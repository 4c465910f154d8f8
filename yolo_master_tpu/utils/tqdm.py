"""Dependency-free progress bar (reference: ultralytics/utils/tqdm.py — a
drop-in TQDM subset so the framework never hard-depends on tqdm).

Renders to stderr only when attached to a TTY (silent in CI/pipes, like the
reference's disable logic); supports iterable wrapping, manual update(),
set_description, and context-manager use.
"""

from __future__ import annotations

import sys
import time
from typing import Iterable, Iterator, Optional


class TQDM:
    def __init__(self, iterable: Optional[Iterable] = None, total: Optional[int] = None,
                 desc: str = "", unit: str = "it", disable: Optional[bool] = None,
                 mininterval: float = 0.1, file=None):
        self.iterable = iterable
        self.total = total if total is not None else (len(iterable) if hasattr(iterable, "__len__") else None)
        self.desc = desc
        self.unit = unit
        self.file = file or sys.stderr
        self.disable = (not getattr(self.file, "isatty", lambda: False)()) if disable is None else disable
        self.mininterval = mininterval
        self.n = 0
        self._start = time.time()
        self._last = 0.0

    # -- core ------------------------------------------------------------------
    def update(self, n: int = 1):
        self.n += n
        now = time.time()
        if not self.disable and (now - self._last >= self.mininterval or self.n == self.total):
            self._last = now
            self._render()

    def _render(self):
        elapsed = max(time.time() - self._start, 1e-9)
        rate = self.n / elapsed
        if self.total:
            frac = min(self.n / max(self.total, 1), 1.0)
            bar = ("#" * int(frac * 20)).ljust(20)
            msg = f"\r{self.desc} |{bar}| {self.n}/{self.total} [{rate:.1f}{self.unit}/s]"
        else:
            msg = f"\r{self.desc} {self.n}{self.unit} [{rate:.1f}{self.unit}/s]"
        self.file.write(msg)
        self.file.flush()

    def set_description(self, desc: str):
        self.desc = desc

    def close(self):
        if not self.disable and self.n:
            self._render()
            self.file.write("\n")
            self.file.flush()

    # -- protocols -------------------------------------------------------------
    def __iter__(self) -> Iterator:
        for item in self.iterable:
            yield item
            self.update(1)
        self.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
