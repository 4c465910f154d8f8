"""Filesystem helpers (reference parity: ultralytics/utils/files.py —
WorkingDirectory:15, spaces_in_path:57, increment_path:106, file_age:153,
file_size:165, get_latest_run:177). Pure-stdlib, TPU-host friendly."""

from __future__ import annotations

import contextlib
import glob
import os
import shutil
import tempfile
import time
from datetime import datetime
from pathlib import Path

__all__ = [
    "WorkingDirectory",
    "spaces_in_path",
    "increment_path",
    "file_age",
    "file_date",
    "file_size",
    "get_latest_run",
]


class WorkingDirectory(contextlib.ContextDecorator):
    """chdir context manager / decorator: restores the previous cwd on exit."""

    def __init__(self, new_dir: str | Path):
        self.dir = Path(new_dir)
        self.cwd = None

    def __enter__(self):
        self.cwd = Path.cwd().resolve()
        os.chdir(self.dir)
        return self

    def __exit__(self, *exc):
        os.chdir(self.cwd)
        return False


@contextlib.contextmanager
def spaces_in_path(path: str | Path):
    """Yield a space-free copy of ``path`` (some exporters/toolchains choke on
    spaces); sync the copy back on exit. Paths without spaces pass through."""
    p = Path(path)
    if " " not in str(p):
        yield p
        return
    with tempfile.TemporaryDirectory() as td:
        safe = Path(td) / str(p.name).replace(" ", "_")
        if p.is_dir():
            shutil.copytree(p, safe)
        elif p.is_file():
            safe.parent.mkdir(parents=True, exist_ok=True)
            shutil.copy2(p, safe)
        try:
            yield safe
        finally:
            if safe.is_dir():
                shutil.copytree(safe, p, dirs_exist_ok=True)
            elif safe.is_file():
                shutil.copy2(safe, p)


def increment_path(path: str | Path, exist_ok: bool = False, sep: str = "-", mkdir: bool = False) -> Path:
    """runs/exp -> runs/exp-2, runs/exp-3, ... (first free suffix). With
    ``exist_ok`` the path is returned unchanged."""
    path = Path(path)
    if path.exists() and not exist_ok:
        base, suffix = (path.with_suffix(""), path.suffix) if path.is_file() else (path, "")
        n = 2
        while (path := Path(f"{base}{sep}{n}{suffix}")).exists():
            n += 1
    if mkdir:
        path.mkdir(parents=True, exist_ok=True)
    return path


def file_age(path: str | Path) -> int:
    """Days since last modification."""
    return int((time.time() - Path(path).stat().st_mtime) // 86400)


def file_date(path: str | Path) -> str:
    """'YYYY-M-D' of last modification."""
    t = datetime.fromtimestamp(Path(path).stat().st_mtime)
    return f"{t.year}-{t.month}-{t.day}"


def file_size(path: str | Path) -> float:
    """Size in MB (recursive for directories); 0.0 if absent."""
    p = Path(path)
    mb = 1 << 20
    if p.is_file():
        return p.stat().st_size / mb
    if p.is_dir():
        return sum(f.stat().st_size for f in p.glob("**/*") if f.is_file()) / mb
    return 0.0


def get_latest_run(search_dir: str = ".") -> str:
    """Most recent ``last*.ckpt``/``last*.npz`` under ``search_dir`` (resume
    helper), or ''."""
    hits = glob.glob(f"{search_dir}/**/last*.ckpt", recursive=True) + glob.glob(
        f"{search_dir}/**/last*.npz", recursive=True
    )
    return max(hits, key=os.path.getctime) if hits else ""
