"""Argument / environment checks (reference: ultralytics/utils/checks.py —
check_imgsz, check_version, check_suffix and friends; the subset with
consumers in this framework)."""

from __future__ import annotations

import re
from typing import List, Sequence, Union

from . import LOGGER, make_divisible


def check_imgsz(imgsz: Union[int, Sequence[int]], stride: int = 32, min_dim: int = 1,
                floor: int = 0) -> Union[int, List[int]]:
    """Round image size(s) up to a multiple of the model stride (reference
    checks.py check_imgsz): warns when it changes the value."""
    if isinstance(imgsz, (list, tuple)):
        out = [check_imgsz(v, stride, floor=floor) for v in imgsz]
        return out if min_dim == 1 or len(out) > 1 else out * 2
    new = max(make_divisible(int(imgsz), stride), floor)
    if new != imgsz:
        LOGGER.warning(f"imgsz={imgsz} must be a multiple of stride {stride}; using {new}")
    return new


def parse_version(v: str) -> tuple:
    """'2.3.1+cpu' -> (2, 3, 1); tolerant of suffixes."""
    return tuple(int(x) for x in re.findall(r"\d+", v)[:3]) or (0,)


def check_version(current: str, required: str = "", name: str = "version", hard: bool = False) -> bool:
    """Compare a version against constraints like '>=1.0,<3.0' (reference
    checks.py check_version semantics)."""
    if not required:
        return True
    cur = parse_version(current)
    ok = True
    for clause in required.split(","):
        m = re.match(r"\s*(==|!=|>=|<=|>|<)?\s*([\d.]+)", clause)
        if not m:
            continue
        op, want = m.group(1) or ">=", parse_version(m.group(2))
        ok &= {"==": cur == want, "!=": cur != want, ">=": cur >= want,
               "<=": cur <= want, ">": cur > want, "<": cur < want}[op]
    if not ok:
        msg = f"{name}{required} required, found {current}"
        if hard:
            raise ModuleNotFoundError(msg)
        LOGGER.warning(msg)
    return ok


def check_suffix(path: str, suffixes: Sequence[str], name: str = "file") -> None:
    """Raise unless the path carries one of the expected suffixes."""
    from pathlib import Path

    s = Path(str(path)).suffix.lower()
    allowed = tuple(x.lower() for x in suffixes)
    if s not in allowed:
        raise ValueError(f"{name} '{path}' must have suffix in {allowed}, got '{s}'")
