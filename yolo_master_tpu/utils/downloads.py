"""Download + archive helpers (reference parity: ultralytics/utils/downloads.py
safe_download/unzip_file/zip_directory/check_disk_space — recast on urllib;
``file://`` URLs work in fully offline environments, which is also how the
tests exercise the retry/unzip paths)."""

from __future__ import annotations

import shutil
import urllib.parse
import urllib.request
import zipfile
from pathlib import Path
from typing import Optional

from . import LOGGER

__all__ = ["is_url", "safe_download", "unzip_file", "zip_directory", "check_disk_space"]


def is_url(s: str, check_exists: bool = False) -> bool:
    """Syntactic URL check; with ``check_exists`` also opens it (HEAD-ish)."""
    try:
        r = urllib.parse.urlparse(str(s))
        ok = all([r.scheme, r.netloc]) or r.scheme == "file"
        if ok and check_exists:
            with urllib.request.urlopen(str(s), timeout=5):
                pass
        return ok
    except Exception:
        return False


def check_disk_space(path: str | Path = ".", required_gb: float = 2.0) -> bool:
    """True when ``path``'s filesystem has at least ``required_gb`` free."""
    try:
        return shutil.disk_usage(Path(path).resolve()).free / (1 << 30) >= required_gb
    except Exception:
        return True


def unzip_file(file: str | Path, path: Optional[str | Path] = None, exist_ok: bool = False) -> Path:
    """Extract a .zip next to itself (or into ``path``); zip-slip-guarded.
    Archives whose members share no single top-level directory are unpacked
    into a directory named after the zip."""
    file = Path(file)
    path = Path(path or file.parent)
    with zipfile.ZipFile(file) as z:
        names = [n for n in z.namelist() if not n.startswith("__MACOSX")]
        tops = {n.split("/", 1)[0] for n in names}
        dest = path if len(tops) == 1 and any("/" in n for n in names) else path / file.stem
        import os

        base = str(dest.resolve())
        for n in names:
            target = (dest / n).resolve()
            if not (str(target) == base or str(target).startswith(base + os.sep)):
                raise ValueError(f"unsafe zip member path: {n}")
        out_root = dest / next(iter(tops)) if len(tops) == 1 and any("/" in n for n in names) else dest
        if out_root.exists() and not exist_ok and any(out_root.iterdir()):
            return out_root
        dest.mkdir(parents=True, exist_ok=True)
        z.extractall(dest)
    return out_root


def zip_directory(directory: str | Path, compress: bool = True) -> Path:
    """Zip a directory's contents to ``<dir>.zip`` (skips existing .zip files)."""
    directory = Path(directory)
    out = directory.with_suffix(".zip")
    comp = zipfile.ZIP_DEFLATED if compress else zipfile.ZIP_STORED
    with zipfile.ZipFile(out, "w", comp) as z:
        for f in sorted(directory.rglob("*")):
            if f.is_file() and f.suffix != ".zip":
                z.write(f, f.relative_to(directory.parent))
    return out


def safe_download(
    url: str,
    file: Optional[str | Path] = None,
    dir: Optional[str | Path] = None,
    unzip: bool = True,
    delete: bool = False,
    retry: int = 3,
    min_bytes: float = 1.0,
    progress: bool = False,
) -> Path:
    """Download ``url`` with retries + size validation; optionally unzip.

    Raises ConnectionError after ``retry`` failed attempts or when the
    result is smaller than ``min_bytes``.
    """
    name = Path(urllib.parse.unquote(str(url))).name.split("?")[0]
    f = Path(dir or ".") / (file or name) if dir or not file else Path(file)
    f.parent.mkdir(parents=True, exist_ok=True)
    if not f.exists():
        last = None
        for attempt in range(retry):
            try:
                with urllib.request.urlopen(str(url), timeout=30) as r, open(f, "wb") as out:
                    total = int(r.headers.get("Content-Length", 0) or 0)
                    got = 0
                    while chunk := r.read(1 << 20):
                        out.write(chunk)
                        got += len(chunk)
                        if progress and total:
                            LOGGER.info(f"download {name}: {got / total:.0%}")
                break
            except Exception as e:  # noqa: PERF203
                last = e
                f.unlink(missing_ok=True)
                LOGGER.warning(f"download attempt {attempt + 1}/{retry} failed for {url}: {e}")
        else:
            raise ConnectionError(f"download failed after {retry} attempts: {url}") from last
    if f.exists() and f.stat().st_size < min_bytes:
        f.unlink(missing_ok=True)
        raise ConnectionError(f"downloaded file too small (<{min_bytes}B): {url}")
    if unzip and f.suffix == ".zip":
        out = unzip_file(f, dir or f.parent)
        if delete:
            f.unlink(missing_ok=True)
        return out
    return f
