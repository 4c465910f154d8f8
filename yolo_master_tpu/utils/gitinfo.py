"""Subprocess-free git metadata (reference parity: ultralytics/utils/git.py
GitRepo:10 — root/branch/commit/origin resolved by reading .git files only,
so it works in sandboxed/restricted environments)."""

from __future__ import annotations

import zlib
from functools import cached_property
from pathlib import Path
from typing import Optional

__all__ = ["GitRepo"]


class GitRepo:
    """Lazily-resolved repository metadata from on-disk .git state.

    Reads HEAD, refs, packed-refs, config and loose objects directly —
    no ``git`` binary. Properties cache on first access; construct a new
    instance to refresh.
    """

    def __init__(self, path: str | Path | None = None):
        start = Path(path) if path is not None else Path.cwd()
        self.root = self._find_root(start.resolve())
        self.gitdir = self._resolve_gitdir(self.root / ".git") if self.root else None

    @staticmethod
    def _find_root(p: Path) -> Optional[Path]:
        for d in [p] + list(p.parents):
            if (d / ".git").exists():
                return d
        return None

    @staticmethod
    def _resolve_gitdir(entry: Path) -> Optional[Path]:
        if entry.is_dir():
            return entry
        if entry.is_file():  # worktree: "gitdir: <path>"
            txt = entry.read_text(errors="ignore").strip()
            if txt.startswith("gitdir:"):
                gd = Path(txt.split(":", 1)[1].strip())
                return gd if gd.is_absolute() else (entry.parent / gd).resolve()
        return None

    @property
    def is_repo(self) -> bool:
        return self.gitdir is not None

    @cached_property
    def head(self) -> Optional[str]:
        if not self.gitdir or not (self.gitdir / "HEAD").exists():
            return None
        return (self.gitdir / "HEAD").read_text(errors="ignore").strip()

    @cached_property
    def branch(self) -> Optional[str]:
        h = self.head
        if h and h.startswith("ref:"):
            ref = h.split(":", 1)[1].strip()
            return ref.rsplit("/", 1)[-1] if ref.startswith("refs/heads/") else ref
        return None  # detached or not a repo

    @cached_property
    def commit(self) -> Optional[str]:
        h = self.head
        if h is None:
            return None
        if not h.startswith("ref:"):
            return h  # detached HEAD: SHA directly
        ref = h.split(":", 1)[1].strip()
        # common-dir refs (worktrees keep shared refs in the parent gitdir)
        for base in (self.gitdir, self._commondir()):
            if base and (base / ref).exists():
                return (base / ref).read_text(errors="ignore").strip()
        packed = (self._commondir() or self.gitdir) / "packed-refs"
        if packed.exists():
            for line in packed.read_text(errors="ignore").splitlines():
                if line.endswith(" " + ref):
                    return line.split(" ", 1)[0]
        return None

    def _commondir(self) -> Optional[Path]:
        if not self.gitdir:
            return None
        cd = self.gitdir / "commondir"
        if cd.exists():
            rel = cd.read_text(errors="ignore").strip()
            return (self.gitdir / rel).resolve()
        return self.gitdir

    @cached_property
    def message(self) -> Optional[str]:
        """Commit subject line, from the loose object if present."""
        sha = self.commit
        base = self._commondir()
        if not sha or not base:
            return None
        obj = base / "objects" / sha[:2] / sha[2:]
        if not obj.exists():
            return None  # packed object: skip (no pack-index parser)
        try:
            raw = zlib.decompress(obj.read_bytes()).decode(errors="ignore")
            body = raw.split("\n\n", 1)
            return body[1].splitlines()[0].strip() if len(body) > 1 else None
        except Exception:
            return None

    @cached_property
    def origin(self) -> Optional[str]:
        base = self._commondir()
        cfg = base / "config" if base else None
        if not cfg or not cfg.exists():
            return None
        section = None
        for line in cfg.read_text(errors="ignore").splitlines():
            s = line.strip()
            if s.startswith("["):
                section = s
            elif section == '[remote "origin"]' and s.startswith("url"):
                return s.split("=", 1)[1].strip()
        return None
