"""Persistent user settings (reference: ultralytics/utils/__init__.py:1353
SettingsManager — a JSON-backed dict at ~/.config with versioned defaults,
reset, and update validation)."""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict

from . import LOGGER

DEFAULTS: Dict[str, Any] = {
    "settings_version": "1.0",
    "api_key": "",          # HUB credential (hub.py HUBClient.login)
    "datasets_dir": str(Path.home() / "datasets"),
    "weights_dir": str(Path.home() / "weights"),
    "runs_dir": "runs",
    "sync": False,          # telemetry off by default (nothing phones home)
    "tensorboard": False,
    "profile": False,
}


class SettingsManager(dict):
    """JSON-backed settings dict; unknown keys are rejected on update."""

    def __init__(self, path: str | Path | None = None):
        self.path = Path(path) if path else Path.home() / ".config" / "yolo_master_tpu" / "settings.json"
        super().__init__(DEFAULTS)
        if self.path.exists():
            try:
                stored = json.loads(self.path.read_text())
                if stored.get("settings_version") != DEFAULTS["settings_version"]:
                    LOGGER.warning("settings version changed — resetting to defaults")
                    self.save()
                else:
                    for k in DEFAULTS:
                        if k in stored:
                            self[k] = stored[k]
            except Exception as e:  # noqa: BLE001
                LOGGER.warning(f"settings unreadable ({e}); using defaults")
        else:
            self.save()

    def save(self):
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self.path.write_text(json.dumps(dict(self), indent=2))

    def update(self, *args, **kw):  # type: ignore[override]
        new = dict(*args, **kw)
        for k in new:
            if k not in DEFAULTS:
                raise KeyError(f"unknown setting '{k}' (valid: {sorted(DEFAULTS)})")
        super().update(new)
        self.save()

    def reset(self):
        self.clear()
        super().update(DEFAULTS)
        self.save()


_SETTINGS: SettingsManager | None = None


def get_settings() -> SettingsManager:
    """Process-wide settings singleton (reference: the module-level SETTINGS
    instance, ultralytics/utils/__init__.py:1505)."""
    global _SETTINGS
    if _SETTINGS is None:
        _SETTINGS = SettingsManager()
    return _SETTINGS
