"""HUB client (reference: ultralytics/hub/__init__.py:25-154, hub/auth.py,
hub/session.py:21-417 — login, training session with queued metric/checkpoint
upload and retry, export requests, dataset checks).

Offline-first design: every network call goes through an injectable
``transport(method, url, *, json=None, files=None, headers=None) -> dict``.
The default transport uses ``requests`` when importable and raises a clear
error otherwise, so the client is fully exercisable (and tested) without
network or credentials — point ``endpoint`` at a real server to go live.
"""

from __future__ import annotations

import threading
import time
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional

from .utils import LOGGER
from .utils.settings import SettingsManager

HUB_API = "https://api.hub.example.com/v1"  # override via HUBClient(endpoint=...)
EXPORT_FORMATS_HUB = ("saved_model", "tflite", "stablehlo", "onnx", "pb")


def default_transport(method: str, url: str, **kw) -> Dict[str, Any]:
    try:
        import requests
    except ImportError as e:  # pragma: no cover - requests present in image
        raise RuntimeError("HUB needs the 'requests' package (or pass transport=)") from e
    r = requests.request(method, url, timeout=kw.pop("timeout", 30), **kw)
    r.raise_for_status()
    return r.json() if r.content else {}


class HUBClient:
    """Auth + top-level HUB verbs (reference hub/__init__.py)."""

    def __init__(self, api_key: Optional[str] = None, endpoint: str = HUB_API,
                 transport: Callable = default_transport, settings: Optional[SettingsManager] = None):
        self.settings = settings or SettingsManager()
        self.api_key = api_key or self.settings.get("api_key", "")
        self.endpoint = endpoint.rstrip("/")
        self.transport = transport

    def _headers(self) -> Dict[str, str]:
        return {"x-api-key": self.api_key}

    def login(self, api_key: Optional[str] = None, save: bool = True) -> bool:
        """Validate the key against /auth (reference hub.login)."""
        if api_key:
            self.api_key = api_key
        if not self.api_key:
            raise ValueError("no api_key: pass one or set it in settings")
        ok = bool(self.transport("POST", f"{self.endpoint}/auth", headers=self._headers()).get("success"))
        if ok and save:
            self.settings.update(api_key=self.api_key)
        return ok

    def logout(self):
        self.settings.update(api_key="")
        self.api_key = ""

    def reset_model(self, model_id: str) -> None:
        self.transport("POST", f"{self.endpoint}/model-reset", json={"modelId": model_id}, headers=self._headers())

    def export(self, model_id: str, format: str = "tflite") -> Dict[str, Any]:
        """Request a server-side export (reference hub.export_model)."""
        if format not in EXPORT_FORMATS_HUB:
            raise ValueError(f"unsupported export format '{format}' (choices: {EXPORT_FORMATS_HUB})")
        return self.transport("POST", f"{self.endpoint}/models/{model_id}/export",
                              json={"format": format}, headers=self._headers())

    def check_dataset(self, path: str, task: str = "detect") -> bool:
        """Pre-upload dataset sanity check (reference hub.check_dataset):
        local zip/yaml structure validation, no network."""
        p = Path(path)
        if p.suffix == ".zip":
            import zipfile

            names = zipfile.ZipFile(p).namelist()
            ok = any(n.endswith(".yaml") for n in names)
        else:
            ok = p.suffix in (".yaml", ".yml") and p.exists()
        if ok:
            LOGGER.info(f"dataset '{path}' checks out for task={task} ✅")
        return ok


class HUBTrainingSession:
    """Queued metrics/checkpoint upload with retry + heartbeat
    (reference hub/session.py:21). Attach to a trainer via callbacks:

        sess = HUBTrainingSession(client, model_id)
        trainer.callbacks.add("on_fit_epoch_end", sess.on_fit_epoch_end)
        trainer.callbacks.add("on_train_end", sess.on_train_end)
    """

    def __init__(self, client: HUBClient, model_id: str, heartbeat_s: float = 300.0):
        self.client = client
        self.model_id = model_id
        self.metrics_queue: Dict[int, dict] = {}
        self.heartbeat_s = heartbeat_s
        self._stop = threading.Event()
        self._hb_thread: Optional[threading.Thread] = None

    def _url(self, suffix: str = "") -> str:
        return f"{self.client.endpoint}/models/{self.model_id}{suffix}"

    def _request(self, method: str, url: str, retries: int = 3, **kw) -> Dict[str, Any]:
        """Exponential-backoff retry (reference session.py:243 request_queue)."""
        delay = 1.0
        for attempt in range(retries):
            try:
                return self.client.transport(method, url, headers=self.client._headers(), **kw)
            except Exception as e:  # noqa: BLE001 — transport failures retry
                if attempt == retries - 1:
                    raise
                LOGGER.warning(f"HUB request failed ({e}); retry {attempt + 1}/{retries}")
                time.sleep(delay)
                delay *= 2
        raise AssertionError("unreachable")

    # -- trainer callbacks -----------------------------------------------------
    def on_fit_epoch_end(self, epoch: int, metrics: Dict[str, float]):
        self.metrics_queue[epoch] = {k: float(v) for k, v in metrics.items() if isinstance(v, (int, float))}
        self.upload_metrics()

    def on_train_end(self, *a, **k):
        self.stop_heartbeat()

    def upload_metrics(self):
        """Flush the queue; failed flushes stay queued (reference :359)."""
        if not self.metrics_queue:
            return
        try:
            self._request("POST", self._url("/metrics"), json={"metrics": self.metrics_queue})
            self.metrics_queue = {}
        except Exception as e:  # noqa: BLE001
            LOGGER.warning(f"metrics upload failed, keeping {len(self.metrics_queue)} queued: {e}")

    def upload_model(self, epoch: int, weights: str, is_best: bool = False, final: bool = False):
        """Checkpoint upload (reference :363)."""
        data = Path(weights).read_bytes()
        self._request("POST", self._url("/upload"),
                      json={"epoch": epoch, "isBest": is_best, "final": final, "nbytes": len(data)},
                      files={"file": data})

    # -- heartbeat -------------------------------------------------------------
    def start_heartbeat(self):
        def beat():
            while not self._stop.wait(self.heartbeat_s):
                try:
                    self._request("POST", f"{self.client.endpoint}/agent/heartbeat/models/{self.model_id}", retries=1)
                except Exception as e:  # noqa: BLE001
                    LOGGER.warning(f"heartbeat failed: {e}")

        self._hb_thread = threading.Thread(target=beat, daemon=True)
        self._hb_thread.start()

    def stop_heartbeat(self):
        self._stop.set()
        if self._hb_thread is not None:
            self._hb_thread.join(timeout=1.0)
