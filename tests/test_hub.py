"""HUB client gates (reference ultralytics/hub): auth, queued metric upload
with retry/requeue, checkpoint upload, export verbs — all through the
injectable transport, no network."""

import numpy as np
import pytest

from yolo_master_tpu.hub import HUBClient, HUBTrainingSession
from yolo_master_tpu.utils.settings import SettingsManager


class FakeTransport:
    def __init__(self, fail_times: int = 0):
        self.calls = []
        self.fail_times = fail_times

    def __call__(self, method, url, **kw):
        self.calls.append((method, url, kw))
        if self.fail_times > 0:
            self.fail_times -= 1
            raise ConnectionError("simulated outage")
        return {"success": True}


def _client(tmp_path, **kw):
    t = FakeTransport(**kw)
    c = HUBClient(api_key="k123", endpoint="http://hub.test/v1",
                  transport=t, settings=SettingsManager(tmp_path / "settings.json"))
    return c, t


def test_login_persists_key(tmp_path):
    c, t = _client(tmp_path)
    assert c.login()
    assert t.calls[0][0] == "POST" and t.calls[0][1].endswith("/auth")
    assert SettingsManager(tmp_path / "settings.json")["api_key"] == "k123"
    c.logout()
    assert SettingsManager(tmp_path / "settings.json")["api_key"] == ""


def test_session_metrics_queue_and_requeue(tmp_path, monkeypatch):
    monkeypatch.setattr("time.sleep", lambda s: None)
    c, t = _client(tmp_path, fail_times=3)  # all 3 retries of first flush fail
    s = HUBTrainingSession(c, "m1")
    s.on_fit_epoch_end(0, {"loss": 1.0, "skip": "str"})
    assert s.metrics_queue, "failed flush must stay queued"
    s.on_fit_epoch_end(1, {"loss": 0.5})
    assert s.metrics_queue == {}, "queue flushes once transport recovers"
    sent = [kw["json"]["metrics"] for m, u, kw in t.calls if u.endswith("/metrics") and "json" in kw]
    assert sent[-1] == {0: {"loss": 1.0}, 1: {"loss": 0.5}}, "both epochs in the recovered flush"


def test_session_upload_model_and_export(tmp_path):
    c, t = _client(tmp_path)
    s = HUBTrainingSession(c, "m1")
    w = tmp_path / "best.npz"
    np.savez(w, a=np.zeros(3))
    s.upload_model(epoch=7, weights=str(w), is_best=True)
    m, u, kw = t.calls[-1]
    assert u.endswith("/models/m1/upload") and kw["json"]["isBest"] and kw["json"]["epoch"] == 7
    assert kw["files"]["file"] == w.read_bytes()

    c.export("m1", "tflite")
    assert t.calls[-1][1].endswith("/models/m1/export")
    with pytest.raises(ValueError, match="unsupported export format"):
        c.export("m1", "floppy")


def test_check_dataset_local(tmp_path):
    c, _ = _client(tmp_path)
    y = tmp_path / "data.yaml"
    y.write_text("names:\n  0: x\n")
    assert c.check_dataset(str(y))
    assert not c.check_dataset(str(tmp_path / "missing.yaml"))
