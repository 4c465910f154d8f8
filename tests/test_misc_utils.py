"""Misc runtime utilities (VERDICT r2 row 69 tail): files ctx managers,
subprocess-free GitRepo, host/device info, downloads, ProfileModels."""

import os
import zipfile
from pathlib import Path

import numpy as np
import pytest


def test_working_directory_and_increment_path(tmp_path):
    from yolo_master_tpu.utils.files import WorkingDirectory, increment_path

    before = Path.cwd()
    with WorkingDirectory(tmp_path):
        assert Path.cwd() == tmp_path
    assert Path.cwd() == before

    p = tmp_path / "exp"
    p.mkdir()
    p2 = increment_path(p)
    assert p2.name == "exp-2" and not p2.exists()
    p3 = increment_path(p, mkdir=True)
    assert p3.exists()
    assert increment_path(p, exist_ok=True) == p


def test_spaces_in_path_roundtrip(tmp_path):
    from yolo_master_tpu.utils.files import spaces_in_path

    d = tmp_path / "with space"
    d.mkdir()
    (d / "a.txt").write_text("x")
    with spaces_in_path(d) as safe:
        assert " " not in str(safe)
        (safe / "b.txt").write_text("y")
    assert (d / "b.txt").read_text() == "y"


def test_file_helpers(tmp_path):
    from yolo_master_tpu.utils.files import file_age, file_date, file_size, get_latest_run

    f = tmp_path / "w.bin"
    f.write_bytes(b"\0" * (1 << 20))
    assert abs(file_size(f) - 1.0) < 0.01
    assert file_age(f) == 0
    assert len(file_date(f).split("-")) == 3
    run = tmp_path / "runs" / "exp"
    run.mkdir(parents=True)
    (run / "last.ckpt").write_text("ck")
    assert get_latest_run(str(tmp_path)).endswith("last.ckpt")


def test_gitrepo_reads_this_repo():
    from yolo_master_tpu.utils.gitinfo import GitRepo

    g = GitRepo(Path(__file__).parent)
    assert g.is_repo
    assert g.commit and len(g.commit) == 40
    assert g.branch  # not detached in dev checkouts
    # non-repo path
    assert not GitRepo("/tmp").is_repo or Path("/tmp/.git").exists()


def test_hostinfo():
    from yolo_master_tpu.utils.hostinfo import CPUInfo, select_device_summary, tpu_info

    name = CPUInfo.name()
    assert isinstance(name, str) and name
    devs = tpu_info()
    assert isinstance(devs, list) and devs  # conftest forces 8 CPU devices
    assert {"id", "kind", "platform"} <= set(devs[0])
    assert "python" in select_device_summary()


def test_safe_download_file_url_and_unzip(tmp_path):
    from yolo_master_tpu.utils.downloads import is_url, safe_download, unzip_file, zip_directory

    src = tmp_path / "payload.bin"
    src.write_bytes(os.urandom(2048))
    url = src.as_uri()
    assert is_url(url) and not is_url("not a url")
    out = safe_download(url, dir=tmp_path / "dl")
    assert out.read_bytes() == src.read_bytes()

    # zip round-trip through safe_download's unzip path
    d = tmp_path / "bundle"
    (d / "sub").mkdir(parents=True)
    (d / "sub" / "x.txt").write_text("hello")
    z = zip_directory(d)
    assert zipfile.is_zipfile(z)
    got = safe_download(z.as_uri(), dir=tmp_path / "dl2", unzip=True)
    assert (got / "sub" / "x.txt").read_text() == "hello"

    # retry exhaustion raises
    with pytest.raises(ConnectionError):
        safe_download((tmp_path / "missing.bin").as_uri(), dir=tmp_path / "dl3", retry=2)


def test_unzip_file_guards_zip_slip(tmp_path):
    from yolo_master_tpu.utils.downloads import unzip_file

    bad = tmp_path / "evil.zip"
    with zipfile.ZipFile(bad, "w") as z:
        z.writestr("../escape.txt", "nope")
    with pytest.raises(ValueError, match="unsafe"):
        unzip_file(bad, tmp_path / "out")


def test_profile_models_tiny():
    from yolo_master_tpu.benchmarks.suite import ProfileModels

    rows = ProfileModels(["yolo-master-n"], imgsz=64, num_timed_runs=3, num_warmup_runs=1).run()
    assert len(rows) == 1
    r = rows[0]
    assert r["params_m"] > 0.5 and r["gflops"] > 0
    assert r["latency_ms_median"] > 0 and r["compile_s"] > 0


def test_build_reference_docs(tmp_path, monkeypatch):
    """docs/build_reference.py renders one markdown page per module + index
    (reference docs/build_reference.py analog, AST-based)."""
    import importlib.util
    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    spec = importlib.util.spec_from_file_location("buildref", repo / "docs/build_reference.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(mod, "OUT", tmp_path)
    assert mod.main() == 0
    pages = list(tmp_path.glob("*.md"))
    assert len(pages) > 80
    idx = (tmp_path / "index.md").read_text()
    assert "yolo_master_tpu.models.yolo" in idx
    facade = (tmp_path / "yolo_master_tpu_models_yolo.md").read_text()
    assert "class `YOLO`" in facade and "train" in facade


def test_model_zoo_metadata():
    """model-zoo/models.json (reference model-zoo analog): one entry per det
    family, every bundled det yaml covered, params measured."""
    import json
    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    d = json.loads((repo / "model-zoo/models.json").read_text())
    assert d["schemaVersion"] == 1 and len(d["models"]) >= 20
    ids = {m["id"] for m in d["models"]}
    assert {"yolo-master", "yolo-master-v0_10", "yolo26-master", "rtdetr-master"} <= ids
    for m in d["models"]:
        assert (repo / m["config"]).exists(), m["id"]
        assert m["params_n_M"] is None or m["params_n_M"] > 0.1
    # every non-task-variant det yaml has an entry
    zoo = {f.stem for f in (repo / "yolo_master_tpu/cfg/models").glob("*.yaml")
           if not f.stem.endswith(("-cls", "-seg", "-pose", "-obb", "-semantic"))}
    assert zoo == ids


def test_perf_docs_reference_newest_bench():
    """README/docs BENCH blocks must quote the newest tracked BENCH_r*.json
    (VERDICT r4 next #5: the record must never lag the driver again)."""
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    r = subprocess.run(
        [sys.executable, str(repo / "scripts/update_perf_docs.py"), "--check"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, f"perf docs stale: {r.stdout}{r.stderr}"
