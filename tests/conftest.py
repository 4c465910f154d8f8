"""Test harness config.

Tests run on a virtual 8-device CPU mesh (the TPU-less analog of the
reference's 2-proc gloo smoke tests, SURVEY.md §4): XLA host-platform device
count is forced *before* jax initializes.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize pins JAX_PLATFORMS=axon (single tunneled TPU); tests
# must run on the virtual 8-device CPU mesh, so force cpu via jax config
# (env-var override is ineffective here).
jax.config.update("jax_platforms", "cpu")

from yolo_master_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

import pytest  # noqa: E402

# -- smoke tier (-m smoke): fast, load-bearing subset that runs <10 min cold
# on a 1-CPU rig (VERDICT r3 item 6). Files here must not import the torch
# reference or compile full-size models.
SMOKE_FILES = {
    "test_nms_metrics.py",
    "test_coco_eval.py",
    "test_cfg_compat.py",
    "test_sparse_dispatch.py",
    "test_serving.py",
    "test_trackers.py",
    "test_utils_converters.py",
    "test_misc_utils.py",
    "test_sahi_augment_cfg.py",
    "test_model_build.py",
    "test_prefetch_loader.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.fspath.basename in SMOKE_FILES and "slow" not in item.keywords:
            item.add_marker(pytest.mark.smoke)


REFERENCE = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE, "ultralytics"))


@pytest.fixture(scope="session")
def torch_reference():
    """Import the PyTorch reference package (CPU), patching the missing
    torchvision metadata. Used only for numeric parity tests; skipped when the
    reference tree is absent."""
    if not reference_available():
        pytest.skip("reference repo not mounted")
    import importlib.metadata as md

    orig = md.version

    def fake_version(name):
        try:
            return orig(name)
        except Exception:
            return "0.19.0"

    md.version = fake_version
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    try:
        import ultralytics  # noqa: F401
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    return ultralytics
