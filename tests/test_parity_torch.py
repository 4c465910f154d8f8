"""Numeric parity vs the PyTorch reference (the core correctness gate).

Builds the reference DetectionModel on CPU, copies its randomly-initialized
weights into our functional tree via the checkpoint importer, feeds both the
same input, and compares decoded predictions to float tolerance — the analog
of BASELINE config 1 ("boxes/scores/classes matching the PyTorch reference").
"""

import numpy as np
import pytest

REF_YAML = "/root/reference/ultralytics/cfg/models/master/v0/det/yolo-master-n.yaml"


@pytest.fixture(scope="module")
def pair(torch_reference):
    import torch

    from yolo_master_tpu.nn.tasks import DetectionModel as JaxModel
    from yolo_master_tpu.utils.torch_import import import_state_dict

    torch.manual_seed(0)
    from ultralytics.nn.tasks import DetectionModel as TorchModel

    tm = TorchModel(REF_YAML, verbose=False)
    tm.eval()
    jm = JaxModel("yolo-master-n")
    params = jm.init_params(0)
    params = import_state_dict(params, tm.state_dict(), strict=True)
    return tm, jm, params


def test_decoded_predictions_match(pair):
    import jax.numpy as jnp
    import torch

    tm, jm, params = pair
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 3, 64, 64), dtype=np.float32) * 0.25 + 0.5
    with torch.no_grad():
        ty, _ = tm(torch.from_numpy(x))
    ty = ty.numpy()  # [B, 4+nc, A]

    jx = jnp.asarray(x.transpose(0, 2, 3, 1))  # NCHW -> NHWC
    jy = np.asarray(jm.forward_predict(params, jx))  # [B, A, 4+nc]
    jy = jy.transpose(0, 2, 1)

    assert ty.shape == jy.shape
    # boxes are in pixel units (up to 64), scores in [0,1]
    box_err = np.abs(ty[:, :4] - jy[:, :4]).max()
    score_err = np.abs(ty[:, 4:] - jy[:, 4:]).max()
    assert box_err < 2e-3, f"box decode mismatch: {box_err}"
    assert score_err < 1e-5, f"score mismatch: {score_err}"


def test_backbone_feature_parity(pair):
    """Check an intermediate feature (post ES_MOE layer 3) matches."""
    import jax.numpy as jnp
    import torch

    tm, jm, params = pair
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 3, 64, 64), dtype=np.float32)

    feats = {}

    def hook(mod, inp, out):
        feats["l3"] = out.detach().numpy()

    h = tm.model[3].register_forward_hook(hook)
    with torch.no_grad():
        tm(torch.from_numpy(x))
    h.remove()

    from yolo_master_tpu.nn.module import Context

    ctx = Context(training=False)
    jx = jnp.asarray(x.transpose(0, 2, 3, 1))
    saved = {}
    y = jx
    lp = params["layers"]
    for spec in jm.specs[:4]:
        y = spec.module(lp[str(spec.i)], y, ctx)
    jf = np.asarray(y).transpose(0, 3, 1, 2)
    err = np.abs(feats["l3"] - jf).max()
    assert err < 1e-4, f"layer-3 feature mismatch: {err}"
