"""Native C preprocessing parity (deploy/cpp/src/ymt_preprocess.cpp via
ctypes): the fused normalize and s2d4 blob builders must match the numpy
twins bit-for-bit. Skips when the toolchain can't build the library."""

import numpy as np
import pytest

from yolo_master_tpu.data import native


pytestmark = pytest.mark.skipif(not native.available(), reason="native lib unavailable")


@pytest.fixture(scope="module")
def bgr():
    return (np.random.default_rng(0).random((320, 416, 3)) * 255).astype(np.uint8)


def test_nhwc_normalize_parity(bgr):
    out = native.nhwc_normalize(bgr)
    ref = bgr[..., ::-1].astype(np.float32) / 255.0
    # C multiplies by the f32 reciprocal; numpy divides — last-ulp difference
    np.testing.assert_allclose(out, ref, atol=1e-7)


def test_s2d4_blob_parity(bgr):
    from yolo_master_tpu.ops.pallas_stem import s2d4_blob_np

    # blob layouts require H, W divisible by 4 — crop like letterbox output
    im = bgr[:320, :416]
    blob = native.s2d4_blob_from_bgr(im)
    x = (im[..., ::-1].astype(np.float32) / 255.0).transpose(2, 0, 1)[None]
    ref = s2d4_blob_np(x)[0]
    assert blob.shape == ref.shape
    np.testing.assert_allclose(blob, ref, atol=1e-7)


def test_s2d4_blob_u8_parity(bgr):
    from yolo_master_tpu.ops.pallas_stem import s2d4_blob_np

    im = bgr[:320, :416]
    blob = native.s2d4_blob_u8_from_bgr(im)
    assert blob.dtype == np.uint8
    x = im[..., ::-1].astype(np.float32).transpose(2, 0, 1)[None]  # unnormalized
    ref = s2d4_blob_np(x)[0]
    np.testing.assert_array_equal(blob.astype(np.float32), ref)


def test_uint8_blob_predict_parity_interpret():
    """fuse(pallas_stem=True) with uint8 blobs (the /255 folded into stem
    weights) matches the plain float predict path."""
    from yolo_master_tpu.models.yolo import YOLO

    img = (np.random.default_rng(2).random((80, 70, 3)) * 255).astype(np.uint8)
    y0 = YOLO("yolo-master-n")
    ref = y0.predict(img, imgsz=64, conf=0.0001, max_det=20)[0]
    y = YOLO("yolo-master-n")
    y.params = y0.params
    y.fuse(pallas_stem=True, imgsz=64)
    assert y.model.input_blob_uint8
    out = y.predict(img, imgsz=64, conf=0.0001, max_det=20)[0]
    assert len(out.boxes) == len(ref.boxes)
    np.testing.assert_allclose(out.boxes.xyxy, ref.boxes.xyxy, atol=0.1)
