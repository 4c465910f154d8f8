"""gRPC serving layer (SURVEY §2.9 deliverable (b), VERDICT r1 row 53):
codec round-trip + live server/client inference over localhost."""

import numpy as np
import pytest

from yolo_master_tpu.serving import InferenceClient, InferenceServer, decode, encode


def test_codec_roundtrip():
    t = {
        "a": np.arange(12, dtype=np.float32).reshape(3, 4),
        "b": np.array([True, False]),
        "c": np.int32(7).reshape(()),
    }
    blob = encode(t, {"k": "v"})
    out, meta = decode(blob)
    assert meta == {"k": "v"}
    for k in t:
        assert out[k].dtype == t[k].dtype and out[k].shape == t[k].shape
        assert np.array_equal(out[k], t[k])


def test_large_payload_over_4mb():
    """A 640x640x3 float32 request is 4.9 MB — past gRPC's 4 MB default cap.
    Both channel ends must carry the max_message_length options or real-size
    images are rejected with RESOURCE_EXHAUSTED (found live on TPU serving)."""
    pytest.importorskip("grpc")

    class EchoPredictor:
        imgsz = (640, 640)
        model = type("M", (), {"nc": 1})()
        params = None
        compute_dtype = np.float32

        def _get_fn(self, bs):
            def fn(params, x):
                n = x.shape[0]
                return {
                    "boxes": np.zeros((n, 1, 4), np.float32),
                    "scores": np.zeros((n, 1), np.float32),
                    "classes": np.zeros((n, 1), np.int32),
                    "valid": np.ones((n, 1), bool),
                }

            return fn

    server = InferenceServer(EchoPredictor())
    port = server.start(port=0)
    try:
        client = InferenceClient(f"127.0.0.1:{port}")
        x = np.zeros((1, 640, 640, 3), np.float32)
        assert x.nbytes > 4 * 1024 * 1024
        out = client.infer(x)
        assert out["boxes"].shape == (1, 1, 4)
        client.close()
    finally:
        server.stop()


def test_server_client_infer():
    pytest.importorskip("grpc")
    from yolo_master_tpu.engine.predictor import DetectionPredictor
    from yolo_master_tpu.nn.tasks import DetectionModel

    cfg = {"nc": 2, "backbone": [
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
    ], "head": [[[2, 3, 4], 1, "Detect", ["nc"]]]}
    model = DetectionModel(cfg)
    pred = DetectionPredictor(model, model.init_params(0), imgsz=64, conf=1e-6, max_det=8, max_nms=256)
    server = InferenceServer(pred, names={0: "a", 1: "b"})
    port = server.start(port=0)
    try:
        client = InferenceClient(f"127.0.0.1:{port}")
        assert client.live()
        md = client.metadata()
        assert md["nc"] == 2 and md["imgsz"] == [64, 64]
        x = np.random.default_rng(0).random((2, 64, 64, 3), np.float32)
        out = client.infer(x)
        assert out["boxes"].shape[0] == 2 and out["boxes"].shape[-1] == 4
        assert set(out) >= {"boxes", "scores", "classes", "valid"}
        client.close()
    finally:
        server.stop()


def test_autobackend_grpc_scheme_predict():
    """AutoBackend('grpc://host:port') routes predict through a remote
    InferenceServer — the reference's TritonRemoteModel / triton:// model
    scheme (utils/triton.py:11, nn/autobackend.py)."""
    pytest.importorskip("grpc")
    from yolo_master_tpu.engine.predictor import DetectionPredictor
    from yolo_master_tpu.nn.autobackend import AutoBackend
    from yolo_master_tpu.nn.tasks import DetectionModel

    cfg = {"nc": 2, "backbone": [[-1, 1, "Conv", [16, 3, 2]], [-1, 1, "Conv", [32, 3, 2]]],
           "head": [[[1], 1, "Detect", ["nc"]]]}
    model = DetectionModel(cfg)
    pred = DetectionPredictor(model, model.init_params(0), imgsz=64, conf=1e-6, max_det=8, max_nms=64)
    server = InferenceServer(pred, names={0: "a", 1: "b"})
    port = server.start(port=0)
    try:
        be = AutoBackend(f"grpc://127.0.0.1:{port}")
        assert be.kind == "grpc" and be.nc == 2 and be.nms_embedded
        remote_pred = DetectionPredictor(backend=be, imgsz=64, conf=1e-6, max_det=8, max_nms=64)
        img = (np.random.default_rng(0).random((96, 80, 3)) * 255).astype(np.uint8)
        r = remote_pred(img)[0]
        # parity vs the local path on the same image
        r_local = pred(img)[0]
        assert len(r.boxes) == len(r_local.boxes)
        np.testing.assert_allclose(r.boxes.xyxy, r_local.boxes.xyxy, atol=0.1)
    finally:
        server.stop()


def test_dynamic_micro_batching():
    """Concurrent requests inside the batch window coalesce into one device
    call (Triton dynamic_batching analog), and every caller gets its own
    slice back."""
    pytest.importorskip("grpc")
    from concurrent.futures import ThreadPoolExecutor

    from yolo_master_tpu.engine.predictor import DetectionPredictor
    from yolo_master_tpu.nn.tasks import DetectionModel

    cfg = {"nc": 2, "backbone": [[-1, 1, "Conv", [8, 3, 2]], [-1, 1, "Conv", [16, 3, 2]]],
           "head": [[[1], 1, "Detect", ["nc"]]]}
    model = DetectionModel(cfg)
    pred = DetectionPredictor(model, model.init_params(0), imgsz=64, conf=1e-6, max_det=8, max_nms=64)
    server = InferenceServer(pred, max_workers=8, max_batch=8, batch_window_ms=30.0)

    calls = []
    orig = server._run_device

    def counting(x):
        calls.append(x.shape[0])
        return orig(x)

    server._run_device = counting
    port = server.start(port=0)
    try:
        client = InferenceClient(f"127.0.0.1:{port}")
        x1 = np.full((1, 64, 64, 3), 0.3, np.float32)
        client.infer(x1)  # warm compile alone
        calls.clear()

        rng = np.random.default_rng(0)
        inputs = [rng.random((1, 64, 64, 3)).astype(np.float32) for _ in range(4)]
        with ThreadPoolExecutor(4) as ex:
            outs = list(ex.map(client.infer, inputs))
        assert all(o["boxes"].shape[0] == 1 for o in outs)
        # the four concurrent singles must have coalesced (fewer device calls
        # than requests, and at least one call with batch > 1)
        assert len(calls) < 4 and max(calls) > 1, f"no coalescing: {calls}"
        # per-request results match solo inference
        solo = [orig(x) for x in inputs]
        for o, s in zip(outs, solo):
            np.testing.assert_allclose(o["scores"], s["scores"], atol=1e-5)
    finally:
        server.stop()


def test_mesh_sharded_serving_matches_single_chip():
    """Multi-chip serving (VERDICT r3 item 7 / BASELINE config 5): the same
    server with a mesh-sharded predictor must return the same detections as
    the unsharded one, with requests padded to a multiple of the mesh so the
    batch axis splits over 'data' (the Triton multi-instance analog,
    reference utils/triton.py:11)."""
    pytest.importorskip("grpc")
    from yolo_master_tpu.engine.predictor import DetectionPredictor
    from yolo_master_tpu.nn.tasks import DetectionModel
    from yolo_master_tpu.parallel.mesh import make_mesh

    # real save-list topology (VERDICT r4 weak #6): skip connection + Concat
    # + a routed ES_MOE block, so the sharded serving graph exercises the
    # multi-input graph walk and MoE dispatch, not a straight Conv line
    cfg = {"nc": 2, "backbone": [
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "ES_MOE", [32]],
        [-1, 1, "Conv", [32, 1, 1]],
        [[-1, 2], 1, "Concat", [1]],
        [-1, 1, "Conv", [32, 3, 2]],
    ], "head": [[[5], 1, "Detect", ["nc"]]]}
    model = DetectionModel(cfg)
    params = model.init_params(0)
    x = np.random.default_rng(1).random((3, 64, 64, 3), np.float32)

    outs = {}
    for name, mesh in (("single", None), ("mesh", make_mesh(8))):
        pred = DetectionPredictor(model, params, imgsz=64, conf=1e-6, max_det=8,
                                  max_nms=256, mesh=mesh)
        server = InferenceServer(pred)
        port = server.start(port=0)
        try:
            client = InferenceClient(f"127.0.0.1:{port}")
            outs[name] = client.infer(x)
            client.close()
        finally:
            server.stop()

    for k in ("boxes", "scores", "classes", "valid"):
        np.testing.assert_allclose(
            np.asarray(outs["mesh"][k], np.float32),
            np.asarray(outs["single"][k], np.float32),
            atol=2e-5, err_msg=k,
        )


def test_uint8_wire_matches_float():
    """Raw uint8 requests against a /255-folded stem (fold_uint8_input) must
    produce the same detections as float[0,1] requests — both against folded
    and unfolded predictors (the server rescales whichever side needs it).
    The uint8 wire is 4x less transfer, the serving bottleneck on
    relay-attached chips."""
    pytest.importorskip("grpc")
    from yolo_master_tpu.engine.predictor import DetectionPredictor
    from yolo_master_tpu.nn.tasks import DetectionModel
    from yolo_master_tpu.utils.fuse import fold_uint8_input, fuse_bn_params

    cfg = {"nc": 2, "backbone": [
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
    ], "head": [[[1], 1, "Detect", ["nc"]]]}
    u8 = np.random.default_rng(5).integers(0, 256, (2, 64, 64, 3), np.uint8)
    f32 = u8.astype(np.float32) / 255.0

    outs = {}
    for mode in ("folded", "plain"):
        model = DetectionModel(cfg)
        params = fuse_bn_params(model.init_params(0))
        if mode == "folded":
            params = fold_uint8_input(model, params)
        pred = DetectionPredictor(model, params, imgsz=64, conf=1e-6, max_det=8, max_nms=64)
        server = InferenceServer(pred)
        port = server.start(port=0)
        try:
            client = InferenceClient(f"127.0.0.1:{port}")
            outs[f"{mode}_u8"] = client.infer(u8)
            outs[f"{mode}_f32"] = client.infer(f32)
            client.close()
        finally:
            server.stop()

    ref = outs["plain_f32"]
    for name, out in outs.items():
        for k in ("boxes", "scores"):
            np.testing.assert_allclose(
                np.asarray(out[k], np.float32), np.asarray(ref[k], np.float32),
                atol=2e-3, err_msg=f"{name}.{k}",
            )
