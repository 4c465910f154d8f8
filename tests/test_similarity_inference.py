"""Similarity search + live-inference solutions (reference
solutions/similarity_search.py + streamlit_inference.py analogs)."""

import numpy as np
import pytest


@pytest.fixture()
def image_dir(tmp_path):
    import cv2

    rng = np.random.default_rng(0)
    for name, color in [("red_box", (0, 0, 255)), ("green_box", (0, 255, 0)),
                        ("blue_box", (255, 0, 0)), ("red_circle", (0, 0, 255))]:
        img = np.full((64, 64, 3), 30, np.uint8)
        if "box" in name:
            cv2.rectangle(img, (16, 16), (48, 48), color, -1)
        else:
            cv2.circle(img, (32, 32), 18, color, -1)
        cv2.imwrite(str(tmp_path / f"{name}.jpg"), img)
    return tmp_path


def test_visual_search_by_image(image_dir):
    import cv2

    from yolo_master_tpu.solutions import VisualAISearch

    s = VisualAISearch(str(image_dir))
    assert len(s.image_paths) == 4
    # query with a copy of red_box: itself must rank first
    q = cv2.imread(str(image_dir / "red_box.jpg"))
    results = s.search_image(q, k=4)
    assert results[0][0].endswith("red_box.jpg") and results[0][1] > 0.99


def test_text_search_filename_fallback(image_dir):
    from yolo_master_tpu.solutions import VisualAISearch

    s = VisualAISearch(str(image_dir))
    results = s.search("red box", k=2)
    assert any("red_box" in p for p, _ in results)


def test_index_cache_roundtrip(image_dir):
    from yolo_master_tpu.solutions import VisualAISearch

    s1 = VisualAISearch(str(image_dir))
    s2 = VisualAISearch(str(image_dir))  # loads from cache
    assert np.allclose(s1.index, s2.index)


def test_search_app_endpoint(image_dir):
    import http.client
    import json
    import threading

    from yolo_master_tpu.solutions import SearchApp

    httpd = SearchApp(str(image_dir), port=0).run(serve_forever=False)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", httpd.server_address[1], timeout=10)
        conn.request("GET", "/search?q=red+box")
        resp = conn.getresponse()
        data = json.loads(resp.read())
        assert resp.status == 200 and len(data) >= 1
    finally:
        httpd.shutdown()


def test_inference_solution_builds():
    from yolo_master_tpu.solutions import Inference

    inf = Inference({"nc": 1, "backbone": [[-1, 1, "Conv", [16, 3, 2]],
                                           [-1, 1, "Conv", [32, 3, 2]],
                                           [-1, 1, "Conv", [32, 3, 2]],
                                           [-1, 1, "Conv", [32, 3, 2]],
                                           [-1, 1, "Conv", [32, 3, 2]]],
                     "head": [[[2, 3, 4], 1, "Detect", ["nc"]]]}, task="detect")
    assert inf.model.task == "detect"
