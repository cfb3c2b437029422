"""HTTP pose service: round-trip over a real socket with a tiny model."""
import base64
import json
import sys
import threading
import urllib.request

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "tests")

import mindpose_tpu as mp
from mindpose_tpu.engine import PoseService, TopDownPredictor, build_http_server

# registers tiny_test_backbone
from tests.engine.test_train_eval_e2e import TINY_SETTING  # noqa: F401


@pytest.fixture(scope="module")
def server():
    net = mp.create_network("tiny_test_backbone", "hrnet_head")
    variables = net.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    predictor = TopDownPredictor(
        net, variables, dataset_setting=dict(TINY_SETTING), batch_size=4
    )
    service = PoseService(predictor, mode="topdown", num_joints=17)
    httpd, port = build_http_server(service, port=0)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as err:
        return err.code, json.loads(err.read())


def test_healthz(server):
    with urllib.request.urlopen(server + "/healthz") as resp:
        assert resp.status == 200
        body = json.loads(resp.read())
    assert body == {"status": "ok", "mode": "topdown", "num_joints": 17}


def test_predict_roundtrip(server):
    rng = np.random.RandomState(0)
    image = rng.randint(0, 255, (120, 160, 3), np.uint8)
    ok, buf = cv2.imencode(".jpg", image)
    assert ok
    payload = {
        "image_b64": base64.b64encode(buf.tobytes()).decode(),
        "boxes": [[10, 10, 60, 100], [80, 5, 70, 110]],
    }
    status, body = _post(server + "/predict", payload)
    assert status == 200, body
    preds = np.asarray(body["predictions"])
    assert preds.shape == (2, 17, 3)
    # coordinates map back to the original frame (the 1.25-padded crop can
    # extend past the image, so allow that margin)
    assert np.isfinite(preds).all()
    assert preds[..., 0].min() > -80 and preds[..., 0].max() < 240
    assert body["latency_ms"] > 0

    # whole-image default box
    status, body = _post(
        server + "/predict",
        {"image_b64": base64.b64encode(buf.tobytes()).decode()},
    )
    assert status == 200
    assert np.asarray(body["predictions"]).shape == (1, 17, 3)


def test_predict_errors(server):
    status, body = _post(server + "/predict", {})
    assert status == 400 and "image_b64" in body["error"]

    status, body = _post(server + "/predict", {"image_b64": "!!!"})
    assert status == 400 and "base64" in body["error"]

    ok, buf = cv2.imencode(".jpg", np.zeros((32, 32, 3), np.uint8))
    good = base64.b64encode(buf.tobytes()).decode()
    status, body = _post(
        server + "/predict", {"image_b64": good, "boxes": [[1, 2, 3]]}
    )
    assert status == 400 and "boxes" in body["error"]

    status, body = _post(
        server + "/predict",
        {"image_b64": good, "boxes": [[0, 0, 32, 32]], "box_scores": [1, 2]},
    )
    assert status == 400 and "box_scores" in body["error"]


def test_unknown_path_is_404(server):
    try:
        urllib.request.urlopen(server + "/nope")
        assert False, "expected 404"
    except urllib.error.HTTPError as err:
        assert err.code == 404
