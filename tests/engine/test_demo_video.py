"""tools/demo_video.py end to end: config + ckpt + video -> annotated video."""
import os
import subprocess
import sys

import cv2
import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

import mindpose_tpu as mp
import pytest

# JAX-compile-heavy: runs only in the full tier (pytest -m "" / no -m filter); the
# fast gate is `pytest -m "not slow"` — see README "Running the tests"
pytestmark = pytest.mark.slow


_REPO = os.path.join(os.path.dirname(__file__), "..", "..")


def test_demo_video_cli_topdown(tmp_path):
    net = mp.create_network(
        "vit_s", "simple_baseline_head", num_joints=17,
        head_args={"num_deconv_layers": 2, "num_deconv_filters": (256, 256),
                   "num_deconv_kernels": (4, 4)})
    variables = jax.device_get(net.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 192, 3), jnp.float32),
        train=False))
    ckpt = str(tmp_path / "demo.ckpt")
    with open(ckpt, "wb") as f:
        f.write(serialization.to_bytes(variables))

    video = str(tmp_path / "in.mp4")
    writer = cv2.VideoWriter(
        video, cv2.VideoWriter_fourcc(*"mp4v"), 10.0, (160, 120))
    rng = np.random.RandomState(0)
    for _ in range(6):
        writer.write(rng.randint(0, 255, (120, 160, 3), np.uint8))
    writer.release()

    out = str(tmp_path / "out.mp4")
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    r = subprocess.run(
        [sys.executable, os.path.join(_REPO, "tools", "demo_video.py"),
         "--config", os.path.join(_REPO, "configs", "vitpose",
                                  "vitpose_s_tpu.yaml"),
         "--ckpt", ckpt, "--video", video, "--output", out,
         "--max-frames", "4"],
        capture_output=True, text=True, env=env, timeout=1800)
    assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-1500:])

    cap = cv2.VideoCapture(out)
    assert cap.isOpened()
    n = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        assert frame.shape == (120, 160, 3)
        n += 1
    cap.release()
    assert n == 4, n
