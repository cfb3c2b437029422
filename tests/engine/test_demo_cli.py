"""tools/demo.py end to end: config + ckpt + images -> skeleton overlays."""
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


def test_demo_cli_topdown(tmp_path):
    # a checkpoint from init (untrained: the demo only needs a valid tree)
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

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    cv2.imwrite(str(img_dir / "a.jpg"),
                rng.randint(0, 255, (240, 320, 3), np.uint8))
    out_dir = tmp_path / "out"

    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    r = subprocess.run(
        [sys.executable, os.path.join(_REPO, "tools", "demo.py"),
         "--config", os.path.join(_REPO, "configs", "vitpose",
                                  "vitpose_s_tpu.yaml"),
         "--ckpt", ckpt, "--image-dir", str(img_dir),
         "--output-dir", str(out_dir)],
        capture_output=True, text=True, env=env, timeout=1800)
    assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-1500:])
    outs = list(out_dir.glob("*.jpg")) + list(out_dir.glob("*.png"))
    assert outs, f"no overlay written in {out_dir}"
    overlay = cv2.imread(str(outs[0]))
    assert overlay is not None and overlay.shape == (240, 320, 3)
