"""On-device pipeline ops: parity with the host cv2/numpy reference paths."""
import cv2
import numpy as np
import pytest

from mindpose_tpu.data.transform.topdown_transform import TopDownGenerateTarget
from mindpose_tpu.data.transform.utils import get_affine_transform
from mindpose_tpu.ops.image import affine_warp, invert_affine, normalize_image
from mindpose_tpu.ops.target import generate_topdown_targets

CONFIG = {
    "image_size": [192, 256],
    "heatmap_size": [48, 64],
    "pixel_std": 200.0,
    "scale_padding": 1.25,
    "flip_pairs": [[1, 2]],
    "upper_body_ids": [0, 1],
}


def test_invert_affine():
    rng = np.random.RandomState(0)
    mat = rng.randn(4, 2, 3).astype(np.float32)
    mat[:, 0, 0] += 2.0  # keep well-conditioned
    mat[:, 1, 1] += 2.0
    inv = np.asarray(invert_affine(mat))
    for m, i in zip(mat, inv):
        m3 = np.vstack([m, [0, 0, 1]])
        i3 = np.vstack([i, [0, 0, 1]])
        np.testing.assert_allclose(m3 @ i3, np.eye(3), atol=1e-5)


def test_affine_warp_matches_cv2():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (120, 160, 3)).astype(np.float32)
    # smooth the image so sub-pixel interpolation differences stay small
    img = cv2.GaussianBlur(img, (7, 7), 2.0)

    center = np.array([80.0, 60.0])
    scale = np.array([0.6, 0.8])
    mat = get_affine_transform(center, scale, 25.0, (48, 64))

    ref = cv2.warpAffine(img, np.asarray(mat), (48, 64), flags=cv2.INTER_LINEAR)
    got = np.asarray(affine_warp(img[None], np.asarray(mat)[None], (64, 48)))[0]

    # interiors match to interpolation tolerance; borders differ by padding mode
    diff = np.abs(ref[2:-2, 2:-2] - got[2:-2, 2:-2])
    assert diff.mean() < 0.5
    assert np.median(diff) < 0.1


def test_normalize_image():
    img = np.full((1, 4, 4, 3), 255.0, np.float32)
    out = np.asarray(normalize_image(img, np.array([0.5, 0.5, 0.5]),
                                     np.array([0.25, 0.25, 0.25])))
    np.testing.assert_allclose(out, 2.0, rtol=1e-6)


@pytest.mark.parametrize("use_udp", [False, True])
# non-integer 3*sigma windows hit the reference's asymmetric int() truncation
# (near-edge kernels shift); the device encode must reproduce that exactly
@pytest.mark.parametrize("sigma", [1.5, 2.0, 2.5, 3.0])
def test_device_target_encode_matches_host(use_udp, sigma):
    host = TopDownGenerateTarget(
        is_train=True, config=CONFIG, sigma=sigma, use_udp=use_udp
    )
    rng = np.random.RandomState(1)
    n, k = 6, 17
    kpts = np.zeros((n, k, 3), np.float32)
    kpts[..., 0] = rng.uniform(-20, 210, (n, k))
    kpts[..., 1] = rng.uniform(-20, 275, (n, k))
    kpts[..., 2] = (rng.rand(n, k) > 0.3).astype(np.float32)

    host_targets = []
    host_weights = []
    for i in range(n):
        out = host.transform({"keypoints": kpts[i].copy()})
        host_targets.append(out["target"])
        host_weights.append(out["target_weight"])
    host_targets = np.stack(host_targets)
    host_weights = np.stack(host_weights)

    dev_targets, dev_weights = generate_topdown_targets(
        kpts, heatmap_size=(48, 64), image_size=(192, 256),
        sigma=sigma, use_udp=use_udp,
    )
    np.testing.assert_allclose(np.asarray(dev_weights), host_weights, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(dev_targets), host_targets, atol=2e-5
    )
