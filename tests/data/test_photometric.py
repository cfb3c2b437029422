"""TopDownPhotometricDistortion: pixel-only jitter, bounded, composable."""
import numpy as np

from mindpose_tpu.data.transform.topdown_transform import (
    TopDownPhotometricDistortion,
)
from mindpose_tpu.register import entrypoint

SETTING = {
    "image_size": [64, 64],
    "heatmap_size": [16, 16],
    "pixel_std": 200.0,
    "scale_padding": 1.25,
    "flip_pairs": [[1, 2]],
    "upper_body_ids": [0, 1, 2],
}


def test_registered_and_pixels_only():
    t = entrypoint("transform", "topdown_photometric_distortion")(
        is_train=True, config=SETTING
    )
    rng = np.random.RandomState(0)
    image = rng.randint(0, 255, (80, 60, 3), np.uint8)
    keypoints = rng.rand(17, 3)

    np.random.seed(3)
    out = t.transform({"image": image.copy(), "keypoints": keypoints})
    assert set(out) == {"image"}  # geometry keys untouched
    assert out["image"].dtype == np.uint8
    assert out["image"].shape == image.shape


def test_changes_pixels_within_bounds():
    t = TopDownPhotometricDistortion(is_train=True, config=SETTING)
    rng = np.random.RandomState(1)
    image = rng.randint(40, 200, (64, 64, 3), np.uint8)

    np.random.seed(0)
    changed = False
    for _ in range(8):
        out = t.transform({"image": image.copy()})["image"]
        assert out.min() >= 0 and out.max() <= 255
        changed = changed or not np.array_equal(out, image)
    assert changed


def test_brightness_only_shift():
    """With every other op disabled, the delta is pure brightness."""
    t = TopDownPhotometricDistortion(
        is_train=True, config=SETTING,
        brightness_delta=30.0, contrast_range=(1.0, 1.0),
        saturation_range=(1.0, 1.0), hue_delta=0.0,
    )
    image = np.full((32, 32, 3), 128, np.uint8)
    np.random.seed(0)
    deltas = []
    for _ in range(50):
        out = t.transform({"image": image.copy()})["image"]
        d = out.astype(np.float32) - 128.0
        assert np.allclose(d, d.flat[0])  # uniform shift
        assert abs(d.flat[0]) <= 30.0
        deltas.append(d.flat[0])
    assert any(d != 0 for d in deltas)
