"""BottomUpGenerateTarget: vectorized encode vs an independent loop oracle.

The vectorized canvas-scatter encode (bottomup_transform.py) must reproduce
the reference algorithm (/root/reference/mindpose/data/transform/
bottomup_transform.py:463-598) bit-exactly: per-point sub-pixel Gaussian
patches, boundary clipping, per-pixel max across instances, and AE tag flat
indices. The oracle below is the loop algorithm written directly from that
spec.
"""
import numpy as np
import pytest

from mindpose_tpu.data.transform.bottomup_transform import BottomUpGenerateTarget

CONFIG = {
    "image_size": [128, 128],
    "heatmap_sizes": [[32, 32], [64, 64]],
    "tag_per_joint": True,
    "flip_pairs": [[1, 2]],
    "max_image_size": [128, 128],
    "pixel_std": 200.0,
}


def loop_oracle(keypoints, heatmap_size, sigma, max_num, tag_per_joint=True):
    w, h = heatmap_size
    m, k, _ = keypoints.shape
    target = np.zeros((k, h, w), dtype=np.float32)
    tag_shape = (max_num, k, 2) if tag_per_joint else (max_num, 2)
    tag_ind = np.zeros(tag_shape, dtype=np.int32)
    tmp_size = sigma * 3
    size = int(2 * tmp_size + 1)
    x = np.arange(0, size, 1, np.float32)
    y = x[:, None]
    x0 = y0 = size // 2
    for mi, single in enumerate(keypoints):
        for idx, pt in enumerate(single):
            if pt[2] <= 0:
                continue
            mu_x, mu_y = round(pt[0]), round(pt[1])
            ul = [int(mu_x - tmp_size), int(mu_y - tmp_size)]
            br = [int(mu_x + tmp_size + 1), int(mu_y + tmp_size + 1)]
            if ul[0] >= w or ul[1] >= h or br[0] < 0 or br[1] < 0:
                continue
            x0_p = x0 + pt[0] - mu_x
            y0_p = y0 + pt[1] - mu_y
            g = np.exp(-((x - x0_p) ** 2 + (y - y0_p) ** 2) / (2 * sigma**2))
            g_x = max(0, -ul[0]), min(br[0], w) - ul[0]
            g_y = max(0, -ul[1]), min(br[1], h) - ul[1]
            img_x = max(0, ul[0]), min(br[0], w)
            img_y = max(0, ul[1]), min(br[1], h)
            patch = target[idx, img_y[0] : img_y[1], img_x[0] : img_x[1]]
            target[idx, img_y[0] : img_y[1], img_x[0] : img_x[1]] = np.maximum(
                patch, g[g_y[0] : g_y[1], g_x[0] : g_x[1]]
            )
            if mu_x >= w or mu_y >= h or mu_x < 0 or mu_y < 0:
                continue
            if tag_per_joint:
                tag_ind[mi, idx] = (mu_y * w + mu_x, 1)
            else:
                tag_ind[mi] = (mu_y * w + mu_x, 1)
    return target, tag_ind


@pytest.mark.parametrize("sigma", [2.0, 1.5, 2.5, 3.0])
@pytest.mark.parametrize("dtype", [np.float32, np.float64])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_vectorized_matches_loop_oracle(seed, dtype, sigma):
    rng = np.random.RandomState(seed)
    m, k = 7, 17
    w, h = 48, 64
    # spread points well past the borders to exercise clipping and rejection
    # (fractional sigma*3 exercises the reference's trunc-asymmetric windows)
    kps = np.stack(
        [
            rng.uniform(-20, w + 20, (m, k)),
            rng.uniform(-20, h + 20, (m, k)),
            rng.choice([0.0, 1.0, 2.0], (m, k), p=[0.3, 0.4, 0.3]),
        ],
        axis=-1,
    ).astype(dtype)
    t = BottomUpGenerateTarget(is_train=True, config=CONFIG, sigma=sigma, max_num=30)
    got_t, got_i = t._generate_heatmap_and_tag_ind(kps, (w, h))
    exp_t, exp_i = loop_oracle(kps, (w, h), sigma=sigma, max_num=30)
    np.testing.assert_array_equal(got_t, exp_t)
    np.testing.assert_array_equal(got_i, exp_i)


def test_half_integer_rounding_parity():
    # np.rint (half-to-even) must match the loop's round() on .5 coordinates
    kps = np.array(
        [[[2.5, 3.5, 2.0], [1.5, 0.5, 1.0], [4.5, 5.5, 1.0]]], np.float32
    )
    cfg = dict(CONFIG)
    t = BottomUpGenerateTarget(is_train=True, config=cfg, sigma=2.0, max_num=30)
    got_t, got_i = t._generate_heatmap_and_tag_ind(kps, (16, 16))
    exp_t, exp_i = loop_oracle(kps, (16, 16), sigma=2.0, max_num=30)
    np.testing.assert_array_equal(got_t, exp_t)
    np.testing.assert_array_equal(got_i, exp_i)


def test_empty_and_all_invisible():
    t = BottomUpGenerateTarget(is_train=True, config=CONFIG, sigma=2.0, max_num=30)
    got_t, got_i = t._generate_heatmap_and_tag_ind(
        np.zeros((0, 17, 3), np.float32), (32, 32)
    )
    assert got_t.shape == (17, 32, 32) and not got_t.any() and not got_i.any()
    kps = np.zeros((3, 17, 3), np.float32)  # vis=0 everywhere
    got_t, got_i = t._generate_heatmap_and_tag_ind(kps, (32, 32))
    assert not got_t.any() and not got_i.any()


def test_overlapping_instances_take_pixel_max():
    # two instances on the same joint close together: per-pixel max, not sum
    kps = np.array(
        [
            [[10.0, 10.0, 2.0]] + [[0, 0, 0]] * 16,
            [[12.0, 10.0, 2.0]] + [[0, 0, 0]] * 16,
        ],
        np.float32,
    )
    t = BottomUpGenerateTarget(is_train=True, config=CONFIG, sigma=2.0, max_num=30)
    got_t, _ = t._generate_heatmap_and_tag_ind(kps, (32, 32))
    exp_t, _ = loop_oracle(kps, (32, 32), sigma=2.0, max_num=30)
    np.testing.assert_array_equal(got_t, exp_t)
    assert got_t[0].max() == pytest.approx(1.0)
    # midpoint between the two peaks must be max of the two, < 1
    assert got_t[0, 10, 11] == pytest.approx(
        max(np.exp(-1 / 8), np.exp(-1 / 8)), rel=1e-6
    )


def test_max_num_guard():
    t = BottomUpGenerateTarget(is_train=True, config=CONFIG, sigma=2.0, max_num=2)
    with pytest.raises(ValueError):
        t._generate_heatmap_and_tag_ind(np.zeros((3, 17, 3), np.float32), (32, 32))
