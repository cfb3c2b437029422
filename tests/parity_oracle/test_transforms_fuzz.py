"""Fuzz the remaining transforms against the reference's live code.

Deterministic transforms (affine warps, rescale/resize/pad) are compared
bit-exactly on random images. Stochastic transforms are compared by seeding
the global numpy RNG identically before each side — this proves both the
formulas AND the random draw order/distributions match, so augmentation
statistics are identical to the reference's.
"""
import sys

import numpy as np

sys.path.insert(0, "tests")

from parity_oracle.oracle import (
    FUZZ_N,
    bottomup_setting,
    load_oracle,
    topdown_setting,
)

from mindpose_tpu.data.transform import bottomup_transform as ours_bu
from mindpose_tpu.data.transform import topdown_transform as ours_td

ORACLE = load_oracle()


def _rand_image(rng, h, w, c=3):
    return rng.integers(0, 256, size=(h, w, c)).astype(np.uint8)


def _copy_state(state):
    out = {}
    for k, v in state.items():
        if isinstance(v, list):
            out[k] = [np.copy(a) for a in v]
        elif isinstance(v, np.ndarray):
            out[k] = np.copy(v)
        else:
            out[k] = v
    return out


def _assert_state_equal(got, want, msg=""):
    assert set(got) == set(want), (sorted(got), sorted(want))
    for k in want:
        g, w = got[k], want[k]
        if isinstance(w, list):
            g = np.stack(g) if isinstance(g, list) else g
            w = np.stack(w)
        g, w = np.asarray(g), np.asarray(w)
        if k in ("image", "mask") and w.dtype == np.uint8:
            # ulp differences between our affine solve and cv2's flip
            # warpAffine's fixed-point rounding on isolated pixels
            diff = np.abs(g.astype(np.int16) - w.astype(np.int16))
            assert diff.max() <= 1, f"{msg} {k} diff {diff.max()}"
            assert (diff > 0).mean() < 1e-3, f"{msg} {k} mismatch fraction"
        elif np.issubdtype(w.dtype, np.floating):
            # float32 matmul-path reassociation noise (see geometry fuzz)
            np.testing.assert_allclose(
                g, w, rtol=1e-5, atol=2e-4, err_msg=f"{msg} key={k}")
        else:
            np.testing.assert_array_equal(g, w, err_msg=f"{msg} key={k}")


def test_topdown_affine_image_parity():
    """Full pixel warp: standard + UDP, with keypoints."""
    rng = np.random.default_rng(30)
    cfg = topdown_setting()
    for i in range(max(5, FUZZ_N // 50)):
        use_udp = bool(i % 2)
        ours = ours_td.TopDownAffine(config=cfg, use_udp=use_udp)
        ref = ORACLE.topdown.TopDownAffine(config=cfg, use_udp=use_udp)
        h, w = int(rng.integers(60, 400)), int(rng.integers(60, 400))
        kpts = np.zeros((17, 3), np.float32)
        kpts[:, 0] = rng.uniform(0, w, 17)
        kpts[:, 1] = rng.uniform(0, h, 17)
        kpts[:, 2] = rng.choice([0.0, 1.0, 2.0], 17)
        state = dict(
            image=_rand_image(rng, h, w),
            center=rng.uniform(20, 300, 2).astype(np.float32),
            scale=rng.uniform(0.3, 3.0, 2).astype(np.float32),
            rotation=float(rng.uniform(-60, 60)),
            keypoints=kpts,
        )
        got = ours.transform(_copy_state(state))
        want = ref.transform(_copy_state(state))
        # our exact 3-point solve differs from cv2.getAffineTransform in the
        # last ulp, which can flip warpAffine's fixed-point rounding on a
        # handful of pixels: allow off-by-one on <0.1% of pixels
        diff = np.abs(got["image"].astype(np.int16) - want["image"].astype(np.int16))
        assert diff.max() <= 1, f"pixel diff {diff.max()} (udp={use_udp})"
        frac = float((diff > 0).mean())
        assert frac < 1e-3, f"{frac:.2%} pixels off by one (udp={use_udp})"
        np.testing.assert_allclose(
            got["keypoints"], want["keypoints"], rtol=1e-5, atol=1e-3)


def _seeded_pair(seed, ours_t, ref_t, state):
    np.random.seed(seed)
    got = ours_t.transform(_copy_state(state))
    np.random.seed(seed)
    want = ref_t.transform(_copy_state(state))
    return got, want


def test_topdown_stochastic_transforms_seeded():
    rng = np.random.default_rng(31)
    cfg = topdown_setting()
    box_ours = ours_td.TopDownBoxToCenterScale(is_train=True, config=cfg)
    box_ref = ORACLE.topdown.TopDownBoxToCenterScale(is_train=True, config=cfg)
    flip_ours = ours_td.TopDownHorizontalRandomFlip(config=cfg)
    flip_ref = ORACLE.topdown.TopDownHorizontalRandomFlip(config=cfg)
    half_ours = ours_td.TopDownHalfBodyTransform(config=cfg)
    half_ref = ORACLE.topdown.TopDownHalfBodyTransform(config=cfg)
    sr_ours = ours_td.TopDownRandomScaleRotation(config=cfg)
    sr_ref = ORACLE.topdown.TopDownRandomScaleRotation(config=cfg)

    for i in range(max(10, FUZZ_N // 10)):
        seed = int(rng.integers(0, 2**31))
        x, y = rng.uniform(0, 300, 2)
        w, h = rng.uniform(10, 200, 2)
        kpts = np.zeros((17, 3), np.float32)
        kpts[:, 0] = rng.uniform(0, 300, 17)
        kpts[:, 1] = rng.uniform(0, 300, 17)
        kpts[:, 2] = rng.choice([0.0, 1.0], 17, p=[0.3, 0.7])

        got, want = _seeded_pair(
            seed, box_ours, box_ref,
            dict(boxes=np.array([x, y, w, h], np.float32)))
        _assert_state_equal(got, want, "box_to_center_scale")

        state = dict(
            image=_rand_image(rng, 120, 160),
            keypoints=kpts,
            center=np.array([80.0, 60.0], np.float32),
        )
        got, want = _seeded_pair(seed + 1, flip_ours, flip_ref, state)
        _assert_state_equal(got, want, "horizontal_flip")

        got, want = _seeded_pair(
            seed + 2, half_ours, half_ref, dict(keypoints=kpts))
        _assert_state_equal(got, want, "half_body")

        state = dict(
            scale=rng.uniform(0.3, 3.0, 2).astype(np.float32),
            rotation=np.float32(0.0),
        )
        got, want = _seeded_pair(seed + 3, sr_ours, sr_ref, state)
        _assert_state_equal(got, want, "scale_rotation")


def test_bottomup_deterministic_transforms():
    rng = np.random.default_rng(32)
    cfg = bottomup_setting(max_image_size=(192, 160))
    rescale_ours = ours_bu.BottomUpRescale(is_train=False, config=cfg)
    rescale_ref = ORACLE.bottomup.BottomUpRescale(is_train=False, config=cfg)
    resize_ours = ours_bu.BottomUpResize(is_train=False, config=cfg, size=128)
    resize_ref = ORACLE.bottomup.BottomUpResize(is_train=False, config=cfg, size=128)
    pad_ours = ours_bu.BottomUpPad(is_train=False, config=cfg)
    pad_ref = ORACLE.bottomup.BottomUpPad(is_train=False, config=cfg)

    for _ in range(max(5, FUZZ_N // 50)):
        h, w = int(rng.integers(40, 500)), int(rng.integers(40, 500))
        img = _rand_image(rng, h, w)

        got = rescale_ours.transform(dict(image=img.copy()))
        want = rescale_ref.transform(dict(image=img.copy()))
        _assert_state_equal(got, want, "rescale")

        got = resize_ours.transform(dict(image=img.copy()))
        want = resize_ref.transform(dict(image=img.copy()))
        _assert_state_equal(got, want, "resize")

        small = _rand_image(rng, int(rng.integers(30, 160)),
                            int(rng.integers(30, 190)))
        got = pad_ours.transform(dict(image=small.copy()))
        want = pad_ref.transform(dict(image=small.copy()))
        _assert_state_equal(got, want, "pad")


def test_bottomup_stochastic_transforms_seeded():
    rng = np.random.default_rng(33)
    sizes = ((32, 32), (64, 64))
    cfg = bottomup_setting(heatmap_sizes=sizes)
    flip_ours = ours_bu.BottomUpHorizontalRandomFlip(config=cfg)
    flip_ref = ORACLE.bottomup.BottomUpHorizontalRandomFlip(config=cfg)
    aff_ours = ours_bu.BottomUpRandomAffine(config=cfg)
    aff_ref = ORACLE.bottomup.BottomUpRandomAffine(config=cfg)

    for i in range(max(10, FUZZ_N // 20)):
        seed = int(rng.integers(0, 2**31))
        m = int(rng.integers(1, 6))
        kpts = np.zeros((len(sizes), m, 17, 3), np.float32)
        for lvl, (w, h) in enumerate(sizes):
            kpts[lvl, ..., 0] = rng.uniform(0, w, (m, 17))
            kpts[lvl, ..., 1] = rng.uniform(0, h, (m, 17))
            kpts[lvl, ..., 2] = rng.choice([0.0, 1.0], (m, 17))
        mask = (rng.uniform(size=(len(sizes), 64, 64)) > 0.1).astype(np.uint8)
        state = dict(
            image=_rand_image(rng, 96, 128),
            mask=mask,
            keypoints=kpts,
        )
        got, want = _seeded_pair(seed, flip_ours, flip_ref, state)
        _assert_state_equal(got, want, "bu_flip")

        got, want = _seeded_pair(seed + 1, aff_ours, aff_ref, state)
        _assert_state_equal(got, want, "bu_random_affine")
