"""Fuzz OUR heatmap target encoders against the reference's live code.

Oracle: /root/reference/mindpose/data/transform/{topdown,bottomup}_transform.py
loaded via importlib (see oracle.py). The encode is SURVEY.md §7's #1 parity
risk (whole AP points die on a rounding slip), so every comparison here is
bit-exact: our HWK/S-stacked layouts are transposed back to the reference's
KHW for the assert.
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

from mindpose_tpu.data.transform.bottomup_transform import BottomUpGenerateTarget
from mindpose_tpu.data.transform.topdown_transform import TopDownGenerateTarget

ORACLE = load_oracle()


def _rand_topdown_keypoints(rng, num_joints, image_size):
    """Keypoints spanning in-bounds, out-of-bounds and boundary regions."""
    w, h = image_size
    kpts = np.zeros((num_joints, 3), np.float32)
    kpts[:, 0] = rng.uniform(-0.5 * w, 1.5 * w, num_joints)
    kpts[:, 1] = rng.uniform(-0.5 * h, 1.5 * h, num_joints)
    kpts[:, 2] = rng.choice([0.0, 1.0, 2.0], num_joints, p=[0.2, 0.4, 0.4])
    # exact pixel centers and .5 boundaries stress the rounding rules
    n_exact = num_joints // 4
    kpts[:n_exact, 0] = rng.integers(0, w, n_exact).astype(np.float32)
    kpts[:n_exact, 1] = rng.integers(0, h, n_exact) + rng.choice(
        [0.0, 0.5], n_exact
    ).astype(np.float32)
    return kpts


def test_topdown_generate_target_fuzz():
    rng = np.random.default_rng(10)
    geometries = [
        ((192, 256), (48, 64)),
        ((256, 256), (64, 64)),
        ((288, 384), (72, 96)),
        ((64, 64), (16, 16)),
    ]
    for case in range(max(10, FUZZ_N // 4)):
        image_size, heatmap_size = geometries[case % len(geometries)]
        sigma = float(rng.choice([2.0, 3.0, 1.5, 2.5]))
        use_udp = bool(case % 2)
        use_jw = bool(rng.integers(2))
        cfg = topdown_setting(
            image_size=image_size, heatmap_size=heatmap_size, joint_weights=True
        )
        ours = TopDownGenerateTarget(
            is_train=True, config=cfg, sigma=sigma,
            use_different_joint_weights=use_jw, use_udp=use_udp)
        ref = ORACLE.topdown.TopDownGenerateTarget(
            is_train=True, config=cfg, sigma=sigma,
            use_different_joint_weights=use_jw, use_udp=use_udp)

        kpts = _rand_topdown_keypoints(rng, 17, image_size)
        got = ours.transform(dict(keypoints=kpts.copy()))
        want = ref.transform(dict(keypoints=kpts.copy()))

        np.testing.assert_array_equal(
            got["target"].transpose(2, 0, 1), want["target"],
            err_msg=f"target mismatch (udp={use_udp}, sigma={sigma})")
        np.testing.assert_array_equal(
            got["target_weight"], np.asarray(want["target_weight"]).reshape(-1))


def test_topdown_generate_target_fractional_sigma():
    """int(2*sigma*3+1) truncation makes the window asymmetric for
    fractional sigmas — the exact edge the round-2 review caught."""
    rng = np.random.default_rng(11)
    cfg = topdown_setting()
    for _ in range(max(5, FUZZ_N // 20)):
        sigma = float(rng.uniform(0.7, 4.0))
        for use_udp in (False, True):
            ours = TopDownGenerateTarget(config=cfg, sigma=sigma, use_udp=use_udp)
            ref = ORACLE.topdown.TopDownGenerateTarget(
                config=cfg, sigma=sigma, use_udp=use_udp)
            kpts = _rand_topdown_keypoints(rng, 17, (192, 256))
            got = ours.transform(dict(keypoints=kpts.copy()))
            want = ref.transform(dict(keypoints=kpts.copy()))
            np.testing.assert_array_equal(
                got["target"].transpose(2, 0, 1), want["target"],
                err_msg=f"sigma={sigma} udp={use_udp}")


def _rand_bottomup_keypoints(rng, m, k, heatmap_size):
    w, h = heatmap_size
    kpts = np.zeros((m, k, 3), np.float32)
    kpts[..., 0] = rng.uniform(-10, w + 10, (m, k))
    kpts[..., 1] = rng.uniform(-10, h + 10, (m, k))
    kpts[..., 2] = rng.choice([0.0, 1.0, 2.0], (m, k), p=[0.3, 0.35, 0.35])
    return kpts


def test_bottomup_generate_target_fuzz():
    rng = np.random.default_rng(12)
    for case in range(max(10, FUZZ_N // 10)):
        sizes = [((32, 32), (64, 64)), ((48, 64), (96, 128)), ((17, 23),)][
            case % 3
        ]
        tag_per_joint = bool((case // 3) % 2)
        sigma = float(rng.choice([2.0, 2.5, 3.0]))
        cfg = bottomup_setting(
            heatmap_sizes=sizes, tag_per_joint=tag_per_joint)
        ours = BottomUpGenerateTarget(config=cfg, sigma=sigma, max_num=30)
        ref = ORACLE.bottomup.BottomUpGenerateTarget(
            config=cfg, sigma=sigma, max_num=30)

        m = int(rng.integers(0, 8))
        state = dict(
            keypoints=[
                _rand_bottomup_keypoints(rng, m, 17, s) for s in sizes
            ]
        )
        got = ours.transform({k: [a.copy() for a in v] for k, v in state.items()})
        want = ref.transform(state)

        np.testing.assert_array_equal(
            got["target"].transpose(0, 3, 1, 2), want["target"],
            err_msg=f"bottomup target mismatch (sizes={sizes}, m={m})")
        np.testing.assert_array_equal(got["tag_ind"], want["tag_ind"])


def test_bottomup_generate_target_crowded():
    """Many overlapping instances exercise the per-pixel max scatter order."""
    rng = np.random.default_rng(13)
    cfg = bottomup_setting(heatmap_sizes=((32, 32),))
    ours = BottomUpGenerateTarget(config=cfg, sigma=2.0, max_num=30)
    ref = ORACLE.bottomup.BottomUpGenerateTarget(config=cfg, sigma=2.0, max_num=30)
    for _ in range(max(5, FUZZ_N // 50)):
        kpts = np.zeros((30, 17, 3), np.float32)
        # cluster all joints in a small region so patches overlap heavily
        kpts[..., 0] = rng.uniform(10, 20, (30, 17))
        kpts[..., 1] = rng.uniform(10, 20, (30, 17))
        kpts[..., 2] = 1.0
        got = ours.transform(dict(keypoints=[kpts.copy()]))
        want = ref.transform(dict(keypoints=[kpts.copy()]))
        np.testing.assert_array_equal(
            got["target"].transpose(0, 3, 1, 2), want["target"])
        np.testing.assert_array_equal(got["tag_ind"], want["tag_ind"])
