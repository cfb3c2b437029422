"""Fuzz OUR geometry utils against the reference's live code.

Oracle: /root/reference/mindpose/data/transform/utils.py loaded via
importlib (see oracle.py). Each function is hit with FUZZ_N random
geometries spanning the real COCO operating range plus edge regions
(tiny/huge scales, negative centers, extreme rotations, inverse matrices,
non-default pixel_std).
"""
import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")

from parity_oracle.oracle import FUZZ_N, load_oracle

from mindpose_tpu.data.transform import utils as ours

ORACLE = load_oracle().utils


def _rand_geometry(rng):
    center = rng.uniform(-100, 800, size=2).astype(np.float32)
    scale = rng.uniform(0.05, 6.0, size=2).astype(np.float32)
    rot = float(rng.uniform(-180, 180))
    output_size = [(48, 64), (64, 48), (192, 256), (256, 192), (17, 23),
                   (64, 64)][rng.integers(6)]
    shift = tuple(rng.uniform(-0.3, 0.3, size=2))
    inv = bool(rng.integers(2))
    pixel_std = float([200.0, 1.0, 173.3][rng.integers(3)])
    return center, scale, rot, output_size, shift, inv, pixel_std


def test_get_affine_transform_fuzz():
    rng = np.random.default_rng(0)
    pts = np.concatenate(
        [np.random.RandomState(1).uniform(-50, 300, size=(5, 2)),
         np.ones((5, 1))], axis=1
    )
    for _ in range(FUZZ_N):
        center, scale, rot, output_size, shift, inv, pixel_std = _rand_geometry(rng)
        ref = ORACLE.get_affine_transform(
            center, scale, rot, output_size, shift=shift, inv=inv,
            pixel_std=pixel_std)
        got = ours.get_affine_transform(
            center, scale, rot, output_size, shift=shift, inv=inv,
            pixel_std=pixel_std)
        # the lstsq solve vs cv2.getAffineTransform agree to fp noise;
        # compare both matrix entries and mapped points
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(pts @ got.T, pts @ ref.T, rtol=1e-4,
                                   atol=5e-3)


def test_get_warp_matrix_fuzz():
    rng = np.random.default_rng(1)
    for _ in range(FUZZ_N):
        theta = float(rng.uniform(-180, 180))
        size_input = rng.uniform(10, 1200, size=2)
        size_dst = rng.uniform(8, 512, size=2)
        size_target = rng.uniform(10, 1200, size=2)
        ref = ORACLE.get_warp_matrix(theta, size_input, size_dst, size_target)
        got = ours.get_warp_matrix(theta, size_input, size_dst, size_target)
        np.testing.assert_array_equal(got, ref)


def test_rotate_point_and_affine_transform_fuzz():
    rng = np.random.default_rng(2)
    for _ in range(FUZZ_N):
        pt = rng.uniform(-500, 500, size=2)
        ang = float(rng.uniform(-7, 7))
        np.testing.assert_array_equal(
            np.asarray(ours.rotate_point(pt, ang)),
            np.asarray(ORACLE.rotate_point(pt, ang)),
        )
        mat = rng.uniform(-2, 2, size=(2, 3))
        np.testing.assert_array_equal(
            ours.affine_transform(pt, mat), ORACLE.affine_transform(pt, mat)
        )


def test_warp_affine_joints_fuzz():
    rng = np.random.default_rng(3)
    for _ in range(max(1, FUZZ_N // 10)):
        shape = [(17, 2), (3, 17, 2), (1, 2), (30, 17, 2)][rng.integers(4)]
        joints = rng.uniform(-100, 600, size=shape).astype(np.float32)
        mat = rng.uniform(-2, 2, size=(2, 3)).astype(np.float32)
        # `@` on a 3-D stack and np.dot pick different float32 GEMM paths;
        # the formula is identical, so only fp reassociation noise remains
        np.testing.assert_allclose(
            ours.warp_affine_joints(joints, mat),
            ORACLE.warp_affine_joints(joints, mat),
            rtol=1e-5, atol=2e-4,
        )


def test_fliplr_joints_fuzz():
    rng = np.random.default_rng(4)
    for _ in range(max(1, FUZZ_N // 10)):
        k = int(rng.integers(2, 40))
        # random disjoint pairs over [0, k)
        perm = rng.permutation(k)
        n_pairs = int(rng.integers(0, k // 2 + 1))
        pairs = [(int(perm[2 * i]), int(perm[2 * i + 1]))
                 for i in range(n_pairs)]
        kpts = rng.uniform(-10, 500, size=(k, 3)).astype(np.float32)
        width = int(rng.integers(10, 1000))
        np.testing.assert_array_equal(
            ours.fliplr_joints(kpts, width, flip_pairs=pairs),
            ORACLE.fliplr_joints(kpts, width, flip_pairs=pairs),
        )
        # flip_index form (any permutation is legal)
        flip_index = rng.permutation(k)
        np.testing.assert_array_equal(
            ours.fliplr_joints(kpts, width, flip_index=flip_index),
            ORACLE.fliplr_joints(kpts, width, flip_index=flip_index),
        )
        # batched [..., K, C] form
        batched = rng.uniform(-10, 500, size=(3, k, 2)).astype(np.float32)
        np.testing.assert_array_equal(
            ours.fliplr_joints(batched, width, flip_index=flip_index),
            ORACLE.fliplr_joints(batched, width, flip_index=flip_index),
        )


def test_pad_to_same_fuzz():
    rng = np.random.default_rng(5)
    for _ in range(max(1, FUZZ_N // 20)):
        n = int(rng.integers(1, 5))
        ndim = int(rng.integers(1, 4))
        arrays = [
            rng.standard_normal(tuple(rng.integers(1, 8, size=ndim))).astype(
                np.float32
            )
            for _ in range(n)
        ]
        got = ours.pad_to_same([a.copy() for a in arrays])
        ref = ORACLE.pad_to_same([a.copy() for a in arrays])
        for g, r in zip(got, ref):
            np.testing.assert_array_equal(g, r)


def test_transform_keypoints_fuzz():
    rng = np.random.default_rng(6)
    for _ in range(max(1, FUZZ_N // 10)):
        n = int(rng.integers(1, 6))
        coords = []
        for _ in range(n):
            m = int(rng.integers(0, 5))
            if m == 0:
                coords.append(np.zeros((0, 17, 4), np.float32))
            else:
                coords.append(
                    rng.uniform(0, 64, size=(m, 17, 4)).astype(np.float32)
                )
        center = rng.uniform(0, 600, size=(n, 2)).astype(np.float32)
        scale = rng.uniform(0.1, 4, size=(n, 2)).astype(np.float32)
        heatmap_shape = np.array([[48, 64]] * n, np.float32)
        pixel_std = float([200.0, 1.0][rng.integers(2)])
        got = ours.transform_keypoints(
            [c.copy() for c in coords], center, scale, heatmap_shape,
            pixel_std=pixel_std)
        ref = ORACLE.transform_keypoints(
            [c.copy() for c in coords], center, scale, heatmap_shape,
            pixel_std=pixel_std)
        for g, r in zip(got, ref):
            np.testing.assert_allclose(g, r, rtol=1e-6, atol=1e-4)


def test_flip_index_matches_reference_recipe():
    """Our flip_index_from_pairs must reproduce the reference's in-cfg
    recipe (flip_pairs[:, ::-1].flatten() with 0 prepended) for COCO pairs —
    that is the permutation baked into trained checkpoints."""
    from parity_oracle.oracle import COCO_FLIP_PAIRS

    pairs = np.array(COCO_FLIP_PAIRS)
    ref_index = np.insert(pairs[:, ::-1].flatten(), 0, 0)
    np.testing.assert_array_equal(
        ours.flip_index_from_pairs(COCO_FLIP_PAIRS), ref_index
    )
