"""Fuzz OUR OKS-NMS and AE tag grouping against the reference's live code.

Oracle: /root/reference/mindpose/utils/{nms,match}.py loaded via importlib
(see oracle.py). These two decide which detections survive and how joints
are grouped into people — silent divergence here shifts AP directly.
"""
import sys

import numpy as np

sys.path.insert(0, "tests")

from parity_oracle.oracle import COCO_JOINT_ORDER, FUZZ_N, load_oracle

from mindpose_tpu.utils import match as ours_match
from mindpose_tpu.utils import nms as ours_nms

ORACLE = load_oracle()


def _rand_kpts_db(rng, n, k=17, clustered=False):
    db = []
    for _ in range(n):
        kpts = np.zeros((k, 3), np.float64)
        if clustered:
            # overlapping detections of the "same" person → high OKS pairs
            base = rng.uniform(50, 60, size=2)
            kpts[:, :2] = base + rng.normal(0, 3, size=(k, 2))
        else:
            kpts[:, :2] = rng.uniform(0, 400, size=(k, 2))
        kpts[:, 2] = rng.uniform(0, 1, size=k)
        db.append(
            dict(
                keypoints=kpts,
                score=float(rng.uniform(0, 1)),
                area=float(rng.uniform(100, 5000)),
            )
        )
    return db


def test_oks_iou_fuzz():
    rng = np.random.default_rng(20)
    for i in range(max(10, FUZZ_N // 10)):
        db = _rand_kpts_db(rng, int(rng.integers(1, 12)),
                           clustered=bool(i % 2))
        g = np.asarray(db[0]["keypoints"]).flatten()
        d = np.array([np.asarray(x["keypoints"]).flatten() for x in db])
        a_d = np.array([x["area"] for x in db])
        vis_thr = [None, 0.2, 0.9][i % 3]
        got = ours_nms.oks_iou(g, d, db[0]["area"], a_d, vis_thr=vis_thr)
        want = ORACLE.nms.oks_iou(g, d, db[0]["area"], a_d, vis_thr=vis_thr)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_oks_nms_fuzz():
    rng = np.random.default_rng(21)
    for i in range(max(10, FUZZ_N // 10)):
        n = int(rng.integers(0, 25))
        db = _rand_kpts_db(rng, n, clustered=bool(i % 2))
        thr = float(rng.choice([0.5, 0.7, 0.9, 0.05]))
        vis_thr = [None, 0.2][i % 2]
        got = ours_nms.oks_nms(db, thr, vis_thr=vis_thr)
        want = ORACLE.nms.oks_nms(db, thr, vis_thr=vis_thr)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_soft_oks_nms_fuzz():
    rng = np.random.default_rng(22)
    for i in range(max(10, FUZZ_N // 10)):
        n = int(rng.integers(0, 25))
        db = _rand_kpts_db(rng, n, clustered=bool(i % 2))
        thr = float(rng.choice([0.5, 0.7, 0.9]))
        max_dets = int(rng.choice([20, 5, 1]))
        got = ours_nms.soft_oks_nms(db, thr, max_dets=max_dets)
        want = ORACLE.nms.soft_oks_nms(db, thr, max_dets=max_dets)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def _rand_match_inputs(rng, k=17, m=30, tag_dim=1, near_thr=False):
    val_k = rng.uniform(0, 1, size=(k, m)).astype(np.float32)
    if near_thr:
        # push many tags to ~tag_thr distance of each other so the
        # spawn-vs-join decision teeters on the threshold
        tag_k = rng.choice([0.0, 0.5, 1.0, 1.5], size=(k, m, tag_dim)).astype(
            np.float32
        ) + rng.normal(0, 0.02, size=(k, m, tag_dim)).astype(np.float32)
    else:
        tag_k = rng.uniform(-3, 3, size=(k, m, tag_dim)).astype(np.float32)
    ind_k = rng.integers(0, 64, size=(k, m, 2)).astype(np.float32)
    return val_k, tag_k, ind_k


def test_match_by_tag_fuzz():
    rng = np.random.default_rng(23)
    for i in range(max(10, FUZZ_N // 10)):
        val_k, tag_k, ind_k = _rand_match_inputs(
            rng, tag_dim=[1, 2][i % 2], near_thr=bool((i // 2) % 2))
        kwargs = dict(
            joint_order=COCO_JOINT_ORDER,
            vis_thr=float(rng.choice([0.1, 0.5, 0.9])),
            tag_thr=1.0,
            ignore_too_much=bool(rng.integers(2)),
            use_rounded_norm=bool(rng.integers(2)),
        )
        got = ours_match.match_by_tag(val_k, tag_k, ind_k, **kwargs)
        want = ORACLE.match.match_by_tag(val_k, tag_k, ind_k, **kwargs)
        got = np.asarray(got, np.float32).reshape(-1, 17, 3 + tag_k.shape[2])
        want = np.asarray(want, np.float32).reshape(-1, 17, 3 + tag_k.shape[2])
        assert got.shape == want.shape, (got.shape, want.shape)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_match_by_tag_sparse_visibility():
    """Few candidates clear vis_thr → spawn/respawn paths dominate."""
    rng = np.random.default_rng(24)
    for _ in range(max(10, FUZZ_N // 20)):
        val_k, tag_k, ind_k = _rand_match_inputs(rng)
        val_k[:] = 0.05  # below default vis_thr
        hot = rng.integers(0, 17, size=8), rng.integers(0, 30, size=8)
        val_k[hot] = rng.uniform(0.5, 1.0, size=8).astype(np.float32)
        got = ours_match.match_by_tag(
            val_k, tag_k, ind_k, joint_order=COCO_JOINT_ORDER)
        want = ORACLE.match.match_by_tag(
            val_k, tag_k, ind_k, joint_order=COCO_JOINT_ORDER)
        got = np.asarray(got, np.float32).reshape(-1, 17, 4)
        want = np.asarray(want, np.float32).reshape(-1, 17, 4)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
