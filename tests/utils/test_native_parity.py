"""Native (C++) vs pure-numpy parity for the metric stack.

The C++ kernels in csrc/coco_native.cpp silently take over computeOks /
oks_iou / RLE decode when a toolchain is available; these tests pin both code
paths to each other on randomized, realistic-scale inputs so whichever path
CI takes, the other is equally covered.
"""
import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")

from cocofixtures import make_realistic_eval_fixture  # noqa: E402

from mindpose_tpu.utils import native  # noqa: E402
from mindpose_tpu.utils.cocoeval import COCO_SIGMAS, COCOeval  # noqa: E402
from mindpose_tpu.utils.coco import COCO, decode_rle  # noqa: E402
from mindpose_tpu.utils.nms import oks_iou  # noqa: E402

requires_native = pytest.mark.skipif(
    not native.native_available(), reason="native library unavailable"
)


@pytest.fixture
def native_toggle():
    """Restore the native switch after each test."""
    yield native.set_native_enabled
    native.set_native_enabled(True)


def _random_instances(rng, n, k=17):
    area = rng.uniform(100.0, 90000.0)
    g = np.zeros(3 * k)
    g[0::3] = rng.uniform(0, 640, k)
    g[1::3] = rng.uniform(0, 480, k)
    g[2::3] = rng.choice([0, 1, 2], k)
    d = np.zeros((n, 3 * k))
    d[:, 0::3] = g[0::3] + rng.randn(n, k) * rng.uniform(1, 40)
    d[:, 1::3] = g[1::3] + rng.randn(n, k) * rng.uniform(1, 40)
    d[:, 2::3] = rng.rand(n, k)
    a_d = rng.uniform(100.0, 90000.0, n)
    return g, d, area, a_d


@requires_native
def test_oks_iou_native_vs_numpy_randomized(native_toggle):
    rng = np.random.RandomState(7)
    for trial in range(120):
        g, d, a_g, a_d = _random_instances(rng, n=rng.randint(1, 8))
        vis_thr = None if trial % 2 == 0 else float(rng.uniform(0.0, 0.9))
        native_toggle(True)
        fast = oks_iou(g, d, a_g, a_d, vis_thr=vis_thr)
        native_toggle(False)
        ref = oks_iou(g, d, a_g, a_d, vis_thr=vis_thr)
        np.testing.assert_allclose(fast, ref, rtol=1e-6, atol=1e-7)


@requires_native
def test_compute_oks_native_vs_numpy_zero_visible_gt(native_toggle):
    """k1 == 0 branch: distance to the doubled gt box."""
    rng = np.random.RandomState(11)
    gt, ann = make_realistic_eval_fixture(num_images=6, seed=3)
    # zero out visibility on some gts to force the box-distance branch
    for a in gt["annotations"][::2]:
        kp = np.asarray(a["keypoints"], dtype=float)
        kp[2::3] = 0
        a["keypoints"] = kp.tolist()

    stats = {}
    for use_native in (True, False):
        native_toggle(use_native)
        ev = COCOeval(COCO(gt), COCO(gt).loadRes(ann), "keypoints")
        ev.evaluate()
        ev.accumulate()
        ev.summarize()
        stats[use_native] = np.asarray(ev.stats)
    np.testing.assert_allclose(stats[True], stats[False], rtol=1e-9, atol=1e-9)


@requires_native
def test_full_cocoeval_native_vs_numpy(native_toggle):
    gt, dets = make_realistic_eval_fixture(num_images=40, seed=0)
    stats = {}
    for use_native in (True, False):
        native_toggle(use_native)
        ev = COCOeval(COCO(gt), COCO(gt).loadRes(dets), "keypoints")
        ev.params.kpt_oks_sigmas = COCO_SIGMAS
        ev.evaluate()
        ev.accumulate()
        ev.summarize()
        stats[use_native] = np.asarray(ev.stats)
    np.testing.assert_allclose(stats[True], stats[False], rtol=1e-9, atol=1e-9)


@requires_native
def test_rle_decode_native_vs_numpy(native_toggle):
    rng = np.random.RandomState(5)
    for _ in range(20):
        h, w = rng.randint(8, 80), rng.randint(8, 80)
        mask = (rng.rand(h, w) > 0.6).astype(np.uint8)
        flat = mask.T.flatten()
        counts, run_val, run = [], 0, 0
        for v in flat:
            if v == run_val:
                run += 1
            else:
                counts.append(run)
                run_val, run = int(v), 1
        counts.append(run)
        rle = {"size": [h, w], "counts": counts}
        native_toggle(True)
        fast = decode_rle(rle)
        native_toggle(False)
        ref = decode_rle(rle)
        np.testing.assert_array_equal(fast, ref)
        np.testing.assert_array_equal(ref, mask)
