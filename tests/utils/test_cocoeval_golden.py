"""Frozen-stat regression tests for the in-repo COCOeval at realistic scale.

pycocotools (the reference's oracle, evaluator.py:145-150) is not installable
in this environment, so the metric stack is pinned three ways:
- perfect-detection fixtures must score AP == AR == 1.0 (oracle-grade);
- jittered fixtures must reproduce frozen stats exactly (regression);
- protocol invariants (monotonicity across IoU thresholds, AR >= AP).
"""
import sys

import numpy as np

sys.path.insert(0, "tests")

from cocofixtures import make_realistic_eval_fixture  # noqa: E402

from mindpose_tpu.utils.coco import COCO  # noqa: E402
from mindpose_tpu.utils.cocoeval import COCOeval  # noqa: E402

# Frozen output of the seed-0, 40-image fixture (198 gts incl. crowd and
# unlabeled instances, 351 detections incl. false positives, score ties and
# >20-detection images). Regenerate ONLY with an understood protocol change.
GOLDEN_STATS_SEED0 = [
    0.2026318518, 0.3337381533, 0.2197688851, 0.1857499878, 0.6489989805,
    0.4354651163, 0.5813953488, 0.4651162791, 0.4444444444, 0.8278688525,
]


def _run_eval(gt, dets):
    coco = COCO(gt)
    ev = COCOeval(coco, coco.loadRes(dets), "keypoints")
    ev.evaluate()
    ev.accumulate()
    ev.summarize()
    return np.asarray(ev.stats)


def test_frozen_stats_realistic_fixture():
    gt, dets = make_realistic_eval_fixture(num_images=40, seed=0)
    stats = _run_eval(gt, dets)
    np.testing.assert_allclose(stats, GOLDEN_STATS_SEED0, atol=1e-8)


def test_perfect_detections_score_one():
    """GT keypoints fed back as detections must reach AP = AR = 1.0."""
    gt, _ = make_realistic_eval_fixture(num_images=15, seed=1)
    dets = [
        {
            "image_id": a["image_id"],
            "category_id": 1,
            "keypoints": a["keypoints"],
            "score": 1.0,
        }
        for a in gt["annotations"]
        if not a["iscrowd"] and a["num_keypoints"] > 0
    ]
    stats = _run_eval(gt, dets)
    # AP all/; AP .5; AP .75; AR all; AR .5; AR .75 (area slots may be -1
    # when a range is empty, so only assert the always-populated ones)
    for idx in (0, 1, 2, 5, 6, 7):
        assert stats[idx] == 1.0, f"stat {idx} = {stats[idx]}"


def test_protocol_invariants():
    gt, dets = make_realistic_eval_fixture(num_images=25, seed=2)
    stats = _run_eval(gt, dets)
    ap, ap50, ap75, _, _, ar, ar50, ar75 = stats[:8]
    # the 0.5 threshold is the loosest: it bounds both the 0.75 slice and
    # the 0.5:0.95 mean (but 0.75-vs-mean is not ordered)
    assert ap50 >= ap75 and ap50 >= ap > 0
    assert ar50 >= ar75 and ar50 >= ar > 0
    assert ar >= ap  # recall upper-bounds precision-recall area
    assert ap50 <= 1.0 and ar50 <= 1.0


def test_maxdets_trimming():
    """Only the top-20 detections per image (by score) are evaluated."""
    gt, _ = make_realistic_eval_fixture(num_images=4, seed=4)
    perfect = [
        a for a in gt["annotations"] if not a["iscrowd"] and a["num_keypoints"]
    ]
    # 20 garbage detections at high score + the perfect ones at low score:
    # trimming must evict the perfect detections -> AP 0
    dets = []
    for a in perfect:
        dets.append(
            {"image_id": a["image_id"], "category_id": 1,
             "keypoints": a["keypoints"], "score": 0.1}
        )
    rng = np.random.RandomState(0)
    img_ids = sorted({a["image_id"] for a in perfect})
    for img_id in img_ids:
        for _ in range(20):
            kp = np.zeros(3 * 17)
            kp[0::3] = rng.uniform(600, 640, 17)  # far corner
            kp[1::3] = rng.uniform(440, 480, 17)
            kp[2::3] = 1.0
            dets.append(
                {"image_id": img_id, "category_id": 1,
                 "keypoints": kp.tolist(), "score": 0.9}
            )
    stats = _run_eval(gt, dets)
    assert stats[0] <= 0.02, f"perfect-but-trimmed dets leaked in: {stats[0]}"
