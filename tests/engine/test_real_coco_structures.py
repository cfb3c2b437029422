"""Runbook eval leg against real-val2017-structured annotation files.

VERDICT r4 missing #1/#4: every accuracy number so far came from clean
synthetic annotation dicts; real COCO files carry structures the clean
fixtures never exercised — compressed-RLE crowd segmentations,
zero-keypoint instances, person-free images, border-overflowing bboxes,
detector JSONs with junk categories / duplicate boxes / dets on empty
frames. make_val2017_structures replicates all of them on disk; these
tests run the prepare->dataset->infer->evaluate leg of docs/runbook_coco.md
end-to-end over that file pair (reference handling being matched:
/root/reference/mindpose/data/dataset/coco_topdown.py:108-174,
/root/reference/mindpose/engine/evaluator/topdown_evaluator.py:139-148).
"""
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, "tests")

import mindpose_tpu as mp
from cocofixtures import make_val2017_structures
from mindpose_tpu.data import create_dataset, create_pipeline
from mindpose_tpu.engine import create_evaluator, create_inferencer
from mindpose_tpu.utils.coco import COCO, decode_rle
from mindpose_tpu.utils.cocoeval import COCOeval

# registers tiny_test_backbone
from tests.engine.test_train_eval_e2e import (  # noqa: F401
    EVAL_SETTING,
    TINY_SETTING,
)


@pytest.fixture(scope="module")
def val_structs(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("val2017_like"))
    return make_val2017_structures(root)


def test_gt_records_filter_crowd_and_zero_keypoint(val_structs):
    img_root, ann, _, expected = val_structs
    ds = create_dataset(img_root, ann, dataset_format="coco_topdown",
                        is_train=False, config=TINY_SETTING,
                        use_gt_bbox_for_val=True)["dataset"]
    # crowds (iscrowd=1) and zero-keypoint instances must both be dropped
    assert len(ds) == expected["n_normal"]
    for i in range(len(ds)):
        rec = ds[i]
        # sanitized: every surviving box lies inside its image
        x, y, w, h = rec["boxes"]
        assert x >= 0 and y >= 0 and w > 0 and h > 0


def test_det_records_filter_category_and_threshold(val_structs):
    img_root, ann, det, expected = val_structs
    ds = create_dataset(img_root, ann, dataset_format="coco_topdown",
                        is_train=False, config=TINY_SETTING,
                        use_gt_bbox_for_val=False, detection_file=det)["dataset"]
    # category_id != 1 junk is dropped; det_bbox_thr=0.0 keeps all persons
    assert len(ds) == expected["n_det_person"]
    thr_ds = create_dataset(
        img_root, ann, dataset_format="coco_topdown", is_train=False,
        config={**TINY_SETTING, "det_bbox_thr": 0.5},
        use_gt_bbox_for_val=False, detection_file=det)["dataset"]
    assert 0 < len(thr_ds) < len(ds)
    # bbox_ids are globally unique across the detection file
    ids = [thr_ds[i]["bbox_ids"] for i in range(len(thr_ds))]
    assert len(set(ids)) == len(ids)


def test_runbook_eval_leg_end_to_end(val_structs, tmp_path):
    """docs/runbook_coco.md §4 on real structures: det boxes -> inferencer ->
    rescoring/OKS-NMS -> COCOeval with crowd + zero-kpt ignores present."""
    img_root, ann, det, expected = val_structs
    ds = create_dataset(img_root, ann, dataset_format="coco_topdown",
                        is_train=False, config=TINY_SETTING,
                        use_gt_bbox_for_val=False, detection_file=det)
    loader = create_pipeline(
        ds, ["topdown_box_to_center_scale", "topdown_affine"],
        method="topdown", batch_size=8, is_train=False, config=TINY_SETTING)

    net = mp.create_network("tiny_test_backbone", "hrnet_head")
    variables = net.init(jax.random.PRNGKey(0),
                         np.zeros((1, 64, 64, 3), np.float32), train=False)
    decoder = mp.create_decoder("topdown_heatmap", shift_coordinate=True)
    eval_net = mp.create_eval_network(net, decoder, output_raw=True)
    inferencer = create_inferencer(
        eval_net, name="topdown_heatmap",
        config={**EVAL_SETTING, "hflip_tta": True, "shift_heatmap": True},
        dataset_config=TINY_SETTING)
    result_path = str(tmp_path / "result.json")
    evaluator = create_evaluator(ann, name="topdown", metric=["AP"],
                                 config=EVAL_SETTING,
                                 dataset_config=TINY_SETTING,
                                 result_path=result_path,
                                 remove_result_file=False)
    records = inferencer(loader, variables=variables)
    assert len(records) == expected["n_det_person"]
    result = evaluator(records)
    # untrained net: AP is near 0, but the protocol must run green and
    # produce the full stat set + a result file
    assert set(result) >= {"AP", "AP .5", "AR"}
    assert all(np.isfinite(v) for v in result.values())
    import os
    assert os.path.exists(result_path)


def test_gt_as_predictions_is_perfect_under_ignores(val_structs):
    """Feeding the visible GT keypoints as detections through COCOeval must
    give AP 1.0 even with crowd-RLE and zero-keypoint ignore regions in the
    annotation file — the ignore semantics must not leak into the score."""
    _, ann, _, expected = val_structs
    coco = COCO(ann)
    res = []
    for a in coco.loadAnns(coco.getAnnIds()):
        if a.get("iscrowd", 0) or a.get("num_keypoints", 0) == 0:
            continue
        res.append({"image_id": a["image_id"], "category_id": 1,
                    "keypoints": a["keypoints"], "score": 1.0})
    assert len(res) == expected["n_normal"]
    ev = COCOeval(coco, coco.loadRes(res), "keypoints")
    ev.evaluate()
    ev.accumulate()
    ev.summarize()
    assert ev.stats[0] == pytest.approx(1.0, abs=1e-9)
    assert ev.stats[5] == pytest.approx(1.0, abs=1e-9)


def test_compressed_rle_crowd_decodes_and_masks_bottomup(val_structs):
    """The compressed-string crowd RLE round-trips, and the bottom-up
    dataset folds it into the blocked-region training mask."""
    img_root, ann, _, expected = val_structs
    coco = COCO(ann)
    crowd_anns = [a for a in coco.loadAnns(coco.getAnnIds())
                  if a.get("iscrowd", 0)]
    assert len(crowd_anns) == expected["n_crowd"]
    for a in crowd_anns:
        seg = a["segmentation"]
        assert isinstance(seg, dict) and isinstance(seg["counts"], str)
        m = decode_rle(seg)
        assert m.shape == tuple(seg["size"])
        assert m.sum() == a["area"]
        # the fixture's crowd region includes the block at [10:40, 15:200]
        assert m[20, 100] == 1 and m[0, 0] == 0

    bu_setting = {
        "image_size": [64, 64], "max_image_size": [96, 64],
        "heatmap_sizes": [[16, 16], [32, 32]], "sigma": 2.0,
        "expand_mask": True, "pixel_std": 200.0, "tag_per_joint": True,
        "flip_pairs": [[1, 2], [3, 4], [5, 6], [7, 8], [9, 10], [11, 12],
                       [13, 14], [15, 16]],
    }
    ds = create_dataset(img_root, ann, dataset_format="coco_bottomup",
                        is_train=True, config=bu_setting)["dataset"]
    # find the record for a crowd image and check its mask blocks the
    # crowd region (mask semantics: 1 = supervised, 0 = blocked)
    crowd_img = crowd_anns[0]["image_id"]
    rec = next(ds[i] for i in range(len(ds))
               if f"{crowd_img:012d}" in ds[i]["image_file"])
    mask = rec["mask"]
    assert mask.ndim == 3  # [levels, H, W]
    assert mask.min() == 0 and mask.max() == 1
    # some pixels are blocked (crowd + zero-kpt regions exist on this image)
    assert (mask[0] == 0).any()
