"""make_det_json (tools/ablate_accuracy.py --det-noise): the generated
detection file must be a valid COCO-results list the detector-box eval can
consume, with the documented noise properties."""
import json
import sys

sys.path.insert(0, "tests")
sys.path.insert(0, "tools")

from helpers import make_tiny_coco


def test_make_det_json_properties(tmp_path):
    from ablate_accuracy import make_det_json

    img_root, ann_path = make_tiny_coco(str(tmp_path), num_images=20,
                                        people_per_img=3)
    out = str(tmp_path / "det.json")
    make_det_json(ann_path, out, seed=0, jitter=0.08, drop=0.05, fp=0.10)
    with open(ann_path) as f:
        ann = json.load(f)
    with open(out) as f:
        dets = json.load(f)

    n_gt = len(ann["annotations"])
    img_ids = {im["id"] for im in ann["images"]}
    # drop=5% + fp=10% of images: count within a generous band around n_gt
    assert 0.75 * n_gt <= len(dets) <= 1.25 * n_gt, (len(dets), n_gt)
    by_img = {}
    for d in dets:
        assert d["category_id"] == 1
        assert d["image_id"] in img_ids
        assert 0.0 < d["score"] <= 1.0
        x, y, w, h = d["bbox"]
        assert w > 0 and h > 0
        by_img.setdefault(d["image_id"], []).append(d)

    # jittered boxes stay near their GT (center moved << box size)
    gt_by_img = {}
    for a in ann["annotations"]:
        gt_by_img.setdefault(a["image_id"], []).append(a["bbox"])
    near = total = 0
    for iid, ds in by_img.items():
        for d in ds:
            x, y, w, h = d["bbox"]
            cx, cy = x + w / 2, y + h / 2
            for gx, gy, gw, gh in gt_by_img[iid]:
                if (abs(cx - (gx + gw / 2)) < 0.5 * gw
                        and abs(cy - (gy + gh / 2)) < 0.5 * gh):
                    near += 1
                    break
            total += 1
    # the overwhelming majority are jittered GT, a small tail are FPs
    assert near / total > 0.85, (near, total)

    # determinism per seed
    out2 = str(tmp_path / "det2.json")
    make_det_json(ann_path, out2, seed=0)
    with open(out2) as f:
        assert json.load(f) == dets
