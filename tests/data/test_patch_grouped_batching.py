"""patch_grouped_batching: same-bucket batches, exactly-once records.

Full device pipeline pads each batch's variable-size source patches to the
batch max, so one large patch inflates every record's footprint (measured:
111 MB/batch where the per-record mean implies ~32, docs/performance.md).
The opt-in regroups processed records by bucket shape. These tests pin the
invariants: every record emitted exactly once per epoch, each batch's
padded shape is its own bucket (not the epoch max), deterministic per seed,
and the remainder rule is respected.
"""
import sys

import numpy as np

sys.path.insert(0, "tests")

from helpers import make_tiny_coco
from mindpose_tpu.data import create_dataset, create_pipeline
from mindpose_tpu.data.device_pipeline import (
    DEVICE_FULL_FINAL_COLUMNS,
    strip_host_target_transform,
    to_matrix_transforms,
)

from tests.engine.test_train_eval_e2e import TINY_SETTING  # noqa: F401

# randomized scale/rotation makes source-patch sizes genuinely variable
TRANSFORMS = [
    "topdown_box_to_center_scale",
    {"topdown_randomscale_rotation": {"rot_factor": 40, "scale_factor": 0.5,
                                      "rot_prob": 0.8}},
    "topdown_affine",
    {"topdown_generate_target": {"sigma": 1.5}},
]
BUCKET = 32


def _build(fixture, batch_size, patch_grouped, seed=0, num_workers=2):
    img_root, ann = fixture
    transforms, _ = strip_host_target_transform(TRANSFORMS)
    transforms = to_matrix_transforms(transforms)
    ds = create_dataset(img_root, ann, dataset_format="coco_topdown",
                        is_train=True, config=TINY_SETTING)
    return create_pipeline(
        ds, transforms, method="topdown", batch_size=batch_size,
        is_train=True, normalize=False, config=TINY_SETTING, seed=seed,
        num_workers=num_workers,
        final_columns=DEVICE_FULL_FINAL_COLUMNS + ["bbox_ids"],
        image_bucket=BUCKET, patch_grouped_batching=patch_grouped,
    )


def _epoch(loader):
    return [
        {k: np.asarray(v) for k, v in b.items()} for b in loader
    ]


def test_exactly_once_and_bucket_shapes():
    import tempfile

    root = tempfile.mkdtemp(prefix="pgb_")
    fixture = make_tiny_coco(root, num_images=12, people_per_img=4)
    loader = _build(fixture, batch_size=8, patch_grouped=True)
    plain = _build(fixture, batch_size=8, patch_grouped=False)

    batches = _epoch(loader)
    ref_batches = _epoch(plain)

    # exactly-once: grouped epoch emits the same record multiset as the
    # plain loader (both drop the same-size remainder: 48 % 8 == 0 -> none)
    got = sorted(int(i) for b in batches for i in b["bbox_ids"])
    want = sorted(int(i) for b in ref_batches for i in b["bbox_ids"])
    assert got == want and len(got) == 48

    # each grouped batch pads to ITS OWN bucket: shape is a multiple of the
    # bucket and equals the max record extent rounded up — and across the
    # epoch there is more than one distinct shape (otherwise the test data
    # isn't exercising the grouping), while the plain loader pays the batch
    # max every time
    shapes = {b["image"].shape[1:3] for b in batches}
    for b in batches:
        h, w = b["image"].shape[1:3]
        assert h % BUCKET == 0 and w % BUCKET == 0
    assert len(shapes) > 1
    grouped_bytes = sum(b["image"].nbytes for b in batches)
    plain_bytes = sum(b["image"].nbytes for b in ref_batches)
    assert grouped_bytes < plain_bytes  # the point of the knob


def test_deterministic_and_remainder():
    import tempfile

    root = tempfile.mkdtemp(prefix="pgb2_")
    fixture = make_tiny_coco(root, num_images=10, people_per_img=3)  # 30 recs

    # num_workers=1 + a reset global seed: augmentation draws come from the
    # shared global RNG stream (same as the plain loader path), so identical
    # epochs require serial processing AND identical starting RNG state
    np.random.seed(7)
    a = _epoch(_build(fixture, batch_size=8, patch_grouped=True, seed=3,
                      num_workers=1))
    np.random.seed(7)
    b = _epoch(_build(fixture, batch_size=8, patch_grouped=True, seed=3,
                      num_workers=1))
    assert [x["image"].shape for x in a] == [x["image"].shape for x in b]
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x["bbox_ids"], y["bbox_ids"])

    # drop_remainder (is_train default): 30 records -> 3 full batches of 8,
    # the 6-record tail dropped — exactly like the plain loader's contract
    assert len(a) == 3
    assert all(x["image"].shape[0] == 8 for x in a)
