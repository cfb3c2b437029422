"""Batched bottom-up eval rule (data_factory): batch>1 only when every
padded image shares ONE static shape — i.e. bottomup_pad present AND a
square max_image_size (BottomUpPad swaps its target dims for portrait
inputs, so a non-square max pads the two orientations differently)."""
import numpy as np
import pytest

from mindpose_tpu.data.transform.bottomup_transform import BottomUpPad


def _pad_shape(img_hw, max_size):
    cfg = {
        "image_size": [64, 64],
        "heatmap_sizes": [[16, 16]],
        "sigma": 2.0,
        "pixel_std": 200.0,
        "tag_per_joint": True,
        "flip_pairs": [],
        "max_image_size": max_size,
    }
    t = BottomUpPad(is_train=False, config=cfg)
    h, w = img_hw
    out = t.transform({"image": np.zeros((h, w, 3), np.uint8)})
    return out["image"].shape


def test_non_square_max_pads_orientations_differently():
    landscape = _pad_shape((40, 80), [96, 64])
    portrait = _pad_shape((80, 40), [96, 64])
    assert landscape == (64, 96, 3)
    assert portrait == (96, 64, 3)
    assert landscape != portrait  # the unstackable pair


def test_square_max_gives_one_static_shape():
    landscape = _pad_shape((40, 80), [96, 96])
    portrait = _pad_shape((80, 40), [96, 96])
    assert landscape == portrait == (96, 96, 3)


@pytest.mark.parametrize(
    "max_size,expected_batch",
    [([96, 96], 4), ([96, 64], 1), (None, 1)],
)
def test_batch_rule(max_size, expected_batch, tmp_path):
    import sys

    sys.path.insert(0, "tests")
    from helpers import make_tiny_coco
    from mindpose_tpu.data import create_dataset, create_pipeline

    img_root, ann = make_tiny_coco(str(tmp_path))
    cfg = {
        "image_size": [64, 64],
        "heatmap_sizes": [[16, 16], [32, 32]],
        "sigma": 2.0,
        "expand_mask": True,
        "pixel_std": 200.0,
        "tag_per_joint": True,
        "flip_pairs": [],
    }
    transforms = ["bottomup_resize"]
    cfg["max_image_size"] = max_size if max_size is not None else [96, 64]
    if max_size is not None:
        transforms.append("bottomup_pad")
    ds = create_dataset(
        img_root, ann, dataset_format="coco_bottomup", is_train=False, config=cfg
    )
    loader = create_pipeline(
        ds, transforms, method="bottomup", batch_size=4, is_train=False, config=cfg
    )
    assert loader.batch_size == expected_batch
