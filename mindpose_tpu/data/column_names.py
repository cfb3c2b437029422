"""Column-name contracts per method x phase.

Parity: /root/reference/mindpose/data/column_names.py:4-88 — the NAMES are
the contract (they must match the reference's exactly so configs and
transforms interoperate); the tables are built compactly from space-
separated specs. In this framework records flow as dicts, so only the
*final* projections (what the batched iterator yields) are load-bearing;
the pre-projection sets document the keys available to transforms.
"""

def _cols(spec: str) -> list:
    return spec.split()


# method -> phase -> keys available to the transform pipeline
_PIPELINE = {
    "topdown": {
        "train": _cols("image center scale boxes keypoints rotation target target_weight"),
        "val": _cols("image center scale rotation image_file boxes bbox_ids bbox_scores"),
    },
    "bottomup": {
        "train": _cols("image boxes keypoints target mask tag_ind"),
        "val": _cols("image mask center scale image_file image_shape"),
    },
}

# method -> phase -> columns the batched iterator yields (train: the train
# step's positional inputs in order; val: what the inferencer consumes)
FINAL_COLUMN_MAP = {
    "topdown": {
        "train": _cols("image target target_weight"),
        "val": _cols("image image_file boxes bbox_ids center scale bbox_scores"),
    },
    "bottomup": {
        "train": _cols("image target mask tag_ind"),
        "val": _cols("image mask center scale image_file image_shape"),
    },
    "imagefolder_bottomup": {
        "val": _cols("image mask center scale image_file image_shape"),
    },
}

# dataset-format aliases share their method's pipeline columns
COLUMN_MAP = {
    "topdown": _PIPELINE["topdown"],
    "coco_topdown": _PIPELINE["topdown"],
    "bottomup": _PIPELINE["bottomup"],
    "coco_bottomup": _PIPELINE["bottomup"],
    "imagefolder_bottomup": {"val": _PIPELINE["bottomup"]["val"]},
}
