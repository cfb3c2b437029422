"""Load the reference's host-side numpy/cv2 modules as a live parity oracle.

The reference's entire host geometry/transform/nms/grouping stack is pure
numpy + scipy + cv2 and imports standalone — no MindSpore required (verified
module by module). Loading it via importlib into a synthetic ``refpose``
package lets every parity test fuzz OUR implementations against the
reference's ACTUAL code instead of hand-transcribed formulas, closing the
transcription-slip risk called out in SURVEY.md §7 ("hard parts" #1).

Modules loaded (all /root/reference/mindpose/...):
  register.py, data/column_names.py, data/transform/{transform,utils,
  topdown_transform,bottomup_transform}.py, utils/{nms,match}.py
"""
import importlib.util
import os
import sys
import types

REF_ROOT = "/root/reference/mindpose"

# (module name, path relative to REF_ROOT) in dependency order
_SUBMODULES = [
    ("refpose.register", "register.py"),
    ("refpose.data.column_names", "data/column_names.py"),
    ("refpose.data.transform.transform", "data/transform/transform.py"),
    ("refpose.data.transform.utils", "data/transform/utils.py"),
    (
        "refpose.data.transform.topdown_transform",
        "data/transform/topdown_transform.py",
    ),
    (
        "refpose.data.transform.bottomup_transform",
        "data/transform/bottomup_transform.py",
    ),
    ("refpose.utils.nms", "utils/nms.py"),
    ("refpose.utils.match", "utils/match.py"),
]

_PACKAGES = ("refpose", "refpose.data", "refpose.data.transform", "refpose.utils")


def load_oracle() -> types.SimpleNamespace:
    """Load (once) and return the reference modules.

    Returns a namespace with attributes:
      utils     — data/transform/utils.py  (geometry)
      topdown   — data/transform/topdown_transform.py
      bottomup  — data/transform/bottomup_transform.py
      nms       — utils/nms.py
      match     — utils/match.py
      column_names — data/column_names.py
    """
    if "refpose.utils.match" not in sys.modules:
        for pkg in _PACKAGES:
            mod = types.ModuleType(pkg)
            mod.__path__ = []  # mark as package for the import machinery
            mod.__package__ = pkg
            sys.modules[pkg] = mod
        for name, rel in _SUBMODULES:
            spec = importlib.util.spec_from_file_location(
                name, os.path.join(REF_ROOT, rel)
            )
            mod = importlib.util.module_from_spec(spec)
            sys.modules[name] = mod
            spec.loader.exec_module(mod)
            parent, _, child = name.rpartition(".")
            setattr(sys.modules[parent], child, mod)

    return types.SimpleNamespace(
        utils=sys.modules["refpose.data.transform.utils"],
        topdown=sys.modules["refpose.data.transform.topdown_transform"],
        bottomup=sys.modules["refpose.data.transform.bottomup_transform"],
        nms=sys.modules["refpose.utils.nms"],
        match=sys.modules["refpose.utils.match"],
        column_names=sys.modules["refpose.data.column_names"],
    )


# Number of fuzz cases per function; the committed default keeps the suite
# fast while MINDPOSE_ORACLE_FUZZ_N=10000 reproduces the documented full
# sweep (docs/parity.md).
FUZZ_N = int(os.environ.get("MINDPOSE_ORACLE_FUZZ_N", "1000"))


# COCO-shaped settings used across the fuzz suites
COCO_FLIP_PAIRS = [
    [1, 2], [3, 4], [5, 6], [7, 8], [9, 10], [11, 12], [13, 14], [15, 16],
]
COCO_UPPER_BODY_IDS = list(range(11))
COCO_JOINT_WEIGHTS = [
    1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.2, 1.2, 1.5, 1.5, 1.0, 1.0, 1.2,
    1.2, 1.5, 1.5,
]
COCO_JOINT_ORDER = [0, 1, 2, 3, 4, 5, 6, 11, 12, 7, 8, 9, 10, 13, 14, 15, 16]
COCO_SIGMAS = [
    0.026, 0.025, 0.025, 0.035, 0.035, 0.079, 0.079, 0.072, 0.072, 0.062,
    0.062, 0.107, 0.107, 0.087, 0.087, 0.089, 0.089,
]


def topdown_setting(image_size=(192, 256), heatmap_size=(48, 64),
                    pixel_std=200.0, scale_padding=1.25,
                    joint_weights=False):
    cfg = {
        "image_size": list(image_size),
        "heatmap_size": list(heatmap_size),
        "flip_pairs": COCO_FLIP_PAIRS,
        "upper_body_ids": COCO_UPPER_BODY_IDS,
        "pixel_std": pixel_std,
        "scale_padding": scale_padding,
    }
    if joint_weights:
        cfg["joint_weights"] = COCO_JOINT_WEIGHTS
    return cfg


def bottomup_setting(image_size=(128, 128), heatmap_sizes=((32, 32), (64, 64)),
                     max_image_size=(160, 160), tag_per_joint=True):
    return {
        "image_size": list(image_size),
        "max_image_size": list(max_image_size),
        "heatmap_sizes": [list(s) for s in heatmap_sizes],
        "flip_pairs": COCO_FLIP_PAIRS,
        "pixel_std": 200.0,
        "tag_per_joint": tag_per_joint,
    }
