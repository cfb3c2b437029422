"""Skeleton resolution for demo overlays across joint layouts.

The reference hardcodes 17-joint COCO drawing; our demos resolve the edge
list from ``dataset_setting.skeleton`` (tools/common/skeleton.py, shared by
demo.py and demo_video.py) so MPII (16) and CrowdPose (14) layouts draw
without out-of-range indices.
"""
import importlib.util
import os
from types import SimpleNamespace

import yaml

_REPO = os.path.join(os.path.dirname(__file__), "..", "..")


def _load_skeleton_mod():
    spec = importlib.util.spec_from_file_location(
        "demo_skeleton_mod",
        os.path.join(_REPO, "tools", "common", "skeleton.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_coco_default_skeleton():
    mod = _load_skeleton_mod()
    args = SimpleNamespace(dataset_setting={}, num_joints=17)
    edges = mod.resolve_skeleton(args)
    assert len(edges) == 19
    assert all(max(a, b) < 17 for a, b in edges)


def test_non_coco_without_skeleton_draws_dots_only():
    mod = _load_skeleton_mod()
    args = SimpleNamespace(dataset_setting={}, num_joints=14)
    assert mod.resolve_skeleton(args) == []


def test_recipe_skeletons_fit_their_layout():
    mod = _load_skeleton_mod()
    for cfg_rel, joints in [
        ("configs/mpii/hrnet_w32_mpii_tpu.yaml", 16),
        ("configs/crowdpose/hrnet_w32_crowdpose_tpu.yaml", 14),
    ]:
        with open(os.path.join(_REPO, cfg_rel)) as f:
            cfg = yaml.safe_load(f)
        args = SimpleNamespace(
            dataset_setting=cfg["dataset_setting"], num_joints=joints)
        edges = mod.resolve_skeleton(args)
        assert edges, cfg_rel
        assert all(max(a, b) < joints for a, b in edges), cfg_rel
