"""Synthetic-fixture joint layouts.

The "person" layout must be exactly flip-pair mirrored (gx_right = 1 -
gx_left, same gy) so horizontal flip augmentation and hflip TTA are
label-consistent; the historical "grid" layout must stay bit-identical so
earlier studies (docs/performance.md, docs/experiments/) remain
reproducible.
"""
import importlib.util
import os

_REPO = os.path.join(os.path.dirname(__file__), "..", "..")

FLIP_PAIRS = [(1, 2), (3, 4), (5, 6), (7, 8), (9, 10), (11, 12), (13, 14),
              (15, 16)]


def _load_gen():
    spec = importlib.util.spec_from_file_location(
        "synth_gen_mod", os.path.join(_REPO, "tools", "make_synthetic_coco.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_person_layout_is_flip_mirrored():
    gen = _load_gen()
    for left, right in FLIP_PAIRS:
        lx, ly = gen._joint_grid(left, "person")
        rx, ry = gen._joint_grid(right, "person")
        assert abs((1.0 - lx) - rx) < 1e-12
        assert ly == ry
    nx, _ = gen._joint_grid(0, "person")
    assert nx == 0.5  # nose self-pairs on the mirror axis


def test_grid_layout_unchanged():
    gen = _load_gen()
    for k in range(17):
        gx, gy = gen._joint_grid(k, "grid")
        assert gx == 0.15 + 0.23 * (k % 4)
        assert gy == 0.08 + 0.21 * (k // 4)


def test_person_layout_inside_box_with_jitter():
    # markers (±0.04 jitter) must stay inside the person box
    gen = _load_gen()
    for k in range(17):
        gx, gy = gen._joint_grid(k, "person")
        assert 0.04 <= gx <= 0.96
        assert 0.0 <= gy <= 0.96
