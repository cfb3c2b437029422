"""Fuzz the jittable on-device AE matcher against the reference's live code.

Oracle: /root/reference/mindpose/utils/match.py (scipy-Hungarian grouping)
loaded via oracle.py. The device matcher (ops/grouping.py) solves the same
per-joint assignment problem with a jittable Jonker-Volgenant LSAP, which
returns an *optimal* assignment — identical to scipy's whenever the optimum
is unique.

Tie structure decides what can be asserted:

1. Structured scenes (well-separated tag clusters — the realistic regime):
   every candidate is either ~0 from its own group mean or >=2.5 from any
   other, so the optimum is unique in BOTH the rounded (production default)
   and unrounded norm modes -> demand exact oracle parity.
2. Adversarial near-threshold fields, unrounded: the optimum is unique in
   real arithmetic, but near-coincident candidates (tags ~1e-3 apart) create
   total-cost gaps below float32 resolution; scipy solves in float64, the
   device in float32, so rare fp-level tie flips are unavoidable -> demand
   group-count equality always, case-exact agreement on >=95%.
3. Rounded norms on adversarial fields quantize costs into integer ties;
   scalar tags (L=1) make ties *structural* (|c0-g0|+|c1-g1| ==
   |c0-g1|+|c1-g0| identically for same-side candidates). No optimal solver
   can promise scipy's tie-break -> assert the tie-robust invariants below.

Tie-robust invariants (hold for ANY optimal tie-break, so any violation is a
real regression, not a tie artifact): with ignore_too_much=False both
implementations place every visible candidate exactly once — ties move a
candidate between groups or flip join/spawn, never drop or duplicate it —
so the *multiset of placed (x, y, score, tag...) rows* must match exactly.
"""
import sys
from collections import defaultdict

import numpy as np
import scipy.optimize

sys.path.insert(0, "tests")

from parity_oracle.oracle import COCO_JOINT_ORDER, FUZZ_N, load_oracle

from mindpose_tpu.ops.grouping import match_by_tag_device
import pytest

# JAX-compile-heavy: runs only in the full tier (pytest -m "" / no -m filter); the
# fast gate is `pytest -m "not slow"` — see README "Running the tests"
pytestmark = pytest.mark.slow


ORACLE = load_oracle()


def _match_by_tag_tiebreak(val_k, tag_k, ind_k, joint_order, vis_thr=0.1,
                           tag_thr=1.0, use_rounded_norm=True,
                           ignore_too_much=False):
    """Numpy replica of the reference algorithm with the device's
    deterministic tie-break (round + eps*dist) in place of scipy's
    arbitrary integer-tie partitioning. The device matcher must agree
    with this oracle EXACTLY — any divergence is a real bug, never a tie
    artifact. Mirrors /root/reference/mindpose/utils/match.py:14-116
    except the two marked lines."""
    num_joints, max_num, _ = tag_k.shape
    default_ = np.zeros((num_joints, 3 + tag_k.shape[2]), np.float32)
    joint_k = np.concatenate((ind_k, val_k[..., None], tag_k), axis=2)
    joint_dict = defaultdict(lambda: default_.copy())
    tag_dict = dict()
    for i in range(num_joints):
        idx = joint_order[i]
        tags = tag_k[idx]
        joints = joint_k[idx]
        mask = joints[:, 2] > vis_thr
        tags = tags[mask]
        if tags.shape[0] == 0:
            continue
        joints = joints[mask]
        if i == 0 or len(joint_dict) == 0:
            for j in range(tags.shape[0]):
                key = tags[j, 0]
                joint_dict[key][idx] = joints[j]
                tag_dict[key] = [tags[j]]
        else:
            grouped_keys = list(joint_dict.keys())
            if ignore_too_much and len(grouped_keys) == max_num:
                continue
            grouped_tags = np.stack([np.mean(np.stack(tag_dict[x]), axis=0)
                                     for x in grouped_keys])
            diff = joints[:, None, 3:] - grouped_tags[None, :, :]
            dn = np.linalg.norm(diff, ord=2, axis=2).astype(np.float32)
            diff_saved = dn.copy()
            if use_rounded_norm:
                # device tie-break: round, then bias by real distance
                eps = 0.5 / (max_num * (dn.max() + 1.0))
                dn = np.round(dn) + np.float32(eps) * dn
            num_added, num_grouped = dn.shape
            if num_added > num_grouped:
                dn = np.concatenate(
                    (dn, np.zeros((num_added, num_added - num_grouped),
                                  np.float32) + 1e10), axis=1)
            r, c = scipy.optimize.linear_sum_assignment(dn)
            for row, col in zip(r, c):
                if (row < num_added and col < num_grouped
                        and diff_saved[row][col] < tag_thr):
                    key = grouped_keys[col]
                    joint_dict[key][idx] = joints[row]
                    tag_dict[key].append(tags[row])
                else:
                    key = tags[row, 0]
                    joint_dict[key][idx] = joints[row]
                    tag_dict[key] = [tags[row]]
    return np.array(list(joint_dict.values())).astype(np.float32)


def _structured_scene(rng, k=17, m=30, tag_dim=1, max_persons=8):
    """Crowded multi-person candidate field with separated tag clusters."""
    g = int(rng.integers(1, max_persons + 1))
    # person tag centers separated by >= 2.5 (tag_thr=1.0)
    centers = (np.arange(g) * rng.uniform(2.5, 4.0)
               + rng.uniform(-10, 10))
    rng.shuffle(centers)
    noise = rng.uniform(0.03, 0.15)

    val_k = np.zeros((k, m), np.float32)
    tag_k = np.zeros((k, m, tag_dim), np.float32)
    ind_k = np.zeros((k, m, 2), np.float32)
    for j in range(k):
        slot = 0
        for p in range(g):
            if rng.random() < 0.25:  # occluded joint
                continue
            val_k[j, slot] = rng.uniform(0.3, 1.0)
            tag_k[j, slot, :] = centers[p] + rng.normal(0, noise, tag_dim)
            ind_k[j, slot] = rng.uniform(0, 128, 2)
            slot += 1
        # sub-threshold clutter candidates (must be ignored by both)
        n_clutter = int(rng.integers(0, 4))
        for _ in range(n_clutter):
            if slot >= m:
                break
            val_k[j, slot] = rng.uniform(0.0, 0.09)
            tag_k[j, slot, :] = rng.uniform(-15, 15, tag_dim)
            ind_k[j, slot] = rng.uniform(0, 128, 2)
            slot += 1
    return val_k, tag_k, ind_k


def _adversarial_scene(rng, k=17, m=30, tag_dim=1):
    """Near-threshold tag field where join-vs-spawn teeters."""
    val_k = rng.uniform(0, 1, size=(k, m)).astype(np.float32)
    tag_k = (rng.choice([0.0, 0.5, 1.0, 1.5, 2.0], size=(k, m, tag_dim))
             + rng.normal(0, 0.02, size=(k, m, tag_dim))).astype(np.float32)
    ind_k = rng.uniform(0, 64, size=(k, m, 2)).astype(np.float32)
    return val_k, tag_k, ind_k


def _canon(groups, k, l):
    """[G, K, 3+L] -> canonical order by mean visible tag (for set compare)."""
    groups = np.asarray(groups, np.float32).reshape(-1, k, 3 + l)
    if len(groups) == 0:
        return groups
    keys = []
    for g in groups:
        vis = g[:, 2] > 0
        keys.append(g[vis, 3].mean() if vis.any() else 1e9)
    return groups[np.argsort(keys)]


def _placed_rows(groups):
    """Lex-sorted multiset of placed candidate rows (score > 0 entries)."""
    flat = groups.reshape(-1, groups.shape[-1])
    flat = flat[flat[:, 2] > 0]
    order = np.lexsort(flat.T[::-1])
    return flat[order]


def _run_both(val_k, tag_k, ind_k, **kwargs):
    oracle_kwargs = {k: v for k, v in kwargs.items() if k != "group_cap"}
    want = ORACLE.match.match_by_tag(val_k, tag_k, ind_k,
                                     joint_order=COCO_JOINT_ORDER,
                                     **oracle_kwargs)
    dev_groups, dev_valid = match_by_tag_device(
        val_k, tag_k, ind_k, joint_order=tuple(COCO_JOINT_ORDER), **kwargs
    )
    n_valid = int(np.asarray(dev_valid).sum())
    cap = np.asarray(dev_groups).shape[0]
    assert n_valid < cap, f"device group capacity {cap} saturated"
    got = np.asarray(dev_groups)[np.asarray(dev_valid)]
    k, l = val_k.shape[0], tag_k.shape[2]
    return _canon(got, k, l), _canon(want, k, l)


def test_device_grouping_structured_unrounded_exact():
    """Separated clusters + unrounded norm -> unique optimum -> exact
    parity (shapes and values), with and without ignore_too_much."""
    rng = np.random.default_rng(30)
    for i in range(max(20, FUZZ_N // 5)):
        val_k, tag_k, ind_k = _structured_scene(rng, tag_dim=2)
        kwargs = dict(
            vis_thr=0.1,
            tag_thr=1.0,
            use_rounded_norm=False,
            ignore_too_much=bool(i % 3 == 0),
        )
        got, want = _run_both(val_k, tag_k, ind_k, **kwargs)
        assert got.shape == want.shape, (
            f"case {i}: device found {got.shape[0]} groups, "
            f"oracle {want.shape[0]}"
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5,
                                   err_msg=f"case {i}")


def test_device_grouping_structured_rounded_production():
    """Rounded norm (production default) on realistic scenes: integer
    rounding makes cross-group cost coincidences common (e.g. 15+0 vs
    10+5), where the reference's outcome is scipy's arbitrary tie-break;
    the device breaks such ties by unrounded distance (join-preserving).

    Assertions, strongest first:
    1. vs the tie-break-matched numpy oracle: EXACT equality always —
       proves the device implements the reference algorithm, with tie
       partitioning as the only degree of freedom (measured 200/200).
    2. vs the true scipy oracle: the placed-candidate multiset matches
       always, and case-exact agreement stays above an empirical floor
       (measured 160/200 = 80%; every disagreement is a tie partition).
    """
    rng = np.random.default_rng(33)
    n_cases, agree = 0, 0
    for i in range(max(20, FUZZ_N // 5)):
        val_k, tag_k, ind_k = _structured_scene(rng, tag_dim=2)
        kwargs = dict(
            vis_thr=0.1,
            tag_thr=1.0,
            use_rounded_norm=True,
            ignore_too_much=False,
        )
        got, want = _run_both(val_k, tag_k, ind_k, **kwargs)

        k, l = val_k.shape[0], tag_k.shape[2]
        want_tb = _canon(
            _match_by_tag_tiebreak(val_k, tag_k, ind_k, COCO_JOINT_ORDER,
                                   **kwargs), k, l)
        assert got.shape == want_tb.shape, (
            f"case {i}: device {got.shape[0]} vs tie-break oracle "
            f"{want_tb.shape[0]} groups"
        )
        np.testing.assert_allclose(got, want_tb, rtol=1e-5, atol=1e-5,
                                   err_msg=f"case {i} (tie-break oracle)")

        np.testing.assert_allclose(
            _placed_rows(got), _placed_rows(want), rtol=1e-5, atol=1e-5,
            err_msg=f"case {i}: placed-candidate multisets diverge",
        )
        n_cases += 1
        agree += bool(got.shape == want.shape
                      and np.allclose(got, want, atol=1e-4))
    assert agree >= int(0.70 * n_cases), f"{agree}/{n_cases} cases agree"


def test_device_grouping_unrounded_adversarial():
    """Unrounded norm + 2-D tags on near-threshold fields: the optimum is
    unique in real arithmetic but fp-level ties (scipy float64 vs device
    float32) can swap near-coincident candidates between groups. Demand the
    tie-robust invariants always, case-exact agreement on >=95%."""
    rng = np.random.default_rng(31)
    n_cases, agree = 0, 0
    for i in range(max(40, FUZZ_N // 3)):
        val_k, tag_k, ind_k = _adversarial_scene(rng, tag_dim=2)
        # adversarial fields spawn far more groups than real scenes; raise
        # the device capacity so parity vs the unbounded oracle is testable
        kwargs = dict(vis_thr=float(rng.choice([0.1, 0.5])), tag_thr=1.0,
                      use_rounded_norm=False, ignore_too_much=False,
                      group_cap=192)
        got, want = _run_both(val_k, tag_k, ind_k, **kwargs)
        assert got.shape == want.shape, (
            f"case {i}: device {got.shape[0]} vs oracle {want.shape[0]} groups"
        )
        np.testing.assert_allclose(
            _placed_rows(got), _placed_rows(want), rtol=1e-5, atol=1e-5,
            err_msg=f"case {i}: placed-candidate multisets diverge",
        )
        n_cases += 1
        agree += bool(np.allclose(got, want, atol=1e-4))
    assert agree >= int(0.95 * n_cases), f"{agree}/{n_cases} cases agree"


def test_device_grouping_degenerate_regime_invariants():
    """Rounded costs and/or scalar tags: integer ties are genuine and
    structural for L=1, so scipy's tie-break is unreproducible by any
    optimal solver. Assert the tie-robust invariant (identical placed
    multiset — no candidate lost or duplicated) on every case, plus an
    empirical case-agreement floor as a gross-regression trap."""
    rng = np.random.default_rng(32)
    n_cases = 0
    agree = 0
    for i in range(max(30, FUZZ_N // 4)):
        if i % 2 == 0:
            val_k, tag_k, ind_k = _structured_scene(
                rng, tag_dim=[1, 2][i % 4 == 0])
        else:
            val_k, tag_k, ind_k = _adversarial_scene(rng, tag_dim=1)
        kwargs = dict(vis_thr=0.1, tag_thr=1.0,
                      use_rounded_norm=bool(i % 3 != 0),
                      ignore_too_much=False, group_cap=192)
        got, want = _run_both(val_k, tag_k, ind_k, **kwargs)
        np.testing.assert_allclose(
            _placed_rows(got), _placed_rows(want), rtol=1e-5, atol=1e-5,
            err_msg=f"case {i}: placed-candidate multisets diverge",
        )
        n_cases += 1
        if got.shape == want.shape and np.allclose(got, want, atol=1e-4):
            agree += 1
    # measured 2026-08: ~49% case-exact agreement — every disagreement is a
    # tie partition; the floor only trips on a structural regression (e.g.
    # a suboptimal assignment would also break the multiset check above)
    assert agree >= int(0.35 * n_cases), f"{agree}/{n_cases} cases agree"


def test_device_grouping_empty_and_single():
    """Degenerate fields: nothing visible, and exactly one candidate."""
    k, m = 17, 30
    zeros = np.zeros((k, m), np.float32)
    tags = np.zeros((k, m, 1), np.float32)
    inds = np.zeros((k, m, 2), np.float32)
    got, want = _run_both(zeros, tags, inds, vis_thr=0.1, tag_thr=1.0)
    assert got.shape[0] == want.shape[0] == 0

    val = zeros.copy()
    val[0, 0] = 0.9
    got, want = _run_both(val, tags, inds, vis_thr=0.1, tag_thr=1.0)
    assert got.shape[0] == want.shape[0] == 1
    np.testing.assert_allclose(got, want, atol=1e-5)
