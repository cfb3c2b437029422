"""Jittable AE grouping vs the host match_by_tag on separable cases."""
import numpy as np

from mindpose_tpu.ops.grouping import match_by_tag_batch, match_by_tag_device
from mindpose_tpu.utils.match import match_by_tag
import pytest

# JAX-compile-heavy: runs only in the full tier (pytest -m "" / no -m filter); the
# fast gate is `pytest -m "not slow"` — see README "Running the tests"
pytestmark = pytest.mark.slow



def _case(num_instances=3, k=5, m=8, tag_sep=4.0, seed=0):
    rng = np.random.RandomState(seed)
    val_k = np.zeros((k, m), np.float32)
    tag_k = np.zeros((k, m, 1), np.float32)
    ind_k = np.zeros((k, m, 2), np.float32)
    for j in range(k):
        for i in range(num_instances):
            val_k[j, i] = 0.5 + 0.4 * rng.rand()
            tag_k[j, i, 0] = i * tag_sep + rng.randn() * 0.05
            ind_k[j, i] = [10 * i + j, 20 * i + j]
    return val_k, tag_k, ind_k


def _canon(groups):
    """Sort instances by their mean tag for comparison."""
    order = np.argsort([g[g[:, 2] > 0, 3].mean() for g in groups])
    return np.stack([groups[i] for i in order])


def test_device_matches_host_separable():
    val_k, tag_k, ind_k = _case()
    joint_order = list(range(5))

    host = match_by_tag(val_k, tag_k, ind_k, joint_order, vis_thr=0.1)
    dev_groups, dev_valid = match_by_tag_device(
        val_k, tag_k, ind_k, tuple(joint_order), vis_thr=0.1
    )
    dev = np.asarray(dev_groups)[np.asarray(dev_valid)]

    assert host.shape == dev.shape
    np.testing.assert_allclose(_canon(host), _canon(dev), atol=1e-5)


def test_device_grouping_respects_vis_thr():
    val_k, tag_k, ind_k = _case(num_instances=2)
    val_k[2, :] = 0.0  # joint 2 invisible everywhere
    dev_groups, dev_valid = match_by_tag_device(
        val_k, tag_k, ind_k, tuple(range(5)), vis_thr=0.1
    )
    dev = np.asarray(dev_groups)[np.asarray(dev_valid)]
    assert len(dev) == 2
    assert (dev[:, 2, 2] == 0).all()  # joint 2 empty in every group


def test_device_grouping_far_tags_spawn():
    # two candidates on the same joint with far tags -> two groups
    k, m = 2, 4
    val_k = np.zeros((k, m), np.float32)
    tag_k = np.zeros((k, m, 1), np.float32)
    ind_k = np.zeros((k, m, 2), np.float32)
    val_k[0, 0] = val_k[0, 1] = 0.9
    tag_k[0, 0, 0] = 0.0
    tag_k[0, 1, 0] = 10.0
    # joint 1: one candidate near group 0's tag -> joins group 0
    val_k[1, 0] = 0.8
    tag_k[1, 0, 0] = 0.1
    dev_groups, dev_valid = match_by_tag_device(
        val_k, tag_k, ind_k, (0, 1), vis_thr=0.1, tag_thr=1.0
    )
    dev = np.asarray(dev_groups)[np.asarray(dev_valid)]
    assert len(dev) == 2
    g0 = dev[np.argmin([g[0, 3] for g in dev])]
    assert g0[1, 2] > 0  # joint 1 joined the low-tag group


def test_batch_vmap():
    val_k, tag_k, ind_k = _case()
    groups, valid = match_by_tag_batch(
        np.stack([val_k, val_k]), np.stack([tag_k, tag_k]),
        np.stack([ind_k, ind_k]), joint_order=list(range(5)),
    )
    assert groups.shape == (2, 8, 5, 4)
    np.testing.assert_array_equal(np.asarray(valid[0]), np.asarray(valid[1]))
