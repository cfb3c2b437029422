"""Loss tests: shapes plus golden-value checks (the reference only asserts
loss.size == 1; we verify the math)."""
import jax.numpy as jnp
import numpy as np

from mindpose_tpu.models.loss import (

    AELoss,
    AEMultiLoss,
    JointsMSELoss,
    JointsMSELossWithMask,
)
import pytest

# JAX-compile-heavy: runs only in the full tier (pytest -m "" / no -m filter); the
# fast gate is `pytest -m "not slow"` — see README "Running the tests"
pytestmark = pytest.mark.slow


def test_joints_mse_loss_golden():
    pred = jnp.ones((2, 4, 4, 3))
    target = jnp.zeros((2, 4, 4, 3))
    loss = JointsMSELoss()(pred, target)
    assert loss.shape == ()
    np.testing.assert_allclose(loss, 1.0, rtol=1e-6)

    # weight zeroes out one joint -> mean scales by 2/3
    weight = jnp.array([[1.0, 1.0, 0.0], [1.0, 1.0, 0.0]])
    loss_w = JointsMSELoss(use_target_weight=True)(pred, target, weight)
    np.testing.assert_allclose(loss_w, 2.0 / 3.0, rtol=1e-6)


def test_joints_mse_with_mask():
    pred = jnp.ones((1, 2, 2, 1))
    target = jnp.zeros((1, 2, 2, 1))
    mask = jnp.array([[[1.0, 0.0], [0.0, 0.0]]])
    loss = JointsMSELossWithMask()(pred, target, mask)
    np.testing.assert_allclose(loss, 0.25, rtol=1e-6)


def test_ae_loss_pull_push():
    # two instances with constant per-instance tags
    h, w, k, m = 4, 4, 2, 2
    pred = np.zeros((1, h, w, k), np.float32)
    # instance 0 tag = 0 at pixel 0; instance 1 tag = 1 at pixel 5
    pred[0, 1, 1, :] = 1.0
    tag_ind = np.zeros((1, m, k, 2), np.int32)
    tag_ind[0, 0, :, 0] = 0
    tag_ind[0, 0, :, 1] = 1
    tag_ind[0, 1, :, 0] = 1 * w + 1
    tag_ind[0, 1, :, 1] = 1

    push, pull = AELoss()(jnp.asarray(pred), jnp.asarray(tag_ind))
    eps = 0.01
    # h_n = [0, 2/(2+eps)]
    h0 = 0.0
    h1 = 2.0 / (2 + eps)
    expected_push = 0.5 * (2 * np.exp(-((h0 - h1) ** 2))) / (2 * 1 + eps)
    np.testing.assert_allclose(push, expected_push, rtol=1e-5)
    # pull: (tag - h_n)^2 summed over valid joints per instance
    expected_pull_i1 = 2 * (1.0 - h1) ** 2 / (2 + eps)
    expected_pull = (0 + expected_pull_i1) / (2 + eps)
    np.testing.assert_allclose(pull, expected_pull, rtol=1e-4, atol=1e-7)


def test_ae_multi_loss_shapes():
    preds = [jnp.zeros((2, 8, 8, 34)), jnp.zeros((2, 16, 16, 17))]
    target = jnp.zeros((2, 2, 16, 16, 17))
    mask = jnp.ones((2, 2, 16, 16))
    tag_ind = jnp.zeros((2, 2, 30, 17, 2), jnp.int32)
    loss = AEMultiLoss(stage_sizes=((8, 8), (16, 16)))(preds, target, mask, tag_ind)
    assert loss.shape == (3,)
