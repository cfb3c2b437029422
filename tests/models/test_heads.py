"""Head shape tests (NHWC mirrors of the reference head tests)."""
import jax
import jax.numpy as jnp

from mindpose_tpu.models.heads import (
    HigherHRNetHead,
    HRNetHead,
    SimpleBaselineHead,
)


def test_simple_baseline_head():
    head = SimpleBaselineHead(in_channels=64, num_joints=17)
    x = jnp.ones((4, 8, 8, 64))
    variables = head.init(jax.random.PRNGKey(0), x, train=False)
    out = head.apply(variables, x, train=False)
    # 3 deconvs -> x8 (ref test_simple_baseline_head.py expects (4,17,64,64))
    assert out.shape == (4, 64, 64, 17)


def test_hrnet_head():
    head = HRNetHead(in_channels=32, num_joints=17)
    x = jnp.ones((4, 8, 8, 32))
    variables = head.init(jax.random.PRNGKey(0), x, train=False)
    out = head.apply(variables, x, train=False)
    assert out.shape == (4, 8, 8, 17)


def test_higher_hrnet_head():
    head = HigherHRNetHead(
        in_channels=32, num_joints=17, with_ae_loss=(True, False)
    )
    x = jnp.ones((4, 8, 8, 32))
    variables = head.init(jax.random.PRNGKey(0), x, train=False)
    outs = head.apply(variables, x, train=False)
    # ref test_higher_hrnet_head.py: (4,34,8,8) and (4,17,16,16) in NCHW
    assert outs[0].shape == (4, 8, 8, 34)
    assert outs[1].shape == (4, 16, 16, 17)
