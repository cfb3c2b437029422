"""Backbone shape + parameter-count tests.

Mirrors the reference's shape tests (tests/models/backbones/test_resnet.py,
test_hrnet.py) in NHWC, and adds param-count checks against the published
Params(M) (SURVEY.md §6) which the reference lacks.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mindpose_tpu as mp

# JAX-compile-heavy: runs only in the full tier (pytest -m "" / no -m filter); the
# fast gate is `pytest -m "not slow"` — see README "Running the tests"
pytestmark = pytest.mark.slow



def _param_count(variables):
    params = sum(
        np.prod(p.shape) for p in jax.tree_util.tree_leaves(variables["params"])
    )
    stats = sum(
        np.prod(p.shape)
        for p in jax.tree_util.tree_leaves(variables.get("batch_stats", {}))
    )
    return params, stats


def test_resnet50_shape_and_params():
    backbone = mp.create_backbone("resnet50")
    x = jnp.ones((2, 32, 32, 3))
    variables = backbone.init(jax.random.PRNGKey(0), x, train=False)
    out = backbone.apply(variables, x, train=False)
    # 32/32 = 1 spatial, channels 2048 (ref test_resnet.py expects NCHW (4,2048,1,1))
    assert out.shape == (2, 1, 1, 2048)
    assert backbone.out_channels == 2048
    params, _ = _param_count(variables)
    # ResNet-50 trunk is ~23.5M params
    assert 23e6 < params < 26e6


@pytest.mark.slow
def test_hrnet_w32_shape_and_params():
    net = mp.create_network("hrnet_w32", "hrnet_head")
    x = jnp.ones((1, 32, 32, 3))
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    out = net.apply(variables, x, train=False)
    # stride-4 output with K=17 channels (ref test_hrnet.py: (4,32,8,8) backbone)
    assert out.shape == (1, 8, 8, 17)
    params, stats = _param_count(variables)
    # published Params(M) = 28.59 includes BN running stats
    assert abs((params + stats) / 1e6 - 28.59) < 0.06


def test_resnet_variants_registered():
    for name in ["resnet50", "resnet101", "resnet152", "hrnet_w32", "hrnet_w48"]:
        assert name in mp.list_components("backbone")
