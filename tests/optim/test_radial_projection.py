"""project_radial (optim_factory): the frozen-BN stabilizer.

Removes each BN-normalized conv filter's radial gradient component,
restoring the scale-invariance property exact BN backward provides
(docs/divergences.md #10).
"""
import jax
import jax.numpy as jnp
import numpy as np

import mindpose_tpu as mp
from mindpose_tpu.optim import create_optimizer
from mindpose_tpu.optim.optim_factory import (

    project_radial,
    radial_projection_mask,
)
import pytest

# JAX-compile-heavy: runs only in the full tier (pytest -m "" / no -m filter); the
# fast gate is `pytest -m "not slow"` — see README "Running the tests"
pytestmark = pytest.mark.slow


def test_projected_grad_is_orthogonal_per_channel():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(3, 3, 8, 16).astype(np.float32))
    g = jnp.asarray(rng.randn(3, 3, 8, 16).astype(np.float32))
    params = {"backbone": {"Conv_0": {"kernel": w}}}
    grads = {"backbone": {"Conv_0": {"kernel": g}}}
    tx = project_radial(radial_projection_mask(params))
    out, _ = tx.update(grads, tx.init(params), params)
    gp = out["backbone"]["Conv_0"]["kernel"]
    dots = np.asarray(jnp.sum(gp * w, axis=(0, 1, 2)))
    np.testing.assert_allclose(dots, np.zeros(16), atol=1e-4)
    # tangential component is untouched
    tang = g - w * (jnp.sum(g * w, axis=(0, 1, 2)) / jnp.sum(w * w, axis=(0, 1, 2)))
    np.testing.assert_allclose(np.asarray(gp), np.asarray(tang), rtol=1e-5, atol=1e-6)


def test_mask_spares_final_heatmap_conv():
    net = mp.create_network("hrnet_w32", "hrnet_head", dtype=jnp.float32)
    v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 48, 3)), train=False)
    mask = radial_projection_mask(v["params"])
    leaves = jax.tree_util.tree_leaves_with_path(mask)
    head_kernels = [
        (p, m) for p, m in leaves
        if (p[0].key if hasattr(p[0], "key") else str(p[0])) == "head"
    ]
    assert head_kernels, "expected head params in the mask"
    # hrnet_head's single final conv has no BN after it -> never projected
    assert all(m is False for _, m in head_kernels)
    back = [m for p, m in leaves if (p[0].key if hasattr(p[0], "key") else str(p[0])) == "backbone"]
    assert any(m is True for m in back)


def test_simple_baseline_head_deconvs_projected():
    net = mp.create_network("resnet50", "simple_baseline_head", dtype=jnp.float32)
    v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 48, 3)), train=False)
    mask = radial_projection_mask(v["params"])
    leaves = jax.tree_util.tree_leaves_with_path(mask)
    deconv = [m for p, m in leaves if any("ConvTranspose" in str(getattr(k, "key", k)) for k in p)]
    assert deconv and all(m is True for m in deconv)


def test_higher_hrnet_head_basic_blocks_projected():
    net = mp.create_network(
        "hrnet_w32", "higher_hrnet_head", dtype=jnp.float32,
        head_args={"with_ae_loss": (True, False)},
    )
    v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    mask = radial_projection_mask(v["params"])
    leaves = jax.tree_util.tree_leaves_with_path(mask)
    blocks = [m for p, m in leaves
              if any("BasicBlock" in str(getattr(k, "key", k)) for k in p)
              and str(getattr(p[-1], "key", p[-1])) == "kernel"]
    finals = [m for p, m in leaves
              if any("final" in str(getattr(k, "key", k)) for k in p)
              and str(getattr(p[-1], "key", p[-1])) == "kernel"]
    assert blocks and all(m is True for m in blocks)
    assert finals and all(m is False for m in finals)


def test_vit_patch_embed_not_projected():
    net = mp.create_network("vit_s", "simple_baseline_head", dtype=jnp.float32)
    v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 48, 3)), train=False)
    mask = radial_projection_mask(v["params"])
    leaves = jax.tree_util.tree_leaves_with_path(mask)
    pe = [m for p, m in leaves
          if any("patch_embed" in str(getattr(k, "key", k)) for k in p)]
    assert pe and all(m is False for m in pe)


def test_weight_decay_survives_projection():
    """The decay term is radial; it must be applied AFTER the projection
    (AdamP ordering), not cancelled by it."""
    w = jnp.ones((1, 1, 2, 4)) * 2.0
    params = {"backbone": {"Conv_0": {"kernel": w}}}
    tx = create_optimizer(
        params, "adamw", learning_rate=0.1, weight_decay=0.5,
        radial_projection=True,
    )
    st = tx.init(params)
    zero_g = jax.tree_util.tree_map(jnp.zeros_like, params)
    up, _ = tx.update(zero_g, st, params)
    u = np.asarray(up["backbone"]["Conv_0"]["kernel"])
    # zero gradient -> update must still be -lr*wd*w, not zero
    np.testing.assert_allclose(u, -0.1 * 0.5 * np.asarray(w), rtol=1e-6)


def test_non_adamw_rejects_projection():
    import pytest as _pytest

    params = {"backbone": {"Conv_0": {"kernel": jnp.ones((1, 1, 2, 2))}}}
    with _pytest.raises(ValueError):
        create_optimizer(params, "sgd", learning_rate=0.1, radial_projection=True)


def test_create_optimizer_accepts_knob_and_trains():
    params = {
        "backbone": {"Conv_0": {"kernel": jnp.ones((1, 1, 2, 2))}},
        "head": {"final": {"kernel": jnp.ones((1, 1, 2, 2)), "bias": jnp.zeros(2)}},
    }
    tx = create_optimizer(
        params, "adamw", learning_rate=1e-2, weight_decay=0.01, radial_projection=True
    )
    st = tx.init(params)
    g = jax.tree_util.tree_map(jnp.ones_like, params)
    up, _ = tx.update(g, st, params)
    # backbone kernel grad was all-radial (g parallel to w) -> update ~decay only
    import optax

    new = optax.apply_updates(params, up)
    assert np.all(np.isfinite(np.asarray(new["backbone"]["Conv_0"]["kernel"])))
