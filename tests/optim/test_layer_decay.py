"""Layer-wise lr decay (ViTPose fine-tuning recipe, arXiv:2204.12484)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mindpose_tpu.optim import create_optimizer
from mindpose_tpu.optim.optim_factory import layer_decay_scales


def _vit_like_params():
    leaf = lambda: jnp.ones((4, 4))
    return {
        "backbone": {
            "patch_embed": {"kernel": leaf()},
            "pos_embedding": leaf(),
            "block_0": {"Dense_0": {"kernel": leaf()}},
            "block_1": {"Dense_0": {"kernel": leaf()}},
            "norm": {"scale": jnp.ones((4,))},
        },
        "head": {"final_layer": {"kernel": leaf()}},
    }


def test_layer_decay_scales_schedule():
    params = _vit_like_params()
    scales = layer_decay_scales(params, 0.5)
    # depth=2: head/final-norm full lr; block_1 0.5; block_0 0.25; embeds 0.125
    assert scales["head"]["final_layer"]["kernel"] == 1.0
    assert scales["backbone"]["norm"]["scale"] == 1.0
    assert scales["backbone"]["block_1"]["Dense_0"]["kernel"] == 0.5
    assert scales["backbone"]["block_0"]["Dense_0"]["kernel"] == 0.25
    assert scales["backbone"]["patch_embed"]["kernel"] == 0.125
    assert scales["backbone"]["pos_embedding"] == 0.125


def test_layer_decay_rejects_cnn_tree():
    with pytest.raises(ValueError, match="block-indexed"):
        layer_decay_scales({"backbone": {"conv1": {"kernel": jnp.ones((3, 3))}}},
                           0.75)


def test_layer_decay_scales_adamw_updates():
    params = _vit_like_params()
    lr = 1e-3
    tx = create_optimizer(params, name="adamw", learning_rate=lr,
                          weight_decay=0.0, layer_decay=0.5)
    opt_state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    # adamw's first step on all-ones grads yields magnitude ~lr everywhere;
    # the post-scale must turn that into lr * layer multiplier
    got_head = float(np.abs(updates["head"]["final_layer"]["kernel"]).mean())
    got_b0 = float(np.abs(updates["backbone"]["block_0"]["Dense_0"]["kernel"]).mean())
    np.testing.assert_allclose(got_head, lr, rtol=1e-3)
    np.testing.assert_allclose(got_b0, lr * 0.25, rtol=1e-3)


def test_layer_decay_validated():
    params = _vit_like_params()
    with pytest.raises(ValueError, match="layer_decay"):
        create_optimizer(params, name="adamw", learning_rate=1e-3,
                         layer_decay=1.5)
