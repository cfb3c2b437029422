"""Device input pipeline: one train step must match the host pipeline."""
import numpy as np
import jax
import jax.numpy as jnp

import mindpose_tpu as mp
from mindpose_tpu.data.device_pipeline import (
    DEVICE_FINAL_COLUMNS,
    build_topdown_preprocess,
    strip_host_target_transform,
)
from mindpose_tpu.data.transform.topdown_transform import TopDownGenerateTarget
from mindpose_tpu.optim import create_optimizer
from mindpose_tpu.parallel import build_train_step, create_train_state

CONFIG = {
    "image_size": [64, 64],
    "heatmap_size": [16, 16],
    "pixel_std": 200.0,
    "scale_padding": 1.25,
    "flip_pairs": [[1, 2]],
    "upper_body_ids": [0, 1],
}


def test_strip_host_target_transform():
    transforms = [
        "topdown_box_to_center_scale",
        "topdown_affine",
        {"topdown_generate_target": {"sigma": 3.0, "use_udp": True}},
    ]
    kept, kwargs = strip_host_target_transform(transforms)
    assert kept == ["topdown_box_to_center_scale", "topdown_affine"]
    assert kwargs == {"sigma": 3.0, "use_udp": True}


def test_device_step_matches_host_step():
    rng = np.random.RandomState(0)
    n, k = 4, 17
    images = rng.randint(0, 255, (n, 64, 64, 3)).astype(np.float32)
    kpts = np.zeros((n, k, 3), np.float32)
    kpts[..., 0] = rng.uniform(0, 63, (n, k))
    kpts[..., 1] = rng.uniform(0, 63, (n, k))
    kpts[..., 2] = 1.0

    mean = [0.485, 0.456, 0.406]
    std = [0.229, 0.224, 0.225]

    # host path: numpy encode + normalize
    host_t = TopDownGenerateTarget(is_train=True, config=CONFIG, sigma=2.0)
    targets, weights = [], []
    for i in range(n):
        out = host_t.transform({"keypoints": kpts[i].copy()})
        targets.append(out["target"])
        weights.append(out["target_weight"])
    targets = np.stack(targets)
    weights = np.stack(weights)
    images_norm = (images - np.array(mean) * 255.0) / (np.array(std) * 255.0)

    def make_step(preprocess):
        import flax.linen as nn
        from mindpose_tpu.models.networks import Net

        class Tiny(nn.Module):
            @nn.compact
            def __call__(self, x, train=True):
                x = nn.Conv(8, (3, 3), strides=(4, 4), padding="SAME")(x)
                return nn.relu(x)

        net = Net(backbone=Tiny(), head=mp.create_head("hrnet_head", 8, 17))
        loss = mp.create_loss("joint_mse", use_target_weight=True)
        nwl = mp.create_network_with_loss(net, loss, has_extra_inputs=True)
        variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                             train=False)
        tx = create_optimizer(variables["params"], "adam", learning_rate=1e-3)
        state = create_train_state(variables, tx)
        return build_train_step(nwl, tx, preprocess=preprocess, donate=False), state

    step_host, state_h = make_step(None)
    _, loss_host = step_host(
        state_h, jnp.asarray(images_norm.astype(np.float32)),
        jnp.asarray(targets), jnp.asarray(weights),
    )

    preprocess = build_topdown_preprocess(
        image_size=(64, 64), heatmap_size=(16, 16),
        normalize_mean=mean, normalize_std=std, sigma=2.0,
    )
    step_dev, state_d = make_step(preprocess)
    _, loss_dev = step_dev(state_d, jnp.asarray(images), jnp.asarray(kpts))

    np.testing.assert_allclose(
        float(jnp.sum(loss_dev)), float(jnp.sum(loss_host)), rtol=1e-5
    )
    assert DEVICE_FINAL_COLUMNS == ["image", "keypoints"]
