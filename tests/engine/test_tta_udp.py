"""hflip-TTA path and UDP end-to-end consistency tests."""
import sys
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "tests")

import mindpose_tpu as mp
from helpers import make_tiny_coco
from mindpose_tpu.data import create_dataset, create_pipeline
from mindpose_tpu.engine import create_evaluator, create_inferencer
from mindpose_tpu.optim import create_optimizer
from mindpose_tpu.parallel import build_train_step, create_train_state

# registers tiny_test_backbone
from tests.engine.test_train_eval_e2e import (  # noqa: F401
    EVAL_SETTING,
    TINY_SETTING,
)


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("coco"))
    img_root, ann = make_tiny_coco(root, num_images=4, people_per_img=1)

    transforms = [
        "topdown_box_to_center_scale",
        {"topdown_affine": {"use_udp": True}},
        {"topdown_generate_target": {"sigma": 1.5, "use_udp": True}},
    ]
    ds = create_dataset(img_root, ann, dataset_format="coco_topdown",
                        is_train=True, config=TINY_SETTING,
                        use_gt_bbox_for_val=True)
    loader = create_pipeline(ds, transforms, method="topdown", batch_size=4,
                             is_train=True, config=TINY_SETTING, num_workers=2)

    net = mp.create_network("tiny_test_backbone", "hrnet_head")
    loss = mp.create_loss("joint_mse", use_target_weight=True)
    nwl = mp.create_network_with_loss(net, loss, has_extra_inputs=True)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                         train=False)
    tx = create_optimizer(variables["params"], "adam", learning_rate=3e-3)
    state = create_train_state(variables, tx)
    step_fn = build_train_step(nwl, tx, mesh=None, donate=False)
    for _ in range(150):
        for batch in loader:
            state, _ = step_fn(
                state, jnp.asarray(batch["image"]), jnp.asarray(batch["target"]),
                jnp.asarray(batch["target_weight"]),
            )
    return img_root, ann, net, state


def _eval(img_root, ann, net, state, decoder_kwargs, eval_overrides):
    vds = create_dataset(img_root, ann, dataset_format="coco_topdown",
                         is_train=False, config=TINY_SETTING,
                         use_gt_bbox_for_val=True)
    val_transforms = ["topdown_box_to_center_scale",
                      {"topdown_affine": {"use_udp": decoder_kwargs.get("use_udp", False)}}]
    vloader = create_pipeline(vds, val_transforms, method="topdown",
                              batch_size=4, is_train=False, config=TINY_SETTING)
    decoder = mp.create_decoder("topdown_heatmap", **decoder_kwargs)
    eval_net = mp.create_eval_network(net, decoder, output_raw=True)
    eval_cfg = {**EVAL_SETTING, **eval_overrides}
    inferencer = create_inferencer(eval_net, name="topdown_heatmap",
                                   config=eval_cfg, dataset_config=TINY_SETTING)
    evaluator = create_evaluator(ann, name="topdown", metric=["AP"],
                                 config=eval_cfg, dataset_config=TINY_SETTING)
    outputs = inferencer(
        vloader, variables={"params": state.params, "batch_stats": state.batch_stats}
    )
    return evaluator(outputs)


def test_udp_end_to_end(trained):
    img_root, ann, net, state = trained
    result = _eval(img_root, ann, net, state,
                   {"use_udp": True, "dark_udp_refine": True, "kernel_size": 9},
                   {})
    # UDP-trained net decoded with UDP+DARK must localize (loose threshold)
    assert result["AP .5"] > 0.2, result


def test_hflip_tta_runs_and_matches(trained):
    img_root, ann, net, state = trained
    base = _eval(img_root, ann, net, state, {"use_udp": True}, {})
    tta = _eval(img_root, ann, net, state, {"use_udp": True},
                {"hflip_tta": True, "shift_heatmap": True})
    # TTA must not collapse the result; allow modest differences
    assert tta["AP .5"] >= base["AP .5"] * 0.5, (base, tta)


def test_predictor_serving_api(trained):
    from mindpose_tpu.engine import TopDownPredictor
    import cv2

    img_root, ann, net, state = trained
    predictor = TopDownPredictor(
        net,
        {"params": state.params, "batch_stats": state.batch_stats},
        dataset_setting=TINY_SETTING,
        decoder_setting={"use_udp": True},
        batch_size=4,
    )
    img = cv2.cvtColor(
        cv2.imread(f"{img_root}/000000000001.jpg"), cv2.COLOR_BGR2RGB
    )
    # two boxes (one real-ish, one partial) -> padding path exercised with 5
    boxes = np.array([[20, 30, 100, 180]] * 5, np.float32)
    preds = predictor(img, boxes)
    assert preds.shape == (5, 17, 3)
    # all predictions inside the image frame and identical across identical boxes
    assert (preds[..., 0] >= -10).all() and (preds[..., 0] <= img.shape[1] + 10).all()
    np.testing.assert_allclose(preds[0], preds[4], atol=1e-4)
