"""Mesh-sharded evaluation on the virtual 8-device CPU mesh.

Beyond the reference (rank-0-only eval, all other chips idle,
eval_callback.py:136-153): inference batches shard over the mesh data axis.
These tests pin sharded results to the unsharded ones, and batched bottom-up
eval (pad-to-max pipeline) to the inherited batch=1 behavior.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "tests")

import mindpose_tpu as mp
from helpers import make_tiny_coco
from mindpose_tpu.data import create_dataset, create_pipeline
from mindpose_tpu.engine import create_inferencer
from mindpose_tpu.parallel import create_mesh

# registers tiny_test_backbone
from tests.engine.test_train_eval_e2e import (  # noqa: F401

    BOTTOMUP_EVAL_SETTING,
    BOTTOMUP_SETTING,
    EVAL_SETTING,
    TINY_SETTING,
)

# JAX-compile-heavy: runs only in the full tier (pytest -m "" / no -m filter); the
# fast gate is `pytest -m "not slow"` — see README "Running the tests"
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("coco_sh"))
    return make_tiny_coco(root, num_images=5, people_per_img=2)  # 10 records


def _topdown_records(fixture, mesh, batch_size):
    img_root, ann = fixture
    net = mp.create_network("tiny_test_backbone", "hrnet_head")
    variables = net.init(jax.random.PRNGKey(3), jnp.zeros((1, 64, 64, 3)),
                         train=False)
    vds = create_dataset(img_root, ann, dataset_format="coco_topdown",
                         is_train=False, config=TINY_SETTING,
                         use_gt_bbox_for_val=True)
    vloader = create_pipeline(
        vds, ["topdown_box_to_center_scale", "topdown_affine"],
        method="topdown", batch_size=batch_size, is_train=False,
        config=TINY_SETTING)
    decoder = mp.create_decoder("topdown_heatmap", shift_coordinate=True)
    eval_net = mp.create_eval_network(net, decoder, output_raw=True)
    inferencer = create_inferencer(eval_net, name="topdown_heatmap",
                                   config=EVAL_SETTING,
                                   dataset_config=TINY_SETTING, mesh=mesh)
    return inferencer(vloader, variables=variables)


def test_topdown_sharded_matches_unsharded(fixture):
    mesh = create_mesh()  # 8 virtual CPU devices on the data axis
    base = _topdown_records(fixture, mesh=None, batch_size=4)
    sharded = _topdown_records(fixture, mesh=mesh, batch_size=4)

    assert len(base) == len(sharded) == 10
    by_id = lambda recs: sorted(recs, key=lambda r: (r["image_path"],
                                                     r["bbox_id"]))
    for a, b in zip(by_id(base), by_id(sharded)):
        assert a["bbox_id"] == b["bbox_id"]
        np.testing.assert_allclose(a["pred"], b["pred"], atol=1e-4)
        np.testing.assert_allclose(a["box"], b["box"], atol=1e-4)


def test_topdown_variables_from_foreign_mesh(fixture):
    """Variables committed to a different device set still evaluate.

    Models the multi-host shape of the bug (ADVICE r2): the train state's
    params are committed to the GLOBAL mesh by the sharded step, while eval
    runs on rank-0's LOCAL mesh. Mixing device sets inside one jit raises an
    incompatible-devices error unless the inferencer re-places the variables
    (Inferencer._place_variables). Single-process stand-in: train mesh =
    devices[:4], eval mesh = devices[4:] (disjoint).
    """
    devices = jax.devices()
    assert len(devices) >= 8
    train_mesh = create_mesh(devices[:4])
    eval_mesh = create_mesh(devices[4:8])

    img_root, ann = fixture
    net = mp.create_network("tiny_test_backbone", "hrnet_head")
    variables = net.init(jax.random.PRNGKey(3), jnp.zeros((1, 64, 64, 3)),
                         train=False)
    # commit params to the train mesh, as the sharded step's out_specs do
    from mindpose_tpu.parallel import replicated_sharding
    variables = jax.device_put(variables, replicated_sharding(train_mesh))

    vds = create_dataset(img_root, ann, dataset_format="coco_topdown",
                         is_train=False, config=TINY_SETTING,
                         use_gt_bbox_for_val=True)
    vloader = create_pipeline(
        vds, ["topdown_box_to_center_scale", "topdown_affine"],
        method="topdown", batch_size=4, is_train=False, config=TINY_SETTING)
    decoder = mp.create_decoder("topdown_heatmap", shift_coordinate=True)
    eval_net = mp.create_eval_network(net, decoder, output_raw=True)
    inferencer = create_inferencer(eval_net, name="topdown_heatmap",
                                   config=EVAL_SETTING,
                                   dataset_config=TINY_SETTING,
                                   mesh=eval_mesh)
    records = inferencer(vloader, variables=variables)
    assert len(records) == 10

    base = _topdown_records(fixture, mesh=None, batch_size=4)
    by_id = lambda recs: sorted(recs, key=lambda r: (r["image_path"],
                                                     r["bbox_id"]))
    for a, b in zip(by_id(base), by_id(records)):
        np.testing.assert_allclose(a["pred"], b["pred"], atol=1e-4)


def _bottomup_records(fixture, mesh, batch_size):
    img_root, ann = fixture
    net = mp.create_network(
        "tiny_test_backbone", "higher_hrnet_head",
        head_args={"with_ae_loss": (True, False), "num_deconv_filters": (32,)},
    )
    variables = net.init(jax.random.PRNGKey(5), jnp.zeros((1, 64, 64, 3)),
                         train=False)
    vds = create_dataset(img_root, ann, dataset_format="coco_bottomup",
                         is_train=False, config=BOTTOMUP_SETTING)
    vloader = create_pipeline(vds, ["bottomup_rescale", "bottomup_pad"],
                              method="bottomup", batch_size=batch_size,
                              is_train=False, config=BOTTOMUP_SETTING)
    decoder = mp.create_decoder(
        "bottomup_heatmap_ae", num_joints=17, num_stages=2,
        with_ae_loss=(True, False), use_nms=True, nms_kernel=3, max_num=10)
    eval_net = mp.create_eval_network(net, decoder, output_raw=True)
    inferencer = create_inferencer(eval_net, name="bottomup_heatmap_ae",
                                   config=BOTTOMUP_EVAL_SETTING,
                                   dataset_config=BOTTOMUP_SETTING, mesh=mesh)
    return inferencer(vloader, variables=variables)


def test_bottomup_batched_eval_matches_batch1(fixture):
    base = _bottomup_records(fixture, mesh=None, batch_size=1)
    batched = _bottomup_records(fixture, mesh=None, batch_size=2)

    assert len(base) == len(batched) == 5  # ragged final batch trimmed
    for a, b in zip(base, batched):
        assert a["image_path"] == b["image_path"]
        assert len(a["pred"]) == len(b["pred"])
        for pa, pb in zip(a["pred"], b["pred"]):
            np.testing.assert_allclose(pa, pb, atol=1e-3)


def test_bottomup_sharded_batched(fixture):
    mesh = create_mesh()
    base = _bottomup_records(fixture, mesh=None, batch_size=2)
    sharded = _bottomup_records(fixture, mesh=mesh, batch_size=2)
    assert len(base) == len(sharded) == 5
    for a, b in zip(base, sharded):
        for pa, pb in zip(a["pred"], b["pred"]):
            np.testing.assert_allclose(pa, pb, atol=1e-3)
