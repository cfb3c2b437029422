"""Registry and config-system tests."""
import os
import tempfile

import pytest
import yaml

import mindpose_tpu as mp
from mindpose_tpu.config import parse_args
from mindpose_tpu.register import entrypoint, has_component, list_components


def test_registered_component_names_parity():
    """The public string API a rebuild must honor (SURVEY.md §2.1)."""
    expected = {
        "backbone": ["resnet50", "resnet101", "resnet152", "hrnet_w32", "hrnet_w48"],
        "head": ["simple_baseline_head", "hrnet_head", "higher_hrnet_head"],
        "decoder": ["topdown_heatmap", "bottomup_heatmap_ae"],
        "loss": ["joint_mse", "joint_mse_with_mask", "ae", "ae_multi_loss"],
        "dataset": ["coco_topdown", "coco_bottomup", "imagefolder_bottomup"],
        "inferencer": ["topdown_heatmap", "bottomup_heatmap_ae"],
        "evaluator": ["topdown", "bottomup"],
        "optim": ["adam", "sgd", "momentum", "adagrad", "adamw"],
        "lr_scheduler": ["warmup_cosine_decay", "warmup_multi_step_decay"],
        "transform": [
            "topdown_box_to_center_scale", "topdown_affine",
            "topdown_generate_target", "topdown_horizontal_random_flip",
            "topdown_halfbody_transform", "topdown_randomscale_rotation",
            "bottomup_horizontal_random_flip", "bottomup_rescale",
            "bottomup_resize", "bottomup_random_affine",
            "bottomup_generate_target", "bottomup_pad",
        ],
    }
    for module, names in expected.items():
        registered = set(list_components(module))
        missing = set(names) - registered
        assert not missing, f"missing {module} components: {missing}"


def test_entrypoint_errors():
    with pytest.raises(ValueError, match="Unknown module"):
        entrypoint("nope", "x")
    with pytest.raises(ValueError, match="Unknown component"):
        entrypoint("backbone", "nope")
    assert has_component("backbone", "resnet50")
    assert not has_component("backbone", "nope")


def test_config_yaml_and_overrides():
    cfg = {
        "batch_size": 16,
        "lr": 0.001,
        "dataset_setting": {"image_size": [192, 256], "pixel_std": 200.0},
    }
    with tempfile.NamedTemporaryFile("w", suffix=".yaml", delete=False) as f:
        yaml.safe_dump(cfg, f)
        path = f.name
    try:
        args = parse_args(
            ["--config", path, "--cfg-options",
             "batch_size=32", "dataset_setting.pixel_std=100.0",
             "new_key='hello'"]
        )
        assert args.batch_size == 32
        assert args.lr == 0.001
        assert args.dataset_setting["pixel_std"] == 100.0
        assert args.dataset_setting["image_size"] == [192, 256]
        assert args.new_key == "hello"
        assert "lr" in args
        assert args.get("missing", 42) == 42
    finally:
        os.unlink(path)


def test_all_configs_parse():
    import glob

    configs = glob.glob("configs/**/*.yaml", recursive=True)
    assert len(configs) >= 11
    for path in configs:
        args = parse_args(["--config", path])
        # COCO recipes: 17 joints; MPII: 16; CrowdPose: 14
        expected = 16 if "mpii" in path else 14 if "crowdpose" in path else 17
        assert args.num_joints == expected
        assert args.pipeline_method in ("topdown", "bottomup")
        # every transform name must be registered
        for t in list(args.train_transforms) + list(args.val_transforms):
            name = t if isinstance(t, str) else list(t.keys())[0]
            assert has_component("transform", name), f"{path}: {name}"
        assert has_component("backbone", args.backbone_name)
        assert has_component("head", args.head_name)
        assert has_component("loss", args.loss)
        assert has_component("decoder", args.decoder_name)


def test_all_configs_build_objects():
    """Every shipped recipe must construct its model/loss/decoder/scheduler/
    optimizer through the factories (catches config<->factory kwargs drift
    that name-registration checks miss). Module construction only — no
    param init, so the 13-recipe sweep stays fast on CPU."""
    import glob

    import jax.numpy as jnp
    import numpy as np

    from mindpose_tpu.optim import create_optimizer
    from mindpose_tpu.scheduler import create_lr_scheduler

    for path in sorted(glob.glob("configs/**/*.yaml", recursive=True)):
        args = parse_args(["--config", path])
        net = mp.create_network(
            args.backbone_name,
            args.head_name,
            neck_name=args.neck_name,
            in_channels=args.in_channels,
            num_joints=args.num_joints,
            backbone_args=args.backbone_setting,
            head_args=args.head_setting,
            dtype=jnp.bfloat16,
        )
        assert net is not None, path
        loss = mp.create_loss(args.loss, **(args.loss_setting or {}))
        assert loss is not None, path
        decoder = mp.create_decoder(
            args.decoder_name, **(args.decoder_setting or {}))
        eval_net = mp.create_eval_network(net, decoder, output_raw=True)
        assert eval_net is not None, path
        sched = create_lr_scheduler(
            args.scheduler, lr=args.lr, total_epochs=args.num_epochs,
            steps_per_epoch=100, warmup=args.warmup,
            **(getattr(args, "lr_scheduler_setting", None) or {}))
        assert float(sched(0)) >= 0.0, path
        # block-indexed so recipes with optimizer_setting.layer_decay
        # (ViTPose) build too
        dummy_params = {
            "backbone": {"block_0": {
                "kernel": np.zeros((3, 3, 3, 4), np.float32),
                "bias": np.zeros((4,), np.float32)}},
            "head": {"kernel": np.zeros((3, 3, 3, 4), np.float32)},
        }
        tx = create_optimizer(
            dummy_params, args.optimizer, learning_rate=sched,
            weight_decay=args.weight_decay,
            filter_bias_and_bn=getattr(args, "filter_bias_and_bn", True),
            **(getattr(args, "optimizer_setting", None) or {}))
        tx.init(dummy_params)


def test_check_divergent_knobs():
    """Divergent training knobs are refused unless explicitly allowed."""
    from argparse import Namespace

    from mindpose_tpu.config import check_divergent_knobs

    # clean config: no-op
    check_divergent_knobs(Namespace())
    check_divergent_knobs(Namespace(backbone_setting={"bn_grad_stats": "exact"}))

    with pytest.raises(SystemExit, match="bn_grad_stats"):
        check_divergent_knobs(
            Namespace(backbone_setting={"bn_grad_stats": "frozen"})
        )
    with pytest.raises(SystemExit, match="radial_projection"):
        check_divergent_knobs(
            Namespace(optimizer_setting={"radial_projection": True})
        )
    # explicit opt-in downgrades to a warning
    check_divergent_knobs(
        Namespace(
            backbone_setting={"bn_grad_stats": "frozen_var"},
            optimizer_setting={"radial_projection": True},
            allow_divergent_knobs=True,
        )
    )


def test_cache_host_fingerprint():
    """Compilation-cache dir is namespaced by a stable host ISA fingerprint."""
    from mindpose_tpu.utils.cache import host_fingerprint

    fp = host_fingerprint()
    assert fp == host_fingerprint()  # stable within a host
    assert len(fp) == 12 and all(c in "0123456789abcdef" for c in fp)
