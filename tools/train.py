"""Training CLI: config-driven end-to-end training on TPU.

TPU-native re-assembly of the reference trainer (/root/reference/tools/train.py:36-233):
the MindSpore ``Model.train(sink_mode)`` + mpirun/HCCL stack is replaced by a
jitted shard_map train step over a jax.sharding.Mesh, with per-process data
sharding in the loader and rank-0-gated eval/checkpointing.

Usage:
    python tools/train.py --config configs/hrnet/hrnet_w32_ascend.yaml \
        [--cfg-options num_epochs=1 batch_size=32 ...]
"""
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from common.platform import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp
import numpy as np

from mindpose_tpu.callbacks import EvalCallback
from mindpose_tpu.config import check_divergent_knobs, parse_args
from mindpose_tpu.data import FINAL_COLUMN_MAP, create_dataset, create_pipeline
from mindpose_tpu.engine import create_evaluator, create_inferencer
from mindpose_tpu.models import (
    create_decoder,
    create_eval_network,
    create_loss,
    create_network,
    create_network_with_loss,
)
from mindpose_tpu.optim import create_optimizer
from mindpose_tpu.parallel import (
    build_ema_update,
    build_fsdp_train_step,
    build_train_step,
    create_mesh,
    create_train_state,
    fsdp_batch_spec,
    shard_batch,
    shard_train_state,
)
from mindpose_tpu.scheduler import create_lr_scheduler
from mindpose_tpu.utils import (
    StepTimer,
    load_pretrained_backbone,
    restore_train_state,
    wait_pending_checkpoints,
)
from common.log import setup_default_logging
from mindpose_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def train(args) -> None:
    check_divergent_knobs(args)
    # ---- runtime / distributed context (ref train.py:38-55) ----
    # multi-host: one process per host, bootstrapped by jax.distributed
    # (replaces the reference's mpirun + HCCL stack). On TPU pods the
    # coordinator is auto-detected from the environment.
    coord = os.environ.get("MINDPOSE_COORDINATOR")
    if coord:
        # explicit bootstrap from tools/launch_pod.py (non-TPU-pod clusters)
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["MINDPOSE_NUM_PROCESSES"]),
            process_id=int(os.environ["MINDPOSE_PROCESS_ID"]),
        )
    elif getattr(args, "distributed_init", False):
        jax.distributed.initialize()

    devices = jax.devices()
    process_count = jax.process_count()
    rank_id = jax.process_index()
    use_mesh = getattr(args, "distribute", False) or len(devices) > 1
    # parallel_mode: "data" (default, shard_map DP matching the reference's
    # strategy) or "fsdp" (GSPMD param/opt-state sharding over the model
    # axis — for ViT-L/H-scale models whose AdamW state won't replicate).
    parallel_mode = str(getattr(args, "parallel_mode", "data") or "data").lower()
    if parallel_mode not in ("data", "fsdp"):
        raise ValueError(f"unknown parallel_mode: {parallel_mode!r}")
    if use_mesh and parallel_mode == "fsdp":
        fsdp_size = int(getattr(args, "model_parallel", 0) or 0) or len(devices)
        mesh = create_mesh(model_parallel=fsdp_size)
    elif use_mesh:
        mesh = create_mesh()
    else:
        mesh = None
    batch_spec = fsdp_batch_spec() if parallel_mode == "fsdp" else None
    n_local = jax.local_device_count() if use_mesh else 1
    logging.info(
        "devices: %d (%s), processes: %d, rank: %d, mesh: %s",
        len(devices), devices[0].platform, process_count, rank_id,
        mesh.shape if mesh else None,
    )

    # seed host-side augmentation RNG per process (the loader's shuffle has
    # its own epoch-seeded stream; transforms use the global numpy stream)
    np.random.seed((getattr(args, "seed", 0) or 0) + rank_id)

    amp = getattr(args, "amp_level", "O0")
    dtype = jnp.bfloat16 if amp not in ("O0", None) else jnp.float32

    # per-device batch (config semantics) -> per-process batch for the loader
    per_process_batch = args.batch_size * n_local

    # ---- data (ref train.py:58-106) ----
    dataset_train = create_dataset(
        args.train_root,
        args.train_label,
        dataset_format=args.dataset_format,
        is_train=True,
        device_num=process_count,
        rank_id=rank_id,
        num_workers=getattr(args, "num_parallel_workers", 4),
        config=args.dataset_setting,
    )
    # on-device pipeline (data/device_pipeline.py):
    #   true -> host stops at the affine crop; normalize + target encode
    #           fuse into the jitted train step
    #   full -> host stops at JPEG decode; warp matrices ship with whole
    #           uint8 frames (size-bucketed) and warp+normalize+encode all
    #           run on device
    device_pipeline = getattr(args, "device_pipeline", False)
    train_transforms = args.train_transforms
    preprocess = None
    final_columns_override = None
    image_bucket = None
    if device_pipeline and args.pipeline_method == "bottomup":
        from mindpose_tpu.data.device_pipeline import (
            BOTTOMUP_DEVICE_FINAL_COLUMNS,
            build_bottomup_preprocess,
        )

        # swap the host Gaussian rasterizer for the tag-only transform; the
        # multi-level targets render inside the jitted step
        sigma = 2.0
        swapped = []
        for t in train_transforms:
            name = t if isinstance(t, str) else next(iter(t))
            if name == "bottomup_generate_target":
                kwargs = dict() if isinstance(t, str) else dict(
                    next(iter(t.values())) or {})
                sigma = float(kwargs.get("sigma", 2.0))
                swapped.append({"bottomup_generate_tag_ind": kwargs})
            else:
                swapped.append(t)
        train_transforms = swapped
        preprocess = build_bottomup_preprocess(
            heatmap_sizes=args.dataset_setting["heatmap_sizes"],
            normalize_mean=args.normalize_mean,
            normalize_std=args.normalize_std,
            sigma=sigma,
        )
        final_columns_override = BOTTOMUP_DEVICE_FINAL_COLUMNS
        logging.info("device input pipeline enabled (bottom-up on-device "
                     "encode)")
    elif device_pipeline and args.pipeline_method == "topdown":
        from mindpose_tpu.data.device_pipeline import (
            DEVICE_FINAL_COLUMNS,
            DEVICE_FULL_FINAL_COLUMNS,
            build_topdown_full_preprocess,
            build_topdown_preprocess,
            strip_host_target_transform,
            to_matrix_transforms,
        )

        train_transforms, target_kwargs = strip_host_target_transform(
            train_transforms
        )
        pp_kwargs = dict(
            image_size=args.dataset_setting["image_size"],
            heatmap_size=args.dataset_setting["heatmap_size"],
            normalize_mean=args.normalize_mean,
            normalize_std=args.normalize_std,
            **target_kwargs,
        )
        if str(device_pipeline).lower() == "full":
            train_transforms = to_matrix_transforms(train_transforms)
            preprocess = build_topdown_full_preprocess(**pp_kwargs)
            final_columns_override = DEVICE_FULL_FINAL_COLUMNS
            image_bucket = int(getattr(args, "image_bucket", 64) or 64)
            logging.info(
                "device input pipeline: FULL (on-device warp+encode, "
                "frame bucket %d)", image_bucket,
            )
        else:
            preprocess = build_topdown_preprocess(**pp_kwargs)
            final_columns_override = DEVICE_FINAL_COLUMNS
            logging.info("device input pipeline enabled (on-device encode)")

    loader_train = create_pipeline(
        dataset_train,
        transforms=train_transforms,
        method=args.pipeline_method,
        batch_size=per_process_batch,
        is_train=True,
        normalize=not device_pipeline,
        normalize_mean=args.normalize_mean,
        normalize_std=args.normalize_std,
        num_workers=getattr(args, "num_parallel_workers", 4),
        config=args.dataset_setting,
        seed=getattr(args, "seed", 0) or 0,
        final_columns=final_columns_override,
        image_bucket=image_bucket,
        decode_cache_mb=getattr(args, "decode_cache_mb", 0) or 0,
        # shuffle frames, not records: makes the decode-cache hit rate
        # (records/frame - 1)/records/frame on any dataset size
        frame_grouped_shuffle=bool(
            getattr(args, "frame_grouped_shuffle", False)),
        # full mode: same-bucket-shape batches so one large source patch
        # doesn't inflate the whole batch's padding (docs/performance.md)
        patch_grouped_batching=bool(
            getattr(args, "patch_grouped_batching", False)),
    )

    val_while_train = getattr(args, "val_while_train", False)
    loader_val = None
    if val_while_train:
        dataset_val = create_dataset(
            args.val_root,
            args.val_label,
            dataset_format=args.dataset_format,
            is_train=False,
            use_gt_bbox_for_val=getattr(args, "val_use_gt_bbox", True),
            detection_file=getattr(args, "val_detection_result", None),
            num_workers=getattr(args, "num_parallel_workers", 4),
            config=args.dataset_setting,
        )
        loader_val = create_pipeline(
            dataset_val,
            transforms=args.val_transforms,
            method=args.pipeline_method,
            # eval runs on rank-0's chip only (no sharding): per-device batch
            batch_size=args.batch_size,
            is_train=False,
            normalize_mean=args.normalize_mean,
            normalize_std=args.normalize_std,
            num_workers=getattr(args, "num_parallel_workers", 4),
            config=args.dataset_setting,
        )

    # ---- model (ref train.py:111-140) ----
    net = create_network(
        backbone_name=args.backbone_name,
        head_name=args.head_name,
        neck_name=getattr(args, "neck_name", "") or "",
        backbone_pretrained=getattr(args, "backbone_pretrained", False),
        backbone_ckpt_url=getattr(args, "backbone_ckpt_url", "") or "",
        in_channels=getattr(args, "in_channels", 3),
        neck_out_channels=getattr(args, "neck_out_channels", None) or 256,
        num_joints=args.num_joints,
        backbone_args=getattr(args, "backbone_setting", None),
        neck_args=getattr(args, "neck_setting", None),
        head_args=getattr(args, "head_setting", None),
        dtype=dtype,
    )

    image_size = args.dataset_setting["image_size"]
    dummy = jnp.zeros((1, image_size[1], image_size[0], 3), jnp.float32)
    rng = jax.random.PRNGKey(getattr(args, "seed", 0) or 0)
    variables = net.init(rng, dummy, train=False)

    # URL or local path; load_pretrained_backbone resolves either
    # (ref models/backbones/utils.py:10-42)
    pretrained_path = getattr(args, "backbone_ckpt_url", "") or ""
    if getattr(args, "backbone_pretrained", False):
        if pretrained_path:
            variables = load_pretrained_backbone(pretrained_path, variables)
        else:
            logging.warning(
                "backbone_pretrained=True but backbone_ckpt_url is empty — "
                "training from scratch"
            )

    loss = create_loss(args.loss, **(getattr(args, "loss_setting", None) or {}))
    net_with_loss = create_network_with_loss(
        net, loss, has_extra_inputs=getattr(args, "loss_with_extra_input", False)
    )

    # ---- lr scheduler + optimizer (ref train.py:143-160) ----
    steps_per_epoch = len(loader_train)
    lr_scheduler = create_lr_scheduler(
        args.scheduler,
        lr=args.lr,
        total_epochs=args.num_epochs,
        steps_per_epoch=steps_per_epoch,
        warmup=getattr(args, "warmup", 0),
        **(getattr(args, "lr_scheduler_setting", None) or {}),
    )
    tx = create_optimizer(
        variables["params"],
        name=args.optimizer,
        learning_rate=lr_scheduler,
        weight_decay=getattr(args, "weight_decay", 0.0),
        filter_bias_and_bn=getattr(args, "filter_bias_and_bn", True),
        **(getattr(args, "optimizer_setting", None) or {}),
    )
    state = create_train_state(variables, tx)

    # ---- resume (ref train.py:163-167) ----
    if getattr(args, "ckpt", None):
        state = restore_train_state(args.ckpt, state)

    # ---- knowledge distillation (beyond ref; models/distill.py) ----
    distill_setting = getattr(args, "distill_setting", None)
    if distill_setting:
        from mindpose_tpu.models.distill import (
            build_teacher,
            build_teacher_preprocess,
        )

        teacher_net, teacher_vars = build_teacher(
            distill_setting, num_joints=args.num_joints,
            in_channels=getattr(args, "in_channels", 3),
        )
        preprocess = build_teacher_preprocess(
            teacher_net, teacher_vars, base_preprocess=preprocess
        )
        logging.info(
            "distillation: teacher %s/%s from %s",
            distill_setting["teacher_backbone"],
            distill_setting["teacher_head"],
            distill_setting["teacher_ckpt"],
        )

    # grad_accum_steps > 1: sequential microbatches per optimizer step
    # (exact for LayerNorm models; BN batch stats become per-microbatch —
    # parallel/train.py:accum_loss_and_grads)
    accum_steps = int(getattr(args, "grad_accum_steps", 1) or 1)
    if accum_steps > 1:
        logging.info("gradient accumulation: %d microbatches/step", accum_steps)

    if mesh is not None and parallel_mode == "fsdp":
        # place params/opt-state as shards before the first step: the full
        # replicated state may not even fit per-chip at ViT-L/H scale
        state = shard_train_state(state, mesh)
        step_fn = build_fsdp_train_step(
            net_with_loss, tx, mesh=mesh, state=state, preprocess=preprocess,
            accum_steps=accum_steps,
        )
    else:
        step_fn = build_train_step(
            net_with_loss, tx, mesh=mesh, preprocess=preprocess,
            accum_steps=accum_steps,
        )

    # ema_decay > 0: keep an exponential moving average of the params;
    # eval runs on the EMA weights and best/last saves add a .ema file.
    # Initialized AFTER shard_train_state so the EMA copy inherits the FSDP
    # sharding (a replicated copy would defeat the sharding at ViT-H scale).
    ema_decay = float(getattr(args, "ema_decay", 0.0) or 0.0)
    ema_params = None
    ema_step = None
    if ema_decay:
        if not 0.0 < ema_decay < 1.0:
            raise ValueError(f"ema_decay must be in (0, 1), got {ema_decay}")
        # a REAL device copy (identity tree.map aliases the buffers, which
        # the first donated train step would delete out from under the EMA)
        ema_params = jax.tree.map(jnp.copy, state.params)
        ema_path = (getattr(args, "ckpt", None) or "") + ".ema"
        if getattr(args, "ckpt", None) and os.path.exists(ema_path):
            from mindpose_tpu.utils import load_checkpoint

            ema_params = load_checkpoint(
                ema_path, {"params": ema_params})["params"]
            logging.info("resumed EMA params from %s", ema_path)
        ema_step = build_ema_update(ema_decay)
        logging.info("EMA enabled (decay %.4f): eval uses averaged weights",
                     ema_decay)

    # ---- eval engines (ref train.py:184-206) ----
    inferencer = evaluator = None
    if val_while_train:
        decoder = create_decoder(
            args.decoder_name, **(getattr(args, "decoder_setting", None) or {})
        )
        eval_net = create_eval_network(
            net, decoder, output_raw=args.eval_setting.get("has_heatmap_output", True)
        )
        # shard val inference over the mesh (beyond ref: their eval idles
        # all but rank 0, eval_callback.py:136-153); sharded_eval=False
        # restores the single-device behavior. Eval runs on rank 0 only, so
        # multi-host training must NOT hand the inferencer the global mesh —
        # rank 0 would issue collectives on devices the other (training-only)
        # processes never join. Shard over rank-0's local chips instead.
        if not args.eval_setting.get("sharded_eval", True):
            eval_mesh = None
        elif jax.process_count() > 1:
            eval_mesh = create_mesh(jax.local_devices())
        elif parallel_mode == "fsdp":
            # eval shards the BATCH; the fsdp mesh's data axis may be 1, so
            # hand the inferencer a pure-DP mesh over the same devices
            # (params replicate for eval — no opt state, f32 ViT-L is 1.2 GB)
            eval_mesh = create_mesh(devices)
        else:
            eval_mesh = mesh
        inferencer = create_inferencer(
            eval_net,
            name=args.inference_method,
            config=args.eval_setting,
            dataset_config=args.dataset_setting,
            mesh=eval_mesh,
        )
        evaluator = create_evaluator(
            args.val_label,
            name=args.eval_method,
            metric=args.eval_metric,
            config=args.eval_setting,
            dataset_config=args.dataset_setting,
            num_joints=args.num_joints,
        )

    # ---- callbacks (ref train.py:212-229) ----
    config_name = os.path.splitext(os.path.basename(args.config))[0]
    ckpt_dir = getattr(args, "ckpt_save_dir", "./ckpt")
    callback = EvalCallback(
        inferencer=inferencer,
        evaluator=evaluator,
        dataset_val=loader_val,
        interval=getattr(args, "val_interval", 1),
        max_epoch=args.num_epochs,
        save_best=getattr(args, "save_best", False),
        save_last=getattr(args, "save_last", False),
        best_ckpt_path=os.path.join(ckpt_dir, f"{config_name}_best.ckpt"),
        last_ckpt_path=os.path.join(ckpt_dir, f"{config_name}_last.ckpt"),
        target_metric_name=args.eval_metric[0]
        if isinstance(args.eval_metric, list)
        else args.eval_metric,
        summary_dir=os.path.join(ckpt_dir, "summary"),
        rank_id=rank_id,
        device_num=process_count,
        # async_checkpoint: true -> serialization + disk write happen off
        # the train loop (GBs per save at ViT-H scale)
        async_checkpoint=bool(getattr(args, "async_checkpoint", False)),
    )

    # ---- train loop (replaces model.train(sink_mode), ref train.py:233) ----
    final_columns = (
        final_columns_override
        or FINAL_COLUMN_MAP[args.pipeline_method]["train"]
    )
    from mindpose_tpu.utils.profiler import trace

    # `device_prefetch: N` overlaps host->device transfer with the step
    # (N batches ahead); 0/absent keeps the synchronous transfer.
    device_prefetch = int(getattr(args, "device_prefetch", 0) or 0)
    if device_prefetch:
        from mindpose_tpu.data import DevicePrefetcher

        prefetcher = DevicePrefetcher(
            loader_train, final_columns, mesh=mesh, depth=device_prefetch,
            spec=batch_spec,
        )
        logging.info("device prefetch enabled (depth %d)", device_prefetch)

        def device_batches():
            return iter(prefetcher)

    else:

        def device_batches():
            for batch in loader_train:
                yield shard_batch(
                    [np.ascontiguousarray(batch[c]) for c in final_columns],
                    mesh,
                    spec=batch_spec,
                )

    profile = getattr(args, "profile", False)
    profile_dir = getattr(args, "profile_dir", os.path.join(ckpt_dir, "trace"))
    try:
        for epoch in range(1, args.num_epochs + 1):
            timer = StepTimer()  # per-epoch: first epoch includes compile time
            callback.on_epoch_begin(epoch)
            # profile the 2nd epoch (1st is compile-dominated)
            with trace(profile_dir, enabled=profile and epoch == 2):
                batches = iter(device_batches())
                while True:
                    timer.start()
                    try:
                        arrays = next(batches)
                    except StopIteration:
                        break
                    state, loss_vec = step_fn(state, *arrays)
                    if ema_step is not None:
                        ema_params = ema_step(ema_params, state.params)
                    callback.on_step_end(loss_vec)
                    timer.stop(arrays[0].shape[0])
            lr_now = float(lr_scheduler(int(state.step)))
            callback.on_epoch_end(epoch, state, lr_now, ema_params=ema_params)
            logging.info(
                "throughput: %.1f images/sec (%.1f/chip)",
                timer.images_per_sec * process_count,
                timer.images_per_sec * process_count / max(len(devices), 1),
            )
        wait_pending_checkpoints()
    except BaseException:
        # crash-resume: persist the last completed state before propagating
        # (the reference's closest analogue is the OpenI try/finally upload,
        # train_on_openi.py:154-162)
        if rank_id == 0:
            crash_path = os.path.join(ckpt_dir, f"{config_name}_crash.ckpt")
            try:
                from mindpose_tpu.utils import save_checkpoint

                save_checkpoint(crash_path, state)
                logging.error("crash checkpoint saved to %s", crash_path)
            except Exception:
                logging.exception("failed to save crash checkpoint")
        raise


def main() -> None:
    setup_default_logging()
    args = parse_args(description="mindpose_tpu training")
    train(args)


if __name__ == "__main__":
    main()
