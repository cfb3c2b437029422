"""Train-time evaluation callback: val-while-train, best/last checkpoints,
metric logging.

Parity: /root/reference/mindpose/callbacks/eval_callback.py:16-238 — per-epoch
loss/lr logging, rank-0 inference + evaluation every ``interval`` epochs,
best-by-target-metric and last checkpoints, and scalar summaries (written as
a metrics.jsonl instead of MindSpore SummaryRecord).
"""
import json
import logging
import os
import time
from typing import Any, Dict, Optional

import numpy as np

from ..parallel.mesh import is_main_process
from ..utils.checkpoint import save_checkpoint
from ..utils.misc import AverageMeter, allreduce_mean

__all__ = ["EvalCallback"]


class EvalCallback:
    """Hooks: on_epoch_begin / on_step_end / on_epoch_end(state)."""

    def __init__(
        self,
        inferencer=None,
        evaluator=None,
        dataset_val=None,
        interval: int = 1,
        max_epoch: int = 1,
        save_best: bool = False,
        save_last: bool = False,
        best_ckpt_path: str = "./best.ckpt",
        last_ckpt_path: str = "./last.ckpt",
        target_metric_name: str = "AP",
        summary_dir: str = "./summary",
        rank_id: Optional[int] = None,
        device_num: Optional[int] = None,
        async_checkpoint: bool = False,
    ) -> None:
        self.inferencer = inferencer
        self.evaluator = evaluator
        self.dataset_val = dataset_val
        self.interval = interval
        self.max_epoch = max_epoch
        self.save_best = save_best
        self.save_last = save_last
        self.best_ckpt_path = best_ckpt_path
        self.last_ckpt_path = last_ckpt_path
        self.target_metric_name = target_metric_name
        # EPE/NME are error metrics (lower is better); everything else the
        # evaluators emit (AP/AR/PCK/AUC) is higher-is-better
        self._metric_sign = -1.0 if target_metric_name in ("EPE", "NME") else 1.0
        self.summary_dir = summary_dir
        self.rank_id = rank_id if rank_id is not None else 0
        self.device_num = device_num or 1
        # move msgpack serialization + disk write off the train loop
        # (utils/checkpoint.py:save_checkpoint async_write)
        self.async_checkpoint = async_checkpoint

        self.best_metric = -np.inf
        self.loss_meter = AverageMeter()
        self._epoch_start = 0.0
        self._metrics_file = None
        if self._is_rank0():
            os.makedirs(summary_dir, exist_ok=True)
            self._metrics_file = os.path.join(summary_dir, "metrics.jsonl")

    def _is_rank0(self) -> bool:
        return self.rank_id == 0 and is_main_process()

    def _write_summary(self, record: Dict[str, Any]) -> None:
        if self._metrics_file:
            with open(self._metrics_file, "a") as f:
                f.write(json.dumps(record) + "\n")

    def on_epoch_begin(self, epoch: int) -> None:
        self.loss_meter.reset()
        self._loss_vectors = []
        self._epoch_start = time.time()

    def on_step_end(self, loss_vector: Any, n: int = 1) -> None:
        # keep the device array; converting per-step would force a host sync
        # every step and serialize the async dispatch pipeline
        self._loss_vectors.append(loss_vector)

    def on_epoch_end(self, epoch: int, state: Any, lr: float,
                     ema_params: Any = None) -> Dict[str, Any]:
        """Log, maybe evaluate, maybe checkpoint. Returns eval metrics (or {}).

        ``ema_params``: when given, evaluation runs on the EMA weights (the
        standard weight-averaging eval) and best/last saves also write a
        ``<path>.ema`` file with {"params": ema} next to the train state.
        """
        epoch_time = time.time() - self._epoch_start
        if self._loss_vectors:
            stacked = np.stack([np.atleast_1d(np.asarray(v)) for v in self._loss_vectors])
            self._last_loss_vector = stacked.mean(axis=0)
            self.loss_meter.update(float(stacked.sum(axis=1).mean()), len(stacked))
        else:
            self._last_loss_vector = None
        loss_avg = float(allreduce_mean(np.asarray(self.loss_meter.avg)))
        logging.info(
            "epoch: [%d/%d], loss: %.6f, lr: %.6f, time: %.1fs",
            epoch, self.max_epoch, loss_avg, lr, epoch_time,
        )

        record: Dict[str, Any] = {
            "epoch": epoch,
            "train/loss": loss_avg,
            "train/lr": float(lr),
            "train/epoch_time": epoch_time,
        }
        if getattr(self, "_last_loss_vector", None) is not None and len(
            self._last_loss_vector
        ) > 1:
            for i, v in enumerate(self._last_loss_vector):
                record[f"train/loss_{i}"] = float(v)

        metrics: Dict[str, Any] = {}
        run_eval = (
            self.inferencer is not None
            and self.evaluator is not None
            and self.dataset_val is not None
            and (epoch % self.interval == 0 or epoch == self.max_epoch)
        )
        if self.save_last or self.save_best or run_eval:
            # multi-host FSDP shards params/opt-state across processes; the
            # rank-gated checkpoint write / eval below needs full values on
            # this host. Collective — all ranks reach this line. No-op for
            # DP (replicated) and single-host states.
            from ..parallel.fsdp import replicate_sharded

            state = replicate_sharded(state)
            if ema_params is not None:
                ema_params = replicate_sharded(ema_params)
        if self._is_rank0():
            if self.save_last:
                save_checkpoint(self.last_ckpt_path, state,
                                async_write=self.async_checkpoint)
                if ema_params is not None:
                    save_checkpoint(self.last_ckpt_path + ".ema",
                                    {"params": ema_params},
                                    async_write=self.async_checkpoint)
            if run_eval:
                variables = {
                    "params": state.params if ema_params is None
                    else ema_params,
                    "batch_stats": state.batch_stats,
                }
                outputs = self.inferencer(self.dataset_val, variables=variables)
                metrics = self.evaluator(outputs)
                for name, value in metrics.items():
                    record[f"val/{name}"] = float(value)
                target = float(metrics[self.target_metric_name])
                logging.info("epoch: [%d/%d], %s%s: %.4f", epoch,
                             self.max_epoch, self.target_metric_name,
                             " (EMA)" if ema_params is not None else "",
                             target)
                if (
                    self.save_best
                    and self._metric_sign * target > self.best_metric
                ):
                    self.best_metric = self._metric_sign * target
                    save_checkpoint(self.best_ckpt_path, state,
                                    async_write=self.async_checkpoint)
                    if ema_params is not None:
                        save_checkpoint(self.best_ckpt_path + ".ema",
                                        {"params": ema_params},
                                        async_write=self.async_checkpoint)
                    logging.info("best %s = %.4f, checkpoint saved.",
                                 self.target_metric_name, target)
            self._write_summary(record)
        return metrics
