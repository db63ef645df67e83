"""Trainer: epoch loop, data-parallel steps, orbax checkpoints, metering.

Behavioral equivalent of /root/reference/training/trainer.py (Trainer :141,
run :499, train_epoch :703, _run_step :845, save_checkpoint :324,
load_checkpoint :382) re-designed for JAX:
  * DDP/NCCL -> batch sharded over a jax.sharding Mesh 'data' axis;
  * AMP/GradScaler -> native bf16 matmuls with fp32 loss (no scaler);
  * torch checkpoints -> orbax (params + opt_state + step counter);
  * TensorBoard meters -> stdlib logging + JSONL scalars (+ TensorBoard via
    torch.utils.tensorboard when available);
  * NaN-loss abort (trainer.py:874-878) preserved.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
import re
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from det_sam2_tpu.configs import SAM2Config
from det_sam2_tpu.parallel.mesh import make_mesh, shard_batch
from det_sam2_tpu.track import SAM2Engine
from det_sam2_tpu.training.loss_fns import CORE_LOSS_KEY
from det_sam2_tpu.training.sam2_train import (
    PromptSchedule,
    PromptSimConf,
    sample_prompt_schedule,
)
from det_sam2_tpu.training.train_step import (
    OptimConf,
    make_optimizer,
    make_train_step,
)

logger = logging.getLogger("det_sam2_tpu.trainer")


@dataclasses.dataclass
class TrainerConf:
    num_epochs: int = 1
    steps_per_epoch: int = 100
    log_every: int = 10
    checkpoint_every_epochs: int = 1
    checkpoint_dir: Optional[str] = None
    prompt_kind_probs: dict = dataclasses.field(
        # legacy single-knob mode (one prompt kind per step, corrections on
        # init frames only); superseded by prompt_sim below
        default_factory=lambda: {"box": 0.5, "point": 0.3, "mask": 0.2}
    )
    num_correction_steps: int = 2
    # full reference prompt simulation (SAM2Train prepare_prompt_inputs):
    # random 1..N init cond frames, mid-sequence frames-to-correct, per-frame
    # box/point choice, 7 correction clicks, GT-sampling prob. When set,
    # prompt_kind_probs is ignored. Each distinct sampled schedule compiles
    # once (cached; the persistent compilation cache amortizes across runs).
    prompt_sim: Optional["PromptSimConf"] = None
    clip_length: int = 8  # frames per clip (schedules are sampled per step)
    seed: int = 0
    # requeue / preemption story (the TPU-pod analogue of the reference's
    # SLURM requeue, training/train.py submitit + trainer resume): when
    # True, run() first restores the newest ckpt_* under checkpoint_dir,
    # and a SIGTERM (maintenance-event preemption) checkpoints the current
    # epoch before the process exits so the relaunched job resumes there.
    auto_resume: bool = False
    checkpoint_on_sigterm: bool = False


class AverageMeter:
    """(training/utils/train_utils.py:158-180)"""

    def __init__(self, name: str):
        self.name = name
        self.reset()

    def reset(self):
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.sum += val * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)


def human_readable_time(time_seconds: float) -> str:
    """(train_utils.py:224-229)"""
    t = int(time_seconds)
    minutes, seconds = divmod(t, 60)
    hours, minutes = divmod(minutes, 60)
    days, hours = divmod(hours, 24)
    return f"{days:02}d {hours:02}h {minutes:02}m"


class MemMeter:
    """Per-iteration peak device-memory usage in GiB
    (train_utils.py:185-222, torch.cuda.max_memory_allocated -> the JAX
    device's memory_stats peak)."""

    def __init__(self, name: str, device=None):
        self.name = name
        self.device = device
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0
        self.peak = 0.0

    def update(self, n: int = 1):
        dev = self.device or jax.local_devices()[0]
        stats = dev.memory_stats() or {}
        self.val = (
            stats.get("peak_bytes_in_use", stats.get("bytes_in_use", 0))
            / 2**30
        )
        self.sum += self.val * n
        self.count += n
        self.peak = max(self.peak, self.val)

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)

    def __str__(self):
        return f"{self.name}: {self.val:.2f} ({self.avg:.2f}/{self.peak:.2f})"


class DurationMeter:
    """(train_utils.py:232-249)"""

    def __init__(self, name: str):
        self.name = name
        self.val = 0.0

    def reset(self):
        self.val = 0.0

    def update(self, val: float):
        self.val = val

    def add(self, val: float):
        self.val += val

    def __str__(self):
        return f"{self.name}: {human_readable_time(self.val)}"


class ProgressMeter:
    """Formats '[batch/total] | meter | meter' lines
    (train_utils.py:252-281)."""

    def __init__(self, num_batches: int, meters, prefix: str = ""):
        digits = len(str(num_batches))
        self._fmt = "[{:" + str(digits) + "d}/" + str(num_batches) + "]"
        self.meters = meters
        self.prefix = prefix

    def format(self, batch: int) -> str:
        entries = [self.prefix + self._fmt.format(batch)]
        for m in self.meters:
            if isinstance(m, AverageMeter):
                entries.append(f"{m.name}: {m.avg:.4f}")
            else:
                entries.append(str(m))
        return " | ".join(entries)

    def display(self, batch: int) -> None:
        logger.info("%s", self.format(batch))


class Trainer:
    def __init__(
        self,
        cfg: SAM2Config,
        engine: SAM2Engine,
        optim_conf: Optional[OptimConf] = None,
        trainer_conf: Optional[TrainerConf] = None,
        mesh=None,
    ):
        self.cfg = cfg
        self.engine = engine
        self.optim_conf = optim_conf or OptimConf()
        self.conf = trainer_conf or TrainerConf()
        self.mesh = mesh if mesh is not None else make_mesh()
        self.optimizer = make_optimizer(
            self.optim_conf, params=engine.params, cfg=cfg
        )
        self._steps = {}
        if self.conf.prompt_sim is None:
            for kind in self.conf.prompt_kind_probs:
                self._steps[kind] = make_train_step(
                    cfg, engine.model, self.optimizer, mesh=self.mesh,
                    prompt_kind=kind,
                    num_correction_steps=(
                        self.conf.num_correction_steps if kind != "mask" else 0
                    ),
                )
        self.params = engine.params
        self.opt_state = self.optimizer.init(self.params)
        self.global_step = 0
        self.start_epoch = 0
        self._tb = None
        if self.conf.checkpoint_dir:
            os.makedirs(self.conf.checkpoint_dir, exist_ok=True)
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(
                    os.path.join(self.conf.checkpoint_dir, "tb")
                )
            except Exception:
                self._tb = None

    # ------------------------------------------------------------------
    # checkpointing (trainer.py:324-447 -> orbax)
    # ------------------------------------------------------------------

    def save_checkpoint(self, epoch: int) -> None:
        if not self.conf.checkpoint_dir:
            return
        import orbax.checkpoint as ocp

        path = os.path.abspath(
            os.path.join(self.conf.checkpoint_dir, f"ckpt_{epoch:04d}")
        )
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(
            path,
            {
                "params": self.params,
                "opt_state": self.opt_state,
                "meta": {
                    "epoch": jnp.asarray(epoch),
                    "global_step": jnp.asarray(self.global_step),
                },
            },
            force=True,
        )
        ckptr.wait_until_finished()
        logger.info("saved checkpoint %s", path)

    def load_checkpoint(self, path: str) -> None:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        template = {
            "params": self.params,
            "opt_state": self.opt_state,
            "meta": {
                "epoch": jnp.asarray(0),
                "global_step": jnp.asarray(0),
            },
        }
        restored = ckptr.restore(os.path.abspath(path), template)
        self.params = restored["params"]
        self.opt_state = restored["opt_state"]
        self.start_epoch = int(restored["meta"]["epoch"]) + 1
        self.global_step = int(restored["meta"]["global_step"])
        logger.info("restored checkpoint %s (epoch %d)", path, self.start_epoch)

    # ------------------------------------------------------------------

    def _log_scalars(self, scalars: dict) -> None:
        if self.conf.checkpoint_dir:
            with open(
                os.path.join(self.conf.checkpoint_dir, "scalars.jsonl"), "a"
            ) as f:
                f.write(json.dumps(scalars) + "\n")
        if self._tb is not None:
            for k, v in scalars.items():
                if isinstance(v, (int, float)):
                    self._tb.add_scalar(k, v, self.global_step)

    def _step_for_schedule(self, schedule: PromptSchedule):
        """Lazily build (and cache) a train step for one prompt schedule."""
        if schedule not in self._steps:
            self._steps[schedule] = make_train_step(
                self.cfg, self.engine.model, self.optimizer, mesh=self.mesh,
                schedule=schedule,
            )
        return self._steps[schedule]

    def _pick_prompt_kind(self, rng: np.random.Generator) -> str:
        kinds = list(self.conf.prompt_kind_probs)
        probs = np.asarray(
            [self.conf.prompt_kind_probs[k] for k in kinds], np.float64
        )
        probs = probs / probs.sum()
        return str(rng.choice(kinds, p=probs))

    @property
    def _val_step(self):
        if not hasattr(self, "_val_step_fn"):
            import jax as _jax
            from jax.sharding import NamedSharding, PartitionSpec as P

            from det_sam2_tpu.modeling.layers import sdpa
            from det_sam2_tpu.modeling.sam2_base import SAM2Model
            from det_sam2_tpu.training.loss_fns import (
                DEFAULT_WEIGHTS,
                MultiStepMultiMasksAndIous,
            )
            from det_sam2_tpu.training.sam2_train import forward_training

            model = SAM2Model(cfg=self.cfg, attention_fn=sdpa,
                              dtype=self.engine.dtype)
            loss_fn = MultiStepMultiMasksAndIous(
                DEFAULT_WEIGHTS, supervise_all_iou=True, iou_use_l1_loss=True,
                pred_obj_scores=self.cfg.pred_obj_scores,
            )

            def step(params, images, gt):
                outs = model.apply(
                    {"params": params}, self.cfg, images, gt,
                    method=lambda m, c, i, g: forward_training(
                        m, c, i, g, prompt_kind="mask"
                    ),
                )
                gt_rows = gt
                if gt_rows.ndim == 5:  # [T,B,K,H,W] -> [T,B*K,H,W]
                    t_, b_, k_ = gt_rows.shape[:3]
                    gt_rows = gt_rows.reshape(
                        t_, b_ * k_, *gt_rows.shape[3:]
                    )
                losses = loss_fn(outs, gt_rows.astype(jnp.float32))
                # mean IoU of final predictions vs GT (J metric proxy)
                inter = 0.0
                union = 0.0
                for t, o in enumerate(outs):
                    pred = o["pred_masks_high_res"][:, 0] > 0
                    g = gt_rows[t] > 0
                    inter = inter + jnp.sum(pred & g)
                    union = union + jnp.sum(pred | g)
                losses["val_iou"] = inter / jnp.maximum(union, 1)
                return losses

            repl = NamedSharding(self.mesh, P())
            batch_sh = NamedSharding(self.mesh, P(None, "data"))
            self._val_step_fn = _jax.jit(
                step,
                in_shardings=(repl, batch_sh, batch_sh),
                out_shardings=repl,
            )
        return self._val_step_fn

    def validate(self, data_loader, num_batches: int = 10) -> dict:
        """Validation pass (reference val_epoch, trainer.py:583-...):
        mask-prompted tracking loss + mean IoU, no gradients."""
        loss_meter = AverageMeter("val_loss")
        iou_meter = AverageMeter("val_iou")
        for images, gt in data_loader.batches(num_batches):
            images, gt = shard_batch(
                self.mesh, (jnp.asarray(images), jnp.asarray(gt)), axis=1
            )
            losses = self._val_step(self.params, images, gt)
            loss_meter.update(float(losses[CORE_LOSS_KEY]))
            iou_meter.update(float(losses["val_iou"]))
        out = {"val_loss": loss_meter.avg, "val_iou": iou_meter.avg}
        self._log_scalars({"step": self.global_step, **out})
        return out

    def validate_jf(self, videos, max_frame_num_to_track=None) -> dict:
        """End-to-end video-tracking validation: J&F on held-out clips.

        The reference validates with the standalone vos_inference +
        sav_benchmark pipeline (sav_dataset/utils/sav_benchmark.py); here
        that protocol is a trainer hook. Each clip is tracked with the
        CURRENT params through the full video predictor (first-appearance
        mask prompts, semi-supervised VOS protocol) and scored with
        tools/sav_benchmark.evaluate_videos.

        videos: iterable of (frames, gt_per_obj) where frames is
        [T, H, W, 3] uint8 and gt_per_obj maps obj_id -> [T, H, W] bool.
        Returns {"val_J", "val_F", "val_JF"}.
        """
        from det_sam2_tpu.tools.sav_benchmark import evaluate_videos
        from det_sam2_tpu.video_predictor import SAM2VideoPredictor

        old_params = self.engine.params
        self.engine.params = self.params
        try:
            predictor = SAM2VideoPredictor(self.engine)
            results = {}
            for vid, (frames, gt_per_obj) in enumerate(videos):
                session = predictor.init_state(list(np.asarray(frames)))
                for obj_id, gt in sorted(gt_per_obj.items()):
                    first = next(
                        (t for t in range(len(gt)) if np.any(gt[t])), 0
                    )
                    predictor.add_new_mask(session, first, obj_id, gt[first])
                preds = {
                    obj_id: [np.zeros(g[0].shape, bool) for _ in g]
                    for obj_id, g in gt_per_obj.items()
                }
                for frame_idx, obj_ids, masks in predictor.propagate_in_video(
                    session, max_frame_num_to_track=max_frame_num_to_track
                ):
                    for i, obj_id in enumerate(obj_ids):
                        if obj_id in preds:
                            preds[obj_id][frame_idx] = (
                                np.asarray(masks[i, 0]) > 0
                            )
                results[f"video_{vid}"] = {
                    obj_id: (list(np.asarray(gt, bool)), preds[obj_id])
                    for obj_id, gt in gt_per_obj.items()
                }
        finally:
            self.engine.params = old_params
        scores = evaluate_videos(results)
        out = {
            "val_J": scores["J"], "val_F": scores["F"],
            "val_JF": scores["J&F"],
        }
        self._log_scalars({"step": self.global_step, **out})
        return out

    def latest_checkpoint(self) -> Optional[str]:
        """Newest ckpt_* under checkpoint_dir, or None."""
        if not self.conf.checkpoint_dir or not os.path.isdir(
            self.conf.checkpoint_dir
        ):
            return None
        # exact ckpt_<digits> only: a killed run can leave orbax temp dirs
        # (ckpt_NNNN.orbax-checkpoint-tmp-*) that must not be resumed from
        names = sorted(
            n for n in os.listdir(self.conf.checkpoint_dir)
            if re.fullmatch(r"ckpt_\d+", n)
        )
        return (
            os.path.join(self.conf.checkpoint_dir, names[-1])
            if names else None
        )

    def run(self, data_loader) -> None:
        """data_loader: object with .batches(n) -> iterator of
        (images [T,B,S,S,3], gt [T,B,S,S]) numpy pairs."""
        if self.conf.auto_resume:
            latest = self.latest_checkpoint()
            if latest is not None:
                self.load_checkpoint(latest)

        self._current_epoch = self.start_epoch
        sigterm_prev = None
        if self.conf.checkpoint_on_sigterm:
            import signal

            def _on_sigterm(signum, frame):
                logger.warning(
                    "SIGTERM: checkpointing epoch %d before exit",
                    self._current_epoch,
                )
                self.save_checkpoint(self._current_epoch - 1)
                raise SystemExit(143)

            sigterm_prev = signal.signal(signal.SIGTERM, _on_sigterm)

        try:
            self._run_epochs(data_loader)
        finally:
            if sigterm_prev is not None:
                import signal

                signal.signal(signal.SIGTERM, sigterm_prev)

    def _run_epochs(self, data_loader) -> None:
        rng = np.random.default_rng(self.conf.seed)
        for epoch in range(self.start_epoch, self.conf.num_epochs):
            self._current_epoch = epoch
            meter = AverageMeter("core_loss")
            tic = time.time()
            for i, (images, gt) in enumerate(
                data_loader.batches(self.conf.steps_per_epoch)
            ):
                if self.conf.prompt_sim is not None:
                    schedule = sample_prompt_schedule(
                        rng, int(images.shape[0]), self.conf.prompt_sim
                    )
                    step_fn = self._step_for_schedule(schedule)
                    kind = (
                        "pt" if schedule.use_pt_input else "mask"
                    ) + f"/cond{len(schedule.init_cond_frames)}" + (
                        f"/corr{len(schedule.frames_to_correct)}"
                    )
                else:
                    kind = self._pick_prompt_kind(rng)
                    step_fn = self._steps[kind]
                images, gt = shard_batch(
                    self.mesh, (jnp.asarray(images), jnp.asarray(gt)), axis=1
                )
                key = jax.random.PRNGKey(
                    self.conf.seed * 100003 + self.global_step
                )
                self.params, self.opt_state, metrics = step_fn(
                    self.params, self.opt_state, images, gt, key
                )
                loss = float(metrics[CORE_LOSS_KEY])
                if not np.isfinite(loss):
                    # NaN/Inf abort (trainer.py:874-878)
                    raise FloatingPointError(
                        f"loss is {loss} at step {self.global_step}"
                    )
                meter.update(loss)
                self.global_step += 1
                if (i + 1) % self.conf.log_every == 0:
                    scalars = {
                        "epoch": epoch,
                        "step": self.global_step,
                        "loss": meter.avg,
                        "grad_norm": float(metrics["grad_norm"]),
                        "steps_per_sec": (i + 1) / (time.time() - tic),
                        "prompt_kind": kind,
                    }
                    logger.info("%s", scalars)
                    self._log_scalars(scalars)
            if (epoch + 1) % self.conf.checkpoint_every_epochs == 0:
                self.save_checkpoint(epoch)
        # sync engine params with the trained weights
        self.engine.params = self.params
