"""Jitted data-parallel training step (AdamW + cosine + grad-clip 0.1).

TPU-native replacement for the reference Trainer's DDP step
(training/trainer.py:845-889 _run_step, :703-832 train_epoch, and
training/optimizer.py): the batch is sharded over the mesh 'data' axis; jit
compiles the psum for gradient averaging; optax implements AdamW, per-step
cosine schedule, and global-norm clipping (max_norm 0.1,
training/optimizer.py:380-420).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from det_sam2_tpu.configs import SAM2Config
from det_sam2_tpu.modeling.sam2_base import SAM2Model
from det_sam2_tpu.training.loss_fns import (
    CORE_LOSS_KEY,
    DEFAULT_WEIGHTS,
    MultiStepMultiMasksAndIous,
)
from det_sam2_tpu.training.sam2_train import forward_training


@dataclasses.dataclass
class OptimConf:
    """Mirrors the MOSE finetune recipe scratch block
    (sam2.1_hiera_b+_MOSE_finetune.yaml:3-12, training/optimizer.py)."""

    base_lr: float = 5.0e-6
    vision_lr: float = 3.0e-6
    weight_decay: float = 0.1
    grad_clip_norm: float = 0.1
    warmup_steps: int = 100
    total_steps: int = 10_000
    b1: float = 0.9
    b2: float = 0.999


def make_optimizer(conf: OptimConf) -> optax.GradientTransformation:
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=conf.base_lr,
        warmup_steps=conf.warmup_steps,
        decay_steps=max(conf.total_steps, conf.warmup_steps + 1),
    )

    def wd_mask(params):
        # no weight decay on biases / norms (training/optimizer.py param
        # group rules: '*bias*' wd=0, LayerNorm wd=0)
        def leaf(path, x):
            name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
            return name not in ("bias", "scale", "gamma") and x.ndim > 1

        return jax.tree_util.tree_map_with_path(leaf, params)

    return optax.chain(
        optax.clip_by_global_norm(conf.grad_clip_norm),
        optax.adamw(
            learning_rate=schedule,
            b1=conf.b1,
            b2=conf.b2,
            weight_decay=conf.weight_decay,
            mask=wd_mask,
        ),
    )


def make_train_step(
    cfg: SAM2Config,
    model: SAM2Model,
    optimizer: optax.GradientTransformation,
    loss_fn: Optional[MultiStepMultiMasksAndIous] = None,
    mesh: Optional[Mesh] = None,
    prompt_kind: str = "box",
    num_correction_steps: int = 0,
) -> Callable:
    """Returns train_step(params, opt_state, images [T,B,H,W,3],
    gt_masks [T,B,H,W], rng) -> (params, opt_state, metrics). When a mesh
    is given, the batch axis (axis 1) is data-parallel.

    Gradients flow through XLA attention (the Pallas inference kernels have
    no VJP), so the model is rebuilt here with the sdpa attention_fn —
    parameter structure is unchanged."""
    import dataclasses as _dc

    from det_sam2_tpu.modeling.layers import sdpa

    model = SAM2Model(
        cfg=_dc.replace(cfg, remat_image_encoder=True),
        attention_fn=sdpa,
        dtype=model.dtype,
    )
    if loss_fn is None:
        loss_fn = MultiStepMultiMasksAndIous(
            DEFAULT_WEIGHTS,
            supervise_all_iou=True,
            iou_use_l1_loss=True,
            pred_obj_scores=cfg.pred_obj_scores,
        )

    def loss_of(params, images, gt_masks, rng):
        outs = model.apply(
            {"params": params},
            cfg,
            images,
            gt_masks,
            rng,
            method=lambda m, c, i, g, r: forward_training(
                m, c, i, g, rng=r,
                prompt_kind=prompt_kind,
                num_correction_steps=num_correction_steps,
            ),
        )
        gt_rows = gt_masks
        if gt_rows.ndim == 5:  # [T, B, K, H, W] -> [T, B*K, H, W]
            t_, b_, k_ = gt_rows.shape[:3]
            gt_rows = gt_rows.reshape(t_, b_ * k_, *gt_rows.shape[3:])
        losses = loss_fn(outs, gt_rows.astype(jnp.float32))
        return losses[CORE_LOSS_KEY], losses

    def step(params, opt_state, images, gt_masks, rng):
        (loss, losses), grads = jax.value_and_grad(loss_of, has_aux=True)(
            params, images, gt_masks, rng
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = {k: v for k, v in losses.items()}
        metrics["grad_norm"] = optax.global_norm(grads)
        return params, opt_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0, 1))

    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(None, "data"))
    return jax.jit(
        step,
        in_shardings=(repl, repl, batch_sh, batch_sh, repl),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1),
    )
