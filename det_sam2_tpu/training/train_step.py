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
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from det_sam2_tpu.configs import SAM2Config
from det_sam2_tpu.modeling.sam2_base import SAM2Model
from det_sam2_tpu.training.loss_fns import (
    CORE_LOSS_KEY,
    DEFAULT_WEIGHTS,
    MultiStepMultiMasksAndIous,
)
from det_sam2_tpu.training.sam2_train import PromptSchedule, forward_training


@dataclasses.dataclass
class OptimConf:
    """Mirrors the MOSE finetune recipe scratch block
    (sam2.1_hiera_b+_MOSE_finetune.yaml:3-12, training/optimizer.py)."""

    base_lr: float = 5.0e-6
    # image-encoder lr (MOSE recipe: 3e-6). None = train the trunk at
    # base_lr (no per-leaf groups needed)
    vision_lr: Optional[float] = None
    weight_decay: float = 0.1
    grad_clip_norm: float = 0.1
    warmup_steps: int = 100
    total_steps: int = 10_000
    b1: float = 0.9
    b2: float = 0.999
    # trunk-block learning-rate decay (reference
    # training/optimizer.py:422 layer_decay_param_modifier, value 0.9 in the
    # MOSE recipe). None disables; requires make_optimizer(params=, cfg=).
    layer_decay: Optional[float] = None
    # reference lr schedule is cosine base_lr -> base_lr * end_ratio
    # (CosineParamScheduler start/end, yaml :259-267)
    cosine_end_ratio: float = 0.1
    # per-option scheduling (reference training/optimizer.py:34-299: any
    # optimizer option may carry a scheduler, evaluated at
    # where = step/total each step). When set, weight decay follows the
    # fvcore CosineParamScheduler curve weight_decay -> weight_decay_end.
    weight_decay_end: Optional[float] = None


def _wd_mask(params):
    # no weight decay on biases / norms (training/optimizer.py param
    # group rules: '*bias*' wd=0, LayerNorm wd=0)
    def leaf(path, x):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        return name not in ("bias", "scale", "gamma") and x.ndim > 1

    return jax.tree_util.tree_map_with_path(leaf, params)


def lr_scale_tree(params, cfg: SAM2Config, conf: OptimConf):
    """Per-leaf lr multipliers (relative to base_lr) replicating the
    reference's param groups:
      * image_encoder.* params train at vision_lr (yaml options.lr
        param_names block, :262-268);
      * trunk blocks additionally decay by layer_decay**(depth - i)
        (hieradet.get_layer_id: blocks.i -> i+1, patch_embed -> 0,
        pos_embed -> 0 but overridden to scale 1.0 by the '*pos_embed*'
        pattern in the MOSE yaml :249-254; everything else in the trunk ->
        scale 1.0).
    Weight decay scales with the group lr exactly as torch AdamW does."""
    depth = cfg.hiera.depth
    vlr = conf.base_lr if conf.vision_lr is None else conf.vision_lr
    vision_ratio = vlr / conf.base_lr
    decay = conf.layer_decay

    def leaf(path, x):
        keys = [p.key if hasattr(p, "key") else str(p) for p in path]
        scale = 1.0
        if keys and keys[0] == "image_encoder":
            scale *= vision_ratio
            if decay and decay != 1.0 and len(keys) >= 2 and keys[1] == "trunk":
                name = ".".join(keys)
                if "pos_embed" in name:
                    pass  # override '*pos_embed*' -> 1.0
                elif "patch_embed" in name:
                    scale *= decay ** (depth + 1)
                else:
                    block = next(
                        (k for k in keys if k.startswith("blocks_")), None
                    )
                    if block is not None:
                        i = int(block.split("_")[1])
                        scale *= decay ** (depth - i)
        return jnp.asarray(scale, jnp.float32)

    return jax.tree_util.tree_map_with_path(leaf, params)


def cosine_param_schedule(start: float, end: float, total_steps: int):
    """fvcore CosineParamScheduler evaluated at where = step/total:
    value = end + 0.5*(start-end)*(1 + cos(pi*where)) (reference
    training/optimizer.py option schedulers; trainer passes `where` as the
    completed fraction of training)."""

    def fn(count):
        where = jnp.clip(count / max(total_steps, 1), 0.0, 1.0)
        return end + 0.5 * (start - end) * (1.0 + jnp.cos(jnp.pi * where))

    return fn


def scheduled_add_decayed_weights(wd_fn, mask) -> optax.GradientTransformation:
    """add_decayed_weights with a per-step-scheduled decay value (the optax
    counterpart of the reference's per-option schedulers applied to
    weight_decay)."""

    def init_fn(params):
        return optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32))

    def update_fn(updates, state, params):
        if params is None:
            raise ValueError("scheduled weight decay requires params")
        wd = wd_fn(state.count)
        keep = mask(params) if callable(mask) else mask
        updates = jax.tree_util.tree_map(
            lambda u, p, k: u + wd * p if k else u, updates, params, keep
        )
        return updates, optax.ScaleByScheduleState(count=state.count + 1)

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(
    conf: OptimConf,
    params=None,
    cfg: Optional[SAM2Config] = None,
) -> optax.GradientTransformation:
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0 if conf.warmup_steps else conf.base_lr,
        peak_value=conf.base_lr,
        warmup_steps=conf.warmup_steps,
        decay_steps=max(conf.total_steps, conf.warmup_steps + 1),
        end_value=conf.base_lr * conf.cosine_end_ratio,
    )

    if conf.weight_decay_end is not None:
        wd_fn = cosine_param_schedule(
            conf.weight_decay, conf.weight_decay_end, conf.total_steps
        )
    else:
        wd_fn = None

    wants_groups = conf.layer_decay is not None or (
        conf.vision_lr is not None and conf.vision_lr != conf.base_lr
    )
    use_groups = params is not None and cfg is not None and wants_groups
    if wants_groups and not use_groups:
        raise ValueError(
            "layer_decay/vision_lr need per-leaf groups: pass params and "
            "cfg to make_optimizer (otherwise they would be silently "
            "ignored and the whole model would train at base_lr)"
        )
    if not use_groups:
        if wd_fn is None:
            return optax.chain(
                optax.clip_by_global_norm(conf.grad_clip_norm),
                optax.adamw(
                    learning_rate=schedule,
                    b1=conf.b1,
                    b2=conf.b2,
                    weight_decay=conf.weight_decay,
                    mask=_wd_mask,
                ),
            )
        # torch decoupled-AdamW ordering with scheduled wd:
        # p -= lr(t) * (adam_dir + wd(t) * p)
        return optax.chain(
            optax.clip_by_global_norm(conf.grad_clip_norm),
            optax.scale_by_adam(b1=conf.b1, b2=conf.b2),
            scheduled_add_decayed_weights(wd_fn, _wd_mask),
            optax.scale_by_learning_rate(schedule),
        )

    scales = lr_scale_tree(params, cfg, conf)

    def per_leaf_lr() -> optax.GradientTransformation:
        def init_fn(params_):
            return optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32))

        def update_fn(updates, state, params_=None):
            lr = schedule(state.count)
            updates = jax.tree_util.tree_map(
                lambda u, s: -lr * s * u, updates, scales
            )
            return updates, optax.ScaleByScheduleState(count=state.count + 1)

        return optax.GradientTransformation(init_fn, update_fn)

    # equivalent to per-group torch AdamW: decoupled wd is added BEFORE the
    # group lr multiplies the whole update (torch: p -= lr*(adam + wd*p))
    return optax.chain(
        optax.clip_by_global_norm(conf.grad_clip_norm),
        optax.scale_by_adam(b1=conf.b1, b2=conf.b2),
        scheduled_add_decayed_weights(wd_fn, _wd_mask)
        if wd_fn is not None
        else optax.add_decayed_weights(conf.weight_decay, mask=_wd_mask),
        per_leaf_lr(),
    )


def make_train_step(
    cfg: SAM2Config,
    model: SAM2Model,
    optimizer: optax.GradientTransformation,
    loss_fn: Optional[MultiStepMultiMasksAndIous] = None,
    mesh: Optional[Mesh] = None,
    prompt_kind: str = "box",
    num_correction_steps: int = 0,
    schedule: Optional[PromptSchedule] = None,
    fsdp: bool = False,
    fsdp_min_size: int = 1 << 14,
) -> Callable:
    """Returns train_step(params, opt_state, images [T,B,H,W,3],
    gt_masks [T,B,H,W], rng) -> (params, opt_state, metrics). When a mesh
    is given, the batch axis (axis 1) is data-parallel.

    With fsdp=True (mesh required) the return value is a FACTORY:
    call it as make(params, opt_state) -> step; params/opt-state leaves
    are sharded over 'data' (ZeRO-3 style) instead of replicated.

    Training runs the same attention path as inference: the Pallas flash
    kernel has a custom VJP (ops/attention.py flash backward), so large
    attention problems train through it; small ones fall back to sdpa."""
    import dataclasses as _dc

    model = SAM2Model(
        cfg=_dc.replace(cfg, remat_image_encoder=True),
        attention_fn=model.attention_fn,
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
            # 'dropout' activates trunk stochastic depth when
            # hiera.drop_path_rate > 0 (reference dpr schedule)
            rngs={"dropout": jax.random.fold_in(rng, 0x5EED)},
            method=lambda m, c, i, g, r: forward_training(
                m, c, i, g, rng=r,
                schedule=schedule,
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
    if not fsdp:
        return jax.jit(
            step,
            in_shardings=(repl, repl, batch_sh, batch_sh, repl),
            out_shardings=(repl, repl, repl),
            donate_argnums=(0, 1),
        )

    # FSDP-lite (ZeRO-3 style; goes beyond the reference's DDP-only
    # trainer): every params/opt-state leaf is sharded over the 'data'
    # axis on its largest divisible dim; GSPMD inserts the all-gathers
    # before use and reduce-scatters after the backward. Per-device
    # params + adam moments drop ~Nx, enabling models that don't fit
    # replicated.
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))

    def leaf_sharding(leaf) -> NamedSharding:
        shape = getattr(leaf, "shape", ())
        if not shape or int(np.prod(shape)) < fsdp_min_size:
            return repl
        dims = [d for d in range(len(shape)) if shape[d] % n_dev == 0]
        if not dims:
            return repl
        best = max(dims, key=lambda d: shape[d])
        spec = [None] * len(shape)
        spec[best] = "data"
        return NamedSharding(mesh, P(*spec))

    def tree_shardings(tree):
        return jax.tree_util.tree_map(leaf_sharding, tree)

    def make(params, opt_state):
        """Bind shardings to the concrete params/opt-state trees (opt
        state mixes params-shaped moments with scalar counts, so shardings
        are derived per leaf, not assumed)."""
        p_sh = tree_shardings(params)
        o_sh = tree_shardings(opt_state)
        return jax.jit(
            step,
            in_shardings=(p_sh, o_sh, batch_sh, batch_sh, repl),
            out_shardings=(p_sh, o_sh, repl),
            donate_argnums=(0, 1),
        )

    make.leaf_sharding = leaf_sharding  # device_put helpers for callers
    make.tree_shardings = tree_shardings
    return make
