"""Training-time forward: simulated-prompt video tracking with in-graph memory.

Behavioral equivalent (v1) of /root/reference/training/model/sam2.py
(SAM2Train :25, forward :107, prepare_prompt_inputs :146, forward_tracking
:269). The reference keeps a dict of per-frame outputs and feeds them back as
memory; here the per-frame memories live in unrolled-python lists inside one
jitted graph (static T), which XLA schedules as a single differentiable
program — no state pytree needed for training.

v1 scope: one initial conditioning frame (t=0) prompted with the GT-derived
box (reference samples point/mask/box probabilistically, :146-268 — the box
branch); no iterative correction clicks yet. Memory selection during
training: all cond frames + up to (num_maskmem-1) previous frames at stride 1
+ object pointers — exactly the training branch of
sam2_base.py:_prepare_memory_conditioned_features.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp

from det_sam2_tpu.configs import SAM2Config
from det_sam2_tpu.modeling.position_encoding import sine_pos_embed_2d
from det_sam2_tpu.modeling.sam2_base import SAM2Model
from det_sam2_tpu.track import use_multimask


def _lazy_samplers():
    from det_sam2_tpu.training.samplers import (
        sample_box_points,
        sample_random_points_from_errors,
    )

    return sample_box_points, sample_random_points_from_errors


def mask_to_box(masks: jnp.ndarray) -> jnp.ndarray:
    """GT mask [B, H, W] (bool/float) -> xyxy box [B, 4] in pixels
    (equivalent of sam2/utils/misc.py:mask_to_box :64-87). Empty masks give
    a degenerate (0,0,0,0) box."""
    b, h, w = masks.shape
    pos = masks > 0
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    big = jnp.float32(1e9)
    x_min = jnp.min(jnp.where(pos, xs, big), axis=(1, 2))
    y_min = jnp.min(jnp.where(pos, ys, big), axis=(1, 2))
    x_max = jnp.max(jnp.where(pos, xs, -big), axis=(1, 2))
    y_max = jnp.max(jnp.where(pos, ys, -big), axis=(1, 2))
    any_pos = pos.any(axis=(1, 2))
    box = jnp.stack([x_min, y_min, x_max, y_max], axis=-1)
    return jnp.where(any_pos[:, None], box, 0.0)


def _training_memory(model: SAM2Model, cfg: SAM2Config, t: int,
                     cond_ts: List[int], mem_feats: Dict[int, jnp.ndarray],
                     mem_ptrs: Dict[int, jnp.ndarray], num_frames: int):
    """Assemble the memory sequence for training frame t (stride 1,
    forward order). Token counts are static per t."""
    tiles = []
    tpos_idx = []
    nm = cfg.num_maskmem
    for ct in cond_ts:
        if ct in mem_feats and ct != t:
            tiles.append(mem_feats[ct])
            tpos_idx.append(nm - 1)
    for d in range(nm - 1, 0, -1):  # t_rel = d, earliest first
        pt = t - d
        if pt >= 0 and pt in mem_feats and pt not in cond_ts:
            tiles.append(mem_feats[pt])
            tpos_idx.append(d - 1)

    s = cfg.image_embedding_size ** 2
    cm = cfg.mem_dim
    base = jnp.asarray(sine_pos_embed_2d(
        cfg.image_embedding_size, cfg.image_embedding_size, cm
    )).reshape(1, s, cm)
    mem = jnp.concatenate(tiles, axis=1)  # [B, n_tiles*S, Cm]
    pos = jnp.concatenate(
        [base + model.maskmem_tpos_enc[i, 0, 0][None, None] for i in tpos_idx],
        axis=1,
    )

    # object pointers from cond frames + previous frames (t_diff < 16)
    ptr_list, dist_list = [], []
    for ct in cond_ts:
        if ct in mem_ptrs and ct <= t:
            ptr_list.append(mem_ptrs[ct])
            dist_list.append(t - ct)
    max_ptrs = min(num_frames, cfg.max_obj_ptrs_in_encoder)
    for d in range(1, max_ptrs):
        pt = t - d
        if pt >= 0 and pt in mem_ptrs and pt not in cond_ts:
            ptr_list.append(mem_ptrs[pt])
            dist_list.append(d)

    num_ptr_tokens = 0
    if cfg.use_obj_ptrs_in_encoder and ptr_list:
        tpp = cfg.hidden_dim // cm
        ptrs = jnp.stack(ptr_list, axis=1)  # [B, P, C]
        bsz, p, c = ptrs.shape
        ptr_tok = ptrs.reshape(bsz, p, tpp, cm).reshape(bsz, p * tpp, cm)
        pe = model.obj_ptr_tpos(
            jnp.asarray(dist_list, jnp.float32), jnp.int32(max_ptrs - 1)
        )
        ptr_pos = jnp.repeat(pe, tpp, axis=0)[None]
        mem = jnp.concatenate([mem, ptr_tok.astype(mem.dtype)], axis=1)
        pos = jnp.concatenate(
            [pos, jnp.broadcast_to(ptr_pos, (pos.shape[0],) + ptr_pos.shape[1:])],
            axis=1,
        )
        num_ptr_tokens = p * tpp

    return mem, pos, len(tiles), num_ptr_tokens


def forward_training(
    model: SAM2Model,
    cfg: SAM2Config,
    images: jnp.ndarray,  # [T, B, H, W, 3]
    gt_masks: jnp.ndarray,  # [T, B, H, W]
    rng: jnp.ndarray = None,
    prompt_kind: str = "box",  # 'box' | 'point' | 'mask' (host-sampled per
    # step with the reference's prob_to_use_* probabilities)
    num_correction_steps: int = 0,
    num_init_cond_frames: int = 1,
    box_noise: float = 0.1,
) -> List[Dict]:
    """Run tracking over a training clip; returns per-frame output dicts
    consumable by MultiStepMultiMasksAndIous.

    Scope notes vs training/model/sam2.py: prompt kind and correction count
    are per-step host choices (same marginal distribution as the reference's
    in-batch sampling, one compiled graph per variant); corrections apply to
    the init cond frames (the reference additionally samples random
    mid-sequence frames to correct)."""
    sample_box_points, sample_random_points_from_errors = _lazy_samplers()
    t_total, b_videos = images.shape[0], images.shape[1]
    # multi-object clips: gt [T, B, K, H, W] -> K object tracks per video
    # share ONE image encode (the reference's flat_obj_to_img_idx indexing,
    # training/utils/data_utils.py:72-113)
    if gt_masks.ndim == 5:
        k_objs = gt_masks.shape[2]
        gt_masks = gt_masks.reshape(
            t_total, b_videos * k_objs, *gt_masks.shape[3:]
        )
    else:
        k_objs = 1
    b = b_videos * k_objs
    flat = images.reshape(t_total * b_videos, *images.shape[2:])
    s0, s1, feat = model.forward_image(flat)

    def _tile(x, t):
        rows = x[t * b_videos : (t + 1) * b_videos]
        if k_objs == 1:
            return rows
        return jnp.repeat(rows, k_objs, axis=0)

    def frame_feats(t):
        return (_tile(s0, t), _tile(s1, t), _tile(feat, t))

    if rng is None:
        rng = jax.random.PRNGKey(0)
    cond_ts = list(range(num_init_cond_frames))
    mem_feats: Dict[int, jnp.ndarray] = {}
    mem_ptrs: Dict[int, jnp.ndarray] = {}
    outs: List[Dict] = []

    for t in range(t_total):
        f0, f1, ft = frame_feats(t)
        is_init = t in cond_ts
        multistep_hr, multistep_ious, multistep_logits = [], [], []
        if is_init:
            pix = model.no_mem_features(ft)
            rng, k_prompt = jax.random.split(rng)
            if prompt_kind == "box":
                coords, labels = sample_box_points(
                    k_prompt, gt_masks[t], noise=box_noise
                )
                mask_input = None
            elif prompt_kind == "point":
                coords, labels = sample_random_points_from_errors(
                    k_prompt, gt_masks[t], None, num_pt=1
                )
                mask_input = None
            elif prompt_kind == "mask":
                # GT mask as the dense prompt (prob_to_use_mask_input path)
                coords, labels = None, None
                mask_input = gt_masks[t].astype(jnp.float32)[..., None]
            else:
                raise ValueError(f"unknown prompt_kind {prompt_kind}")
        else:
            mem, pos, n_tiles, n_ptr = _training_memory(
                model, cfg, t, cond_ts, mem_feats, mem_ptrs, t_total
            )
            valid = jnp.ones((mem.shape[1],), bool)
            pix = model.attend_memory(
                ft, mem, pos, valid,
                num_mem_frames=n_tiles, num_obj_ptr_tokens=n_ptr,
            )
            coords, labels, mask_input = None, None, None

        num_pts = 0 if labels is None else labels.shape[1]
        multimask = use_multimask(cfg, is_init=is_init, num_pts=num_pts)
        (multimasks, multimasks_hr, ious, low_res, high_res, obj_ptr,
         obj_logits) = model.forward_sam_heads(
            pix,
            point_coords=coords,
            point_labels=labels,
            mask_inputs=mask_input,
            high_res_features=[f0, f1],
            multimask_output=multimask,
        )
        multistep_hr.append(multimasks_hr)
        multistep_ious.append(ious)
        multistep_logits.append(obj_logits)

        # iterative correction clicks on prompted frames
        # (SAM2Train._iter_correct_pt_sampling, training/model/sam2.py:448)
        if is_init and num_correction_steps > 0 and prompt_kind != "mask":
            acc_coords, acc_labels = coords, labels
            for _ in range(num_correction_steps):
                rng, k_corr = jax.random.split(rng)
                pred_bin = high_res[:, 0] > 0
                new_pt, new_lb = sample_random_points_from_errors(
                    k_corr, gt_masks[t], pred_bin, num_pt=1
                )
                acc_coords = jnp.concatenate([acc_coords, new_pt], axis=1)
                acc_labels = jnp.concatenate([acc_labels, new_lb], axis=1)
                multimask = use_multimask(
                    cfg, is_init=True, num_pts=acc_labels.shape[1]
                )
                (multimasks, multimasks_hr, ious, low_res, high_res,
                 obj_ptr, obj_logits) = model.forward_sam_heads(
                    pix,
                    point_coords=acc_coords,
                    point_labels=acc_labels,
                    mask_inputs=jnp.clip(low_res, -32.0, 32.0)[
                        :, 0, :, :, None
                    ],
                    high_res_features=[f0, f1],
                    multimask_output=multimask,
                )
                multistep_hr.append(multimasks_hr)
                multistep_ious.append(ious)
                multistep_logits.append(obj_logits)

        maskmem = model.encode_memory(
            ft, high_res, obj_logits, binarize=False
        )
        mem_feats[t] = maskmem.reshape(b, -1, cfg.mem_dim)
        mem_ptrs[t] = obj_ptr
        outs.append(
            {
                "multistep_pred_multimasks_high_res": multistep_hr,
                "multistep_pred_ious": multistep_ious,
                "multistep_object_score_logits": multistep_logits,
                "pred_masks_high_res": high_res,
            }
        )
    return outs
