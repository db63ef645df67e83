"""Training-time forward: simulated-prompt video tracking with in-graph memory.

Behavioral equivalent of /root/reference/training/model/sam2.py
(SAM2Train :25, forward :107, prepare_prompt_inputs :146, forward_tracking
:269, track_step :352, _iter_correct_pt_sampling :448). The reference keeps
a dict of per-frame outputs and feeds them back as memory; here the
per-frame memories live in unrolled-python lists inside one jitted graph
(static T), which XLA schedules as a single differentiable program.

Fidelity design: everything the reference samples with its HOST numpy rng
(which frames are initial cond frames, which frames receive correction
clicks, point vs box vs mask input) is a host-sampled `PromptSchedule`
here too — one compiled graph per distinct schedule, cached by jit.
Everything the reference samples with torch ops on device (point
coordinates, box noise, GT-vs-error correction source) is PRNG-key driven
inside the graph, including the per-click Bernoulli(prob_to_sample_from_gt)
choice (traced select, so it does not multiply compiled variants).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

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


# ---------------------------------------------------------------------------
# prompt schedule (the reference's host-rng decisions, prepare_prompt_inputs)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class PromptSchedule:
    """One training batch's prompt structure. Static under jit (each
    distinct schedule compiles once; the compilation cache amortizes)."""

    init_cond_frames: Tuple[int, ...] = (0,)
    frames_to_correct: Tuple[int, ...] = ()
    use_pt_input: bool = True
    # per init-cond frame: box corners (True) or one sampled click (False)
    use_box_per_frame: Tuple[bool, ...] = (True,)
    num_correction_pt: int = 0
    prob_to_sample_from_gt: float = 0.0


@dataclasses.dataclass(frozen=True)
class PromptSimConf:
    """Train-side knobs of SAM2Train (reference training/model/sam2.py:31-56;
    defaults = the MOSE finetune recipe,
    sam2.1_hiera_b+_MOSE_finetune.yaml:181-193)."""

    prob_to_use_pt_input: float = 0.5
    prob_to_use_box_input: float = 0.5
    num_frames_to_correct: int = 2
    rand_frames_to_correct: bool = True
    num_init_cond_frames: int = 2
    rand_init_cond_frames: bool = True
    num_correction_pt_per_frame: int = 7
    prob_to_sample_from_gt: float = 0.1


def sample_prompt_schedule(
    rng: np.random.Generator, num_frames: int, conf: PromptSimConf
) -> PromptSchedule:
    """Host-rng sampling mirroring prepare_prompt_inputs
    (/root/reference/training/model/sam2.py:146-268), including the
    rng-call order so a seeded generator reproduces the reference's
    choices."""
    prob_pt = conf.prob_to_use_pt_input
    num_frames_to_correct = conf.num_frames_to_correct
    num_init_cond = conf.num_init_cond_frames
    if num_frames == 1:
        # static-image SAM task: force point input, single frame
        prob_pt = 1.0
        num_frames_to_correct = 1
        num_init_cond = 1
    use_pt_input = bool(rng.random() < prob_pt)
    if conf.rand_init_cond_frames and num_init_cond > 1:
        num_init_cond = int(rng.integers(1, num_init_cond, endpoint=True))
    if (
        use_pt_input
        and conf.rand_frames_to_correct
        and num_frames_to_correct > num_init_cond
    ):
        num_frames_to_correct = int(
            rng.integers(num_init_cond, num_frames_to_correct, endpoint=True)
        )

    if num_init_cond == 1:
        init_cond = [0]
    else:
        init_cond = [0] + rng.choice(
            range(1, num_frames), num_init_cond - 1, replace=False
        ).tolist()
    rest = [t for t in range(num_frames) if t not in init_cond]

    use_box_per_frame = tuple(
        bool(rng.random() < conf.prob_to_use_box_input) if use_pt_input else False
        for _ in init_cond
    )

    if not use_pt_input:
        frames_to_correct: List[int] = []
    elif num_frames_to_correct == num_init_cond:
        frames_to_correct = list(init_cond)
    else:
        extra = num_frames_to_correct - num_init_cond
        frames_to_correct = init_cond + rng.choice(
            rest, extra, replace=False
        ).tolist()

    return PromptSchedule(
        init_cond_frames=tuple(int(t) for t in init_cond),
        frames_to_correct=tuple(int(t) for t in frames_to_correct),
        use_pt_input=use_pt_input,
        use_box_per_frame=use_box_per_frame,
        num_correction_pt=(
            conf.num_correction_pt_per_frame if use_pt_input else 0
        ),
        prob_to_sample_from_gt=conf.prob_to_sample_from_gt,
    )


# ---------------------------------------------------------------------------
# in-graph memory assembly (training branch of
# sam2_base.py:_prepare_memory_conditioned_features: stride 1, all cond
# frames, no past-only pointer filter)
# ---------------------------------------------------------------------------


def _training_memory(model: SAM2Model, cfg: SAM2Config, t: int,
                     cond_ts: Sequence[int], mem_feats: Dict[int, jnp.ndarray],
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

    # object pointers: ALL processed cond frames (training applies no
    # past-only filter; distance is signed when use_signed_tpos, reference
    # sam2_base.py:~565) + previous non-cond frames at t_diff < max_ptrs
    ptr_list, dist_list = [], []
    for ct in cond_ts:
        if ct in mem_ptrs and ct != t:
            d = t - ct
            ptr_list.append(mem_ptrs[ct])
            dist_list.append(d if cfg.use_signed_tpos_enc_to_obj_ptrs else abs(d))
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


# ---------------------------------------------------------------------------
# training forward
# ---------------------------------------------------------------------------


def forward_training(
    model: SAM2Model,
    cfg: SAM2Config,
    images: jnp.ndarray,  # [T, B, H, W, 3]
    gt_masks: jnp.ndarray,  # [T, B, H, W] or [T, B, K, H, W]
    rng: jnp.ndarray = None,
    schedule: Optional[PromptSchedule] = None,
    # legacy single-knob interface (maps onto a schedule)
    prompt_kind: str = "box",  # 'box' | 'point' | 'mask'
    num_correction_steps: int = 0,
    num_init_cond_frames: int = 1,
    box_noise: float = 0.1,
    prompt_recorder: Optional[list] = None,  # eager-mode parity hook: gets
    # {"t", "kind", "coords", "labels"} per sampled prompt/click
) -> List[Dict]:
    """Run simulated-prompt tracking over a training clip; returns per-frame
    output dicts (frame order) consumable by MultiStepMultiMasksAndIous.

    Mirrors forward_tracking (/root/reference/training/model/sam2.py:269-352):
    initial cond frames are processed FIRST (so later frames attend all of
    them), then the remaining frames in index order; frames in
    `schedule.frames_to_correct` receive `num_correction_pt` iterative
    clicks sampled from prediction errors (or from GT with a traced
    Bernoulli(prob_to_sample_from_gt) choice), feeding back the previous
    mask logits as a dense prompt (:448-520)."""
    sample_box_points, sample_random_points_from_errors = _lazy_samplers()
    if schedule is None:
        init_cond = tuple(range(num_init_cond_frames))
        schedule = PromptSchedule(
            init_cond_frames=init_cond,
            frames_to_correct=(
                init_cond
                if num_correction_steps > 0 and prompt_kind != "mask"
                else ()
            ),
            use_pt_input=prompt_kind != "mask",
            use_box_per_frame=tuple(
                prompt_kind == "box" for _ in init_cond
            ),
            num_correction_pt=num_correction_steps,
        )

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
    cond_ts = list(schedule.init_cond_frames)
    correct_ts = set(schedule.frames_to_correct)
    rest_ts = [t for t in range(t_total) if t not in cond_ts]
    processing_order = cond_ts + rest_ts

    mem_feats: Dict[int, jnp.ndarray] = {}
    mem_ptrs: Dict[int, jnp.ndarray] = {}
    outs_by_t: Dict[int, Dict] = {}

    def sample_correction(key, gt, high_res):
        """One correction click: from errors, or from GT with a traced
        Bernoulli(prob_to_sample_from_gt) (reference :473-484)."""
        k_src, k_pt_err, k_pt_gt = jax.random.split(key, 3)
        pt_e, lb_e = sample_random_points_from_errors(
            k_pt_err, gt, high_res[:, 0] > 0, num_pt=1
        )
        if schedule.prob_to_sample_from_gt > 0:
            pt_g, lb_g = sample_random_points_from_errors(
                k_pt_gt, gt, None, num_pt=1
            )
            from_gt = jax.random.bernoulli(
                k_src, schedule.prob_to_sample_from_gt
            )
            pt = jnp.where(from_gt, pt_g, pt_e)
            lb = jnp.where(from_gt, lb_g, lb_e)
            return pt, lb
        return pt_e, lb_e

    for t in processing_order:
        f0, f1, ft = frame_feats(t)
        is_init = t in cond_ts
        gt_t = gt_masks[t]
        multistep_hr, multistep_ious, multistep_logits = [], [], []

        coords, labels, mask_input = None, None, None
        if is_init:
            if (
                not schedule.use_pt_input
                and cfg.use_mask_input_as_output_without_sam
            ):
                # GT-mask prompt bypasses the SAM heads entirely: the mask
                # becomes the output at +-10 logits and the object score
                # comes from mask occupancy (reference sam2_base.py:772-779
                # _use_mask_as_output; the MOSE recipe sets the flag true,
                # sam2.1_hiera_b+_MOSE_finetune.yaml:150). Supervising
                # decoder outputs here instead would change training
                # dynamics for every mask-prompted batch.
                mask_input = gt_t.astype(jnp.float32)[..., None]
                (multimasks, multimasks_hr, ious, low_res, high_res,
                 obj_ptr, obj_logits) = model.use_mask_as_output(
                    ft, [f0, f1], mask_input
                )
                multistep_hr.append(multimasks_hr)
                multistep_ious.append(ious)
                multistep_logits.append(obj_logits)
                maskmem = model.encode_memory(
                    ft, high_res, obj_logits, binarize=False
                )
                mem_feats[t] = maskmem.reshape(b, -1, cfg.mem_dim)
                mem_ptrs[t] = obj_ptr
                outs_by_t[t] = {
                    "multistep_pred_multimasks_high_res": multistep_hr,
                    "multistep_pred_ious": multistep_ious,
                    "multistep_object_score_logits": multistep_logits,
                    "pred_masks_high_res": high_res,
                }
                continue
            pix = model.no_mem_features(ft)
            if not schedule.use_pt_input:
                # GT mask as the dense prompt on every init cond frame
                # (flag off: the decoder refines the mask prompt)
                mask_input = gt_t.astype(jnp.float32)[..., None]
            else:
                rng, k_prompt = jax.random.split(rng)
                if schedule.use_box_per_frame[cond_ts.index(t)]:
                    coords, labels = sample_box_points(
                        k_prompt, gt_t, noise=box_noise
                    )
                else:
                    # one initial click from GT (get_next_point 'uniform')
                    coords, labels = sample_random_points_from_errors(
                        k_prompt, gt_t, None, num_pt=1
                    )
                if prompt_recorder is not None:
                    prompt_recorder.append(
                        {"t": t, "kind": "init", "coords": coords,
                         "labels": labels}
                    )
        else:
            mem, pos, n_tiles, n_ptr = _training_memory(
                model, cfg, t, cond_ts, mem_feats, mem_ptrs, t_total
            )
            valid = jnp.ones((mem.shape[1],), bool)
            pix = model.attend_memory(
                ft, mem, pos, valid,
                num_mem_frames=n_tiles, num_obj_ptr_tokens=n_ptr,
            )

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
            training=True,
        )
        multistep_hr.append(multimasks_hr)
        multistep_ious.append(ious)
        multistep_logits.append(obj_logits)

        # iterative correction clicks (reference _iter_correct_pt_sampling,
        # :448-520): previous low-res logits fed back as the dense prompt,
        # clicks accumulate, every step supervised
        if t in correct_ts and schedule.num_correction_pt > 0:
            acc_coords, acc_labels = coords, labels
            for _ in range(schedule.num_correction_pt):
                rng, k_corr = jax.random.split(rng)
                new_pt, new_lb = sample_correction(k_corr, gt_t, high_res)
                if prompt_recorder is not None:
                    prompt_recorder.append(
                        {"t": t, "kind": "correction", "coords": new_pt,
                         "labels": new_lb}
                    )
                if acc_coords is None:
                    acc_coords, acc_labels = new_pt, new_lb
                else:
                    acc_coords = jnp.concatenate([acc_coords, new_pt], axis=1)
                    acc_labels = jnp.concatenate([acc_labels, new_lb], axis=1)
                multimask = use_multimask(
                    cfg, is_init=is_init, num_pts=acc_labels.shape[1]
                )
                (multimasks, multimasks_hr, ious, low_res, high_res,
                 obj_ptr, obj_logits) = model.forward_sam_heads(
                    pix,
                    point_coords=acc_coords,
                    point_labels=acc_labels,
                    mask_inputs=low_res[:, 0, :, :, None],
                    high_res_features=[f0, f1],
                    multimask_output=multimask,
                    training=True,
                )
                multistep_hr.append(multimasks_hr)
                multistep_ious.append(ious)
                multistep_logits.append(obj_logits)

        maskmem = model.encode_memory(
            ft, high_res, obj_logits, binarize=False
        )
        mem_feats[t] = maskmem.reshape(b, -1, cfg.mem_dim)
        mem_ptrs[t] = obj_ptr
        outs_by_t[t] = {
            "multistep_pred_multimasks_high_res": multistep_hr,
            "multistep_pred_ious": multistep_ious,
            "multistep_object_score_logits": multistep_logits,
            "pred_masks_high_res": high_res,
        }
    return [outs_by_t[t] for t in range(t_total)]
