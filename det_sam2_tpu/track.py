"""SAM2Engine: jit-compiled per-frame step functions over the static state.

This is the TPU replacement for the reference's per-frame driver
(`_run_single_frame_inference`, sam2/sam2_video_predictor.py:1279-1365, and
`SAM2Base.track_step`, sam2/modeling/sam2_base.py:746-932). Each public
method is a jitted pure function of (params, image features, MemoryBank,
scalars); Python-level flags that change the traced graph (reverse, is_init,
prompt size P, object count O) key a small closure cache, so steady-state
streaming never re-traces.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from det_sam2_tpu.configs import SAM2Config
from det_sam2_tpu.modeling.layers import sdpa
from det_sam2_tpu.ops.attention import flash_attention
from det_sam2_tpu.ops.connected_components import fill_holes_in_mask_scores_jax
from det_sam2_tpu.modeling.position_encoding import sine_pos_embed_2d
from det_sam2_tpu.modeling.sam2_base import SAM2Model
from det_sam2_tpu.state import (
    MemoryBank,
    memory_layout,
    next_pow2,
    select_memory,
    write_cond,
    write_noncond,
)
from det_sam2_tpu.utils.resize import torch_resize_hw


def _maybe_fill_holes(cfg: SAM2Config, low_res: jnp.ndarray) -> jnp.ndarray:
    """Device-side fill_holes_in_mask_scores on the stored/propagated
    low-res logits (sam2_video_predictor.py:1341-1347, fill_hole_area=8 via
    build_sam.py:134). Runs inside the jitted step: no extra transfers."""
    if cfg.fill_hole_area > 0:
        return fill_holes_in_mask_scores_jax(low_res, float(cfg.fill_hole_area))
    return low_res


def use_multimask(cfg: SAM2Config, is_init: bool, num_pts: int) -> bool:
    """sam2_base.py:_use_multimask (:915-925)."""
    return (
        cfg.multimask_output_in_sam
        and (is_init or cfg.multimask_output_for_tracking)
        and (cfg.multimask_min_pt_num <= num_pts <= cfg.multimask_max_pt_num)
    )


def _assemble_memory(model: SAM2Model, cfg: SAM2Config, sel):
    """Pack gathered bank slots into the attention token sequence
    (the concat at sam2_base.py:668-683)."""
    lay = sel["layout"]
    s = lay.tokens_per_tile
    cm = cfg.mem_dim

    hw = cfg.image_embedding_size
    base = jnp.asarray(sine_pos_embed_2d(hw, hw, cm)).reshape(s, cm)
    tpos = model.maskmem_tpos_enc[sel["spatial_tpos"], 0, 0]  # [T, Cm]
    spatial_pos = (base[None, :, :] + tpos[:, None, :]).reshape(1, -1, cm)

    ptrs = sel["ptrs"]  # [O, P, C]
    o, p, c = ptrs.shape
    tpp = c // cm
    ptr_tokens = ptrs.reshape(o, p, tpp, cm).reshape(o, p * tpp, cm)
    ptr_pe = model.obj_ptr_tpos(
        sel["ptr_dist"].astype(jnp.float32), sel["t_diff_max"]
    )  # [P, Cm]
    ptr_pos = jnp.repeat(ptr_pe, tpp, axis=0)[None]

    memory = jnp.concatenate(
        [sel["spatial_mem"], ptr_tokens.astype(sel["spatial_mem"].dtype)], axis=1
    )
    memory_pos = jnp.concatenate(
        [spatial_pos, ptr_pos.astype(spatial_pos.dtype)], axis=1
    )
    valid = jnp.concatenate(
        [
            jnp.repeat(sel["spatial_valid"], s, axis=1),
            jnp.repeat(sel["ptr_valid"], tpp, axis=1),
        ],
        axis=1,
    )  # [O, Nk]
    return memory, memory_pos, valid, lay


def _conditioned_features(model, cfg, feat_o, bank, frame_idx, num_frames,
                          reverse: bool, is_init: bool):
    """Memory-condition the current frame. Returns (pix_feat, bank): the
    bank is returned because the BANKED path (bank.mem_k is not None)
    writes the per-frame obj-ptr staging tile into the cache arrays —
    callers must carry the returned bank so the update stays in-place."""
    if is_init or cfg.num_maskmem == 0:
        if cfg.directly_add_no_mem_embed:
            return model.no_mem_features(feat_o), bank
        raise NotImplementedError("sam2.1 always sets directly_add_no_mem_embed")
    if bank.mem_k is not None:
        return _conditioned_features_banked(
            model, cfg, feat_o, bank, frame_idx, num_frames, reverse
        )
    sel = select_memory(cfg, bank, frame_idx, num_frames, reverse)
    memory, memory_pos, valid, lay = _assemble_memory(model, cfg, sel)
    return model.attend_memory(
        feat_o,
        memory,
        memory_pos,
        valid,
        num_mem_frames=lay.num_mem_frames,
        num_obj_ptr_tokens=lay.num_ptr_tokens,
    ), bank


def _conditioned_features_banked(model, cfg, feat_o, bank, frame_idx,
                                 num_frames, reverse: bool):
    """Bank-indirect memory conditioning: no big-tile gathers, no per-frame
    K projection/rotation — the flash kernel reads the cached K (mem_k) and
    raw V (mem_v) straight from bank rows via the selected slot list. Only
    the small per-frame pieces are computed here: obj-ptr tokens (written
    into the staging row), validity bias, and tpos vectors."""
    sel = select_memory(cfg, bank, frame_idx, num_frames, reverse,
                        gather_spatial=False)
    lay = sel["layout"]
    s = lay.tokens_per_tile
    cm = cfg.mem_dim

    ptrs = sel["ptrs"]  # [O, P, C]
    o, p, c = ptrs.shape
    tpp = c // cm
    n_ptr = p * tpp
    assert n_ptr <= s, "obj-ptr tokens must fit the staging tile"
    ptr_tokens = ptrs.reshape(o, p, tpp, cm).reshape(o, n_ptr, cm)
    ptr_pe = model.obj_ptr_tpos(
        sel["ptr_dist"].astype(jnp.float32), sel["t_diff_max"]
    )  # [P, Cm]
    ptr_pos = jnp.repeat(ptr_pe, tpp, axis=0)[None]  # [1, n_ptr, Cm]

    ptr_tokens = ptr_tokens.astype(bank.mem_v.dtype)
    stage_k = model.project_memory_k(
        ptr_tokens + ptr_pos.astype(ptr_tokens.dtype), spatial=False
    )  # [O, L, n_ptr, D]
    stage_row = bank.mem_k.shape[0] - 1
    bank = bank.replace(
        mem_k=bank.mem_k.at[stage_row, :, :, :n_ptr].set(
            stage_k.astype(bank.mem_k.dtype)
        ),
        mem_v=bank.mem_v.at[stage_row, :, :n_ptr].set(ptr_tokens),
    )

    slots = jnp.concatenate(
        [sel["slots"], jnp.full((1,), stage_row, jnp.int32)]
    )
    tpos = model.maskmem_tpos_enc[sel["spatial_tpos"], 0, 0]  # [T, Cm]
    tpos_vecs = jnp.concatenate([tpos, jnp.zeros((1, cm), tpos.dtype)])

    valid_sp = jnp.repeat(sel["spatial_valid"], s, axis=1)  # [O, T*S]
    valid_stage = jnp.pad(
        jnp.repeat(sel["ptr_valid"], tpp, axis=1), ((0, 0), (0, s - n_ptr))
    )
    mask = jnp.concatenate([valid_sp, valid_stage], axis=1)

    pix = model.attend_memory_banked(
        feat_o, bank.mem_k, bank.mem_v, slots, tpos_vecs, mask
    )
    return pix, bank


def _memk(m, bank, smem):
    """K-cache for a bank write (None in regular mode)."""
    return m.project_memory_k(smem) if bank.mem_k is not None else None


_IMG_MEAN = np.asarray((0.485, 0.456, 0.406), np.float32)
_IMG_STD = np.asarray((0.229, 0.224, 0.225), np.float32)


def normalize_image(img: jnp.ndarray) -> jnp.ndarray:
    """Float inputs are assumed ALREADY normalized and pass through
    unchanged (the loader's prepare_frame emits normalized fp16; parity
    tests feed normalized fp32). uint8 frames pass through RAW: the patch
    embed fuses the ImageNet affine into its space-to-depth layout (a
    separate fp32 normalize pass cost ~0.6 ms/frame at 1024^2). Raw 0..255
    floats are NOT rescaled — convert to uint8 first."""
    if img.dtype == jnp.uint8:
        return img
    return img.astype(jnp.float32)


def _fill_stacked(cfg: SAM2Config, low: jnp.ndarray) -> jnp.ndarray:
    """Batched fill-holes over stacked window outputs [T, O, 1, s4, s4],
    in chunks of frames (skip-frame rows are all-zero planes: one
    >max_area background component, provably untouched). fp32 for the
    <=0 threshold test, matching the per-frame path up to fp16 rounding
    of the raw logits. The chunk size bounds the one-hot histogram
    working set (~100 MB per s4=256 mask) while amortizing the
    propagation rounds over chunk*O masks."""
    if cfg.fill_hole_area <= 0:
        return low
    o = low.shape[1]
    chunk = max(1, 8 // max(o, 1))
    tt = low.shape[0]
    pad_t = (-tt) % chunk
    lowp = jnp.pad(low, ((0, pad_t),) + ((0, 0),) * (low.ndim - 1))
    lowp = lowp.reshape((tt + pad_t) // chunk, chunk * o, *low.shape[2:])
    lowp = jax.lax.map(
        lambda m: _maybe_fill_holes(cfg, m.astype(jnp.float32)).astype(
            jnp.float16
        ),
        lowp,
    )
    return lowp.reshape(tt + pad_t, o, *low.shape[2:])[:tt]


def _broadcast_feats(feats, o: int):
    return tuple(
        jnp.broadcast_to(f, (o,) + f.shape[1:]) if f.shape[0] == 1 else f
        for f in feats
    )


class SAM2Engine:
    """Holds params + compiled step functions. Thread-compatible: all state
    lives in the MemoryBank pytree owned by the caller.

    Compiled-graph cache policy: step functions are lru_cached per
    (reverse, window length, image count, cond-tile bucket, ...) with
    maxsize=64 per family — far above the handful of variants a fixed-knob
    app compiles, but bounded so a long-lived multi-video serving process
    cannot accumulate compiled executables without limit (evicted variants
    recompile from the on-disk JAX compilation cache)."""

    def __init__(
        self,
        cfg: SAM2Config,
        params=None,
        dtype=jnp.float32,
        attention_fn=None,
        seed: int = 0,
    ):
        if attention_fn is None:
            # Pallas flash kernel on TPU (falls back internally for small
            # problems); plain XLA sdpa elsewhere. Trunk window attention
            # stays on XLA's batched path: Pallas multi-window kernels
            # were tried in 3 layouts and measured slower (25-31 vs 18 ms
            # hiera-L encoder — many small grid cells, lane-pad waste at
            # head_dim 72; see CLAUDE.md tried-and-rejected).
            if jax.default_backend() == "tpu":
                attention_fn = flash_attention
            else:
                attention_fn = sdpa
        self.cfg = cfg
        self.dtype = dtype
        self.model = SAM2Model(
            cfg=cfg,
            attention_fn=attention_fn,
            dtype=dtype,
        )
        if params is None:
            params = self._init_params(seed)
        self.params = params

    @property
    def banked_layers(self) -> int:
        """Memory-attention layer count for the bank-indirect
        cross-attention caches (state.init_bank banked_layers), or 0 for
        the regular gather path. DET_SAM2_BANKED_ATTN=0|1 overrides the
        default. Requires the worst-case obj-ptr token count to fit one
        staging tile (true for every reference config; tiny test grids at
        full cond capacity may not fit)."""
        env = os.environ.get("DET_SAM2_BANKED_ATTN", "")
        if env == "0":
            return 0
        lay = memory_layout(self.cfg)  # full-capacity cond tiles
        fits = lay.num_ptr_tokens <= lay.tokens_per_tile
        if env == "1":
            if not fits:
                raise ValueError(
                    "banked attention needs obj-ptr tokens to fit one tile"
                )
            return self.cfg.memory_attention.num_layers
        # default: on for real TPU runs (hiera-L 1024^2 2-obj measured
        # 32.4 -> 34.6 FPS); off elsewhere (the interpret-mode kernel
        # would slow CPU tests, which pin parity explicitly instead)
        if fits and jax.default_backend() == "tpu":
            return self.cfg.memory_attention.num_layers
        return 0

    def _init_params(self, seed: int):
        cfg = self.cfg
        model = self.model

        def touch(mdl: SAM2Model):
            img = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
            feats = mdl.forward_image(img)
            s0, s1, feat = feats
            pix = mdl.no_mem_features(feat)
            mdl.forward_sam_heads(
                pix,
                high_res_features=[s0, s1],
                multimask_output=False,
            )
            s = cfg.image_embedding_size
            nq = s * s
            mem = jnp.zeros((1, nq + cfg.hidden_dim // cfg.mem_dim, cfg.mem_dim),
                            jnp.float32)
            mdl.attend_memory(
                feat,
                mem,
                jnp.zeros_like(mem),
                jnp.ones((mem.shape[1],), bool),
                num_mem_frames=1,
                num_obj_ptr_tokens=cfg.hidden_dim // cfg.mem_dim,
            )
            mdl.encode_memory(
                feat,
                jnp.zeros((1, 1, cfg.image_size, cfg.image_size), jnp.float32),
                jnp.zeros((1, 1), jnp.float32),
            )
            mdl.obj_ptr_tpos(jnp.zeros((2,), jnp.float32), jnp.int32(15))
            mdl.forward_sam_heads(
                pix,
                mask_inputs=jnp.zeros((1, s * 4, s * 4, 1), jnp.float32),
                high_res_features=[s0, s1],
                multimask_output=False,
            )
            if cfg.use_mask_input_as_output_without_sam:
                mdl.use_mask_as_output(
                    pix,
                    [s0, s1],
                    jnp.zeros((1, cfg.image_size, cfg.image_size, 1), jnp.float32),
                )
            return None

        # Trace for shapes only, then fill leaves host-side: running the real
        # initializers would execute a full 1024^2 forward just to make
        # random weights.
        import numpy as np

        shapes = jax.eval_shape(nn.init(touch, model), jax.random.PRNGKey(seed))
        rng = np.random.default_rng(seed)

        def _fill(path, leaf):
            name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
            if name in ("scale", "gamma"):
                v = np.ones(leaf.shape, np.float32)
            elif name == "bias":
                v = np.zeros(leaf.shape, np.float32)
            else:
                v = rng.standard_normal(leaf.shape).astype(np.float32) * 0.02
            return jnp.asarray(v, dtype=leaf.dtype)

        return jax.tree_util.tree_map_with_path(_fill, shapes)["params"]

    # ------------------------------------------------------------------

    @functools.cached_property
    def _encode_image_fn(self):
        return jax.jit(
            nn.apply(
                lambda m, x: m.forward_image(normalize_image(x)), self.model
            )
        )

    def encode_image(self, img):
        """img [1, H, W, 3] normalized -> (feat_s0, feat_s1, feat)."""
        return self._encode_image_fn({"params": self.params}, img)

    @functools.lru_cache(maxsize=64)
    def _track_step_fn(self, reverse: bool):
        cfg, model = self.cfg, self.model

        def body(m: SAM2Model, feats, bank: MemoryBank, frame_idx, num_frames,
                 obj_valid):
            o = bank.num_objects
            s0, s1, feat = _broadcast_feats(feats, o)
            pix, bank = _conditioned_features(
                m, cfg, feat, bank, frame_idx, num_frames, reverse, is_init=False
            )
            multimask = use_multimask(cfg, is_init=False, num_pts=0)
            (_, _, ious, low_res, high_res, obj_ptr, obj_logits) = (
                m.forward_sam_heads(
                    pix,
                    high_res_features=[s0, s1],
                    multimask_output=multimask,
                )
            )
            maskmem = m.encode_memory(
                feat, high_res, obj_logits,
                binarize=False,
                apply_non_overlap=cfg.non_overlap_masks_for_mem_enc,
            )
            smem = maskmem.reshape(o, -1, cfg.mem_dim)
            new_bank = write_noncond(bank, frame_idx, smem, obj_ptr,
                                     obj_valid=obj_valid,
                                     mem_k=_memk(m, bank, smem))
            low_res = _maybe_fill_holes(cfg, low_res)
            out = {
                "pred_masks": low_res,
                "obj_ptr": obj_ptr,
                "object_score_logits": obj_logits,
                "ious": ious,
            }
            return new_bank, out

        fn = nn.apply(body, model)
        return jax.jit(fn, donate_argnums=(2,))

    def track_step(self, feats, bank, frame_idx, num_frames, reverse=False,
                   obj_valid=None):
        """Track one (unprompted) frame: memory-read -> SAM heads ->
        memory-write. Returns (new_bank, outputs)."""
        if obj_valid is None:
            # host-side: a jnp default here would device_put then download
            # again at the np.asarray below (and bool readbacks are not
            # even supported over some device tunnels)
            obj_valid = np.ones((bank.num_objects,), bool)
        return self._track_step_fn(bool(reverse))(
            {"params": self.params}, feats, bank,
            np.int32(frame_idx), np.int32(num_frames), np.asarray(obj_valid),
        )

    @functools.lru_cache(maxsize=64)
    def _prompt_step_fn(self, num_pts: int, is_init: bool, reverse: bool,
                        has_prev_logits: bool):
        cfg, model = self.cfg, self.model

        def body(m, feats, bank, frame_idx, num_frames, points, labels,
                 prev_logits):
            o = points.shape[0]
            s0, s1, feat = _broadcast_feats(feats, o)
            pix, bank = _conditioned_features(
                m, cfg, feat, bank, frame_idx, num_frames, reverse, is_init
            )
            mask_inputs = None
            if has_prev_logits:
                # previous low-res logits fed back as a dense prompt
                # (sam2_video_predictor.py:~480, clamped to +-32)
                mask_inputs = jnp.clip(prev_logits, -32.0, 32.0)
                mask_inputs = mask_inputs[:, 0, :, :, None]
            multimask = use_multimask(cfg, is_init, num_pts)
            (_, _, ious, low_res, high_res, obj_ptr, obj_logits) = (
                m.forward_sam_heads(
                    pix,
                    point_coords=points,
                    point_labels=labels,
                    mask_inputs=mask_inputs,
                    high_res_features=[s0, s1],
                    multimask_output=multimask,
                )
            )
            low_res = _maybe_fill_holes(cfg, low_res)
            return {
                "pred_masks": low_res,
                "obj_ptr": obj_ptr,
                "object_score_logits": obj_logits,
                "ious": ious,
            }

        fn = nn.apply(body, model)
        return jax.jit(fn)

    def prompt_step(
        self, feats, bank, frame_idx, num_frames, points, labels,
        is_init: bool, reverse: bool = False, prev_logits=None,
    ):
        """Run SAM heads with point/box prompts (no memory write — the
        caller consolidates + encodes via encode_cond_memory, mirroring
        run_mem_encoder=False at sam2_video_predictor.py:485-505).

        points [O, P, 2] in model pixels; labels [O, P] (-1 pad rows for
        objects not prompted this frame produce outputs the caller must
        ignore). prev_logits [O, 1, s4, s4] or None.
        """
        p = points.shape[1]
        fn = self._prompt_step_fn(p, bool(is_init), bool(reverse),
                                  prev_logits is not None)
        if prev_logits is None:
            prev_logits = jnp.zeros(
                (points.shape[0], 1, self.cfg.image_size // 4,
                 self.cfg.image_size // 4), jnp.float32
            )
        return fn(
            {"params": self.params}, feats, bank,
            np.int32(frame_idx), np.int32(num_frames),
            points.astype(jnp.float32), labels.astype(jnp.int32), prev_logits,
        )

    @functools.lru_cache(maxsize=64)
    def _predict_step_fn(self, num_pts: int, has_mask: bool, multimask: bool):
        """Memory-less SAM prediction (image predictor / AMG): the no-mem
        path of the heads with full multimask outputs returned."""
        cfg, model = self.cfg, self.model

        def body(m: SAM2Model, feats, points, labels, mask_input):
            o = points.shape[0]
            s0, s1, feat = _broadcast_feats(feats, o)
            pix = m.no_mem_features(feat)
            (multimasks, _, ious, low_res, _, _, obj_logits) = (
                m.forward_sam_heads(
                    pix,
                    point_coords=points,
                    point_labels=labels,
                    mask_inputs=mask_input if has_mask else None,
                    high_res_features=[s0, s1],
                    multimask_output=multimask,
                    gate_no_obj=False,  # image-predictor semantics
                )
            )
            return {
                "multimasks": multimasks,  # [B, M, s4, s4] fp32 logits
                "ious": ious,
                "low_res_masks": low_res,
                "object_score_logits": obj_logits,
            }

        return jax.jit(nn.apply(body, model))

    def predict_step(self, feats, points, labels, mask_input=None,
                     multimask: bool = True):
        """points [B, P, 2] px, labels [B, P]; mask_input [B,1,s4,s4] or
        None. Batched single-image prediction (image predictor / AMG)."""
        p = points.shape[1]
        fn = self._predict_step_fn(p, mask_input is not None, bool(multimask))
        if mask_input is None:
            mask_input = np.zeros((1,), np.float32)  # placeholder leaf
        else:
            mask_input = np.asarray(mask_input, np.float32)[:, 0, :, :, None]
        return fn(
            {"params": self.params},
            feats,
            np.asarray(points, np.float32),
            np.asarray(labels, np.int32),
            mask_input,
        )

    @functools.lru_cache(maxsize=64)
    def _mask_prompt_step_fn(self, is_init: bool, reverse: bool):
        cfg, model = self.cfg, self.model

        def body(m, feats, bank, frame_idx, num_frames, mask_inputs):
            o = mask_inputs.shape[0]
            s0, s1, feat = _broadcast_feats(feats, o)
            if cfg.use_mask_input_as_output_without_sam:
                pix = feat  # no memory conditioning on the direct-mask path
                outs = m.use_mask_as_output(pix, [s0, s1], mask_inputs)
            else:
                pix, bank = _conditioned_features(
                    m, cfg, feat, bank, frame_idx, num_frames, reverse, is_init
                )
                outs = m.forward_sam_heads(
                    pix,
                    mask_inputs=mask_inputs,
                    high_res_features=[s0, s1],
                    multimask_output=use_multimask(cfg, is_init, 0),
                )
            (_, _, ious, low_res, _, obj_ptr, obj_logits) = outs
            low_res = _maybe_fill_holes(cfg, low_res)
            return {
                "pred_masks": low_res,
                "obj_ptr": obj_ptr,
                "object_score_logits": obj_logits,
                "ious": ious,
            }

        return jax.jit(nn.apply(body, model))

    def mask_prompt_step(self, feats, bank, frame_idx, num_frames,
                         mask_inputs, is_init: bool, reverse: bool = False):
        """mask_inputs: [O, H, W, 1] binary float at model resolution."""
        return self._mask_prompt_step_fn(bool(is_init), bool(reverse))(
            {"params": self.params}, feats, bank,
            np.int32(frame_idx), np.int32(num_frames),
            mask_inputs.astype(jnp.float32),
        )

    @functools.lru_cache(maxsize=64)
    def _encode_cond_fn(self, is_mask_from_pts: bool, pinned: bool,
                        to_cond: bool = True):
        cfg, model = self.cfg, self.model

        def body(m, feats, bank, frame_idx, low_res_masks, obj_logits, obj_ptr,
                 obj_valid):
            o = low_res_masks.shape[0]
            _, _, feat = _broadcast_feats(feats, o)
            high_res = torch_resize_hw(
                low_res_masks, (cfg.image_size, cfg.image_size), mode="bilinear"
            )
            binarize = cfg.binarize_mask_from_pts_for_mem_enc and is_mask_from_pts
            maskmem = m.encode_memory(
                feat, high_res, obj_logits,
                binarize=binarize,
                apply_non_overlap=cfg.non_overlap_masks_for_mem_enc,
            )
            smem = maskmem.reshape(o, -1, cfg.mem_dim)
            memk = _memk(m, bank, smem)
            if to_cond:
                return write_cond(bank, frame_idx, smem, obj_ptr,
                                  obj_valid=obj_valid, pinned=pinned,
                                  mem_k=memk)
            return write_noncond(bank, frame_idx, smem, obj_ptr,
                                 obj_valid=obj_valid, mem_k=memk)

        return jax.jit(nn.apply(body, model), donate_argnums=(2,))

    def encode_cond_memory(
        self, feats, bank, frame_idx, low_res_masks, object_score_logits,
        obj_ptr, is_mask_from_pts: bool = True, pinned: bool = False,
        obj_valid=None,
    ):
        """Consolidated-frame memory encoding + cond-bank write (the
        run_mem_encoder consolidation at sam2_video_predictor.py:730-760)."""
        if obj_valid is None:
            obj_valid = np.ones((low_res_masks.shape[0],), bool)
        return self._encode_cond_fn(bool(is_mask_from_pts), bool(pinned))(
            {"params": self.params}, feats, bank, np.int32(frame_idx),
            np.asarray(low_res_masks, np.float32),
            np.asarray(object_score_logits, np.float32), obj_ptr,
            np.asarray(obj_valid),
        )

    def encode_noncond_memory(
        self, feats, bank, frame_idx, low_res_masks, object_score_logits,
        obj_ptr, is_mask_from_pts: bool = True, obj_valid=None,
    ):
        """Consolidated NON-cond frame memory encoding (corrections on
        already-tracked frames land in non_cond_frame_outputs in the
        reference, sam2_video_predictor.py:858-871 — they are read back as
        strided non-cond memories, not as conditioning frames)."""
        if obj_valid is None:
            obj_valid = np.ones((low_res_masks.shape[0],), bool)
        return self._encode_cond_fn(
            bool(is_mask_from_pts), False, to_cond=False
        )(
            {"params": self.params}, feats, bank, np.int32(frame_idx),
            np.asarray(low_res_masks, np.float32),
            np.asarray(object_score_logits, np.float32), obj_ptr,
            np.asarray(obj_valid),
        )

    def attach_bank_caches(self, bank: MemoryBank) -> MemoryBank:
        """Allocate + rebuild the banked-attention caches (mem_k/mem_v)
        from the stored memories. Used after deserializing a bank —
        save_session strips the caches (they are derived state: per-layer
        projections of cond/noncond memories). No-op shape-wise when the
        engine runs the regular path (caches set to None)."""
        nl = self.banked_layers
        if nl == 0:
            return bank.replace(mem_k=None, mem_v=None)
        cfg, model = self.cfg, self.model

        @jax.jit
        def build(params, cond_mem, noncond_mem):
            mems = jnp.concatenate([cond_mem, noncond_mem], axis=0)
            k, o, s, cm = mems.shape
            flat = mems.reshape(k * o, s, cm)
            mk = nn.apply(lambda m, x: m.project_memory_k(x), model)(
                {"params": params}, flat
            )  # [K*O, L, S, D]
            mk = mk.reshape(k, o, nl, s, -1)
            # + the per-frame obj-ptr staging row (rewritten every frame)
            mk = jnp.concatenate([mk, jnp.zeros_like(mk[:1])], axis=0)
            mv = jnp.concatenate([mems, jnp.zeros_like(mems[:1])], axis=0)
            return mk.astype(mems.dtype), mv

        mem_k, mem_v = build(self.params, bank.cond_mem, bank.noncond_mem)
        return bank.replace(mem_k=mem_k, mem_v=mem_v)

    @functools.lru_cache(maxsize=64)
    def _stream_step_fn(self, reverse: bool):
        """One fused jit: image encode + memory read + SAM heads + memory
        write — the steady-state streaming hot path. Fusing lets XLA overlap
        the encoder with memory gathers and skips a host round-trip."""
        cfg, model = self.cfg, self.model

        def body(m: SAM2Model, img, bank: MemoryBank, frame_idx, num_frames,
                 obj_valid):
            feats = m.forward_image(normalize_image(img))
            o = bank.num_objects
            s0, s1, feat = _broadcast_feats(feats, o)
            pix, bank = _conditioned_features(
                m, cfg, feat, bank, frame_idx, num_frames, reverse, is_init=False
            )
            multimask = use_multimask(cfg, is_init=False, num_pts=0)
            (_, _, ious, low_res, high_res, obj_ptr, obj_logits) = (
                m.forward_sam_heads(
                    pix, high_res_features=[s0, s1], multimask_output=multimask
                )
            )
            maskmem = m.encode_memory(
                feat, high_res, obj_logits,
                binarize=False,
                apply_non_overlap=cfg.non_overlap_masks_for_mem_enc,
            )
            smem = maskmem.reshape(o, -1, cfg.mem_dim)
            new_bank = write_noncond(
                bank, frame_idx, smem, obj_ptr,
                obj_valid=obj_valid, mem_k=_memk(m, bank, smem),
            )
            low_res = _maybe_fill_holes(cfg, low_res)
            return new_bank, {
                "pred_masks": low_res,
                "obj_ptr": obj_ptr,
                "object_score_logits": obj_logits,
                "ious": ious,
            }

        return jax.jit(nn.apply(body, model), donate_argnums=(2,))

    def stream_step(self, img, bank, frame_idx, num_frames, reverse=False,
                    obj_valid=None):
        """img [1, H, W, 3] -> (new_bank, outputs); fused encode+track."""
        if obj_valid is None:
            obj_valid = np.ones((bank.num_objects,), bool)
        return self._stream_step_fn(bool(reverse))(
            {"params": self.params}, img, bank,
            np.int32(frame_idx), np.int32(num_frames), np.asarray(obj_valid),
        )

    @functools.lru_cache(maxsize=64)
    def _propagate_window_fn(self, t: int, n_images: int, reverse: bool,
                             pipelined: bool = False):
        """Whole propagation window as ONE jitted lax.scan: T frames stream
        through encode+track+write with the MemoryBank as the scan carry.
        One upload, one dispatch, one download per window — the per-frame
        host round-trips of the reference's Python loop
        (sam2_video_predictor.py:975-1025) disappear entirely.

        Frames flagged in `skips` (prompted/consolidated frames whose
        outputs are reused) pass through via lax.cond without inference or
        bank writes; their images are NOT uploaded — `images` holds only
        the frames to run, addressed per step via `img_idx`.

        pipelined=True selects the software-pipelined body (see
        body_pipelined); the host wrapper picks it when few steps skip."""
        cfg, model = self.cfg, self.model
        s4 = cfg.image_size // 4

        def body(m: SAM2Model, images, bank: MemoryBank, frame_indices,
                 skips, img_idx, num_frames, obj_valid):
            # note: batch-encoding all T frames upfront was measured SLOWER
            # (hiera-S 768: 16.5 vs 12.8 ms/frame) — the B=T activations
            # blow past on-chip reuse; per-step encoding pipelines better.
            def run_step(bank, i_img, frame_idx):
                img = jax.lax.dynamic_index_in_dim(
                    images, i_img, axis=0, keepdims=False
                )
                feats = m.forward_image(normalize_image(img)[None])
                o = bank.num_objects
                s0, s1, feat = _broadcast_feats(feats, o)
                pix, bank = _conditioned_features(
                    m, cfg, feat, bank, frame_idx, num_frames, reverse,
                    is_init=False,
                )
                multimask = use_multimask(cfg, is_init=False, num_pts=0)
                (_, _, ious, low_res, high_res, obj_ptr, obj_logits) = (
                    m.forward_sam_heads(
                        pix, high_res_features=[s0, s1],
                        multimask_output=multimask,
                    )
                )
                maskmem = m.encode_memory(
                    feat, high_res, obj_logits,
                    binarize=False,
                    apply_non_overlap=cfg.non_overlap_masks_for_mem_enc,
                )
                smem = maskmem.reshape(o, -1, cfg.mem_dim)
                new_bank = write_noncond(
                    bank, frame_idx, smem,
                    obj_ptr, obj_valid=obj_valid,
                    mem_k=_memk(m, bank, smem),
                )
                # fp16 mask logits: halves the per-window download (the
                # predictor stores them fp16 anyway). fill-holes runs ONCE
                # on the stacked [T, O, ...] outputs after the scan — the
                # reference also fills only the STORED masks, after memory
                # encoding (sam2_video_predictor.py:1341-1347), so batching
                # it out of the carry is semantics-preserving and lets the
                # CC propagation rounds + histogram matmuls batch over T*O
                # masks instead of paying per-frame overhead.
                return new_bank, (
                    low_res.astype(jnp.float16),
                    obj_ptr.astype(jnp.float32),
                    obj_logits.astype(jnp.float32),
                )

            def skip_step(bank, i_img, frame_idx):
                o = bank.num_objects
                return bank, (
                    jnp.zeros((o, 1, s4, s4), jnp.float16),
                    jnp.zeros((o, cfg.hidden_dim), jnp.float32),
                    jnp.zeros((o, 1), jnp.float32),
                )

            def step(bank, xs):
                frame_idx, skip, i_img = xs
                return jax.lax.cond(skip, skip_step, run_step, bank, i_img,
                                    frame_idx)

            new_bank, (low, ptr, logits) = jax.lax.scan(
                step, bank, (frame_indices, skips, img_idx)
            )
            low = _fill_stacked(cfg, low)
            return new_bank, (low, ptr, logits)

        def body_pipelined(m: SAM2Model, images, bank: MemoryBank,
                           frame_indices, skips, img_idx, num_frames,
                           obj_valid):
            """Software-pipelined window: step t tracks frame t from CARRIED
            features while encoding frame t+1 in the same straight-line
            graph. The serial scan otherwise pays each step's full
            encode+track dependency chain; putting the (independent) next
            encode beside the track ops lets XLA's scheduler fill the
            track side's gather/latency stalls with encoder work. The last
            frame is tracked in an epilogue so no encode is wasted.

            Skip-step semantics match `body`: no bank write (lax.cond
            around the small write only), zeroed outputs. Unlike `body`,
            the track COMPUTE still runs on skip steps (outputs discarded)
            — the straight-line graph is what enables the overlap — so
            windows where most steps skip should use the cond path.

            On-chip A/B (whole-window bench, 2 obj): hiera-S 768
            114.4 -> 117.3 FPS; hiera-L 1024 neutral (32.4 — the chip is
            already bandwidth-saturated there, no stalls left to fill)."""

            def encode(i_img):
                img = jax.lax.dynamic_index_in_dim(
                    images, i_img, axis=0, keepdims=False
                )
                return m.forward_image(normalize_image(img)[None])

            def track(bank, feats, frame_idx, skip):
                o = bank.num_objects
                s0, s1, feat = _broadcast_feats(feats, o)
                pix, bank = _conditioned_features(
                    m, cfg, feat, bank, frame_idx, num_frames, reverse,
                    is_init=False,
                )
                multimask = use_multimask(cfg, is_init=False, num_pts=0)
                (_, _, ious, low_res, high_res, obj_ptr, obj_logits) = (
                    m.forward_sam_heads(
                        pix, high_res_features=[s0, s1],
                        multimask_output=multimask,
                    )
                )
                maskmem = m.encode_memory(
                    feat, high_res, obj_logits,
                    binarize=False,
                    apply_non_overlap=cfg.non_overlap_masks_for_mem_enc,
                )
                smem = maskmem.reshape(o, -1, cfg.mem_dim)
                # masked write, not lax.cond: a conditional in the scan body
                # blocks carry buffer aliasing (the identity branch forces a
                # whole-bank copy per frame)
                new_bank = write_noncond(
                    bank, frame_idx, smem, obj_ptr, obj_valid=obj_valid,
                    skip=skip, mem_k=_memk(m, bank, smem),
                )
                low = jnp.where(skip, jnp.float16(0),
                                low_res.astype(jnp.float16))
                ptr = jnp.where(skip, 0.0, obj_ptr.astype(jnp.float32))
                logit = jnp.where(skip, 0.0, obj_logits.astype(jnp.float32))
                return new_bank, (low, ptr, logit)

            feats0 = encode(img_idx[0])

            def step(carry, xs):
                bank, feats = carry
                frame_idx, skip, next_i = xs
                new_bank, outs = track(bank, feats, frame_idx, skip)
                feats_next = encode(next_i)
                return (new_bank, feats_next), outs

            if t > 1:
                xs = (frame_indices[:-1], skips[:-1], img_idx[1:])
                (bank1, feats_last), (low, ptr, logits) = jax.lax.scan(
                    step, (bank, feats0), xs
                )
            else:
                bank1, feats_last = bank, feats0
                o = bank.num_objects
                low = jnp.zeros((0, o, 1, s4, s4), jnp.float16)
                ptr = jnp.zeros((0, o, cfg.hidden_dim), jnp.float32)
                logits = jnp.zeros((0, o, 1), jnp.float32)
            new_bank, (low_t, ptr_t, logit_t) = track(
                bank1, feats_last, frame_indices[t - 1], skips[t - 1]
            )
            low = jnp.concatenate([low, low_t[None]], axis=0)
            ptr = jnp.concatenate([ptr, ptr_t[None]], axis=0)
            logits = jnp.concatenate([logits, logit_t[None]], axis=0)
            low = _fill_stacked(cfg, low)
            return new_bank, (low, ptr, logits)

        return jax.jit(
            nn.apply(body_pipelined if pipelined and t >= 1 else body, model),
            donate_argnums=(2,),
        )

    @staticmethod
    def _use_pipelined_scan(skips) -> bool:
        """Pipelined scan unless the window is mostly skips (each skip step
        still pays full track compute there) — or an env override says
        otherwise (DET_SAM2_SCAN_PIPELINE=0|1)."""
        env = os.environ.get("DET_SAM2_SCAN_PIPELINE", "")
        if env in ("0", "1"):
            return env == "1"
        s = np.asarray(skips)
        return s.size > 0 and float(s.mean()) <= 0.25

    def propagate_window(self, images, bank, frame_indices, skips,
                         num_frames, reverse=False, obj_valid=None,
                         img_idx=None):
        """images: the frames to RUN, [N, H, W, 3] uint8 (N <= T; skipped
        frames upload nothing); frame_indices/skips [T]; img_idx [T] maps
        each step to its row of `images` (ignored on skip steps). With
        img_idx=None, images must be [T, ...] (identity mapping).
        Returns (new_bank, (pred_masks [T,O,1,s4,s4], obj_ptr [T,O,C],
        object_score_logits [T,O,1]))."""
        t = len(frame_indices)
        if img_idx is None:
            img_idx = np.arange(t, dtype=np.int32)
        # bucket the run-frame count so skip-count variation between
        # windows reuses compiled graphs; device-resident frames pad with a
        # device-side concat (no host round-trip)
        if isinstance(images, jax.Array):
            n = images.shape[0]
            n_bucket = min(max(8, next_pow2(n)), t) if t else 0
            if n < n_bucket:
                images = jnp.concatenate([
                    images,
                    jnp.zeros((n_bucket - n, *images.shape[1:]), images.dtype),
                ])
        else:
            images = np.asarray(images)
            n = images.shape[0]
            n_bucket = min(max(8, next_pow2(n)), t) if t else 0
            if n < n_bucket:
                pad = np.zeros((n_bucket - n, *images.shape[1:]), images.dtype)
                images = np.concatenate([images, pad])
        if obj_valid is None:
            obj_valid = np.ones((bank.num_objects,), bool)
        return self._propagate_window_fn(
            t, images.shape[0], bool(reverse),
            self._use_pipelined_scan(skips),
        )(
            {"params": self.params},
            jnp.asarray(images),
            bank,
            np.asarray(frame_indices, np.int32),
            np.asarray(skips, bool),
            np.asarray(img_idx, np.int32),
            np.int32(num_frames),
            np.asarray(obj_valid),
        )

    @functools.lru_cache(maxsize=64)
    def _batched_window_fn(self, t: int, n_images: int, reverse: bool,
                           counts: tuple, pipelined: bool = False):
        """Lockstep multi-video propagation window: B independent video
        streams tracked in ONE scan over a shared frame clock.

        TPU-native batching design: video v's objects occupy a contiguous
        row group of a single merged MemoryBank (O_total = sum(counts)
        rows) — the per-(slot,object) validity machinery that already
        reproduces the reference's per-object dicts (added objects with
        later cond frames, sam2_video_predictor.py:1437-1535) makes the
        merged bank exact per video. Each scan step encodes B frames as
        one batched trunk call (MXU batching) and repeats each video's
        features over its object rows; memory read/SAM heads/memory
        write are per-object and untouched. One dispatch and one
        download serve B streams — on a high-dispatch-latency setup the
        per-stream overhead drops ~B-fold.

        Per-video skip frames (prompted/consolidated) cannot use lax.cond
        (the predicate is per-lane); instead the step always runs and a
        skipped video's rows are excluded from the bank write
        (obj_valid &) and zeroed in the outputs — the all-rows-invalid
        noncond slot this leaves behind is read back exactly like the
        reference's missing non_cond_frame_outputs entry (select_memory
        picks by frame distance, invalid rows are masked). Steps where
        EVERY video skips take the real lax.cond skip: no encode, no
        write, no image upload."""
        cfg, model = self.cfg, self.model
        s4 = cfg.image_size // 4
        b = len(counts)
        o_total = int(sum(counts))
        counts_arr = np.asarray(counts, np.int32)
        video_of_obj = np.repeat(np.arange(b, dtype=np.int32), counts_arr)

        def body(m: SAM2Model, images, bank: MemoryBank, frame_indices,
                 skips, img_idx, num_frames, obj_valid):
            v_of_o = jnp.asarray(video_of_obj)

            def rep(f):
                return jnp.repeat(
                    f, jnp.asarray(counts_arr), axis=0,
                    total_repeat_length=o_total,
                )

            def run_step(bank, i_img, frame_idx, skip_b):
                imgs = jax.lax.dynamic_index_in_dim(
                    images, i_img, axis=0, keepdims=False
                )  # [B, H, W, 3]
                feats = m.forward_image(normalize_image(imgs))
                s0, s1, feat = (rep(f) for f in feats)
                pix, bank = _conditioned_features(
                    m, cfg, feat, bank, frame_idx, num_frames, reverse,
                    is_init=False,
                )
                multimask = use_multimask(cfg, is_init=False, num_pts=0)
                (_, _, ious, low_res, high_res, obj_ptr, obj_logits) = (
                    m.forward_sam_heads(
                        pix, high_res_features=[s0, s1],
                        multimask_output=multimask,
                    )
                )
                # non-overlap suppression couples objects ACROSS the batch
                # axis; propagate_window_batched rejects the flag upfront
                # (cfg.non_overlap_masks_for_mem_enc is False in every
                # reference config) rather than mixing videos here.
                maskmem = m.encode_memory(
                    feat, high_res, obj_logits,
                    binarize=False, apply_non_overlap=False,
                )
                skip_o = skip_b[v_of_o]  # [O_total]
                smem = maskmem.reshape(o_total, -1, cfg.mem_dim)
                new_bank = write_noncond(
                    bank, frame_idx, smem, obj_ptr,
                    obj_valid=obj_valid & ~skip_o,
                    mem_k=_memk(m, bank, smem),
                )
                # skipped videos emit zeros (the single-video skip_step
                # contract: callers reuse their stored prompted outputs)
                low = jnp.where(
                    skip_o[:, None, None, None], jnp.float16(0),
                    low_res.astype(jnp.float16),
                )
                ptr = jnp.where(skip_o[:, None], 0.0,
                                obj_ptr.astype(jnp.float32))
                logit = jnp.where(skip_o[:, None], 0.0,
                                  obj_logits.astype(jnp.float32))
                return new_bank, (low, ptr, logit)

            def skip_step(bank, i_img, frame_idx, skip_b):
                return bank, (
                    jnp.zeros((o_total, 1, s4, s4), jnp.float16),
                    jnp.zeros((o_total, cfg.hidden_dim), jnp.float32),
                    jnp.zeros((o_total, 1), jnp.float32),
                )

            def step(bank, xs):
                frame_idx, skip_b, i_img = xs
                return jax.lax.cond(
                    jnp.all(skip_b), skip_step, run_step,
                    bank, i_img, frame_idx, skip_b,
                )

            new_bank, (low, ptr, logits) = jax.lax.scan(
                step, bank, (frame_indices, skips, img_idx)
            )
            low = _fill_stacked(cfg, low)
            return new_bank, (low, ptr, logits)

        def body_pipelined(m: SAM2Model, images, bank: MemoryBank,
                           frame_indices, skips, img_idx, num_frames,
                           obj_valid):
            """Software-pipelined lockstep window (see the single-video
            body_pipelined): track B frames from carried features while
            encoding the next B in the same straight-line graph. All-skip
            steps become a masked no-op bank write (write_noncond
            skip=all(skip_b)) — identical slot occupancy to the cond
            path — but still pay full compute, so the wrapper only picks
            this body when few steps are all-skip."""
            v_of_o = jnp.asarray(video_of_obj)

            def rep(f):
                return jnp.repeat(
                    f, jnp.asarray(counts_arr), axis=0,
                    total_repeat_length=o_total,
                )

            def encode(i_img):
                imgs = jax.lax.dynamic_index_in_dim(
                    images, i_img, axis=0, keepdims=False
                )  # [B, H, W, 3]
                return m.forward_image(normalize_image(imgs))

            def track(bank, feats, frame_idx, skip_b):
                s0, s1, feat = (rep(f) for f in feats)
                pix, bank = _conditioned_features(
                    m, cfg, feat, bank, frame_idx, num_frames, reverse,
                    is_init=False,
                )
                multimask = use_multimask(cfg, is_init=False, num_pts=0)
                (_, _, ious, low_res, high_res, obj_ptr, obj_logits) = (
                    m.forward_sam_heads(
                        pix, high_res_features=[s0, s1],
                        multimask_output=multimask,
                    )
                )
                maskmem = m.encode_memory(
                    feat, high_res, obj_logits,
                    binarize=False, apply_non_overlap=False,
                )
                skip_o = skip_b[v_of_o]  # [O_total]
                smem = maskmem.reshape(o_total, -1, cfg.mem_dim)
                new_bank = write_noncond(
                    bank, frame_idx, smem, obj_ptr,
                    obj_valid=obj_valid & ~skip_o,
                    skip=jnp.all(skip_b),
                    mem_k=_memk(m, bank, smem),
                )
                low = jnp.where(
                    skip_o[:, None, None, None], jnp.float16(0),
                    low_res.astype(jnp.float16),
                )
                ptr = jnp.where(skip_o[:, None], 0.0,
                                obj_ptr.astype(jnp.float32))
                logit = jnp.where(skip_o[:, None], 0.0,
                                  obj_logits.astype(jnp.float32))
                return new_bank, (low, ptr, logit)

            feats0 = encode(img_idx[0])

            def step(carry, xs):
                bank, feats = carry
                frame_idx, skip_b, next_i = xs
                new_bank, outs = track(bank, feats, frame_idx, skip_b)
                return (new_bank, encode(next_i)), outs

            if t > 1:
                xs = (frame_indices[:-1], skips[:-1], img_idx[1:])
                (bank1, feats_last), (low, ptr, logits) = jax.lax.scan(
                    step, (bank, feats0), xs
                )
            else:
                bank1, feats_last = bank, feats0
                low = jnp.zeros((0, o_total, 1, s4, s4), jnp.float16)
                ptr = jnp.zeros((0, o_total, cfg.hidden_dim), jnp.float32)
                logits = jnp.zeros((0, o_total, 1), jnp.float32)
            new_bank, (low_t, ptr_t, logit_t) = track(
                bank1, feats_last, frame_indices[t - 1], skips[t - 1]
            )
            low = jnp.concatenate([low, low_t[None]], axis=0)
            ptr = jnp.concatenate([ptr, ptr_t[None]], axis=0)
            logits = jnp.concatenate([logits, logit_t[None]], axis=0)
            low = _fill_stacked(cfg, low)
            return new_bank, (low, ptr, logits)

        return jax.jit(
            nn.apply(body_pipelined if pipelined and t >= 1 else body, model),
            donate_argnums=(2,),
        )

    def propagate_window_batched(self, images, bank, frame_indices, skips,
                                 num_frames, counts, reverse=False,
                                 obj_valid=None, img_idx=None):
        """Track B videos in lockstep through one window.

        images: [N, B, H, W, 3] uint8 — the steps to RUN (N <= T; steps
        where every video skips upload nothing); frame_indices [T] shared
        frame clock; skips [T, B] bool per (step, video); counts: static
        tuple of per-video object counts (bank.num_objects ==
        sum(counts), video v owns rows sum(counts[:v]) ..+counts[v]);
        img_idx [T] maps steps to rows of `images`. Returns (new_bank,
        (pred_masks [T, O_total, 1, s4, s4] fp16, obj_ptr, logits)) —
        split the object axis by `counts` to recover per-video outputs.

        Capacity condition: a partially-skipped step still writes a
        shared noncond slot (the skipped video's rows merely
        invalidated), so a skipped video occupies MORE slots than its
        single-video session would; once the bank is at capacity the
        furthest-slot eviction can then drop a memory that video's
        independent run would still hold. Exactness therefore requires
        noncond_bank_size >= the strided read span
        ((num_maskmem-1)*stride) plus the max per-video skip count in
        the window — violations raise below.
        """
        counts = tuple(int(c) for c in counts)
        if bank.num_objects != sum(counts):
            raise ValueError(
                f"bank has {bank.num_objects} object rows, counts "
                f"{counts} sum to {sum(counts)}"
            )
        if self.cfg.non_overlap_masks_for_mem_enc and len(counts) > 1:
            raise NotImplementedError(
                "non_overlap_masks_for_mem_enc couples objects across "
                "videos; batched windows require it off (it is off in "
                "every reference config)"
            )
        t = len(frame_indices)
        skips_arr = np.asarray(skips, bool)
        if skips_arr.size and len(counts) > 1:
            span = (self.cfg.num_maskmem - 1) * max(
                1, self.cfg.memory_temporal_stride_for_eval
            )
            max_skips = int(skips_arr.sum(axis=0).max())
            if max_skips and self.cfg.noncond_bank_size < span + max_skips:
                raise ValueError(
                    f"noncond_bank_size={self.cfg.noncond_bank_size} cannot "
                    f"guarantee single-session-exact eviction for a video "
                    f"with {max_skips} skipped steps this window (needs >= "
                    f"read span {span} + {max_skips}); enlarge the bank or "
                    f"shorten the window"
                )
        if img_idx is None:
            img_idx = np.arange(t, dtype=np.int32)
        if isinstance(images, jax.Array):
            n = images.shape[0]
            n_bucket = min(max(8, next_pow2(n)), t) if t else 0
            if n < n_bucket:
                images = jnp.concatenate([
                    images,
                    jnp.zeros((n_bucket - n, *images.shape[1:]), images.dtype),
                ])
        else:
            images = np.asarray(images)
            n = images.shape[0]
            n_bucket = min(max(8, next_pow2(n)), t) if t else 0
            if n < n_bucket:
                pad = np.zeros((n_bucket - n, *images.shape[1:]), images.dtype)
                images = np.concatenate([images, pad])
        if obj_valid is None:
            obj_valid = np.ones((bank.num_objects,), bool)
        all_skip_rows = (
            skips_arr.all(axis=1) if skips_arr.size else skips_arr
        )
        return self._batched_window_fn(
            t, images.shape[0], bool(reverse), counts,
            self._use_pipelined_scan(all_skip_rows),
        )(
            {"params": self.params},
            jnp.asarray(images),
            bank,
            np.asarray(frame_indices, np.int32),
            np.asarray(skips, bool),
            np.asarray(img_idx, np.int32),
            np.int32(num_frames),
            np.asarray(obj_valid),
        )

    @functools.lru_cache(maxsize=64)
    def _resize_fn(self, h: int, w: int):
        @jax.jit
        def fn(masks):
            return torch_resize_hw(masks, (h, w), mode="bilinear")

        return fn

    def resize_masks(self, masks, out_hw):
        """Low-res logits -> arbitrary resolution (video res), exact torch
        bilinear (sam2_video_predictor.py:_get_orig_video_res_output)."""
        return self._resize_fn(int(out_hw[0]), int(out_hw[1]))(masks)

    def empty_mask_ptr(self, feats, frame_idx: int = 0):
        """Dummy pointer from an empty mask (sam2_video_predictor.py:769-804)."""
        cfg = self.cfg
        zeros = jnp.zeros((1, cfg.image_size, cfg.image_size, 1), jnp.float32)
        if cfg.use_mask_input_as_output_without_sam:
            # the direct-mask path never reads the bank; None keeps the
            # jitted call free of dead bank uploads
            bank = None
        else:
            # is_init=True skips the memory read, but the traced step still
            # needs a structurally valid bank pytree
            from det_sam2_tpu.state import init_bank

            bank = init_bank(cfg, num_objects=1, dtype=self.dtype)
        out = self._mask_prompt_step_fn(True, False)(
            {"params": self.params},
            tuple(f[:1] for f in feats),
            bank,
            np.int32(frame_idx),
            np.int32(1),
            zeros,
        )
        return out["obj_ptr"]
