"""SAM2Model: the assembled single-frame model (TPU re-design of SAM2Base).

Behavioral equivalent of /root/reference/sam2/modeling/sam2_base.py
(SAM2Base :24, _build_sam_heads :205, _forward_sam_heads :254,
_use_mask_as_output :~400, _encode_new_memory :692, _apply_non_overlapping_
constraints :934). The dict-driven memory *selection* of
_prepare_memory_conditioned_features (:479) lives in det_sam2_tpu/state.py
as pure index arithmetic over the static ring-buffer bank; this module only
provides the compute: SAM heads, memory cross-attention, memory encoding.

Everything is NHWC, batch dim = object slots, shapes static.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from det_sam2_tpu.configs import SAM2Config
from det_sam2_tpu.modeling.image_encoder import ImageEncoder
from det_sam2_tpu.modeling.layers import MLP, approx_gelu, exact_gelu, sdpa
from det_sam2_tpu.modeling.mask_decoder import MaskDecoder
from det_sam2_tpu.modeling.memory_attention import MemoryAttention
from det_sam2_tpu.modeling.memory_encoder import MemoryEncoder
from det_sam2_tpu.modeling.position_encoding import get_1d_sine_pe, sine_pos_embed_2d
from det_sam2_tpu.modeling.prompt_encoder import PromptEncoder
from det_sam2_tpu.utils.resize import torch_resize_hw

# placeholder score for missing objects (sam2_base.py:21)
NO_OBJ_SCORE = -1024.0


class SAM2Model(nn.Module):
    cfg: SAM2Config
    attention_fn: Callable = sdpa
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        encoder_cls = (
            nn.remat(ImageEncoder, static_argnums=())
            if c.remat_image_encoder
            else ImageEncoder
        )
        use_approx = c.use_approx_gelu
        if use_approx is None:  # auto: tanh in bf16 (sub-ulp difference)
            use_approx = self.dtype == jnp.bfloat16
        gelu = approx_gelu if use_approx else exact_gelu
        self.image_encoder = encoder_cls(
            hiera_cfg=c.hiera,
            neck_cfg=c.neck,
            scalp=c.scalp,
            attention_fn=self.attention_fn,
            gelu=gelu,
            dtype=self.dtype,
        )
        self.memory_attention = MemoryAttention(
            cfg=c.memory_attention, attention_fn=self.attention_fn, dtype=self.dtype
        )
        self.memory_encoder = MemoryEncoder(cfg=c.memory_encoder, dtype=self.dtype)
        s = c.image_embedding_size
        self.sam_prompt_encoder = PromptEncoder(
            embed_dim=c.hidden_dim,
            image_embedding_size=(s, s),
            input_image_size=(c.image_size, c.image_size),
            mask_in_chans=16,
            dtype=self.dtype,
        )
        self.sam_mask_decoder = MaskDecoder(
            transformer_dim=c.hidden_dim,
            num_multimask_outputs=3,
            iou_head_depth=3,
            iou_head_hidden_dim=256,
            use_high_res_features=c.use_high_res_features_in_sam,
            iou_prediction_use_sigmoid=c.iou_prediction_use_sigmoid,
            dynamic_multimask_via_stability=c.dynamic_multimask_via_stability,
            dynamic_multimask_stability_delta=c.dynamic_multimask_stability_delta,
            dynamic_multimask_stability_thresh=c.dynamic_multimask_stability_thresh,
            pred_obj_scores=c.pred_obj_scores,
            pred_obj_scores_mlp=c.pred_obj_scores_mlp,
            use_multimask_token_for_obj_ptr=c.use_multimask_token_for_obj_ptr,
            dtype=self.dtype,
        )

        init = nn.initializers.normal(stddev=0.02)
        self.maskmem_tpos_enc = self.param(
            "maskmem_tpos_enc", init, (c.num_maskmem, 1, 1, c.mem_dim)
        )
        self.no_mem_embed = self.param("no_mem_embed", init, (1, 1, c.hidden_dim))
        self.no_mem_pos_enc = self.param("no_mem_pos_enc", init, (1, 1, c.hidden_dim))
        if c.pred_obj_scores and c.use_obj_ptrs_in_encoder:
            self.no_obj_ptr = self.param("no_obj_ptr", init, (1, c.hidden_dim))
        if c.no_obj_embed_spatial:
            self.no_obj_embed_spatial = self.param(
                "no_obj_embed_spatial", init, (1, c.mem_dim)
            )
        if c.use_obj_ptrs_in_encoder:
            self.mask_downsample = nn.Conv(
                1, (4, 4), strides=(4, 4), dtype=self.dtype, name="mask_downsample"
            )
            if c.use_mlp_for_obj_ptr_proj:
                self.obj_ptr_proj = MLP(
                    hidden_dim=c.hidden_dim, output_dim=c.hidden_dim, num_layers=3,
                    dtype=self.dtype, name="obj_ptr_proj",
                )
            else:
                self.obj_ptr_proj = MLP(
                    hidden_dim=c.hidden_dim, output_dim=c.hidden_dim, num_layers=1,
                    dtype=self.dtype, name="obj_ptr_proj",
                )
        else:
            # reference always defines the projection (nn.Identity when
            # pointers are unused, sam2_base.py:240-248) — forward_sam_heads
            # calls it unconditionally
            self.obj_ptr_proj = lambda x: x
        if c.proj_tpos_enc_in_obj_ptrs:
            self.obj_ptr_tpos_proj = nn.Dense(
                c.mem_dim, dtype=self.dtype, name="obj_ptr_tpos_proj"
            )

    # ------------------------------------------------------------------
    # image features
    # ------------------------------------------------------------------

    def forward_image(self, img: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        """img [B, H, W, 3] -> (feat_s0 [B,4s,4s,C/8], feat_s1 [B,2s,2s,C/4],
        feat [B,s,s,C]) with SAM decoder convs pre-applied
        (sam2_base.py:451-462)."""
        out = self.image_encoder(img)
        fpn = out["backbone_fpn"]
        if self.cfg.use_high_res_features_in_sam:
            s0 = self.sam_mask_decoder.conv_s0(fpn[0])
            s1 = self.sam_mask_decoder.conv_s1(fpn[1])
            return s0, s1, fpn[2]
        # uniform arity so callers can always unpack (s0, s1, feat)
        return None, None, fpn[-1]

    # ------------------------------------------------------------------
    # SAM heads
    # ------------------------------------------------------------------

    def forward_sam_heads(
        self,
        backbone_features: jnp.ndarray,  # [B, s, s, C]
        point_coords: Optional[jnp.ndarray] = None,  # [B, P, 2]
        point_labels: Optional[jnp.ndarray] = None,  # [B, P]
        mask_inputs: Optional[jnp.ndarray] = None,  # [B, H, W, 1] float
        high_res_features: Optional[List[jnp.ndarray]] = None,
        multimask_output: bool = False,
        gate_no_obj: bool = True,  # False = the image-predictor path, which
        # calls the decoder directly and never fills NO_OBJ_SCORE
        # (sam2_image_predictor.py:420)
        training: bool = False,  # disables the decoder's dynamic-stability
        # multimask swap (reference gates it with `not self.training`)
    ):
        """Equivalent of sam2_base.py:_forward_sam_heads (:254-399).

        Returns (low_res_multimasks [B,M,s4,s4], high_res_multimasks
        [B,M,H,W], ious [B,M], low_res_masks [B,1,s4,s4], high_res_masks
        [B,1,H,W], obj_ptr [B,C], object_score_logits [B,1]); mask logits
        fp32.
        """
        c = self.cfg
        b = backbone_features.shape[0]
        if point_coords is None:
            point_coords = jnp.zeros((b, 1, 2), jnp.float32)
            point_labels = -jnp.ones((b, 1), jnp.int32)

        sam_mask_prompt = None
        if mask_inputs is not None:
            target = self.sam_prompt_encoder.mask_input_hw
            if mask_inputs.shape[1:3] != target:
                m = mask_inputs[..., 0].astype(jnp.float32)
                m = torch_resize_hw(m, target, mode="bilinear", antialias=True)
                sam_mask_prompt = m[..., None]
            else:
                sam_mask_prompt = mask_inputs

        sparse, dense = self.sam_prompt_encoder(
            points=(point_coords, point_labels), masks=sam_mask_prompt
        )
        dense_pe = self.sam_prompt_encoder.get_dense_pe()
        low_res_multimasks, ious, sam_output_tokens, object_score_logits = (
            self.sam_mask_decoder(
                backbone_features,
                dense_pe,
                sparse,
                dense,
                multimask_output,
                high_res_features,
                training=training,
            )
        )
        low_res_multimasks = low_res_multimasks.astype(jnp.float32)
        if c.pred_obj_scores and gate_no_obj:
            is_obj_appearing = object_score_logits > 0  # [B, 1]
            low_res_multimasks = jnp.where(
                is_obj_appearing[:, None, None],
                low_res_multimasks,
                NO_OBJ_SCORE,
            )
        high_res_multimasks = torch_resize_hw(
            low_res_multimasks, (c.image_size, c.image_size), mode="bilinear"
        )

        sam_output_token = sam_output_tokens[:, 0]
        if multimask_output:
            best = jnp.argmax(ious, axis=-1)  # [B]
            onehot = jax.nn.one_hot(best, ious.shape[-1], dtype=jnp.float32)
            low_res_masks = jnp.einsum(
                "bm,bmhw->bhw", onehot, low_res_multimasks
            )[:, None]
            high_res_masks = jnp.einsum(
                "bm,bmhw->bhw", onehot, high_res_multimasks
            )[:, None]
            if sam_output_tokens.shape[1] > 1:
                sam_output_token = jnp.einsum(
                    "bm,bmc->bc", onehot.astype(sam_output_tokens.dtype),
                    sam_output_tokens,
                )
        else:
            low_res_masks, high_res_masks = low_res_multimasks, high_res_multimasks

        obj_ptr = self.obj_ptr_proj(sam_output_token)
        if c.pred_obj_scores:
            if c.soft_no_obj_ptr:
                lam = jax.nn.sigmoid(object_score_logits)
            else:
                lam = (object_score_logits > 0).astype(obj_ptr.dtype)
            if c.fixed_no_obj_ptr:
                obj_ptr = lam * obj_ptr
            if c.use_obj_ptrs_in_encoder:
                # no_obj_ptr only exists alongside encoder pointers
                # (reference defines it under the same pair of flags,
                # sam2_base.py:170-172)
                obj_ptr = obj_ptr + (1.0 - lam) * self.no_obj_ptr

        return (
            low_res_multimasks,
            high_res_multimasks,
            ious,
            low_res_masks,
            high_res_masks,
            obj_ptr,
            object_score_logits,
        )

    def use_mask_as_output(
        self,
        backbone_features: jnp.ndarray,
        high_res_features: Optional[List[jnp.ndarray]],
        mask_inputs: jnp.ndarray,  # [B, H, W, 1]
    ):
        """Directly emit the input mask as output (sam2_base.py:~400-449)."""
        c = self.cfg
        out_scale, out_bias = 20.0, -10.0
        mask_f = mask_inputs.astype(jnp.float32)
        high_res_masks = (mask_f * out_scale + out_bias)[..., 0][:, None]  # [B,1,H,W]
        low_res_masks = torch_resize_hw(
            high_res_masks,
            (high_res_masks.shape[-2] // 4, high_res_masks.shape[-1] // 4),
            mode="bilinear",
            antialias=True,
        )
        ious = jnp.ones((mask_inputs.shape[0], 1), jnp.float32)
        if not c.use_obj_ptrs_in_encoder:
            obj_ptr = jnp.zeros((mask_inputs.shape[0], c.hidden_dim), self.dtype)
        else:
            small = self.mask_downsample(mask_f)
            _, _, _, _, _, obj_ptr, _ = self.forward_sam_heads(
                backbone_features,
                mask_inputs=small,
                high_res_features=high_res_features,
            )
        is_obj_appearing = jnp.any(
            mask_f.reshape(mask_f.shape[0], -1) > 0.0, axis=1
        )[:, None]
        lam = is_obj_appearing.astype(jnp.float32)
        object_score_logits = out_scale * lam + out_bias
        if c.pred_obj_scores:
            if c.fixed_no_obj_ptr:
                obj_ptr = lam * obj_ptr
            if c.use_obj_ptrs_in_encoder:
                obj_ptr = obj_ptr + (1.0 - lam) * self.no_obj_ptr
        return (
            low_res_masks,
            high_res_masks,
            ious,
            low_res_masks,
            high_res_masks,
            obj_ptr,
            object_score_logits,
        )

    # ------------------------------------------------------------------
    # memory
    # ------------------------------------------------------------------

    def no_mem_features(self, curr_feat: jnp.ndarray) -> jnp.ndarray:
        """Init-cond-frame path: add the learned no-memory embedding
        (sam2_base.py:directly_add_no_mem_embed branch)."""
        b, h, w, cdim = curr_feat.shape
        x = curr_feat.reshape(b, h * w, cdim) + self.no_mem_embed.astype(
            curr_feat.dtype
        )
        return x.reshape(b, h, w, cdim)

    def attend_memory(
        self,
        curr_feat: jnp.ndarray,  # [B, s, s, C]
        memory: jnp.ndarray,  # [B, Nk, mem_dim]
        memory_pos: jnp.ndarray,  # [B or 1, Nk, mem_dim]
        memory_mask: jnp.ndarray,  # [Nk] or [B, Nk] bool
        num_mem_frames: int,
        num_obj_ptr_tokens: int,
    ) -> jnp.ndarray:
        """Memory cross-attention (sam2_base.py:668-690)."""
        c = self.cfg
        b, h, w, cdim = curr_feat.shape
        curr = curr_feat.reshape(b, h * w, cdim)
        curr_pos = jnp.asarray(
            sine_pos_embed_2d(h, w, c.hidden_dim).reshape(1, h * w, c.hidden_dim)
        ).astype(curr.dtype)
        curr_pos = jnp.broadcast_to(curr_pos, curr.shape)
        if memory_mask.ndim == 1:
            memory_mask = jnp.broadcast_to(memory_mask[None], memory.shape[:2])
        if memory_pos.shape[0] == 1 and b > 1:
            memory_pos = jnp.broadcast_to(memory_pos, memory.shape)
        out = self.memory_attention(
            curr,
            memory,
            curr_pos=curr_pos,
            memory_pos=memory_pos,
            num_obj_ptr_tokens=num_obj_ptr_tokens,
            num_mem_frames=num_mem_frames,
            memory_mask=memory_mask,
        )
        return out.reshape(b, h, w, cdim)

    def encode_memory(
        self,
        curr_feat: jnp.ndarray,  # [B, s, s, C] (pre-memory pixel features)
        high_res_masks: jnp.ndarray,  # [B, 1, H, W] fp32 logits
        object_score_logits: jnp.ndarray,  # [B, 1]
        binarize: bool = False,
        apply_non_overlap: bool = False,
    ) -> jnp.ndarray:
        """Encode prediction into a [B, s, s, mem_dim] memory
        (sam2_base.py:_encode_new_memory :692-744)."""
        c = self.cfg
        masks = high_res_masks
        if apply_non_overlap:
            masks = apply_non_overlapping_constraints(masks)
        if binarize:
            mask_for_mem = (masks > 0).astype(jnp.float32)
        else:
            mask_for_mem = jax.nn.sigmoid(masks)
        if c.sigmoid_scale_for_mem_enc != 1.0:
            mask_for_mem = mask_for_mem * c.sigmoid_scale_for_mem_enc
        if c.sigmoid_bias_for_mem_enc != 0.0:
            mask_for_mem = mask_for_mem + c.sigmoid_bias_for_mem_enc
        mask_nhwc = mask_for_mem[:, 0, :, :, None].astype(self.dtype)
        maskmem = self.memory_encoder(curr_feat, mask_nhwc, skip_mask_sigmoid=True)
        if c.no_obj_embed_spatial:
            is_obj = (object_score_logits > 0).astype(maskmem.dtype)  # [B, 1]
            maskmem = maskmem + (1.0 - is_obj)[:, None, None, :] * (
                self.no_obj_embed_spatial[None, None].astype(maskmem.dtype)
            )
        return maskmem

    def project_memory_k(self, mem: jnp.ndarray, spatial: bool = True
                         ) -> jnp.ndarray:
        """Bank-write-time K cache for the bank-indirect cross-attention:
        [B, S, Cm] memory -> [B, L, S, D] per-layer roped keys of
        (mem + spatial_pos). The per-frame temporal-position term is added
        in-kernel at read time (rope distributes over the sum).
        spatial=False projects obj-ptr staging tokens: the caller already
        added their positional term and they are never rotated."""
        c = self.cfg
        x = mem
        if spatial:
            hw = c.image_embedding_size
            spos = jnp.asarray(
                sine_pos_embed_2d(hw, hw, c.mem_dim).reshape(1, -1, c.mem_dim)
            )
            x = mem + spos.astype(mem.dtype)
        return self.memory_attention(
            x, None, mode="project_k", roped=spatial
        )

    def attend_memory_banked(
        self,
        curr_feat: jnp.ndarray,  # [B, s, s, C]
        mem_k: jnp.ndarray,  # [Ktot+1, B, L, S, D] (staging row written)
        mem_v: jnp.ndarray,  # [Ktot+1, B, S, Cm]
        slots: jnp.ndarray,  # [T+1] int32 (incl. the staging row)
        tpos_vecs: jnp.ndarray,  # [T+1, Cm] (zero row for the staging tile)
        memory_mask: jnp.ndarray,  # [B, (T+1)*S] bool
    ) -> jnp.ndarray:
        """Memory cross-attention reading K/V straight from bank rows."""
        c = self.cfg
        b, h, w, cdim = curr_feat.shape
        curr = curr_feat.reshape(b, h * w, cdim)
        curr_pos = jnp.asarray(
            sine_pos_embed_2d(h, w, c.hidden_dim).reshape(1, h * w, c.hidden_dim)
        ).astype(curr.dtype)
        curr_pos = jnp.broadcast_to(curr_pos, curr.shape)
        out = self.memory_attention(
            curr, None,
            curr_pos=curr_pos,
            memory_mask=memory_mask,
            mode="attend_banked",
            banked={"mem_k": mem_k, "mem_v": mem_v, "slots": slots,
                    "tpos_vecs": tpos_vecs},
        )
        return out.reshape(b, h, w, cdim)

    def obj_ptr_tpos(self, pos: jnp.ndarray, t_diff_max: jnp.ndarray) -> jnp.ndarray:
        """Temporal PE for object pointers (sam2_base.py:599-648):
        pos [P] (signed frame distances) -> [P, mem_dim]."""
        c = self.cfg
        if c.add_tpos_enc_to_obj_ptrs:
            tpos_dim = c.hidden_dim if c.proj_tpos_enc_in_obj_ptrs else c.mem_dim
            pe = get_1d_sine_pe(
                pos / jnp.maximum(t_diff_max, 1).astype(jnp.float32), dim=tpos_dim
            )
            if c.proj_tpos_enc_in_obj_ptrs:
                pe = self.obj_ptr_tpos_proj(pe.astype(self.dtype))
            return pe.astype(jnp.float32)
        return jnp.zeros((pos.shape[0], c.mem_dim), jnp.float32)


def apply_non_overlapping_constraints(pred_masks: jnp.ndarray) -> jnp.ndarray:
    """Keep only the argmax object per pixel (sam2_base.py:934-952).
    pred_masks: [O, 1, H, W]."""
    if pred_masks.shape[0] == 1:
        return pred_masks
    max_obj = jnp.argmax(pred_masks, axis=0, keepdims=True)
    batch_obj = jnp.arange(pred_masks.shape[0])[:, None, None, None]
    keep = max_obj == batch_obj
    return jnp.where(keep, pred_masks, jnp.clip(pred_masks, max=-10.0))
