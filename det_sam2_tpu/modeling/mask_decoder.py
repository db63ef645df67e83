"""SAM mask decoder: output tokens + two-way transformer + hypernetworks.

Behavioral equivalent of /root/reference/sam2/modeling/sam/mask_decoder.py
(MaskDecoder :15, predict_masks :163, _get_stability_scores :~250,
_dynamic_multimask_via_stability :261).

TPU re-design notes:
  * NHWC throughout; the 2x2-stride-2 transposed convs of the upscaler are
    implemented as Dense(4*out) + depth-to-space — exactly equivalent to
    torch's ConvTranspose2d(k=2, s=2) but lowered as one MXU matmul instead
    of a conv-transpose (and with zero layout ambiguity);
  * mask/IoU selection uses one-hot matmuls rather than fancy indexing;
  * multimask_output is a static Python flag (two jitted variants).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from det_sam2_tpu.modeling.layers import LayerNorm, MLP, exact_gelu
from det_sam2_tpu.modeling.transformer import TwoWayTransformer


class ConvTranspose2x(nn.Module):
    """ConvTranspose2d(kernel=2, stride=2) as Dense + depth-to-space.

    Torch weight layout [C_in, C_out, 2, 2] is stored verbatim as the param
    'kernel'; out[2i+di, 2j+dj, o] = sum_c x[i, j, c] * kernel[c, o, di, dj].
    """

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (cin, self.features, 2, 2),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        b, h, w, _ = x.shape
        wmat = kernel.reshape(cin, self.features * 4).astype(self.dtype)
        y = x @ wmat  # [B, H, W, out*4] with (o, di, dj) minor order
        y = y.reshape(b, h, w, self.features, 2, 2)
        y = y.transpose(0, 1, 4, 2, 5, 3)  # B, H, di, W, dj, out
        y = y.reshape(b, 2 * h, 2 * w, self.features)
        return y + bias.astype(self.dtype)


class MaskDecoder(nn.Module):
    transformer_dim: int = 256
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    use_high_res_features: bool = False
    iou_prediction_use_sigmoid: bool = False
    dynamic_multimask_via_stability: bool = False
    dynamic_multimask_stability_delta: float = 0.05
    dynamic_multimask_stability_thresh: float = 0.98
    pred_obj_scores: bool = False
    pred_obj_scores_mlp: bool = False
    use_multimask_token_for_obj_ptr: bool = False
    dtype: jnp.dtype = jnp.float32

    @property
    def num_mask_tokens(self) -> int:
        return self.num_multimask_outputs + 1

    def setup(self):
        d = self.transformer_dim
        self.iou_token = self.param("iou_token", nn.initializers.normal(1.0), (1, d))
        self.mask_tokens = self.param(
            "mask_tokens", nn.initializers.normal(1.0), (self.num_mask_tokens, d)
        )
        if self.pred_obj_scores:
            self.obj_score_token = self.param(
                "obj_score_token", nn.initializers.normal(1.0), (1, d)
            )
        self.transformer = TwoWayTransformer(
            depth=2, embedding_dim=d, num_heads=8, mlp_dim=2048, dtype=self.dtype,
            name="transformer",
        )
        self.upscale_conv1 = ConvTranspose2x(d // 4, dtype=self.dtype,
                                             name="upscale_conv1")
        self.upscale_ln = LayerNorm(eps=1e-6, name="upscale_ln")
        self.upscale_conv2 = ConvTranspose2x(d // 8, dtype=self.dtype,
                                             name="upscale_conv2")
        self.hypernets = [
            MLP(hidden_dim=d, output_dim=d // 8, num_layers=3, dtype=self.dtype,
                name=f"hypernet_{i}")
            for i in range(self.num_mask_tokens)
        ]
        self.iou_prediction_head = MLP(
            hidden_dim=self.iou_head_hidden_dim,
            output_dim=self.num_mask_tokens,
            num_layers=self.iou_head_depth,
            sigmoid_output=self.iou_prediction_use_sigmoid,
            dtype=self.dtype,
            name="iou_prediction_head",
        )
        if self.pred_obj_scores:
            if self.pred_obj_scores_mlp:
                self.pred_obj_score_head = MLP(
                    hidden_dim=d, output_dim=1, num_layers=3, dtype=self.dtype,
                    name="pred_obj_score_head",
                )
            else:
                self.pred_obj_score_head = MLP(
                    hidden_dim=d, output_dim=1, num_layers=1, dtype=self.dtype,
                    name="pred_obj_score_head",
                )
        if self.use_high_res_features:
            # conv_s0/s1 live here in the reference checkpoint layout but are
            # applied inside forward_image (sam2_base.py:451-462)
            self.conv_s0 = nn.Conv(d // 8, (1, 1), dtype=self.dtype, name="conv_s0")
            self.conv_s1 = nn.Conv(d // 4, (1, 1), dtype=self.dtype, name="conv_s1")

    def predict_masks(
        self,
        image_embeddings: jnp.ndarray,  # [B, H, W, C]
        image_pe: jnp.ndarray,  # [H, W, C]
        sparse_prompt_embeddings: jnp.ndarray,  # [B, N, C]
        dense_prompt_embeddings: jnp.ndarray,  # [B, H, W, C]
        high_res_features: Optional[List[jnp.ndarray]] = None,  # NHWC s0, s1
    ):
        b = sparse_prompt_embeddings.shape[0]
        s = 1 if self.pred_obj_scores else 0
        if self.pred_obj_scores:
            output_tokens = jnp.concatenate(
                [self.obj_score_token, self.iou_token, self.mask_tokens], axis=0
            )
        else:
            output_tokens = jnp.concatenate([self.iou_token, self.mask_tokens], 0)
        output_tokens = jnp.broadcast_to(
            output_tokens[None], (b, *output_tokens.shape)
        ).astype(self.dtype)
        tokens = jnp.concatenate([output_tokens, sparse_prompt_embeddings], axis=1)

        h, w, c = image_embeddings.shape[1:4]
        src = image_embeddings + dense_prompt_embeddings
        src_seq = src.reshape(b, h * w, c)
        pe_seq = jnp.broadcast_to(
            image_pe.reshape(1, h * w, c), (b, h * w, c)
        ).astype(self.dtype)

        hs, src_seq = self.transformer(src_seq, pe_seq, tokens)
        iou_token_out = hs[:, s, :]
        mask_tokens_out = hs[:, s + 1 : s + 1 + self.num_mask_tokens, :]

        src = src_seq.reshape(b, h, w, c)
        if not self.use_high_res_features:
            up = exact_gelu(self.upscale_ln(self.upscale_conv1(src)))
            up = exact_gelu(self.upscale_conv2(up))
        else:
            feat_s0, feat_s1 = high_res_features
            up = exact_gelu(self.upscale_ln(self.upscale_conv1(src) + feat_s1))
            up = exact_gelu(self.upscale_conv2(up) + feat_s0)

        hyper_in = jnp.stack(
            [self.hypernets[i](mask_tokens_out[:, i]) for i in
             range(self.num_mask_tokens)],
            axis=1,
        )  # [B, M, C/8]
        bh, hh, wh, ch = up.shape
        masks = jnp.einsum(
            "bmc,bhwc->bmhw", hyper_in, up, preferred_element_type=jnp.float32
        )

        iou_pred = self.iou_prediction_head(iou_token_out)
        if self.pred_obj_scores:
            object_score_logits = self.pred_obj_score_head(hs[:, 0, :])
        else:
            object_score_logits = 10.0 * jnp.ones((b, 1), self.dtype)
        return masks, iou_pred, mask_tokens_out, object_score_logits

    def _stability_scores(self, mask_logits: jnp.ndarray) -> jnp.ndarray:
        flat = mask_logits.reshape(*mask_logits.shape[:-2], -1)
        d = self.dynamic_multimask_stability_delta
        area_i = jnp.sum(flat > d, axis=-1).astype(jnp.float32)
        area_u = jnp.sum(flat > -d, axis=-1).astype(jnp.float32)
        return jnp.where(area_u > 0, area_i / jnp.maximum(area_u, 1.0), 1.0)

    def _dynamic_multimask(self, all_mask_logits, all_iou_scores):
        """Fallback single->best-multimask when token-0 is unstable
        (mask_decoder.py:261-...)."""
        multimask_logits = all_mask_logits[:, 1:]
        multimask_iou = all_iou_scores[:, 1:]
        best = jnp.argmax(multimask_iou, axis=-1)
        onehot = jax.nn.one_hot(best, multimask_iou.shape[-1],
                                dtype=multimask_logits.dtype)
        best_logits = jnp.einsum("bm,bmhw->bhw", onehot, multimask_logits)[:, None]
        best_iou = jnp.einsum(
            "bm,bm->b", onehot.astype(multimask_iou.dtype), multimask_iou
        )[:, None]

        single_logits = all_mask_logits[:, 0:1]
        single_iou = all_iou_scores[:, 0:1]
        stable = (
            self._stability_scores(single_logits)
            >= self.dynamic_multimask_stability_thresh
        )
        out_logits = jnp.where(stable[..., None, None], single_logits, best_logits)
        out_iou = jnp.where(stable, single_iou, best_iou)
        return out_logits, out_iou

    def __call__(
        self,
        image_embeddings,
        image_pe,
        sparse_prompt_embeddings,
        dense_prompt_embeddings,
        multimask_output: bool,
        high_res_features=None,
        training: bool = False,
    ):
        masks, iou_pred, mask_tokens_out, object_score_logits = self.predict_masks(
            image_embeddings,
            image_pe,
            sparse_prompt_embeddings,
            dense_prompt_embeddings,
            high_res_features,
        )
        if multimask_output:
            out_masks = masks[:, 1:]
            out_iou = iou_pred[:, 1:]
        elif self.dynamic_multimask_via_stability and not training:
            out_masks, out_iou = self._dynamic_multimask(masks, iou_pred)
        else:
            out_masks = masks[:, 0:1]
            out_iou = iou_pred[:, 0:1]

        if multimask_output and self.use_multimask_token_for_obj_ptr:
            sam_tokens_out = mask_tokens_out[:, 1:]
        else:
            sam_tokens_out = mask_tokens_out[:, 0:1]
        return out_masks, out_iou, sam_tokens_out, object_score_logits
