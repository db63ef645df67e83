"""Attention layers and the two-way (token <-> image) transformer.

Behavioral equivalents of /root/reference/sam2/modeling/sam/transformer.py
(TwoWayTransformer :44, TwoWayAttentionBlock :136, Attention :214,
RoPEAttention :287). TPU re-design: batch-first [B, N, C] token layout,
fp32 softmax, optional RoPE passed in as host-precomputed cos/sin tables
(with a static count of trailing tokens excluded from rotation — the
object-pointer tokens in memory cross-attention).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from det_sam2_tpu.modeling.layers import LayerNorm, MLP, sdpa
from det_sam2_tpu.modeling.position_encoding import (
    apply_rope,
    apply_rope_halves,
    rope_channel_perm,
)


class _PermutedDense(nn.Module):
    """Dense with optionally permuted output columns. Parameter tree is
    identical to nn.Dense (kernel/bias), so converted checkpoints load
    unchanged; the permutation is a compile-time-folded [D, D] kernel
    gather (see rope_channel_perm)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, perm=None):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (x.shape[-1], self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        kernel = kernel.astype(self.dtype)
        bias = bias.astype(self.dtype)
        if perm is not None:
            kernel = kernel[:, perm]
            bias = bias[perm]
        return x.astype(self.dtype) @ kernel + bias


class Attention(nn.Module):
    """Multi-head attention with optional internal downsampling, separate
    kv input width, RoPE, and additive bias (for padded-memory masking)."""

    embedding_dim: int
    num_heads: int
    downsample_rate: int = 1
    kv_in_dim: Optional[int] = None
    attention_fn: Callable = sdpa
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        q: jnp.ndarray,
        k: jnp.ndarray,
        v: jnp.ndarray,
        rope_q: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        rope_k: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        num_k_rope: Optional[int] = None,
        bias: Optional[jnp.ndarray] = None,
        project_k_only: bool = False,
        banked: Optional[dict] = None,
    ) -> jnp.ndarray:
        internal = self.embedding_dim // self.downsample_rate
        h = self.num_heads

        if project_k_only:
            # bank-write-time K-cache projection: k_proj (incl. bias) of the
            # raw input, in the RoPE-permuted column layout. The caller
            # applies the rotation (or not, for obj-ptr tokens).
            p1 = rope_channel_perm(internal // h)
            perm = jnp.asarray(
                (np.arange(h)[:, None] * (internal // h) + p1[None, :])
                .reshape(-1)
            )
            return _PermutedDense(internal, dtype=self.dtype, name="k_proj")(
                q, perm
            )

        if banked is not None:
            # bank-indirect cross-attention (inference): K/V blocks are read
            # straight from the memory bank by the Pallas kernel via a
            # scalar-prefetched slot list; the per-tile temporal-position
            # K term is added in-kernel (w = Wk @ tpos, rope distributes
            # over the sum). Only the q side is computed here.
            assert h == 1, "banked memory attention is single-head"
            b, nq = q.shape[0], q.shape[1]
            dh = internal
            p1 = rope_channel_perm(dh)
            perm = jnp.asarray(p1)
            qp = _PermutedDense(internal, dtype=self.dtype, name="q_proj")(
                q, perm
            )
            qp = qp[:, None]  # [B, 1, Nq, D]
            cos_q, sin_q = rope_q
            qp = apply_rope_halves(qp, cos_q, sin_q)
            kp = _PermutedDense(internal, dtype=self.dtype, name="k_proj")
            tv = banked["tpos_vecs"].astype(self.dtype)  # [T, Cm]
            w = kp(tv, perm) - kp(jnp.zeros_like(tv[:1]), perm)  # [T, D]
            from det_sam2_tpu.ops.attention import flash_attention_banked

            o = flash_attention_banked(
                qp, banked["mem_k"], banked["mem_v"], banked["slots"],
                w.astype(jnp.float32), banked["bias"], banked["cos"],
                banked["sin"], layer=banked["layer"],
            )  # [B, 1, Nq, Cm]
            o = o[:, 0]
            v_proj = nn.Dense(internal, dtype=self.dtype, name="v_proj")
            o = v_proj(o)
            live = jnp.any(
                banked["bias"] > -1e29, axis=-1, keepdims=True
            )  # [B, 1]
            # objects with NO live key have P = 0: strip the bias v_proj
            # added (recovered by projecting a zero value row)
            cm = banked["mem_v"].shape[-1]
            bv = v_proj(jnp.zeros((1, cm), self.dtype))  # [1, internal]
            o = jnp.where(live[..., None], o, o - bv[None])
            return nn.Dense(
                self.embedding_dim, dtype=self.dtype, name="out_proj"
            )(o)

        b, nq = q.shape[0], q.shape[1]
        nk = k.shape[1]

        # Low-rank value path: when the values enter at a narrow kv_in_dim
        # (the 64-d memory tokens of memory attention), attention runs
        # against the RAW values and v_proj applies AFTER — P @ (M Wv + bv)
        # = (P @ M) Wv + bv because softmax rows sum to one. This cuts the
        # dominant P·V contraction from `internal` to kv_in_dim wide (4x
        # fewer FLOPs over ~16k memory keys per frame). Exact up to fp
        # reassociation; fully-masked query rows (P = 0) keep the bias off.
        kv_in = v.shape[-1]
        late_v = (
            self.kv_in_dim is not None and kv_in < internal and h == 1
        )

        # RoPE path: permute the q/k projection COLUMNS so the rotation
        # acts on contiguous channel halves (rope_channel_perm) — the
        # interleaved form's stride-2 lane slices cost ~1.8 ms/frame in
        # vector shuffles on v5e. Scores are invariant: q and k share the
        # permutation.
        roped = rope_q is not None or rope_k is not None
        perm = None
        if roped:
            dh = internal // h
            p1 = rope_channel_perm(dh)
            perm = jnp.asarray(
                (np.arange(h)[:, None] * dh + p1[None, :]).reshape(-1)
            )

        q = _PermutedDense(internal, dtype=self.dtype, name="q_proj")(q, perm)
        k = _PermutedDense(internal, dtype=self.dtype, name="k_proj")(k, perm)
        if not late_v:
            v = nn.Dense(internal, dtype=self.dtype, name="v_proj")(v)

        q = q.reshape(b, nq, h, -1).transpose(0, 2, 1, 3)
        k = k.reshape(b, nk, h, -1).transpose(0, 2, 1, 3)
        v = v.reshape(b, nk, h, -1).transpose(0, 2, 1, 3)

        if rope_q is not None:
            cos_q, sin_q = rope_q
            q = apply_rope_halves(q, cos_q, sin_q)
        if rope_k is not None:
            cos_k, sin_k = rope_k
            nkr = nk if num_k_rope is None else num_k_rope
            if nkr == nk:
                k = apply_rope_halves(k, cos_k, sin_k)
            else:
                k = jnp.concatenate(
                    [
                        apply_rope_halves(k[:, :, :nkr], cos_k, sin_k),
                        k[:, :, nkr:],
                    ],
                    axis=2,
                )

        o = self.attention_fn(q, k, v, bias=bias)
        o = o.transpose(0, 2, 1, 3).reshape(b, nq, -1)
        if late_v:
            v_proj = nn.Dense(internal, dtype=self.dtype, name="v_proj")
            o = v_proj(o)
            if bias is not None:
                # rows with no live key have P = 0: remove the bias term
                # v_proj added (bias recovered by projecting a zero vector)
                live = jnp.any(bias > -1e29, axis=(-1, -2))  # [B, 1]
                bv = v_proj(jnp.zeros((1, kv_in), self.dtype))  # [1, internal]
                o = jnp.where(live[..., None], o, o - bv[None])
        return nn.Dense(self.embedding_dim, dtype=self.dtype, name="out_proj")(o)


class TwoWayAttentionBlock(nn.Module):
    """(1) token self-attn, (2) token->image cross-attn, (3) token MLP,
    (4) image->token cross-attn (transformer.py:136-213)."""

    embedding_dim: int
    num_heads: int
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    skip_first_layer_pe: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        if self.skip_first_layer_pe:
            queries = Attention(
                self.embedding_dim, self.num_heads, dtype=self.dtype,
                name="self_attn",
            )(queries, queries, queries)
        else:
            q = queries + query_pe
            attn_out = Attention(
                self.embedding_dim, self.num_heads, dtype=self.dtype,
                name="self_attn",
            )(q, q, queries)
            queries = queries + attn_out
        queries = LayerNorm(eps=1e-5, name="norm1")(queries)

        q = queries + query_pe
        k = keys + key_pe
        attn_out = Attention(
            self.embedding_dim, self.num_heads,
            downsample_rate=self.attention_downsample_rate, dtype=self.dtype,
            name="cross_attn_token_to_image",
        )(q, k, keys)
        queries = queries + attn_out
        queries = LayerNorm(eps=1e-5, name="norm2")(queries)

        mlp_out = MLP(
            hidden_dim=self.mlp_dim, output_dim=self.embedding_dim, num_layers=2,
            activation=nn.relu, dtype=self.dtype, name="mlp",
        )(queries)
        queries = queries + mlp_out
        queries = LayerNorm(eps=1e-5, name="norm3")(queries)

        q = queries + query_pe
        k = keys + key_pe
        attn_out = Attention(
            self.embedding_dim, self.num_heads,
            downsample_rate=self.attention_downsample_rate, dtype=self.dtype,
            name="cross_attn_image_to_token",
        )(k, q, queries)
        keys = keys + attn_out
        keys = LayerNorm(eps=1e-5, name="norm4")(keys)
        return queries, keys


class TwoWayTransformer(nn.Module):
    """Bidirectional decoder transformer (transformer.py:44-135)."""

    depth: int = 2
    embedding_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embedding, image_pe, point_embedding):
        """image_embedding/image_pe: [B, N_img, C] (pre-flattened);
        point_embedding: [B, N_tok, C]. Returns (queries, keys)."""
        queries = point_embedding
        keys = image_embedding
        for i in range(self.depth):
            queries, keys = TwoWayAttentionBlock(
                embedding_dim=self.embedding_dim,
                num_heads=self.num_heads,
                mlp_dim=self.mlp_dim,
                attention_downsample_rate=self.attention_downsample_rate,
                skip_first_layer_pe=(i == 0),
                dtype=self.dtype,
                name=f"layers_{i}",
            )(queries, keys, point_embedding, image_pe)

        q = queries + point_embedding
        k = keys + image_pe
        attn_out = Attention(
            self.embedding_dim, self.num_heads,
            downsample_rate=self.attention_downsample_rate, dtype=self.dtype,
            name="final_attn_token_to_image",
        )(q, k, keys)
        queries = queries + attn_out
        queries = LayerNorm(eps=1e-5, name="norm_final_attn")(queries)
        return queries, keys
