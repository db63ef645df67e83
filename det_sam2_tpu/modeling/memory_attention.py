"""Memory attention: conditions current-frame tokens on the memory bank.

Behavioral equivalent of /root/reference/sam2/modeling/memory_attention.py
(MemoryAttentionLayer :17, MemoryAttention :102) with the sam2.1 config
(4 layers, d_model 256, RoPE self-attention over the 4096 current tokens and
RoPE cross-attention against 64-d memory tokens, rope_k_repeat, obj-ptr
tokens excluded from rotation).

TPU re-design:
  * batch-first [B, N, C] (the reference is seq-first and transposes twice);
  * RoPE tables are host-precomputed constants;
  * the memory sequence is a FIXED-capacity padded layout; padded tokens are
    masked with an additive -inf bias so shapes never change between frames
    (no recompilation, flash-kernel tile skipping later);
  * dropout is inference-off by construction (the app never trains through
    this module).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from det_sam2_tpu.configs import MemoryAttentionConfig
from det_sam2_tpu.modeling.layers import LayerNorm, sdpa
from det_sam2_tpu.modeling.position_encoding import (
    apply_rope_halves,
    axial_rope_cos_sin,
)
from det_sam2_tpu.modeling.transformer import Attention


class MemoryAttentionLayer(nn.Module):
    cfg: MemoryAttentionConfig
    attention_fn: Callable = sdpa
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        tgt: jnp.ndarray,  # [B, Nq, C]
        memory: jnp.ndarray,  # [B, Nk, mem_dim]
        pos: Optional[jnp.ndarray],  # [B, Nk, mem_dim]
        query_pos: Optional[jnp.ndarray],  # [B, Nq, C]
        rope_q: Tuple[jnp.ndarray, jnp.ndarray] = None,
        rope_k: Tuple[jnp.ndarray, jnp.ndarray] = None,
        num_k_rope: int = 0,
        memory_bias: Optional[jnp.ndarray] = None,
        project_k_x: Optional[jnp.ndarray] = None,
        banked: Optional[dict] = None,
    ) -> jnp.ndarray:
        c = self.cfg
        if project_k_x is not None:
            # bank-write-time K-cache: this layer's cross-attention k_proj
            # of (memory + positional encoding), pre-rotation
            return Attention(
                embedding_dim=c.d_model,
                num_heads=c.num_heads,
                kv_in_dim=c.kv_in_dim,
                dtype=self.dtype,
                name="cross_attn_image",
            )(project_k_x, project_k_x, project_k_x, project_k_only=True)

        # self-attention (pos_enc_at_attn=False in sam2.1: no pos added)
        tgt2 = LayerNorm(eps=1e-5, name="norm1")(tgt)
        qk = tgt2 + query_pos if c.pos_enc_at_attn else tgt2
        tgt2 = Attention(
            embedding_dim=c.d_model,
            num_heads=c.num_heads,
            attention_fn=self.attention_fn,
            dtype=self.dtype,
            name="self_attn",
        )(qk, qk, tgt2, rope_q=rope_q, rope_k=rope_q)
        tgt = tgt + tgt2

        # cross-attention against memory (+pos on keys, not queries)
        tgt2 = LayerNorm(eps=1e-5, name="norm2")(tgt)
        q = tgt2 + query_pos if c.pos_enc_at_cross_attn_queries else tgt2
        if banked is not None:
            tgt2 = Attention(
                embedding_dim=c.d_model,
                num_heads=c.num_heads,
                kv_in_dim=c.kv_in_dim,
                attention_fn=self.attention_fn,
                dtype=self.dtype,
                name="cross_attn_image",
            )(q, q, q, rope_q=rope_q, banked=banked)
        else:
            k = memory + pos if c.pos_enc_at_cross_attn_keys else memory
            tgt2 = Attention(
                embedding_dim=c.d_model,
                num_heads=c.num_heads,
                kv_in_dim=c.kv_in_dim,
                attention_fn=self.attention_fn,
                dtype=self.dtype,
                name="cross_attn_image",
            )(
                q, k, memory,
                rope_q=rope_q, rope_k=rope_k, num_k_rope=num_k_rope,
                bias=memory_bias,
            )
        tgt = tgt + tgt2

        # feed-forward
        tgt2 = LayerNorm(eps=1e-5, name="norm3")(tgt)
        tgt2 = nn.Dense(c.dim_feedforward, dtype=self.dtype, name="linear1")(tgt2)
        tgt2 = nn.relu(tgt2) if c.activation == "relu" else nn.gelu(
            tgt2, approximate=False
        )
        tgt2 = nn.Dense(c.d_model, dtype=self.dtype, name="linear2")(tgt2)
        return tgt + tgt2


class MemoryAttention(nn.Module):
    cfg: MemoryAttentionConfig
    attention_fn: Callable = sdpa
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        curr: jnp.ndarray,  # [B, Nq, C] current-frame tokens
        memory: jnp.ndarray,  # [B, Nk, mem_dim] padded memory tokens
        curr_pos: Optional[jnp.ndarray] = None,
        memory_pos: Optional[jnp.ndarray] = None,
        num_obj_ptr_tokens: int = 0,
        num_mem_frames: int = 0,  # spatial-memory frame count (Nk layout)
        memory_mask: Optional[jnp.ndarray] = None,  # [B, Nk] True=valid
        mode: str = "attend",
        roped: bool = True,  # project_k mode: apply the tile rotation
        banked: Optional[dict] = None,  # attend_banked mode inputs
    ) -> jnp.ndarray:
        c = self.cfg
        head_dim = c.d_model // c.num_heads
        ex, ey = c.rope_feat_sizes
        cos, sin = axial_rope_cos_sin(head_dim, ex, ey, c.rope_theta)
        rope_q = (jnp.asarray(cos), jnp.asarray(sin))

        if mode == "project_k":
            # curr: [B, S, mem_dim] = memory (+ spatial pos) of ONE tile ->
            # each layer's cached cross-attention K [B, L, S, D]
            assert (not roped) or curr.shape[1] == ex * ey
            ks = []
            for i in range(c.num_layers):
                k = MemoryAttentionLayer(
                    cfg=c, dtype=self.dtype, name=f"layers_{i}"
                )(None, None, None, None, project_k_x=curr)
                if roped:
                    k = apply_rope_halves(
                        k[:, None], rope_q[0], rope_q[1]
                    )[:, 0]
                ks.append(k)
            return jnp.stack(ks, axis=1)

        nq = curr.shape[1]
        assert nq == ex * ey, f"query tokens {nq} != rope grid {ex}x{ey}"

        output = curr
        if c.pos_enc_at_input and curr_pos is not None:
            output = output + 0.1 * curr_pos

        if mode == "attend_banked":
            neg = jnp.asarray(-1e30, dtype=jnp.float32)
            bias = jnp.where(memory_mask, 0.0, neg)  # [B, Nk_banked]
            for i in range(c.num_layers):
                output = MemoryAttentionLayer(
                    cfg=c,
                    attention_fn=self.attention_fn,
                    dtype=self.dtype,
                    name=f"layers_{i}",
                )(
                    output, None, pos=None, query_pos=curr_pos,
                    rope_q=rope_q,
                    banked=dict(banked, bias=bias, layer=i,
                                cos=rope_q[0], sin=rope_q[1]),
                )
            return LayerNorm(eps=1e-5, name="norm")(output)

        num_k_rope = memory.shape[1] - num_obj_ptr_tokens
        assert num_k_rope == num_mem_frames * nq, (
            "memory layout must be num_mem_frames*Nq spatial tokens followed "
            f"by obj-ptr tokens; got Nk={memory.shape[1]}, "
            f"frames={num_mem_frames}, ptr={num_obj_ptr_tokens}"
        )
        rope_k = (
            jnp.tile(rope_q[0], (max(num_mem_frames, 1), 1)),
            jnp.tile(rope_q[1], (max(num_mem_frames, 1), 1)),
        )

        bias = None
        if memory_mask is not None:
            neg = jnp.asarray(-1e30, dtype=jnp.float32)
            bias = jnp.where(memory_mask, 0.0, neg)[:, None, None, :]

        for i in range(c.num_layers):
            output = MemoryAttentionLayer(
                cfg=c,
                attention_fn=self.attention_fn,
                dtype=self.dtype,
                name=f"layers_{i}",
            )(
                output, memory,
                pos=memory_pos, query_pos=curr_pos,
                rope_q=rope_q, rope_k=rope_k, num_k_rope=num_k_rope,
                memory_bias=bias,
            )
        return LayerNorm(eps=1e-5, name="norm")(output)
