"""Pallas TPU kernel: batched small-window attention for the Hiera trunk.

Hiera's windowed attention (reference behavior:
sam2/modeling/backbones/hieradet.py:40-84) runs thousands of tiny
independent attention problems per frame (windows of 16-256 tokens,
head_dim 72). Measured on v5e, two costs dominate the XLA lowering:

  * the fp32 score/softmax tensors round-trip HBM several times per block;
  * batched [N, 72] x [72, N] matmuls run the MXU at a fraction of a tile.

This kernel merges (window, head) into one leading axis, packs GP such
problems per grid cell as one [GP*N, GP*N] attention with a static
block-diagonal mask, and keeps scores/softmax ENTIRELY IN VMEM. Block
shapes are [GP, N, D] (sublanes = tokens, lanes = head_dim) — the layout
Mosaic tiles natively. Masked cross-problem logits underflow to exactly 0
in the softmax, so packing is numerically exact per window.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from det_sam2_tpu.modeling.layers import sdpa

_NEG = -1e30


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, gp: int, nq: int,
            nk: int):
    # refs: q [GP, Nq, D], k/v [GP, Nk, D], o [GP, Nq, D]
    d = q_ref.shape[-1]
    q = q_ref[...].reshape(gp * nq, d)
    k = k_ref[...].reshape(gp * nk, d)
    v = v_ref[...].reshape(gp * nk, d)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [GP*Nq, GP*Nk] fp32, VMEM-resident
    if gp > 1:
        row_w = jax.lax.broadcasted_iota(jnp.int32, (gp * nq, gp * nk), 0) // nq
        col_w = jax.lax.broadcasted_iota(jnp.int32, (gp * nq, gp * nk), 1) // nk
        s = jnp.where(row_w == col_w, s, _NEG)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        (p / l).astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [GP*Nq, D]
    o_ref[...] = o.reshape(gp, nq, d).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("gp", "interpret"))
def _call(q, k, v, gp: int, interpret: bool):
    """q: [P, Nq, D]; k/v: [P, Nk, D] with P = B*H problems.

    D is zero-padded to a lane-aligned 128 multiple before the kernel
    (128-lane rows DMA in full bursts; Hiera's head_dim 72 = 144-byte rows
    otherwise force strided transfers). Padding is exact: zero q/k lanes
    contribute nothing to q k^T, padded v lanes are sliced off."""
    p_, nq, d = q.shape
    nk = k.shape[1]
    scale = 1.0 / float(np.sqrt(d))
    dp = -(-d // 128) * 128
    if dp != d:
        widths = ((0, 0), (0, 0), (0, dp - d))
        q = jnp.pad(q, widths)
        k = jnp.pad(k, widths)
        v = jnp.pad(v, widths)
    kernel = functools.partial(_kernel, scale=scale, gp=gp, nq=nq, nk=nk)
    out = pl.pallas_call(
        kernel,
        grid=(p_ // gp,),
        in_specs=[
            pl.BlockSpec((gp, nq, dp), lambda i: (i, 0, 0)),
            pl.BlockSpec((gp, nk, dp), lambda i: (i, 0, 0)),
            pl.BlockSpec((gp, nk, dp), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((gp, nq, dp), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((p_, nq, dp), q.dtype),
        interpret=interpret,
    )(q, k, v)
    return out[..., :d] if dp != d else out


def _pick_group(p: int, nk: int, target: int = 512) -> int:
    """Largest divisor gp of p with gp * nk <= target (>=1)."""
    if nk >= target or p <= 1:
        return 1
    gp = min(target // nk, p)
    while p % gp:
        gp -= 1
    return gp


def multi_window_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Attention over B independent windows, layout [B, N, H, D].

    q: [B, Nq, H, D]; k/v: [B, Nk, H, D] -> [B, Nq, H, D].
    Each (window, head) is an independent softmax(q k^T / sqrt(D)) v.
    Exact wrt sdpa up to dtype rounding.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, nq, h, d = q.shape
    nk = k.shape[1]
    qt = q.transpose(0, 2, 1, 3).reshape(b * h, nq, d)
    kt = k.transpose(0, 2, 1, 3).reshape(b * h, nk, d)
    vt = v.transpose(0, 2, 1, 3).reshape(b * h, nk, d)
    gp = _pick_group(b * h, nk)
    out = _call(qt, kt, vt, gp, interpret)  # [B*H, Nq, D]
    return out.reshape(b, h, nq, d).transpose(0, 2, 1, 3)


def packed_window_attention(
    qkv: jnp.ndarray,
    num_heads: int,
    q_pooled: jnp.ndarray | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Entry point straight from the fused qkv projection.

    qkv: [B, N, 3 * H * D] (the qkv Dense output over windows stacked in
    B). One 5-D transpose re-lays q, k and v at once (a single XLA copy
    instead of three slice+transpose pairs), then the Pallas kernel runs
    scores/softmax in VMEM. q_pooled, when given ([B, Nq, H, D], the
    2x2-max-pooled queries of q-stride blocks), replaces the packed q.
    Returns [B, Nq, H, D].
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, n, chd = qkv.shape
    h = num_heads
    d = chd // (3 * h)
    t = qkv.reshape(b, n, 3, h, d).transpose(2, 0, 3, 1, 4)  # [3, B, H, N, D]
    t = t.reshape(3, b * h, n, d)
    if q_pooled is not None:
        nq = q_pooled.shape[1]
        qt = q_pooled.transpose(0, 2, 1, 3).reshape(b * h, nq, d)
    else:
        nq = n
        qt = t[0]
    gp = _pick_group(b * h, n)
    out = _call(qt, t[1], t[2], gp, interpret)  # [B*H, Nq, D]
    return out.reshape(b, h, nq, d).transpose(0, 2, 1, 3)


def window_sdpa_reference(q, k, v):
    """XLA reference for tests: same [B, N, H, D] contract via sdpa."""
    o = sdpa(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
    )
    return o.transpose(0, 2, 1, 3)
