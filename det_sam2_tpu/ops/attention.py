"""Pallas TPU flash attention with masked-tile skipping.

The compute paths that dominate the per-frame step are attention:
  * memory cross-attention: 4096 queries x ~41k memory tokens per object,
    where large spans of the static padded memory sequence are INVALID
    (empty bank slots) — the reference instead re-materializes a dense
    [Nq, Nk] score matrix per layer (sam2/modeling/sam/transformer.py:
    F.scaled_dot_product_attention);
  * memory self-attention and the Hiera global blocks: 4096 x 4096.

This kernel is a standard online-softmax flash attention (one pass over KV
tiles with running max/sum in VMEM scratch) with one TPU-specific twist:
the additive bias tile is inspected and a KV tile whose bias is all -inf
(an invalid bank slot) is SKIPPED entirely — with the default bank sizes
this avoids ~40-70%% of the cross-attention FLOPs early in a stream.

Matmuls run on the MXU in the input dtype (bf16 in production) with fp32
accumulation; softmax statistics are fp32. Falls back to the XLA sdpa for
small problems and on non-TPU backends (interpret mode keeps CPU tests
honest).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from det_sam2_tpu.modeling.layers import sdpa

_NEG_INF = -1e30
_SKIP_THRESHOLD = -1e29  # a tile whose max bias is below this is skipped

# Banked-kernel block overrides, read ONCE at import: the block choice is
# baked into every jit trace that reaches the kernel, so re-reading the env
# per call would make post-compile toggles silent no-ops (an A/B trap).
# A/B harnesses set the env before importing, one mode per process.
_BANKED_BQ_ENV = int(os.environ.get("DET_SAM2_BANKED_BQ", 0)) or None
_BANKED_BK_ENV = int(os.environ.get("DET_SAM2_BANKED_BK", 0)) or None


def _flash_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref,
                  m_scr, l_scr, acc_scr, *, scale: float, has_bias: bool):
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    if has_bias:
        bias = bias_ref[0, 0, :]  # [BK] fp32
        tile_live = jnp.max(bias) > _SKIP_THRESHOLD
    else:
        bias = None
        tile_live = True

    @pl.when(tile_live)
    def _compute():
        q = q_ref[0]  # [BQ, D]
        k = k_ref[0]  # [BK, D]
        v = v_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [BQ, BK]
        if bias is not None:
            s = s + bias[None, :]
        m_prev = m_scr[:]  # [BQ, 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_scr[:] = m_new

    @pl.when(ik == nk - 1)
    def _finalize():
        # fully-masked query rows (l == 0) produce zeros, not NaN
        denom = jnp.maximum(l_scr[:], 1e-20)
        o_ref[0] = (acc_scr[:] / denom).astype(o_ref.dtype)
        lse_ref[0, 0] = (m_scr[:] + jnp.log(denom))[:, 0]


def _pad_axis(x, axis: int, to: int, value=0.0):
    pad = to - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret")
)
def _flash_call(q, k, v, bias, block_q: int, block_k: int, interpret: bool):
    """q/k: [BH, N, D]; v: [BH, Nk, Dv] (Dv may differ from D — the
    low-rank memory path feeds raw 64-d value tokens); bias: [BH, Nk] fp32
    additive or None."""
    bh, nq, d = q.shape
    nk = k.shape[1]
    dv = v.shape[-1]
    scale = 1.0 / float(np.sqrt(d))

    nq_pad = -(-nq // block_q) * block_q
    nk_pad = -(-nk // block_k) * block_k
    q = _pad_axis(q, 1, nq_pad)
    k = _pad_axis(k, 1, nk_pad)
    v = _pad_axis(v, 1, nk_pad)
    has_bias = bias is not None
    if has_bias:
        bias = _pad_axis(bias.astype(jnp.float32), 1, nk_pad, value=_NEG_INF)
    elif nk_pad != nk:
        # padding alone requires masking
        bias = jnp.where(
            jnp.arange(nk_pad) < nk, 0.0, _NEG_INF
        )[None].astype(jnp.float32)
        bias = jnp.broadcast_to(bias, (bh, nk_pad))
        has_bias = True
    if has_bias:
        bias = bias[:, None, :]  # [BH, 1, Nk] (TPU block-shape constraint)

    grid = (bh, nq_pad // block_q, nk_pad // block_k)
    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
        pl.BlockSpec((1, block_k, d), lambda b, iq, ik: (b, ik, 0)),
        pl.BlockSpec((1, block_k, dv), lambda b, iq, ik: (b, ik, 0)),
    ]
    args = [q, k, v]
    if has_bias:
        in_specs.append(
            pl.BlockSpec((1, 1, block_k), lambda b, iq, ik: (b, 0, ik))
        )
        args.append(bias)
        kernel = functools.partial(_flash_kernel, scale=scale, has_bias=True)
    else:
        kernel = functools.partial(_flash_kernel_nobias, scale=scale)

    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, block_q, dv), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, 1, block_q), lambda b, iq, ik: (b, 0, iq)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, nq_pad, dv), q.dtype),
            jax.ShapeDtypeStruct((bh, 1, nq_pad), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, dv), jnp.float32),
        ],
        interpret=interpret,
    )(*args)
    return out[:, :nq], lse[:, 0, :nq]


def _flash_kernel_nobias(q_ref, k_ref, v_ref, o_ref, lse_ref,
                         m_scr, l_scr, acc_scr, *, scale: float):
    _flash_kernel(q_ref, k_ref, v_ref, None, o_ref, lse_ref,
                  m_scr, l_scr, acc_scr, scale=scale, has_bias=False)


# ---------------------------------------------------------------------------
# backward (custom VJP): standard flash backward recomputing P from the saved
# logsumexp; masked KV tiles are skipped exactly like the forward
# ---------------------------------------------------------------------------


def _safe_p(s, lse_row):
    # fully-masked query rows have lse ~ -1e30; their P must be 0, not inf.
    # NOTE: compare on the already-reshaped [BQ, 1] f32 column — reshaping a
    # bool vector ([BQ] -> [BQ, 1]) is a Mosaic minor-dim insertion that is
    # only legal for 32-bit types on TPU (fails to compile at block_q=768).
    lse_col = lse_row[:, None]
    return jnp.where(
        lse_col > _SKIP_THRESHOLD, jnp.exp(s - lse_col), 0.0
    )


def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref,
                         delta_ref, dq_ref, dq_scr, *, scale: float,
                         has_bias: bool):
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    if has_bias:
        bias = bias_ref[0, 0, :]
        tile_live = jnp.max(bias) > _SKIP_THRESHOLD
    else:
        bias = None
        tile_live = True

    @pl.when(tile_live)
    def _compute():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        if bias is not None:
            s = s + bias[None, :]
        p = _safe_p(s, lse_ref[0, 0])  # [BQ, BK]
        do = do_ref[0]
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta_ref[0, 0][:, None])
        dq_scr[:] = dq_scr[:] + jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale

    @pl.when(ik == nk - 1)
    def _finalize():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def _flash_bwd_dq_kernel_nobias(q_ref, k_ref, v_ref, do_ref, lse_ref,
                                delta_ref, dq_ref, dq_scr, *, scale: float):
    _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, None, do_ref, lse_ref,
                         delta_ref, dq_ref, dq_scr, scale=scale,
                         has_bias=False)


def _flash_bwd_dkv_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref,
                          delta_ref, dk_ref, dv_ref, dk_scr, dv_scr,
                          *, scale: float, has_bias: bool):
    iq = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(iq == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    if has_bias:
        bias = bias_ref[0, 0, :]
        tile_live = jnp.max(bias) > _SKIP_THRESHOLD
    else:
        bias = None
        tile_live = True

    @pl.when(tile_live)
    def _compute():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        if bias is not None:
            s = s + bias[None, :]
        p = _safe_p(s, lse_ref[0, 0])  # [BQ, BK]
        do = do_ref[0]
        dv_scr[:] = dv_scr[:] + jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta_ref[0, 0][:, None])
        dk_scr[:] = dk_scr[:] + jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale

    @pl.when(iq == nq - 1)
    def _finalize():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _flash_bwd_dkv_kernel_nobias(q_ref, k_ref, v_ref, do_ref, lse_ref,
                                 delta_ref, dk_ref, dv_ref, dk_scr, dv_scr,
                                 *, scale: float):
    _flash_bwd_dkv_kernel(q_ref, k_ref, v_ref, None, do_ref, lse_ref,
                          delta_ref, dk_ref, dv_ref, dk_scr, dv_scr,
                          scale=scale, has_bias=False)


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret")
)
def _flash_bwd_call(q, k, v, bias, out, lse, do, block_q: int, block_k: int,
                    interpret: bool):
    bh, nq, d = q.shape
    nk = k.shape[1]
    dv = v.shape[-1]
    scale = 1.0 / float(np.sqrt(d))

    nq_pad = -(-nq // block_q) * block_q
    nk_pad = -(-nk // block_k) * block_k
    qp = _pad_axis(q, 1, nq_pad)
    kp = _pad_axis(k, 1, nk_pad)
    vp = _pad_axis(v, 1, nk_pad)
    dop = _pad_axis(do.astype(jnp.float32), 1, nq_pad)
    # padded query rows: lse = -inf sentinel so P = 0
    lsep = _pad_axis(lse, 1, nq_pad, value=_NEG_INF)[:, None, :]
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), -1)
    deltap = _pad_axis(delta, 1, nq_pad)[:, None, :]
    has_bias = bias is not None
    if has_bias:
        biasp = _pad_axis(
            bias.astype(jnp.float32), 1, nk_pad, value=_NEG_INF
        )[:, None, :]
    elif nk_pad != nk:
        biasp = jnp.where(
            jnp.arange(nk_pad) < nk, 0.0, _NEG_INF
        )[None].astype(jnp.float32)
        biasp = jnp.broadcast_to(biasp, (bh, nk_pad))[:, None, :]
        has_bias = True
    else:
        biasp = None

    q_spec_iq = pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0))
    k_spec_iq = pl.BlockSpec((1, block_k, d), lambda b, iq, ik: (b, ik, 0))
    v_spec_iq = pl.BlockSpec((1, block_k, dv), lambda b, iq, ik: (b, ik, 0))
    do_spec_iq = pl.BlockSpec((1, block_q, dv), lambda b, iq, ik: (b, iq, 0))
    row_spec_iq = pl.BlockSpec((1, 1, block_q), lambda b, iq, ik: (b, 0, iq))
    bias_spec_iq = pl.BlockSpec((1, 1, block_k), lambda b, iq, ik: (b, 0, ik))

    args = [qp, kp, vp]
    in_specs = [q_spec_iq, k_spec_iq, v_spec_iq]
    if has_bias:
        args.append(biasp)
        in_specs.append(bias_spec_iq)
        dq_kernel = functools.partial(
            _flash_bwd_dq_kernel, scale=scale, has_bias=True
        )
    else:
        dq_kernel = functools.partial(_flash_bwd_dq_kernel_nobias, scale=scale)
    args += [dop, lsep, deltap]
    in_specs += [do_spec_iq, row_spec_iq, row_spec_iq]

    dq = pl.pallas_call(
        dq_kernel,
        grid=(bh, nq_pad // block_q, nk_pad // block_k),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, nq_pad, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        interpret=interpret,
    )(*args)

    # dk/dv: grid over kv tiles, inner loop over q tiles
    q_spec_ik = pl.BlockSpec((1, block_q, d), lambda b, ik, iq: (b, iq, 0))
    k_spec_ik = pl.BlockSpec((1, block_k, d), lambda b, ik, iq: (b, ik, 0))
    v_spec_ik = pl.BlockSpec((1, block_k, dv), lambda b, ik, iq: (b, ik, 0))
    do_spec_ik = pl.BlockSpec((1, block_q, dv), lambda b, ik, iq: (b, iq, 0))
    row_spec_ik = pl.BlockSpec((1, 1, block_q), lambda b, ik, iq: (b, 0, iq))
    bias_spec_ik = pl.BlockSpec((1, 1, block_k), lambda b, ik, iq: (b, 0, ik))

    args2 = [qp, kp, vp]
    in_specs2 = [q_spec_ik, k_spec_ik, v_spec_ik]
    if has_bias:
        args2.append(biasp)
        in_specs2.append(bias_spec_ik)
        dkv_kernel = functools.partial(
            _flash_bwd_dkv_kernel, scale=scale, has_bias=True
        )
    else:
        dkv_kernel = functools.partial(
            _flash_bwd_dkv_kernel_nobias, scale=scale
        )
    args2 += [dop, lsep, deltap]
    in_specs2 += [do_spec_ik, row_spec_ik, row_spec_ik]

    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(bh, nk_pad // block_k, nq_pad // block_q),
        in_specs=in_specs2,
        out_specs=(
            pl.BlockSpec((1, block_k, d), lambda b, ik, iq: (b, ik, 0)),
            pl.BlockSpec((1, block_k, dv), lambda b, ik, iq: (b, ik, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, nk_pad, d), k.dtype),
            jax.ShapeDtypeStruct((bh, nk_pad, dv), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, dv), jnp.float32),
        ],
        interpret=interpret,
    )(*args2)
    return dq[:, :nq], dk[:, :nk], dv[:, :nk]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash_core(q, k, v, bias, block_q: int, block_k: int, interpret: bool):
    out, _ = _flash_call(q, k, v, bias, block_q, block_k, interpret)
    return out


def _flash_core_fwd(q, k, v, bias, block_q, block_k, interpret):
    out, lse = _flash_call(q, k, v, bias, block_q, block_k, interpret)
    return out, (q, k, v, bias, out, lse)


def _flash_core_bwd(block_q, block_k, interpret, res, dout):
    q, k, v, bias, out, lse = res
    dq, dk, dv = _flash_bwd_call(
        q, k, v, bias, out, lse, dout, block_q, block_k, interpret
    )
    # bias gradient is NOT computed: every bias reaching this kernel is a
    # constant validity mask (0 / -1e30 from memory_attention), never a
    # learned tensor. A differentiable bias would silently train with
    # dbias=0 here while the small-shape sdpa fallback returns the true
    # gradient — if you add one, extend the backward kernel first.
    dbias = None if bias is None else jnp.zeros_like(bias)
    return dq, dk, dv, dbias


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


# ---------------------------------------------------------------------------
# bank-indirect (slot-compacted) forward kernel for memory cross-attention
# ---------------------------------------------------------------------------


def _flash_banked_kernel(slots_ref, q_ref, k_ref, v_ref, bias_ref, cos_ref,
                         sin_ref, w_ref, wr_ref, o_ref,
                         m_scr, l_scr, acc_scr, *, scale: float, bpt: int):
    """Online-softmax flash forward whose K/V tiles are read DIRECTLY from
    the memory bank via a scalar-prefetched slot list (no per-frame gather
    or K materialization). Each K block adds the per-tile temporal-position
    correction in-kernel: k = k_cached + cos*w[tile] + sin*wr[tile], where
    k_cached = rope(Wk(mem + spatial_pos) + bk) was written at bank-write
    time and w = Wk @ tpos_enc (rope of a broadcast vector distributes:
    rope(a + b) = rope(a) + rope(b)). cos/sin are full [S, D] VMEM
    residents (constant index_map: fetched once per launch, not per block);
    w rows are zero for unroped tiles (the obj-ptr staging tile)."""
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    bias = bias_ref[0, 0, :]  # [BK] fp32
    tile_live = jnp.max(bias) > _SKIP_THRESHOLD

    @pl.when(tile_live)
    def _compute():
        jt = ik // bpt
        jb = ik % bpt
        q = q_ref[0]  # [BQ, D]
        k0 = k_ref[0, 0, 0].astype(jnp.float32)  # [BK, D]
        cos = cos_ref[jb]  # [BK, D/2] fp32 (in-tile position block)
        sin = sin_ref[jb]
        half = cos.shape[-1]
        w1 = w_ref[pl.ds(jt, 1), :]  # [1, D/2]
        w2 = wr_ref[pl.ds(jt, 1), :]
        # rope of the broadcast tpos vector, halves layout:
        # corr = [w1*cos - w2*sin, w1*sin + w2*cos]
        corr = jnp.concatenate(
            [cos * w1 - sin * w2, sin * w1 + cos * w2], axis=-1
        )
        k = (k0 + corr).astype(q.dtype)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        s = s + bias[None, :]
        m_prev = m_scr[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        v = v_ref[0, 0]
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_scr[:] = m_new

    @pl.when(ik == nk - 1)
    def _finalize():
        denom = jnp.maximum(l_scr[:], 1e-20)
        o_ref[0] = (acc_scr[:] / denom).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("layer", "block_q", "block_k", "interpret")
)
def _flash_banked_call(q, mem_k, mem_v, slots, w, bias, cos, sin,
                       layer: int, block_q: int, block_k: int,
                       interpret: bool):
    """q: [B, Nq, D]; mem_k: [Ktot, B, L, S, D] cached roped K;
    mem_v: [Ktot, B, S, Cm] raw memory values; slots: [T] int32;
    w: [T, D] fp32 per-tile K correction (pre-rotation vector);
    bias: [B, T*S] fp32 additive; cos/sin: [S, D//2] fp32 rope tables
    (halves layout). Returns [B, Nq, Cm]."""
    b, nq, d = q.shape
    ktot, _, nl, s_tile, _ = mem_k.shape
    cm = mem_v.shape[-1]
    t_tiles = slots.shape[0]
    assert s_tile % block_k == 0 and nq % block_q == 0
    bpt = s_tile // block_k
    scale = 1.0 / float(np.sqrt(d))

    half = d // 2
    cos_b = cos.reshape(bpt, block_k, half)
    sin_b = sin.reshape(bpt, block_k, half)
    w1 = w[:, :half]
    w2 = w[:, half:]
    bias3 = bias.astype(jnp.float32)[:, None, :]  # [B, 1, T*S]

    grid = (b, nq // block_q, t_tiles * bpt)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d),
                         lambda bb, iq, ik, sl: (bb, iq, 0)),
            pl.BlockSpec(
                (1, 1, 1, block_k, d),
                lambda bb, iq, ik, sl, _l=layer, _bpt=bpt: (
                    sl[ik // _bpt], bb, _l, ik % _bpt, 0
                ),
            ),
            pl.BlockSpec(
                (1, 1, block_k, cm),
                lambda bb, iq, ik, sl, _bpt=bpt: (
                    sl[ik // _bpt], bb, ik % _bpt, 0
                ),
            ),
            pl.BlockSpec((1, 1, block_k),
                         lambda bb, iq, ik, sl: (bb, 0, ik)),
            pl.BlockSpec((bpt, block_k, half),
                         lambda bb, iq, ik, sl: (0, 0, 0)),
            pl.BlockSpec((bpt, block_k, half),
                         lambda bb, iq, ik, sl: (0, 0, 0)),
            pl.BlockSpec((t_tiles, half), lambda bb, iq, ik, sl: (0, 0)),
            pl.BlockSpec((t_tiles, half), lambda bb, iq, ik, sl: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, cm),
                               lambda bb, iq, ik, sl: (bb, iq, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, cm), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_flash_banked_kernel, scale=scale, bpt=bpt),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, nq, cm), q.dtype),
        interpret=interpret,
    )(slots.astype(jnp.int32), q, mem_k, mem_v, bias3, cos_b, sin_b,
      w1.astype(jnp.float32), w2.astype(jnp.float32))


def flash_attention_banked(
    q: jnp.ndarray,  # [B, 1, Nq, D] (single-head memory cross-attention)
    mem_k: jnp.ndarray,  # [Ktot, B, L, S, D]
    mem_v: jnp.ndarray,  # [Ktot, B, S, Cm]
    slots: jnp.ndarray,  # [T] int32
    w: jnp.ndarray,  # [T, D]
    bias: jnp.ndarray,  # [B, T*S]
    cos: jnp.ndarray,  # [S, D//2]
    sin: jnp.ndarray,  # [S, D//2]
    layer: int,
    block_q: int = 2048,
    block_k: int = 1024,
) -> jnp.ndarray:
    """Bank-indirect memory cross-attention forward (inference only: no
    VJP — the training path assembles memory densely and never reaches
    this). Returns [B, 1, Nq, Cm] raw-value attention output (the caller
    applies the late v_proj/out_proj, as in the regular low-rank path)."""
    assert q.shape[1] == 1, "banked path is single-head"
    b, _, nq, d = q.shape
    s_tile = mem_v.shape[2]
    # largest Mosaic-legal (multiple-of-128) divisor <= the cap: tiles are
    # S = (image/16)^2 (4096 @1024^2, 2304 @768^2 -> 1152 not 256), with a
    # plain power-of-two fallback for tiny test grids. VMEM budget: the
    # fp32 score block is bq*bk*4 bytes — 8 MB is the proven-compiling
    # ceiling (whole-tile q at 768^2 OOM'd scoped VMEM: 19.5M > 16M).
    # Larger bq cuts K re-reads (one full-K sweep per q block): at
    # hiera-L 1024^2, (2048, 1024) measured 35.18 FPS vs (1024, 2048)
    # 34.76. DET_SAM2_BANKED_BQ/BK (import-time) override for A/Bs.
    block_q = _BANKED_BQ_ENV or block_q
    block_k = _BANKED_BK_ENV or block_k
    block_q = _divisor_block(nq, block_q)
    bk = _divisor_block(s_tile, block_k)
    out = _flash_banked_call(
        q[:, 0], mem_k, mem_v, slots, w, bias, cos, sin,
        layer, block_q, bk, jax.default_backend() != "tpu",
    )
    return _banked_inference_only(out)[:, None]


@jax.custom_vjp
def _banked_inference_only(out):
    """Identity gate that turns an attempted differentiation of the banked
    kernel into a descriptive error instead of an opaque Pallas one. The
    mode switch is the bank pytree (mem_k present), so a training path
    handed a banked bank would otherwise fail deep inside pallas_call."""
    return out


def _banked_inference_only_fwd(out):
    return out, None


def _banked_inference_only_bwd(_, g):
    raise NotImplementedError(
        "flash_attention_banked is inference-only (no VJP): banked-mode "
        "memory cross-attention reads K/V from bank-resident caches. For "
        "training/finetuning, assemble memory densely — build the bank "
        "with banked_layers=0 (init_bank default) so MemoryAttention takes "
        "the differentiable gather path (see make_train_step)."
    )


_banked_inference_only.defvjp(
    _banked_inference_only_fwd, _banked_inference_only_bwd
)


_BLOCK_CANDIDATES = (1024, 768, 512, 384, 256, 128)


def _divisor_block(n: int, cap: int) -> int:
    """Largest multiple-of-128 divisor of n that is <= cap; for small n
    (tiny test grids) the largest power-of-two divisor <= min(n, cap)."""
    best = 0
    for m in range(128, cap + 1, 128):
        if n % m == 0:
            best = m
    if best:
        return best
    b = 1
    while b * 2 <= min(n, cap) and n % (b * 2) == 0:
        b *= 2
    return b


def _pick_block(n: int, cap: int) -> int:
    """Choose a flash kernel block size for a sequence length n.

    Prefer a candidate that divides n exactly (no padding waste); when
    nothing divides, fall back to the LARGEST legal block <= cap —
    _flash_call pads to the block multiple and bias-masks the padded keys,
    and every candidate is a multiple of 128 (Mosaic-legal tile). Falling
    back to 128 here (a round-3 "alignment fix") quartered the memory
    cross-attention throughput: its Nk = 7*S + ptr tokens (16192 @768^2,
    28736 @1024^2) divides NONE of the candidates, so the whole streaming
    hot path ran at block_k=128 (hiera-L 768^2: 41.7 vs 55.6 FPS). Only a
    raw `n` fallback would risk an illegal tile; capped candidates never
    do. Guarded by tests/test_flash_attention.py."""
    for b in _BLOCK_CANDIDATES:
        if b <= cap and n % b == 0:
            return b
    for b in _BLOCK_CANDIDATES:
        if b <= cap:
            return b
    return 128


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    block_q: int = 1024,
    block_k: int = 1024,
    min_flops: int = 1 << 22,
) -> jnp.ndarray:
    """Drop-in replacement for modeling.layers.sdpa.

    q: [B, H, Nq, D]; k/v: [B, H, Nk, D]; bias: None or additive
    [B, 1, 1, Nk] / [B, H, Nq, Nk]-broadcastable with -inf at masked keys
    (only the [B,1,1,Nk] form hits the kernel; others fall back).

    Gradient caveat: the custom VJP returns dbias=0 (the only bias used is
    a constant validity mask) — do not route a LEARNED bias through this
    kernel without extending the backward pass.
    """
    b, h, nq, d = q.shape
    nk = k.shape[2]
    small = nq * nk < min_flops
    on_tpu = jax.default_backend() == "tpu"
    bias_ok = bias is None or (
        bias.ndim == 4 and bias.shape[1] == 1 and bias.shape[2] == 1
    )
    if small or not bias_ok:
        return sdpa(q, k, v, bias=bias)

    qf = q.reshape(b * h, nq, d)
    kf = k.reshape(b * h, nk, d)
    vf = v.reshape(b * h, nk, v.shape[-1])
    bf = None
    if bias is not None:
        bf = jnp.broadcast_to(bias[:, 0, 0, :][:, None, :], (b, h, nk))
        bf = bf.reshape(b * h, nk)
    if q.dtype == jnp.float32:
        # fp32 training path: halve the block caps — the backward kernels'
        # fp32 buffers at 1024-blocks exceed the 16 MB scoped-VMEM limit
        # (hiera-b+ @1024^2 T=8 self-attn bwd measured 21.8M > 16M)
        block_q = min(block_q, 512)
        block_k = min(block_k, 512)
    block_q_eff = _pick_block(nq, block_q)
    block_k_eff = _pick_block(nk, block_k)
    out = _flash_core(
        qf, kf, vf, bf, block_q_eff, block_k_eff, not on_tpu
    )
    return out.reshape(b, h, nq, v.shape[-1])
