"""Fused LayerNorm -> MLP -> residual Pallas kernel (transformer block tail).

Every Hiera block ends with `x + mlp(ln(x))` where mlp = Dense(4D) -> gelu
-> Dense(D). Naively this materializes the [R, 4D] hidden activation in HBM
twice plus separate LayerNorm passes; this kernel keeps the normalized
activation and the MLP hidden in VMEM so HBM traffic drops to one read of
x, one pass over the weights, and one write of the output.

MEASURED VERDICT (v5e, hiera-L encoder, whole-model A/B): SLOWER than
XLA's unfused pipeline — 53.0 vs 55.4 FPS @768^2, 28.7 vs 30.8 @1024^2,
even with VMEM-resident weights (single hidden block, weights DMA'd once).
XLA evidently already avoids most of the modeled traffic (elementwise
fusion into matmul epilogues + layout freedom + inter-op overlap), so the
hand kernel only adds pipeline barriers. Kept as an OFF-BY-DEFAULT option
(MultiScaleBlock.use_fused_mlp) with full tests, same ruling as the Pallas
trunk window-attention kernels.

Matches the reference block tail semantics (hieradet.py:86-170 MLP path;
torch LayerNorm eps=1e-6, exact-erf GELU): LN statistics in fp32, matmuls
accumulated in fp32 on the MXU, gelu in fp32, output cast to the input
dtype. The backward pass is a custom VJP that differentiates an equivalent
pure-jnp composition (recompute; no extra residuals saved), so training
uses the same math as the unfused path.

Grid: (row blocks, hidden blocks). Hidden blocks iterate fastest; the
second matmul accumulates into a VMEM fp32 scratch and the output is
written once on the last hidden step (same revisit pattern as the flash
kernel in ops/attention.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gelu_f32(x, approximate: bool):
    # torch nn.GELU default is the exact erf form; the tanh form backs the
    # opt-in SAM2Config.use_approx_gelu fast path (layers.approx_gelu)
    if approximate:
        c = 0.7978845608028654  # sqrt(2/pi)
        return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * x * x * x)))
    return 0.5 * x * (1.0 + jax.lax.erf(x * (2.0 ** -0.5)))


def _kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref,
            y_scr, acc_scr, *, eps: float, approximate: bool):
    i_h = pl.program_id(1)
    n_h = pl.num_programs(1)

    @pl.when(i_h == 0)
    def _():
        xb = x_ref[:].astype(jnp.float32)
        mean = jnp.mean(xb, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xb - mean), axis=-1, keepdims=True)
        y = (xb - mean) * jax.lax.rsqrt(var + eps)
        y = y * g_ref[:] + b_ref[:]
        y_scr[:] = y.astype(y_scr.dtype)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    h = jnp.dot(y_scr[:], w1_ref[:], preferred_element_type=jnp.float32)
    h = h + b1_ref[:].astype(jnp.float32)
    a = _gelu_f32(h, approximate).astype(x_ref.dtype)
    acc_scr[:] += jnp.dot(a, w2_ref[:], preferred_element_type=jnp.float32)

    @pl.when(i_h == n_h - 1)
    def _():
        out = x_ref[:].astype(jnp.float32) + acc_scr[:] + b2_ref[:]
        out_ref[:] = out.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("eps", "approximate", "block_r", "block_h", "interpret"),
)
def _fused_call(x, g, b, w1, b1, w2, b2, eps, approximate, block_r, block_h,
                interpret):
    r, d = x.shape
    hdim = w1.shape[1]
    n_r = pl.cdiv(r, block_r)
    n_h = hdim // block_h
    grid = (n_r, n_h)
    return pl.pallas_call(
        functools.partial(_kernel, eps=eps, approximate=approximate),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_r, d), lambda ir, ih: (ir, 0)),
            pl.BlockSpec((1, d), lambda ir, ih: (0, 0)),
            pl.BlockSpec((1, d), lambda ir, ih: (0, 0)),
            pl.BlockSpec((d, block_h), lambda ir, ih: (0, ih)),
            pl.BlockSpec((1, block_h), lambda ir, ih: (0, ih)),
            pl.BlockSpec((block_h, d), lambda ir, ih: (ih, 0)),
            pl.BlockSpec((1, d), lambda ir, ih: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_r, d), lambda ir, ih: (ir, 0)),
        out_shape=jax.ShapeDtypeStruct((r, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_r, d), x.dtype),
            pltpu.VMEM((block_r, d), jnp.float32),
        ],
        interpret=interpret,
    )(x, g, b, w1, b1, w2, b2)


def _pure(x, g, b, w1, b1, w2, b2, eps, approximate):
    """Equivalent pure-jnp composition (the unfused module path): used as
    the XLA fallback and to derive the backward pass."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = (y * g + b).astype(x.dtype)
    h = jnp.dot(y, w1, preferred_element_type=jnp.float32) + b1
    a = _gelu_f32(h, approximate).astype(x.dtype)
    o = jnp.dot(a, w2, preferred_element_type=jnp.float32) + b2
    return x + o.astype(x.dtype)


@functools.lru_cache(maxsize=16)
def _make_op(eps: float, approximate: bool, block_r: int, block_h: int,
             interpret: bool):
    @jax.custom_vjp
    def op(x, g, b, w1, b1, w2, b2):
        return _fused_call(
            x, g, b, w1, b1, w2, b2, eps, approximate, block_r, block_h,
            interpret
        )

    def fwd(x, g, b, w1, b1, w2, b2):
        return op(x, g, b, w1, b1, w2, b2), (x, g, b, w1, b1, w2, b2)

    def bwd(res, dout):
        _, vjp = jax.vjp(lambda *a: _pure(*a, eps, approximate), *res)
        return vjp(dout)

    op.defvjp(fwd, bwd)
    return op


def fused_ln_mlp(
    x: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    eps: float = 1e-6,
    approximate: bool = False,
    block_r: int = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """x [..., D] -> x + Dense2(gelu(Dense1(LN(x)))), fused on TPU.

    ln_scale/ln_bias are applied in fp32 (like modeling.layers.LayerNorm);
    w1 [D, H], w2 [H, D] and their biases are cast to x.dtype (like flax
    Dense under dtype=bf16). Falls back to the pure-XLA composition when
    not on TPU (unless interpret=True, for kernel tests on CPU).
    """
    d = x.shape[-1]
    hdim = w1.shape[1]
    g = ln_scale.astype(jnp.float32).reshape(1, d)
    bb = ln_bias.astype(jnp.float32).reshape(1, d)
    w1c = w1.astype(x.dtype)
    w2c = w2.astype(x.dtype)
    b1c = b1.astype(x.dtype).reshape(1, hdim)
    b2c = b2.astype(jnp.float32).reshape(1, d)

    x2 = x.reshape(-1, d)
    if not interpret and jax.default_backend() != "tpu":
        out = _pure(x2, g, bb, w1c, b1c, w2c, b2c, eps, approximate)
        return out.reshape(x.shape)

    # Weight residency drives the block choice: with a single hidden block
    # (n_h == 1) the weight BlockSpec index never changes, so Pallas
    # fetches W1/W2 from HBM exactly ONCE for the whole kernel — the
    # row-block loop streams only activations. Splitting the hidden dim
    # (n_h > 1) re-fetches every weight block once per ROW block, which
    # for wide layers costs more HBM traffic than the fusion saves (that
    # was a measured 10% encoder regression). So: keep the full hidden in
    # VMEM whenever the weights fit, sizing the row block to the fp32
    # hidden scratch; only stage-4-width layers (21 MB of weights) split.
    w_bytes = 2 * d * hdim * x.dtype.itemsize  # W1 + W2 in x.dtype
    if w_bytes <= (8 << 20):
        block_h = hdim
        br = 512 if d <= 288 else 256
    elif interpret:
        block_h = max(
            bh for bh in (512, 384, 256, 128) if hdim % bh == 0
        )
        br = 256
    else:
        # weights don't fit VMEM: hidden-splitting re-fetches every weight
        # block once per row block (n_r x 21 MB for hiera's stage-4 width)
        # — measured slower than XLA's unfused path; fall back
        out = _pure(x2, g, bb, w1c, b1c, w2c, b2c, eps, approximate)
        return out.reshape(x.shape)
    if block_r is not None:  # explicit override (tests)
        br = block_r
    op = _make_op(eps, approximate, min(br, x2.shape[0]), block_h, interpret)
    return op(x2, g, bb, w1c, b1c, w2c, b2c).reshape(x.shape)
