"""Shared neural building blocks (flax.linen, NHWC, fp32-params/bf16-compute).

Behavioral equivalents of /root/reference/sam2/modeling/sam2_utils.py
(MLP :121, LayerNorm2d :150, DropPath :100) re-written for JAX. LayerNorm2d
in NHWC is simply LayerNorm over the trailing channel axis — no permutes.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any

# ImageNet normalization (sam2/utils/transforms.py defaults); shared by the
# host loaders and the fused uint8 patch-embed path.
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


# ---------------------------------------------------------------------------
# space-to-depth conv rewrite
#
# A stride-s conv with few input channels (the 3-channel 7x7 patch embed,
# the 1->4->16->64 mask downsampler) wastes the TPU's 128-wide lanes and
# pays an im2col layout copy. When the tap span fits two stride-s cells
# (p <= s*m and k-1-p < s*m), the conv is EXACTLY a dense 2x2 conv on the
# space-to-depth layout: out[Y, (q, co)] = sum over cells {Y-1, Y} of
# W2 . in[cell, (p_in, ci)], where W2 is a zero-padded rearrangement of the
# canonical taps. All MXU-dense, no layout copies; built from params only,
# so XLA's while-loop LICM hoists the build out of per-frame scans.
# ---------------------------------------------------------------------------


class ConvParams(nn.Module):
    """Owns a conv kernel/bias pair with nn.Conv's param names and inits,
    WITHOUT binding them to a fixed conv op — callers apply them either as
    the canonical strided conv or as the space-to-depth rearrangement.
    Given the same `name` as an nn.Conv module, the param tree (and every
    converted checkpoint) is identical."""

    kernel_shape: tuple  # (kh, kw, cin, cout)

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), self.kernel_shape
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.kernel_shape[-1],)
        )
        return kernel, bias


@functools.lru_cache(maxsize=32)
def s2d_phase_map(m: int, k: int, s: int = 2, p: int = None) -> np.ndarray:
    """R[cell, phase_in, phase_out, tap] placement constant for one axis of
    the space-to-depth conv rewrite. m = output phases per cell (the
    remaining downsample factor after this stage); input phases per cell =
    s*m; taps at stride s with padding p (default (k-1)//2)."""
    if p is None:
        p = (k - 1) // 2
    # Exactness requires EVERY tap to land inside the two-cell window for
    # every output phase q: the rightmost tap of the last phase reaches
    # row s*(m-1) + (k-1) - p, which must stay < s*m  =>  k-1-p <= s-1;
    # the leftmost tap of phase 0 reaches -p >= -s*m  =>  p <= s*m. A
    # weaker bound would let the p_in guard below silently DROP taps
    # (wrong conv, no error).
    assert p <= s * m and k - 1 - p <= s - 1, (
        f"tap span must fit two s2d cells: need p <= {s * m} and "
        f"k-1-p <= {s - 1}, got k={k}, s={s}, p={p}, m={m}"
    )
    r = np.zeros((2, s * m, m, k), np.float32)
    for q in range(m):
        for d in range(k):
            row = s * q + d - p
            cell, p_in = (1, row) if row >= 0 else (0, s * m + row)
            if p_in < s * m:
                r[cell, p_in, q, d] = 1.0
    return r


def s2d_stage(x, kernel, bias, m: int, dtype, s: int = 2, p: int = None):
    """One stride-s conv stage in the space-to-depth layout.

    x: [B, h, w, (s*m)*(s*m)*ci] (phase-major (py, px), channel-minor);
    kernel: [k, k, ci, co] canonical taps; returns [B, h, w, m*m*co].
    Exact up to fp summation order."""
    kk, _, ci, co = kernel.shape
    r = jnp.asarray(s2d_phase_map(m, kk, s, p))
    w2 = jnp.einsum(
        "apqd,brse,decf->abprcqsf", r, r, kernel.astype(jnp.float32)
    ).reshape(2, 2, (s * m) * (s * m) * ci, m * m * co)
    out = jax.lax.conv_general_dilated(
        x.astype(dtype), w2.astype(dtype),
        window_strides=(1, 1), padding=((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is None:
        return out
    bias2 = jnp.broadcast_to(bias.astype(jnp.float32), (m * m, co)).reshape(-1)
    return out + bias2.astype(dtype)


def s2d_split(x, factor: int):
    """[B, H, W, C] -> [B, H/f, W/f, f*f*C] (phase-major, channel-minor)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // factor, factor, w // factor, factor, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, h // factor, w // factor, factor * factor * c
    )


def exact_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Torch nn.GELU default is the exact erf form (flax defaults to tanh)."""
    return nn.gelu(x, approximate=False)


def approx_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """tanh GELU: ~17%% faster hiera-L encoder on TPU (fewer VPU
    transcendentals); opt-in via SAM2Config.use_approx_gelu — NOT bit-parity
    with the torch reference (max |diff| ~1e-3 per activation)."""
    return nn.gelu(x, approximate=True)


ACTIVATIONS: dict = {
    "relu": nn.relu,
    "gelu": exact_gelu,
}


class MLP(nn.Module):
    """N-layer perceptron; activation between layers, optional sigmoid out."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    activation: Callable = nn.relu
    sigmoid_output: bool = False
    dtype: Dtype = jnp.float32
    quant: bool = False  # int8 weights (ops/quant.py); trunk opt-in only

    @nn.compact
    def __call__(self, x):
        if self.quant:
            from det_sam2_tpu.ops.quant import QuantDense

            for i in range(self.num_layers):
                is_last = i == self.num_layers - 1
                dim = self.output_dim if is_last else self.hidden_dim
                x = QuantDense(dim, dtype=self.dtype, name=f"layers_{i}")(x)
                if not is_last:
                    x = self.activation(x)
            if self.sigmoid_output:
                x = jax.nn.sigmoid(x)
            return x
        for i in range(self.num_layers):
            is_last = i == self.num_layers - 1
            dim = self.output_dim if is_last else self.hidden_dim
            x = nn.Dense(dim, dtype=self.dtype, name=f"layers_{i}")(x)
            if not is_last:
                x = self.activation(x)
        if self.sigmoid_output:
            x = jax.nn.sigmoid(x)
        return x


class LayerNorm(nn.Module):
    """LayerNorm over the trailing axis with fp32 statistics.

    Variance uses the SHIFTED one-pass form: with a per-row constant
    c = x[..., 0], Var[x] = E[(x-c)^2] - (E[x]-c)^2 exactly, and the two
    moment reduces (over x-c and (x-c)^2) stay INDEPENDENT, so XLA's
    multi-output fusion computes both in a single sweep over x — the
    centered two-pass form forces two sequential HBM reads per LN (the
    round-5 trace measured LN stats at 4.3 ms/frame of the hiera-L
    1024^2 step with ~96 reduce launches). The shift bounds the
    cancellation: the unshifted E[x^2]-E[x]^2 loses ~mean^2 * eps_fp32
    absolute, which destroys the variance in the |mean| >> std outlier
    regime pretrained transformers are known to hit; after shifting,
    both terms are O(std^2 + (mean-c)^2) so the subtraction is benign
    (pathological-input test in tests/test_hiera.py). The broadcast
    subtract fuses into the same sweep (VPU op on resident data)."""

    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        orig_dtype = x.dtype
        x = x.astype(jnp.float32)
        # stop_gradient: the forward value is analytically independent of
        # c, so treating it as a constant gives the exact gradient with
        # fewer backward ops.
        c = jax.lax.stop_gradient(x[..., :1])
        xc = x - c
        mean_c = jnp.mean(xc, axis=-1, keepdims=True)
        mean2_c = jnp.mean(jnp.square(xc), axis=-1, keepdims=True)
        var = jnp.maximum(mean2_c - jnp.square(mean_c), 0.0)
        x = (xc - mean_c) * jax.lax.rsqrt(var + self.eps)
        return (x * scale + bias).astype(orig_dtype)


def drop_path(
    x: jnp.ndarray,
    rate: float,
    deterministic: bool,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Stochastic depth on the leading (batch) axis."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, p=keep, shape=shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


def sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Scaled dot-product attention, batch-first heads layout.

    q: [..., Nq, D], k/v: [..., Nk, D]. Softmax in fp32 (TPU-safe numerics);
    matmuls run in the input dtype (bf16 on TPU -> MXU).
    This is the pure-XLA reference path; the Pallas flash kernels in
    det_sam2_tpu/ops/attention.py are drop-in replacements.
    """
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, dtype=jnp.float32))
    logits = jnp.einsum(
        "...qd,...kd->...qk", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * scale
    if bias is not None:
        logits = logits + bias
    probs = jax.nn.softmax(logits, axis=-1)
    if bias is not None:
        # fully-masked query rows (every key biased to <= -1e29, e.g. an
        # object slot with zero valid memories) must produce P = 0, not a
        # uniform softmax over garbage — this matches the Pallas flash
        # kernel's masked-tile skip, so CPU and TPU agree and the caller's
        # dead-row v_proj-bias correction (transformer.py) stays exact
        dead = jnp.max(bias, axis=-1, keepdims=True) <= -1e29
        probs = jnp.where(dead, 0.0, probs)
    return jnp.einsum(
        "...qk,...kd->...qd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(v.dtype)
