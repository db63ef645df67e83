"""Shared neural building blocks (flax.linen, NHWC, fp32-params/bf16-compute).

Behavioral equivalents of /root/reference/sam2/modeling/sam2_utils.py
(MLP :121, LayerNorm2d :150, DropPath :100) re-written for JAX. LayerNorm2d
in NHWC is simply LayerNorm over the trailing channel axis — no permutes.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


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
    """LayerNorm over the trailing axis with fp32 statistics."""

    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        orig_dtype = x.dtype
        x = x.astype(jnp.float32)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        x = (x - mean) * jax.lax.rsqrt(var + self.eps)
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
