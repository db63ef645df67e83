"""W8A8 int8 quantized matmuls for the Hiera trunk (opt-in).

TPU-native inference quantization in the AQT style: weights are
pre-quantized per OUTPUT channel to int8 (symmetric, absmax), activations
are quantized per TOKEN (row) on the fly, and the contraction runs as an
int8 x int8 -> int32 `lax.dot_general`, which the v5e MXU executes at 2x
its bf16 rate. The fp32 rescale (row_scale * channel_scale) and bias add
fuse into the matmul epilogue under XLA.

The reference has no quantized path (pure fp16/bf16 autocast CUDA,
det_sam2_inference/det_sam2_RT.py:102); this is a TPU-first addition for
serving: the trunk is ~2/3 of streaming frame time and is matmul-bound,
so the int8 MXU rate is the remaining large perf lever. Quality impact is
bounded by per-channel weight + per-token activation scaling; see
tests/test_quant.py for the parity tolerances.

Scope: trunk dense layers only (qkv / attention out / MLP / dim-change
proj). Attention score/value products and everything downstream of the
trunk (memory attention, SAM heads) stay bf16 — they are either tiny or
already at high MXU efficiency (flash kernel), and mask quality is most
sensitive there.

Usage:
    cfg = dataclasses.replace(cfg, hiera=dataclasses.replace(
        cfg.hiera, quantize_int8=True))
    qparams = quantize_trunk(params)        # fp ckpt -> int8 trunk
    engine = SAM2Engine(cfg, params=qparams, dtype=jnp.bfloat16)
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

INT8_MAX = 127.0
_EPS = 1e-12


def quantize_weight(
    w: jnp.ndarray, contract_axes: Tuple[int, ...] = (0,)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric absmax int8 quantization, one scale per output channel.

    `contract_axes` are the axes folded into the matmul contraction; the
    scale is computed over them so each output channel keeps its own
    dynamic range. Returns (w_q int8, scale fp32 with contract axes
    reduced to size 1 for broadcast-free rescale)."""
    w = jnp.asarray(w, jnp.float32)
    absmax = jnp.max(jnp.abs(w), axis=contract_axes, keepdims=True)
    scale = jnp.maximum(absmax, _EPS) / INT8_MAX
    w_q = jnp.clip(jnp.round(w / scale), -INT8_MAX, INT8_MAX).astype(jnp.int8)
    return w_q, scale.astype(jnp.float32)


def _quantize_rows(
    x: jnp.ndarray, axes: Tuple[int, ...] = (-1,)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dynamic symmetric int8 quantization, one scale per row — a row
    spans `axes` (the contraction axes of the following matmul)."""
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=axes, keepdims=True)
    s = jnp.maximum(absmax, _EPS) / INT8_MAX
    x_q = jnp.clip(jnp.round(xf / s), -INT8_MAX, INT8_MAX).astype(jnp.int8)
    return x_q, s


def int8_matmul(
    x: jnp.ndarray,  # [..., Cin] bf16/fp32
    w_q: jnp.ndarray,  # [Cin, Cout] int8
    w_scale: jnp.ndarray,  # [1, Cout] fp32
    out_dtype: jnp.dtype,
) -> jnp.ndarray:
    """round(x / s_row) @ w_q * (s_row * w_scale): int32 accumulation on
    the MXU, fp32 rescale in the epilogue. Returns [..., Cout]."""
    x_q, s_row = _quantize_rows(x)
    y = jax.lax.dot_general(
        x_q,
        w_q,
        (((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (y.astype(jnp.float32) * s_row * w_scale.reshape(-1)).astype(
        out_dtype
    )


def int8_matmul_prequant(
    x_q: jnp.ndarray,  # [..., Cin] int8 (already row-quantized)
    s_row: jnp.ndarray,  # [..., 1] fp32
    w_q: jnp.ndarray,
    w_scale: jnp.ndarray,
    out_dtype: jnp.dtype,
) -> jnp.ndarray:
    """int8_matmul when the activation is quantized once and reused
    (QKVProj runs three matmuls against the same rows)."""
    y = jax.lax.dot_general(
        x_q,
        w_q,
        (((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (y.astype(jnp.float32) * s_row * w_scale.reshape(-1)).astype(
        out_dtype
    )


def quantize_rows(
    x: jnp.ndarray, axes: Tuple[int, ...] = (-1,)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Public alias of the per-row activation quantizer."""
    return _quantize_rows(x, axes)


def init_int8_zeros(key, shape, dtype=jnp.int8):
    """Placeholder initializer: quantized engines are built FROM converted
    fp params (quantize_trunk), never trained from scratch — random int8
    weights are meaningless, so shape-only zeros keep init cheap."""
    del key
    return jnp.zeros(shape, jnp.int8)


class QuantDense(nn.Module):
    """Dense layer over pre-quantized int8 weights: params are kernel_q
    [Cin, F] int8 + kernel_scale [1, F] fp32 + bias [F] fp32 — the tree
    quantize_trunk produces from a Dense 'kernel'/'bias' pair."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        w_q = self.param("kernel_q", init_int8_zeros, (cin, self.features))
        w_s = self.param(
            "kernel_scale", nn.initializers.ones, (1, self.features)
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        y = int8_matmul(x, w_q, w_s, self.dtype)
        return y + b.astype(self.dtype)


# ----------------------------------------------------------------------
# Params-tree conversion: fp trunk -> int8 trunk
# ----------------------------------------------------------------------

# Module-relative param paths inside every trunk block that hold a dense
# kernel contracted over axis 0 (QKVProj "qkv", OutProj "proj" — its
# [heads*D, Cout] kernel contracts over axis 0 after the head fold —
# MLP "layers_*", and the dim-change Dense "proj").
_KERNEL_LEAF = "kernel"


def _block_dense_kind(path: Tuple[str, ...]) -> str:
    """Layer kind of a trunk block dense kernel ("qkv" / "attn_out" /
    "mlp" / "proj"), or "" if the leaf is not one. path is the params-tree
    key path, e.g. ('image_encoder','trunk','blocks_3','attn','qkv',
    'kernel')."""
    if path[-1] != _KERNEL_LEAF:
        return ""
    if "trunk" not in path:
        return ""
    if "patch_embed" in path:  # 3-channel conv: skip (tiny, MXU-hostile)
        return ""
    if not any(p.startswith("blocks_") for p in path):
        return ""
    if path[-2] == "qkv":
        return "qkv"
    if path[-2] == "proj" and path[-3] == "attn":
        return "attn_out"
    if path[-3] == "mlp":
        return "mlp"
    if path[-2] == "proj":  # blocks_i/proj: dim-change shortcut
        return "proj"
    return ""


def _walk(tree, path=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _walk(v, path + (k,))
    else:
        yield path, tree


def quantize_trunk(params: dict, skip: Tuple[str, ...] = ()) -> dict:
    """Rewrite every trunk block dense kernel into (kernel_q int8,
    kernel_scale fp32) pairs, leaving all other leaves untouched. The
    result feeds a model built with HieraConfig.quantize_int8=True.

    `skip` lists layer kinds to KEEP full-precision ("qkv" / "attn_out" /
    "mlp" / "proj"); it must match HieraConfig.quant_skip on the model."""
    flat = dict(_walk(params))
    out: dict = {}

    def insert(path, leaf):
        node = out
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = leaf

    for path, leaf in flat.items():
        kind = _block_dense_kind(path)
        if kind and kind not in skip:
            w_q, scale = quantize_weight(leaf, contract_axes=(0,))
            insert(path[:-1] + ("kernel_q",), np.asarray(w_q))
            insert(
                path[:-1] + ("kernel_scale",),
                np.asarray(scale, np.float32),
            )
        else:
            insert(path, leaf)
    return out
