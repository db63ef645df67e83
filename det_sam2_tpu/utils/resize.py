"""Torch-equivalent image resizing as precomputed dense weight matrices.

The reference calls ``F.interpolate`` in several hot/parity-critical places
(bicubic pos-embed interpolation, hieradet.py:283-299 via _get_pos_embed;
bilinear mask upsampling, sam2_base.py:370-376; antialiased bilinear mask
downsampling, sam2_base.py:320-330 and :447-453; nearest 2x FPN top-down,
image_encoder.py:101-134). On TPU, gather-based resize is VPU-bound and
bilinear/bicubic resampling is a *linear* operator, so we precompute the
1-D interpolation weights with numpy once per (in_size, out_size, mode) and
apply them as two small matmuls that XLA maps onto the MXU:

    out[o, p] = sum_h sum_w Wy[o, h] * x[h, w] * Wx[p, w]

This is bit-faithful to torch's align_corners=False semantics (including
antialias) because the weights themselves replicate torch's kernels.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic convolution kernel used by torch's bicubic (a=-0.75)."""
    ax = np.abs(x)
    ax2, ax3 = ax * ax, ax * ax * ax
    w = np.where(
        ax <= 1.0,
        (a + 2.0) * ax3 - (a + 3.0) * ax2 + 1.0,
        np.where(ax < 2.0, a * ax3 - 5.0 * a * ax2 + 8.0 * a * ax - 4.0 * a, 0.0),
    )
    return w


def _triangle_kernel(x: np.ndarray) -> np.ndarray:
    return np.clip(1.0 - np.abs(x), 0.0, None)


@functools.lru_cache(maxsize=None)
def resize_weights(
    in_size: int,
    out_size: int,
    mode: str = "bilinear",
    antialias: bool = False,
) -> np.ndarray:
    """1-D resize weight matrix [out_size, in_size] matching
    ``torch.nn.functional.interpolate(..., align_corners=False)``.

    mode: 'bilinear' | 'bicubic' | 'nearest'.
    antialias only affects downscaling (scale > 1), like torch/PIL.
    """
    w = np.zeros((out_size, in_size), dtype=np.float64)
    if in_size == out_size and mode != "nearest":
        np.fill_diagonal(w, 1.0)
        return w.astype(np.float32)

    scale = in_size / out_size

    if mode == "nearest":
        # torch 'nearest': src = floor(dst * in/out)
        for i in range(out_size):
            j = min(int(np.floor(i * scale)), in_size - 1)
            w[i, j] = 1.0
        return w.astype(np.float32)

    if mode == "bilinear":
        kernel, support = _triangle_kernel, 1.0
    elif mode == "bicubic":
        kernel, support = _cubic_kernel, 2.0
    else:
        raise ValueError(f"unknown resize mode: {mode}")

    if antialias and scale > 1.0:
        # PIL/torch antialiased path: stretch the kernel by the scale factor.
        kscale = scale
        ksupport = support * kscale
        for i in range(out_size):
            center = (i + 0.5) * scale
            xmin = max(int(center - ksupport + 0.5), 0)
            xmax = min(int(center + ksupport + 0.5), in_size)
            xs = np.arange(xmin, xmax, dtype=np.float64)
            ws = kernel((xs - center + 0.5) / kscale)
            s = ws.sum()
            if s > 0:
                ws = ws / s
            w[i, xmin:xmax] = ws
        return w.astype(np.float32)

    # non-antialiased path: fixed-width kernel, border clamping
    ntaps = int(2 * support)
    for i in range(out_size):
        center = (i + 0.5) * scale - 0.5
        base = int(np.floor(center)) - (ntaps // 2 - 1)
        xs = base + np.arange(ntaps, dtype=np.float64)
        ws = kernel(xs - center)
        s = ws.sum()
        if s != 0:
            ws = ws / s
        for t in range(ntaps):
            j = int(np.clip(xs[t], 0, in_size - 1))
            w[i, j] += ws[t]
    return w.astype(np.float32)


def resize_hw(x: jnp.ndarray, wy: jnp.ndarray, wx: jnp.ndarray) -> jnp.ndarray:
    """Resize over the LAST TWO axes: x [..., H, W] -> [..., H', W']."""
    x = jnp.einsum("oh,...hw->...ow", wy, x)
    return jnp.einsum("...ow,pw->...op", x, wx)


def resize_nhwc(x: jnp.ndarray, wy: jnp.ndarray, wx: jnp.ndarray) -> jnp.ndarray:
    """Resize NHWC: x [B, H, W, C] -> [B, H', W', C]."""
    x = jnp.einsum("oh,bhwc->bowc", wy, x)
    return jnp.einsum("bowc,pw->bopc", x, wx)


def torch_resize_hw(
    x: jnp.ndarray,
    out_hw,
    mode: str = "bilinear",
    antialias: bool = False,
) -> jnp.ndarray:
    """Convenience: resize the last two axes of ``x`` to ``out_hw`` with
    torch-interpolate-equivalent weights (computed on host, cached)."""
    h, w = x.shape[-2], x.shape[-1]
    oh, ow = out_hw
    wy = jnp.asarray(resize_weights(h, oh, mode, antialias))
    wx = jnp.asarray(resize_weights(w, ow, mode, antialias))
    orig_dtype = x.dtype
    out = resize_hw(x.astype(jnp.float32), wy, wx)
    return out.astype(orig_dtype)


def upsample2x_nearest_nhwc(x: jnp.ndarray) -> jnp.ndarray:
    """Exact torch 'nearest' 2x upsample (each pixel repeated 2x2)."""
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)
