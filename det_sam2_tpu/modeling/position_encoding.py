"""Positional encodings: 2-D sine, random-Fourier, 1-D sine, axial RoPE.

Re-designed from the behaviors in /root/reference/sam2/modeling/
position_encoding.py (PositionEmbeddingSine :16, PositionEmbeddingRandom
:115, init_t_xy/compute_axial_cis/apply_rotary_enc :167-220) and
sam2/modeling/sam2_utils.py:get_1d_sine_pe (:69).

TPU-first choices:
  * deterministic encodings (sine, RoPE tables) are precomputed with numpy on
    the host and closed over as constants — they never re-trace or recompute;
  * RoPE is expressed in real cos/sin arithmetic (no complex dtype, which the
    TPU backend lowers poorly) as an elementwise VPU op fused into attention.
"""

from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# 2-D sine embedding (PositionEmbeddingSine.forward equivalent)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def sine_pos_embed_2d(
    h: int, w: int, num_pos_feats: int, temperature: float = 10000.0
) -> np.ndarray:
    """Returns [h, w, num_pos_feats] (channels-last; torch returns NCHW).

    Channel layout matches the reference: concat(pe_y, pe_x) where each half
    interleaves sin/cos over pair-shared frequencies.
    """
    assert num_pos_feats % 2 == 0
    half = num_pos_feats // 2
    scale = 2 * math.pi
    eps = 1e-6

    y = np.arange(1, h + 1, dtype=np.float64)[:, None] * np.ones((1, w))
    x = np.arange(1, w + 1, dtype=np.float64)[None, :] * np.ones((h, 1))
    y = y / (h + eps) * scale
    x = x / (w + eps) * scale

    dim_t = np.arange(half, dtype=np.float64)
    dim_t = temperature ** (2 * (dim_t // 2) / half)

    def _interleave(p):  # p: [h, w, half] of pos/dim_t
        out = np.empty_like(p)
        out[..., 0::2] = np.sin(p[..., 0::2])
        out[..., 1::2] = np.cos(p[..., 1::2])
        return out

    pe_y = _interleave(y[..., None] / dim_t)
    pe_x = _interleave(x[..., None] / dim_t)
    return np.concatenate([pe_y, pe_x], axis=-1).astype(np.float32)


def get_1d_sine_pe(
    pos: jnp.ndarray, dim: int, temperature: float = 10000.0
) -> jnp.ndarray:
    """1-D sine embedding of (possibly traced) positions; [..., dim].

    Matches sam2_utils.get_1d_sine_pe: first half sin, second half cos over
    pair-shared frequencies.
    """
    pe_dim = dim // 2
    dim_t = np.arange(pe_dim, dtype=np.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / pe_dim)
    emb = pos[..., None] / jnp.asarray(dim_t)
    return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)


# ---------------------------------------------------------------------------
# Random-Fourier embedding (PositionEmbeddingRandom equivalent)
# The gaussian matrix is a model parameter; these are pure functions of it.
# ---------------------------------------------------------------------------


def random_pe_encode(coords01: jnp.ndarray, gaussian: jnp.ndarray) -> jnp.ndarray:
    """coords01 [..., 2] in [0,1] -> [..., 2*F] with gaussian [2, F]."""
    c = 2.0 * coords01 - 1.0
    c = c @ gaussian
    c = (2.0 * math.pi) * c
    return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)


def random_pe_grid(h: int, w: int, gaussian: jnp.ndarray) -> jnp.ndarray:
    """Dense grid encoding [h, w, 2*F] (reference returns C x H x W)."""
    ye = (np.arange(h, dtype=np.float32) + 0.5) / h
    xe = (np.arange(w, dtype=np.float32) + 0.5) / w
    grid = np.stack(
        [np.broadcast_to(xe[None, :], (h, w)), np.broadcast_to(ye[:, None], (h, w))],
        axis=-1,
    )  # [h, w, 2] as (x, y)
    return random_pe_encode(jnp.asarray(grid), gaussian)


def random_pe_points(
    coords_px: jnp.ndarray, image_hw, gaussian: jnp.ndarray
) -> jnp.ndarray:
    """Unnormalized pixel coords [..., 2] as (x, y) -> [..., 2*F]."""
    h, w = image_hw
    scale = jnp.asarray([1.0 / w, 1.0 / h], dtype=coords_px.dtype)
    return random_pe_encode(coords_px * scale, gaussian)


# ---------------------------------------------------------------------------
# Axial RoPE (compute_axial_cis / apply_rotary_enc equivalents)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def axial_rope_cos_sin(
    head_dim: int, end_x: int, end_y: int, theta: float = 10000.0
):
    """cos/sin tables [end_x*end_y, head_dim//2].

    Pair j of the head dim rotates by angle t*freq_j where the first
    head_dim//4 pairs use the x coordinate (t % end_x) and the rest use the
    y coordinate (t // end_x) — the reference's compute_axial_cis layout.
    """
    quarter = head_dim // 4
    freqs = 1.0 / (
        theta ** (np.arange(0, head_dim, 4, dtype=np.float64)[:quarter] / head_dim)
    )
    t = np.arange(end_x * end_y, dtype=np.float64)
    tx = t % end_x
    ty = np.floor(t / end_x)
    ang_x = np.outer(tx, freqs)  # [N, quarter]
    ang_y = np.outer(ty, freqs)
    ang = np.concatenate([ang_x, ang_y], axis=-1)  # [N, head_dim//2]
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate interleaved pairs of the last dim.

    x: [..., N, head_dim]; cos/sin: broadcastable to [..., N, head_dim//2].
    out[..., 2j]   = x[2j] * cos_j - x[2j+1] * sin_j
    out[..., 2j+1] = x[2j] * sin_j + x[2j+1] * cos_j
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    xr = xf[..., 0::2]
    xi = xf[..., 1::2]
    or_ = xr * cos - xi * sin
    oi_ = xr * sin + xi * cos
    out = jnp.stack([or_, oi_], axis=-1).reshape(x.shape)
    return out.astype(orig_dtype)


def rope_channel_perm(head_dim: int) -> np.ndarray:
    """Permutation mapping the interleaved-pair channel layout to
    [real half | imag half]: perm = [0, 2, 4, ..., 1, 3, 5, ...].

    Stride-2 lane slices (x[..., 0::2]) lower to expensive vector shuffles
    on TPU; permuting the q/k PROJECTION columns once (a [D, D] kernel
    gather, folded at compile time) makes the rotation act on contiguous
    halves instead. q.k scores are invariant under any permutation shared
    by q and k."""
    perm = np.empty(head_dim, np.int32)
    perm[: head_dim // 2] = np.arange(0, head_dim, 2)
    perm[head_dim // 2:] = np.arange(1, head_dim, 2)
    return perm


def apply_rope_halves(
    x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
) -> jnp.ndarray:
    """apply_rope for channels pre-permuted with rope_channel_perm:
    the pair (2j, 2j+1) lives at (j, j + D/2), so the rotation uses two
    contiguous half-slices (no lane shuffles)."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    half = x.shape[-1] // 2
    x1 = xf[..., :half]
    x2 = xf[..., half:]
    out = jnp.concatenate(
        [x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1
    )
    return out.astype(orig_dtype)


def tile_rope_tables(cos: jnp.ndarray, sin: jnp.ndarray, repeats: int):
    """Repeat per-frame RoPE tables along the token axis (rope_k_repeat)."""
    return (
        jnp.tile(cos, (repeats, 1)),
        jnp.tile(sin, (repeats, 1)),
    )
