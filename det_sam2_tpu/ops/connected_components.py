"""Connected components + hole filling: host C++ kernel and device JAX op.

Replaces the reference's single native component, the CUDA union-find CC
kernel (sam2/csrc/connected_components.cu:62-289) consumed by
fill_holes_in_mask_scores (sam2/utils/misc.py:365-393) and
SAM2Transforms.postprocess_masks (sam2/utils/transforms.py:84-120).

Two implementations:
  * HOST: `_cc_host.cpp` (union-find, ctypes; compiled on demand with g++)
    for video-resolution postprocessing. numpy/cv2 fallback when no
    compiler is available.
  * DEVICE: `connected_components_jax` — iterative 8-neighbor min-label
    propagation under lax.while_loop with areas via segment_sum. Static
    shapes, jit-safe, runs inside the tracked-frame step so the
    fill_hole_area=8 postprocess (build_sam.py:134) costs no transfers.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Histogram-path override, read ONCE at import: env toggles after the
# first jit trace would silently have no effect (the mode is baked into
# the compiled step), so runtime control goes through the explicit `mode`
# argument of small_components_jax instead.
_CC_HIST_MODE = os.environ.get("DET_SAM2_CC_HIST", "")

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "_cc_host.cpp")
_LIB_PATH = os.path.join(_HERE, "_cc_host.so")
_LIB: Optional[ctypes.CDLL] = None
_LIB_TRIED = False


def _build_host_lib() -> Optional[str]:
    try:
        # compile to a process-private temp file, then atomically publish:
        # concurrent processes (serving worker + tests) may build at the
        # same time, and CDLL-ing a half-written .so segfaults
        tmp = f"{_LIB_PATH}.{os.getpid()}.tmp"
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
             "-o", tmp],
            check=True,
            capture_output=True,
        )
        os.replace(tmp, _LIB_PATH)
        return _LIB_PATH
    except Exception:
        return None


def _lib_fresh() -> bool:
    """The published .so exists and is no older than its source (a stale
    artifact would silently pin pre-edit behavior)."""
    try:
        return os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC)
    except OSError:
        return False


def _get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    if _LIB is not None or _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    path = _LIB_PATH if _lib_fresh() else _build_host_lib()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.connected_components_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.connected_components_u8.restype = None
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def get_connected_components_np(
    masks: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray]:
    """masks [..., H, W] (bool/uint8) -> (labels int32, areas int32), both
    [..., H, W]. 8-connectivity; labels > 0 on foreground."""
    m = np.ascontiguousarray(np.asarray(masks) != 0, dtype=np.uint8)
    lead = m.shape[:-2]
    h, w = m.shape[-2:]
    flat = m.reshape(-1, h, w)
    n = flat.shape[0]
    labels = np.zeros((n, h, w), np.int32)
    areas = np.zeros((n, h, w), np.int32)

    lib = _get_lib()
    if lib is not None:
        lib.connected_components_u8(
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n, h, w,
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            areas.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
    else:  # cv2 fallback
        import cv2

        for i in range(n):
            cnt, lab, stats, _ = cv2.connectedComponentsWithStats(flat[i], 8)
            labels[i] = lab
            sizes = stats[:, cv2.CC_STAT_AREA]
            sizes = sizes.copy()
            sizes[0] = 0
            areas[i] = sizes[lab]
    return labels.reshape(*lead, h, w), areas.reshape(*lead, h, w)


def fill_holes_in_mask_scores_np(mask: np.ndarray, max_area: float) -> np.ndarray:
    """Host equivalent of sam2/utils/misc.py:fill_holes_in_mask_scores."""
    assert max_area > 0
    labels, areas = get_connected_components_np(mask <= 0)
    is_hole = (labels > 0) & (areas <= max_area)
    return np.where(is_hole, 0.1, mask)


def fill_holes_and_sprinkles_np(
    masks: np.ndarray, threshold: float, max_hole_area: float,
    max_sprinkle_area: float,
) -> np.ndarray:
    """Host equivalent of SAM2Transforms.postprocess_masks cleanup.

    Both connected-component passes are computed from the ORIGINAL mask
    (the reference's mask_flat is built once, transforms.py:~95 — the
    sprinkle pass does NOT see the hole-filled values), while the +-10
    writes apply sequentially."""
    orig = masks.astype(np.float32)
    out = orig
    if max_hole_area > 0:
        labels, areas = get_connected_components_np(orig <= threshold)
        is_hole = (labels > 0) & (areas <= max_hole_area)
        out = np.where(is_hole, threshold + 10.0, out)
    if max_sprinkle_area > 0:
        labels, areas = get_connected_components_np(orig > threshold)
        is_spr = (labels > 0) & (areas <= max_sprinkle_area)
        out = np.where(is_spr, threshold - 10.0, out)
    return out


# ---------------------------------------------------------------------------
# device (JAX) implementation
# ---------------------------------------------------------------------------


def _propagate_once(labels: jnp.ndarray, fg: jnp.ndarray) -> jnp.ndarray:
    """One 8-neighbor min-propagation step: a single 3x3 min-pool (the
    center is included, which is a no-op since labels only decrease).
    Out-of-bounds neighbors contribute the dtype-max identity via padding.
    labels [..., H, W] int32 or fp32 (fp32 rides the hardware pooling
    path; flat indices < 2^24 are exact) with a large sentinel on
    background."""
    big = (
        np.float32(np.finfo(np.float32).max)
        if labels.dtype == jnp.float32
        else np.int32(np.iinfo(np.int32).max)
    )
    lead = labels.ndim - 2
    out = jax.lax.reduce_window(
        labels,
        jnp.asarray(big, labels.dtype),
        jax.lax.min,
        window_dimensions=(1,) * lead + (3, 3),
        window_strides=(1,) * labels.ndim,
        padding=((0, 0),) * lead + ((1, 1), (1, 1)),
    )
    return jnp.where(fg, out, jnp.asarray(big, labels.dtype))


def connected_components_jax(
    masks: jnp.ndarray, max_iters: Optional[int] = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Device CC: masks [..., H, W] bool -> (labels int32 [+1-based],
    areas int32). Min-label propagation with POINTER JUMPING: each round
    does one 8-neighbor min (reach +1) then one label = label[label] hop
    (reach doubles), so convergence is O(log(component diameter)) serial
    steps instead of O(diameter) — ~16 rounds for a 192^2 grid worst case
    vs up to h*w for plain propagation."""
    fg = masks != 0
    h, w = fg.shape[-2], fg.shape[-1]
    big = jnp.asarray(jnp.iinfo(jnp.int32).max, jnp.int32)
    init = jnp.where(
        fg,
        jax.lax.broadcasted_iota(jnp.int32, fg.shape, fg.ndim - 2) * w
        + jax.lax.broadcasted_iota(jnp.int32, fg.shape, fg.ndim - 1),
        big,
    )
    lead = fg.shape[:-2]
    fg_flat = fg.reshape(-1, h * w)

    def jump(labels):
        # labels of foreground pixels are flat indices of same-component
        # pixels; one hop halves the remaining chain depth
        flat = labels.reshape(-1, h * w)
        ptr = jnp.clip(flat, 0, h * w - 1)
        hopped = jnp.take_along_axis(flat, ptr, axis=-1)
        out = jnp.where(fg_flat, jnp.minimum(flat, hopped), big)
        return out.reshape(labels.shape)

    def cond(state):
        labels, changed, it = state
        # the fixed-point check terminates the loop; the bound is a safety
        # net only (with jumping, real convergence is ~log(diameter) rounds)
        limit = max_iters if max_iters is not None else h * w
        return changed & (it < limit)

    def body(state):
        labels, _, it = state
        new = jump(_propagate_once(labels, fg))
        return new, jnp.any(new != labels), it + 1

    labels, _, _ = jax.lax.while_loop(cond, body, (init, jnp.bool_(True), 0))

    flat = jnp.where(fg, labels, 0).reshape(-1, h * w)
    ones = fg.reshape(-1, h * w).astype(jnp.int32)

    def per_image(lab_row, ones_row):
        seg = jax.ops.segment_sum(ones_row, lab_row, num_segments=h * w)
        return seg[lab_row]

    areas = jax.vmap(per_image)(flat, ones).reshape(fg.shape)
    areas = jnp.where(fg, areas, 0)
    labels_out = jnp.where(fg, labels + 1, 0)
    return labels_out, areas


def _small_via_stencil(
    fg: jnp.ndarray,
    labels: jnp.ndarray,
    changed: jnp.ndarray,
    max_area: float,
    a: int,
) -> jnp.ndarray:
    """Exact per-group area test as a bounded-displacement stencil.

    After `a` rounds of speed-1 min-propagation, every pixel holding label
    L = r0*w + c0 reached it along an in-component path of length <= a, so
    it lies within Chebyshev distance a of pixel (r0, c0); flat-index
    minimality further forces dr = r - r0 in [0, a] and, when dr == 0,
    dc >= 0. Group areas (and the contains-a-still-changing-pixel flag)
    are therefore sums over a fixed (a+1) x (2a+1) window — pure VPU
    shift/compare/add work on [M, H, W] tiles with an (a, a)-halo, no
    65k-bin histogram contraction and no flat gather. Counts are exactly
    the label-group sizes, so the result is bit-identical to the
    histogram path."""
    h, w = fg.shape[-2], fg.shape[-1]
    big = jnp.asarray(np.finfo(np.float32).max, jnp.float32)
    iota = (
        jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
        + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    ).astype(jnp.float32)
    lead_pad = ((0, 0),) * (labels.ndim - 2)
    # group pixels lie BELOW-or-AT the root row: pad rows (0, a); cols (a, a)
    pad_lab = jnp.pad(labels, lead_pad + ((0, a), (a, a)), constant_values=big)
    pad_chg = jnp.pad(changed, lead_pad + ((0, a), (a, a)))

    area = jnp.zeros(labels.shape, jnp.float32)
    grp_changed = jnp.zeros(labels.shape, bool)
    for dr in range(0, a + 1):
        for dc in range(-a, a + 1):
            if dr == 0 and dc < 0:
                continue
            sl = (Ellipsis, slice(dr, dr + h), slice(a + dc, a + dc + w))
            eq = pad_lab[sl] == iota  # pixel (r+dr, c+dc) holds label r*w+c
            area = area + eq
            grp_changed = grp_changed | (eq & pad_chg[sl])
    small2d = (area > 0) & (area <= max_area) & ~grp_changed

    # back-map group smallness to member pixels: pixel (r, c) holding label
    # (r-dr)*w + (c-dc) reads small2d at that root — the mirrored stencil
    pad_small = jnp.pad(small2d, lead_pad + ((a, 0), (a, a)))
    small_px = jnp.zeros(labels.shape, bool)
    for dr in range(0, a + 1):
        for dc in range(-a, a + 1):
            if dr == 0 and dc < 0:
                continue
            root = iota - (dr * w + dc)
            sl = (Ellipsis, slice(a - dr, a - dr + h),
                  slice(a - dc, a - dc + w))
            small_px = small_px | ((labels == root) & pad_small[sl])
    return small_px & fg


def small_components_jax(
    masks: jnp.ndarray, max_area: float, mode: Optional[str] = None
) -> jnp.ndarray:
    """Exact mask of pixels belonging to connected components with area
    <= max_area, using a FIXED number of propagation rounds (hot-path
    replacement for full CC inside the per-frame step).

    Why ceil(max_area) rounds are exact:
      * a component with area <= A has diameter < A, so A rounds of
        8-neighbor min-propagation fully converge it -> its label group IS
        the component and the area test is exact;
      * a larger component may be fragmented into label groups, but any
        group that would pass the area test (<= A pixels) either contains a
        pixel that still changes in one more round (excluded by the
        fixed-point check), or is a min-rooted radius-A ball with >= A+1
        pixels (excluded by the area test).
    No while_loop, no per-round gathers — just A+1 rounds of rolls/mins plus
    one segment_sum/segment_max pair."""
    assert max_area > 0, max_area  # matches fill_holes_in_mask_scores_np
    a = max(int(np.ceil(max_area)), 1)  # a=0 would make fori_loop illegal
    fg = masks != 0
    h, w = fg.shape[-2], fg.shape[-1]
    # fp32 labels: exact for flat indices < 2^24 and the 3x3 min-pool
    # lowers onto the hardware pooling path (int32 reduce_window doesn't)
    big = jnp.asarray(np.finfo(np.float32).max, jnp.float32)
    labels = jnp.where(
        fg,
        (jax.lax.broadcasted_iota(jnp.int32, fg.shape, fg.ndim - 2) * w
         + jax.lax.broadcasted_iota(jnp.int32, fg.shape, fg.ndim - 1)
         ).astype(jnp.float32),
        big,
    )
    labels = jax.lax.fori_loop(
        0, a, lambda _, lab: _propagate_once(lab, fg), labels,
        unroll=min(a, 8),
    )
    changed = (_propagate_once(labels, fg) != labels) & fg

    # Path choice: the bounded-displacement stencil costs O(a^2) taps but
    # avoids the 65k-bin histogram contraction entirely; the histogram is
    # ~constant in a. On-chip A/B (hiera-L 1024^2 whole-scan, a=8): stencil
    # 0.24 ms/frame vs histogram 2.06 — stencil wins by ~9x at the default
    # fill_hole_area=8 and stays ahead until its quadratic tap count
    # catches up (~a=24 extrapolated), so it is the default for a <= 16.
    # mode=stencil|bf16|bf16x1|int8 forces a path for re-A/Bs (defaults to
    # the import-time DET_SAM2_CC_HIST env value; the env is NOT re-read
    # here — mid-process toggles after a jit trace would be silent no-ops).
    mode_s = _CC_HIST_MODE if mode is None else mode
    if mode_s == "stencil" or (mode_s == "" and a <= 16):
        return _small_via_stencil(fg, labels, changed, max_area, a)
    if mode_s == "":
        mode_s = "bf16"

    flat_lab = jnp.where(fg, labels, 0.0).astype(jnp.int32).reshape(-1, h * w)
    flat_fg = fg.reshape(-1, h * w)
    flat_ch = changed.reshape(-1, h * w)

    mode = mode_s

    def per_image(lab_row, fg_row, ch_row):
        # Per-label histograms WITHOUT scatter (TPU scatters serialize; a
        # 36k-bin segment_sum costs ~1 ms/frame inside the tracked-frame
        # step). Factor label = r * w + c and express the histogram as a
        # one-hot matmul: areas2d[r, c] = sum_p U[p, r] * V[p, c] with
        # U = onehot(label // w) (fg-masked), V = onehot(label % w).
        # Default "bf16": TWO bf16 dots (fp32 accum, exact for counts
        # < 2^24) — the round-4 on-chip A/B measured it fastest
        # (hiera-S 768 whole-scan 105.2 FPS vs 102.8 "int8" / 102.7
        # "bf16x1"; hiera-L 1024: 30.8 vs 30.35 / 30.49): packing both
        # histograms (area and contains-a-changed-pixel) into ONE dot via
        # a width-2w V costs more than the second dot saves, regardless
        # of operand dtype. DET_SAM2_CC_HIST selects the alternatives for
        # re-A/Bs on other hardware.
        r_hot = (
            (lab_row // w)[:, None]
            == jax.lax.broadcasted_iota(jnp.int32, (1, h), 1)
        )
        c_hot = (
            (lab_row % w)[:, None]
            == jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
        )
        if mode == "bf16":
            c16 = c_hot.astype(jnp.bfloat16)

            def hist(row_mask):
                u = (r_hot & row_mask[:, None]).astype(jnp.bfloat16)
                return jax.lax.dot_general(
                    u, c16, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).reshape(h * w)

            seg_area = hist(fg_row)
            seg_changed = hist(fg_row & ch_row)
        else:
            dt = jnp.bfloat16 if mode == "bf16x1" else jnp.int8
            acc = jnp.float32 if mode == "bf16x1" else jnp.int32
            u = (r_hot & fg_row[:, None]).astype(dt)
            v = jnp.concatenate(
                [c_hot, c_hot & ch_row[:, None]], axis=1
            ).astype(dt)
            both = jax.lax.dot_general(
                u, v, (((0,), (0,)), ((), ())),
                preferred_element_type=acc,
            )
            seg_area = both[:, :w].reshape(h * w)
            seg_changed = both[:, w:].reshape(h * w)
        small = (seg_area > 0) & (seg_area <= max_area) & (seg_changed == 0)
        return small[lab_row]

    small = jax.vmap(per_image)(flat_lab, flat_fg, flat_ch)
    return small.reshape(fg.shape) & fg


def fill_holes_in_mask_scores_jax(
    mask: jnp.ndarray, max_area: float
) -> jnp.ndarray:
    """Device fill-holes on mask logits [..., H, W] (misc.py:365-393);
    background components with area <= max_area become 0.1 foreground."""
    is_hole = small_components_jax(mask <= 0, max_area)
    return jnp.where(is_hole, jnp.asarray(0.1, mask.dtype), mask)
