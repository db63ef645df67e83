"""Static-shape inference state: the ring-buffer memory bank.

This replaces the reference's mutable dict state machine
(`inference_state["output_dict"]` in sam2/sam2_video_predictor.py:43-120,
select_closest_cond_frames in sam2/modeling/sam2_utils.py:19-66, the memory
gathering in sam2/modeling/sam2_base.py:479-690, and release_old_frames
:1215-1277) with fixed-capacity arrays + integer index arithmetic, so the
whole per-frame step compiles ONCE and never re-traces:

  * cond bank   [Kc slots]: prompted (conditioning) frames; preloaded frames
    are PINNED (never evicted; always eligible for attention — the fork's
    preload-memory semantics, sam2_utils.py:56-60).
  * non-cond bank [Kn slots]: tracked frames; eviction = overwrite oldest.
  * object axis O: padded slots; adding an object mid-stream is a host-side
    bump of the active count, no recompilation (vs the re-consolidation loop
    at sam2_video_predictor.py:250-327).

Eviction-policy note: the reference keeps every frame until
release_old_frames deletes old ones; here the Kn-slot ring implicitly keeps
the most recent Kn distinct frames. Selection only ever looks back
max(num_maskmem*stride, max_obj_ptrs) frames, so behavior is identical
whenever Kn >= that window (the default 32 covers the app defaults).
Similarly the cond bank attends over the `cond_attn_size` closest slots —
identical to the reference whenever the number of live cond frames is <=
cond_attn_size (select_closest semantics otherwise approximated by
closest-|dt| priority with pinned frames always included).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from det_sam2_tpu.configs import SAM2Config

# np scalars, NOT jnp: a module-level jnp constant commits to the device
# at import time, so merely importing the package would hang when the
# accelerator is unreachable (observed with the tunneled TPU down).
INVALID = np.int32(-1)
_FAR = np.int32(2**30)


@flax.struct.dataclass
class MemoryBank:
    """Per-video tracking memory. Leading axis = slots, second = objects."""

    cond_mem: jnp.ndarray  # [Kc, O, S, Cm]
    cond_ptr: jnp.ndarray  # [Kc, O, C]
    cond_frame_idx: jnp.ndarray  # [Kc] int32 (-1 = empty)
    cond_pinned: jnp.ndarray  # [Kc] bool
    cond_obj_valid: jnp.ndarray  # [Kc, O] bool (per-object row validity --
    # the reference's per-object output dicts: an object only attends frames
    # written while it existed)
    noncond_mem: jnp.ndarray  # [Kn, O, S, Cm]
    noncond_ptr: jnp.ndarray  # [Kn, O, C]
    noncond_frame_idx: jnp.ndarray  # [Kn] int32
    noncond_obj_valid: jnp.ndarray  # [Kn, O] bool
    # Banked-attention caches (None unless the engine enables the
    # bank-indirect memory cross-attention). Unified slot space: cond slot
    # i -> row i, non-cond slot j -> row Kc + j, row Kc + Kn = the per-frame
    # obj-ptr staging tile. mem_k holds each memory-attention layer's
    # PROJECTED + ROPED keys of (mem + spatial_pos), computed once at bank
    # write time; mem_v duplicates the raw memory values so the flash
    # kernel reads K AND V directly from bank rows via a scalar-prefetched
    # slot list (no per-frame gather / K materialization).
    mem_k: jnp.ndarray = None  # [Kc+Kn+1, O, L, S, Dk] or None
    mem_v: jnp.ndarray = None  # [Kc+Kn+1, O, S, Cm] or None
    # STATIC metadata (not a pytree leaf): how many cond tiles the read path
    # attends. All pre-attention K/V work (projections, RoPE, pos-add) runs
    # densely over the padded memory, so sizing the attend set to the LIVE
    # cond count — bucketed so recompiles are bounded — is what keeps the
    # 20-cond-capable layout from costing 20 tiles of bandwidth when only
    # 1-2 cond frames exist. 0 = full capacity.
    attend_cond_tiles: int = flax.struct.field(pytree_node=False, default=0)

    @property
    def num_objects(self) -> int:
        return self.cond_mem.shape[1]


def init_bank(
    cfg: SAM2Config,
    num_objects: int,
    dtype=jnp.float32,
    attend_cond_tiles: int = 0,
    banked_layers: int = 0,
) -> MemoryBank:
    """banked_layers > 0 additionally allocates the bank-indirect attention
    caches (mem_k/mem_v) for that many memory-attention layers; the engine
    step functions pick the banked cross-attention path whenever the bank
    carries them (the pytree structure IS the mode switch)."""
    s = cfg.image_embedding_size ** 2
    kc, kn = cfg.cond_bank_size, cfg.noncond_bank_size
    o, cm, c = num_objects, cfg.mem_dim, cfg.hidden_dim
    mem_k = mem_v = None
    if banked_layers > 0:
        dk = cfg.memory_attention.d_model
        mem_k = jnp.zeros((kc + kn + 1, o, banked_layers, s, dk), dtype)
        mem_v = jnp.zeros((kc + kn + 1, o, s, cm), dtype)
    return MemoryBank(
        cond_mem=jnp.zeros((kc, o, s, cm), dtype),
        cond_ptr=jnp.zeros((kc, o, c), dtype),
        cond_frame_idx=jnp.full((kc,), INVALID),
        cond_pinned=jnp.zeros((kc,), bool),
        cond_obj_valid=jnp.zeros((kc, o), bool),
        noncond_mem=jnp.zeros((kn, o, s, cm), dtype),
        noncond_ptr=jnp.zeros((kn, o, c), dtype),
        noncond_frame_idx=jnp.full((kn,), INVALID),
        noncond_obj_valid=jnp.zeros((kn, o), bool),
        mem_k=mem_k,
        mem_v=mem_v,
        attend_cond_tiles=attend_cond_tiles,
    )


def next_pow2(n: int) -> int:
    """Smallest power of two >= n (n >= 1). THE bucketing helper: object
    slots, cond attend tiles, and window run-count buckets all round with
    this so compiled-graph cache keys stay consistent."""
    return 1 << max(n - 1, 0).bit_length()


def cond_tile_bucket(cfg: SAM2Config, live_cond: int) -> int:
    """Power-of-two bucket (capped at capacity) for the attended cond-tile
    count, so live-cond growth triggers at most ~log2(capacity) recompiles."""
    cap = min(cfg.cond_attn_size, cfg.cond_bank_size)
    return min(next_pow2(min(max(live_cond, 1), cap)), cap)


def grow_objects(bank: MemoryBank, new_num_objects: int) -> MemoryBank:
    """Pad the object axis (mid-stream new-object addition). The new rows
    hold zeros; the host re-encodes recent cond frames to fill them
    (the TPU analogue of sam2_video_predictor.py:250-327)."""
    o = bank.num_objects
    if new_num_objects <= o:
        return bank
    pad = new_num_objects - o

    def _pad(x):
        if x.ndim >= 2 and x.shape[1] == o:
            widths = [(0, 0)] * x.ndim
            widths[1] = (0, pad)
            return jnp.pad(x, widths)
        return x

    return bank.replace(
        cond_mem=_pad(bank.cond_mem),
        cond_ptr=_pad(bank.cond_ptr),
        cond_obj_valid=_pad(bank.cond_obj_valid),
        noncond_mem=_pad(bank.noncond_mem),
        noncond_ptr=_pad(bank.noncond_ptr),
        noncond_obj_valid=_pad(bank.noncond_obj_valid),
        mem_k=None if bank.mem_k is None else _pad(bank.mem_k),
        mem_v=None if bank.mem_v is None else _pad(bank.mem_v),
    )


def _choose_write_slot(frame_idx_vec, pinned, frame_idx):
    """match > first empty > temporally-furthest unpinned.

    Eviction is distance-from-current, not oldest-first: the read path only
    ever looks a bounded window around the frame being written (strided
    non-cond selection + obj-ptr scan), in BOTH directions, so the right
    victim is the frame furthest from the write position. Oldest-first
    breaks reverse tracking, where the most recently written frames have the
    smallest indices and would be evicted first once the bank fills."""
    match = frame_idx_vec == frame_idx
    empty = frame_idx_vec < 0
    # distance is measured from the frame being WRITTEN — for the steady
    # streaming path that frame IS the current tracking position. Writes to
    # old frames (demotions, late corrections) use the written frame as a
    # proxy for "current", which can evict a nearer-to-current slot; the
    # app never does this mid-window, so the approximation is acceptable.
    dist = jnp.abs(frame_idx_vec - frame_idx)
    # pinned slots are shielded only while an unpinned victim exists; if
    # EVERY slot is pinned (preload bank at capacity), fall back to
    # furthest-pinned instead of silently clobbering slot 0
    any_unpinned = jnp.any(~pinned)
    evict_key = jnp.where(pinned & any_unpinned, jnp.int32(-1), dist)
    slot = jnp.where(
        match.any(),
        jnp.argmax(match),
        jnp.where(empty.any(), jnp.argmax(empty), jnp.argmax(evict_key)),
    )
    return slot, match.any()


def _write_banked(bank: MemoryBank, row, mem, mem_k, skip=None):
    """Mirror a slot write into the banked-attention caches (row = unified
    slot index: cond slot i -> i, non-cond slot j -> Kc + j)."""
    if bank.mem_k is None:
        return bank
    assert mem_k is not None, (
        "bank carries banked-attention caches; writers must pass mem_k "
        "(model.project_memory_k of the written memory)"
    )
    mem_k = mem_k.astype(bank.mem_k.dtype)
    mem_v = mem.astype(bank.mem_v.dtype)
    if skip is not None:
        mem_k = jnp.where(skip, bank.mem_k[row], mem_k)
        mem_v = jnp.where(skip, bank.mem_v[row], mem_v)
    return bank.replace(
        mem_k=bank.mem_k.at[row].set(mem_k),
        mem_v=bank.mem_v.at[row].set(mem_v),
    )


def write_cond(
    bank: MemoryBank,
    frame_idx: jnp.ndarray,
    mem: jnp.ndarray,  # [O, S, Cm]
    ptr: jnp.ndarray,  # [O, C]
    obj_valid: jnp.ndarray = None,  # [O] bool: rows backed by live objects
    pinned: bool = False,
    mem_k: jnp.ndarray = None,  # [O, L, S, Dk] (banked mode only)
) -> MemoryBank:
    if obj_valid is None:
        obj_valid = jnp.ones((mem.shape[0],), bool)
    slot, had_match = _choose_write_slot(
        bank.cond_frame_idx, bank.cond_pinned, frame_idx
    )
    keep_pin = jnp.where(had_match, bank.cond_pinned[slot], False)
    bank = _write_banked(bank, slot, mem, mem_k)
    return bank.replace(
        cond_mem=bank.cond_mem.at[slot].set(mem.astype(bank.cond_mem.dtype)),
        cond_ptr=bank.cond_ptr.at[slot].set(ptr.astype(bank.cond_ptr.dtype)),
        cond_frame_idx=bank.cond_frame_idx.at[slot].set(frame_idx),
        cond_pinned=bank.cond_pinned.at[slot].set(keep_pin | pinned),
        cond_obj_valid=bank.cond_obj_valid.at[slot].set(obj_valid),
    )


def write_noncond(
    bank: MemoryBank,
    frame_idx: jnp.ndarray,
    mem: jnp.ndarray,
    ptr: jnp.ndarray,
    obj_valid: jnp.ndarray = None,
    skip: jnp.ndarray = None,
    mem_k: jnp.ndarray = None,  # [O, L, S, Dk] (banked mode only)
) -> MemoryBank:
    """Write one non-cond slot (eviction = temporally furthest). With
    `skip` (traced bool), a skipped write rewrites the chosen slot with its
    OWN current values — a bit-identical no-op expressed as straight-line
    dynamic slices, so callers in a scan don't need a lax.cond around the
    write (conditionals block carry buffer aliasing)."""
    if obj_valid is None:
        obj_valid = jnp.ones((mem.shape[0],), bool)
    slot, _ = _choose_write_slot(
        bank.noncond_frame_idx,
        jnp.zeros_like(bank.noncond_frame_idx, bool),
        frame_idx,
    )
    bank = _write_banked(
        bank, bank.cond_frame_idx.shape[0] + slot, mem, mem_k, skip=skip
    )
    mem = mem.astype(bank.noncond_mem.dtype)
    ptr = ptr.astype(bank.noncond_ptr.dtype)
    fidx = frame_idx
    if skip is not None:
        mem = jnp.where(skip, bank.noncond_mem[slot], mem)
        ptr = jnp.where(skip, bank.noncond_ptr[slot], ptr)
        fidx = jnp.where(skip, bank.noncond_frame_idx[slot], frame_idx)
        obj_valid = jnp.where(skip, bank.noncond_obj_valid[slot], obj_valid)
    return bank.replace(
        noncond_mem=bank.noncond_mem.at[slot].set(mem),
        noncond_ptr=bank.noncond_ptr.at[slot].set(ptr),
        noncond_frame_idx=bank.noncond_frame_idx.at[slot].set(fidx),
        noncond_obj_valid=bank.noncond_obj_valid.at[slot].set(obj_valid),
    )


def clear_object_rows(bank: MemoryBank, obj_idx: int) -> MemoryBank:
    """Invalidate every bank memory row for one object slot. Used by
    remove_object so a later object reusing the freed slot never attends the
    removed object's stale memories (the reference instead compacts slot
    indices, sam2_video_predictor.py:1437-1535)."""
    return bank.replace(
        cond_obj_valid=bank.cond_obj_valid.at[:, obj_idx].set(False),
        noncond_obj_valid=bank.noncond_obj_valid.at[:, obj_idx].set(False),
    )


def release_frames(
    bank: MemoryBank,
    min_keep_idx: jnp.ndarray,
    max_keep_idx: jnp.ndarray = None,
) -> MemoryBank:
    """Invalidate unpinned slots with frame_idx < min_keep_idx (and
    optionally > max_keep_idx) — the fork's release_old_frames
    (sam2_video_predictor.py:1215-1277); pinned preload frames survive."""

    def _drop(vec, pinned):
        drop = (vec >= 0) & (vec < min_keep_idx) & ~pinned
        if max_keep_idx is not None:
            drop = drop | ((vec >= 0) & (vec > max_keep_idx) & ~pinned)
        return jnp.where(drop, INVALID, vec)

    return bank.replace(
        cond_frame_idx=_drop(bank.cond_frame_idx, bank.cond_pinned),
        noncond_frame_idx=_drop(
            bank.noncond_frame_idx, jnp.zeros_like(bank.noncond_frame_idx, bool)
        ),
    )


def invalidate_noncond(bank: MemoryBank, frame_idx: jnp.ndarray) -> MemoryBank:
    """Drop a frame from the non-cond bank (the cond/non-cond dedup at
    sam2_video_predictor.py:871-878: a frame must not be both)."""
    vec = bank.noncond_frame_idx
    return bank.replace(
        noncond_frame_idx=jnp.where(vec == frame_idx, INVALID, vec)
    )


def remove_cond_frame(bank: MemoryBank, frame_idx: jnp.ndarray) -> MemoryBank:
    match = bank.cond_frame_idx == frame_idx
    return bank.replace(
        cond_frame_idx=jnp.where(match, INVALID, bank.cond_frame_idx),
        cond_pinned=jnp.where(match, False, bank.cond_pinned),
    )


def demote_cond_frame(bank: MemoryBank, frame_idx: jnp.ndarray) -> MemoryBank:
    """Move a frame's memory from the cond bank to the non-cond bank (the
    cond->non-cond demotion in clear_all_prompts_in_frame,
    sam2_video_predictor.py:1060-1131)."""
    match = bank.cond_frame_idx == frame_idx
    has = match.any()
    slot = jnp.argmax(match)
    bank2 = write_noncond(
        bank, frame_idx, bank.cond_mem[slot], bank.cond_ptr[slot],
        obj_valid=bank.cond_obj_valid[slot],  # carry per-object validity:
        # defaulting to all-valid would resurrect freed objects' rows
        mem_k=None if bank.mem_k is None else bank.mem_k[slot],
    )
    # undo the noncond write when the cond frame didn't exist
    bank2 = jax.tree_util.tree_map(
        lambda new, old: jnp.where(has, new, old), bank2, bank
    )
    return remove_cond_frame(bank2, jnp.where(has, frame_idx, INVALID))


def clear_noncond_around(
    bank: MemoryBank, frame_idx: jnp.ndarray, radius: jnp.ndarray
) -> MemoryBank:
    """_clear_non_cond_mem_around_input (sam2_video_predictor.py:1551-1571):
    drop non-cond memories within +-radius of a correction frame."""
    vec = bank.noncond_frame_idx
    drop = (vec >= 0) & (jnp.abs(vec - frame_idx) <= radius)
    return bank.replace(noncond_frame_idx=jnp.where(drop, INVALID, vec))


# ---------------------------------------------------------------------------
# memory selection (read path)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class MemoryLayout:
    """Static description of the packed memory-token sequence."""

    num_cond_tiles: int
    num_noncond_tiles: int
    tokens_per_tile: int
    num_ptr_slots: int
    tokens_per_ptr: int

    @property
    def num_mem_frames(self) -> int:
        return self.num_cond_tiles + self.num_noncond_tiles

    @property
    def num_spatial_tokens(self) -> int:
        return self.num_mem_frames * self.tokens_per_tile

    @property
    def num_ptr_tokens(self) -> int:
        return self.num_ptr_slots * self.tokens_per_ptr

    @property
    def num_tokens(self) -> int:
        return self.num_spatial_tokens + self.num_ptr_tokens


def memory_layout(cfg: SAM2Config, attend_cond_tiles: int = 0) -> MemoryLayout:
    cap = min(cfg.cond_attn_size, cfg.cond_bank_size)
    ka = cap if attend_cond_tiles <= 0 else min(attend_cond_tiles, cap)
    return MemoryLayout(
        num_cond_tiles=ka,
        num_noncond_tiles=cfg.num_maskmem - 1,
        tokens_per_tile=cfg.image_embedding_size ** 2,
        num_ptr_slots=ka + cfg.max_obj_ptrs_in_encoder - 1,
        tokens_per_ptr=cfg.hidden_dim // cfg.mem_dim,
    )


def _desired_noncond_indices(
    cfg: SAM2Config, frame_idx: jnp.ndarray, reverse: bool
) -> jnp.ndarray:
    """Frame indices of the (num_maskmem-1) non-cond memories at temporal
    stride r — exact arithmetic of sam2_base.py:528-562."""
    r = cfg.memory_temporal_stride_for_eval
    out = []
    for t_pos in range(1, cfg.num_maskmem):
        t_rel = cfg.num_maskmem - t_pos
        if t_rel == 1:
            idx = frame_idx + 1 if reverse else frame_idx - 1
        else:
            if not reverse:
                base = ((frame_idx - 2) // r) * r
                idx = base - (t_rel - 2) * r
            else:
                base = -(-(frame_idx + 2) // r) * r
                idx = base + (t_rel - 2) * r
        out.append(idx)
    return jnp.stack(out)  # [num_maskmem-1], earliest (t_pos=1) first


def _take_rows(arr: jnp.ndarray, idx: jnp.ndarray, k: int) -> jnp.ndarray:
    """Gather k rows of arr ([N, ...]) at traced indices idx ([k] int32),
    as k UNROLLED dynamic slices + stack. XLA lowers jnp.take with traced
    indices to a general gather, which TPU executes (near-)element-serially
    — profiled at ~1.3 ms for the 7-tile memory selection inside the
    tracked-frame step; the unrolled dynamic-slice form is pure DMA."""
    return jnp.stack(
        [jax.lax.dynamic_index_in_dim(arr, idx[i], keepdims=False)
         for i in range(k)]
    )


def _take_rows_dot(arr: jnp.ndarray, idx: jnp.ndarray, k: int) -> jnp.ndarray:
    """One-hot-matmul row gather for SMALL arrays ([N, ...] with few kB per
    row): out[i] = sum_n onehot[i, n] * arr[n]. One MXU dot replaces k
    dynamic slices (each slice has a ~us dispatch floor; the dot is one op).
    Exact for fp32/bf16 values (0/1 weights, fp32 accumulation)."""
    n = arr.shape[0]
    hot = (idx[:, None] == jnp.arange(n, dtype=idx.dtype)[None, :])
    flat = arr.reshape(n, -1)
    if flat.dtype == jnp.bool_:
        out = jax.lax.dot_general(
            hot.astype(jnp.float32), flat.astype(jnp.float32),
            (((1,), (0,)), ((), ())),
        ) > 0.5
    else:
        out = jax.lax.dot_general(
            hot.astype(jnp.float32), flat.astype(jnp.float32),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(arr.dtype)
    return out.reshape((k,) + arr.shape[1:])


def select_memory(
    cfg: SAM2Config,
    bank: MemoryBank,
    frame_idx: jnp.ndarray,
    num_frames: jnp.ndarray,
    reverse: bool = False,
    gather_spatial: bool = True,
):
    """Gather the packed memory sequence for one tracked frame.

    Returns a dict:
      spatial_mem   [O, (Ka+6)*S, Cm]    cond tiles then non-cond tiles
      spatial_tpos  [Ka+6] int32         index into maskmem_tpos_enc
      spatial_valid [Ka+6] bool
      ptrs          [O, P, C]            object pointers (cond + scan)
      ptr_dist      [P] int32            signed frame distance
      ptr_valid     [P] bool
      t_diff_max    scalar int32         tpos normalizer (min(F,16)-1)

    With gather_spatial=False (the bank-indirect attention path), the big
    tile gathers are skipped: instead of `spatial_mem`, the dict carries
    `slots` [Ka+6] int32 — UNIFIED bank rows (cond slot i -> i, non-cond
    slot j -> Kc + j) for the kernel's scalar-prefetch index map.
    """
    lay = memory_layout(cfg, bank.attend_cond_tiles)
    ka = lay.num_cond_tiles
    tpos_sign = -1 if reverse else 1

    # --- cond tiles: pinned first, then closest |dt| ---
    valid = bank.cond_frame_idx >= 0
    dt = jnp.abs(bank.cond_frame_idx - frame_idx)
    score = jnp.where(valid, dt, _FAR)
    score = jnp.where(valid & bank.cond_pinned, -1, score)
    _, cond_slots = jax.lax.top_k(-score, ka)  # smallest score
    cond_valid = valid[cond_slots]
    cond_t = bank.cond_frame_idx[cond_slots]

    cond_obj_valid = _take_rows_dot(
        bank.cond_obj_valid, cond_slots, ka
    )  # [Ka, O]

    # --- non-cond tiles at t_pos 1..num_maskmem-1 ---
    desired = _desired_noncond_indices(cfg, frame_idx, reverse)  # [6]
    nnc = cfg.num_maskmem - 1
    eq = bank.noncond_frame_idx[None, :] == desired[:, None]  # [6, Kn]
    found = eq.any(axis=1) & (desired >= 0)
    nc_slots = jnp.argmax(eq, axis=1)
    nc_obj_valid = _take_rows_dot(
        bank.noncond_obj_valid, nc_slots, nnc
    )  # [6, O]

    spatial = None
    if gather_spatial:
        # Gather forms were A/B'd in-step on chip (hiera-L 1024, Kc=Kn=32):
        # jnp.take (general gather) +1.35 ms; one-hot whole-bank dots +1.68;
        # UNROLLED dynamic slices for the big mem tiles with one-hot dots
        # for the small ptr/validity arrays +1.01 — the big tiles want pure
        # DMA slices, the small arrays want one fused MXU op instead of k
        # slice dispatches.
        cond_mem = _take_rows(bank.cond_mem, cond_slots, ka)  # [Ka, O, S, Cm]
        nc_mem = _take_rows(bank.noncond_mem, nc_slots, nnc)  # [6, O, S, Cm]
        spatial = jnp.concatenate([cond_mem, nc_mem], 0)  # [Ka+6, O, S, Cm]
        o = spatial.shape[1]
        spatial = spatial.transpose(1, 0, 2, 3).reshape(
            o, -1, spatial.shape[-1]
        )

    nm = cfg.num_maskmem
    spatial_tpos = jnp.concatenate(
        [
            jnp.full((ka,), nm - 1, jnp.int32),  # cond: t_pos = 0
            nm - jnp.arange(1, nm, dtype=jnp.int32) - 1,  # t_pos = 1..nm-1
        ]
    )
    # [O, Ka+6]: frame-level validity AND per-object row validity
    spatial_valid = jnp.concatenate(
        [
            (cond_valid[:, None] & cond_obj_valid).T,
            (found[:, None] & nc_obj_valid).T,
        ],
        axis=1,
    )

    # --- object pointers ---
    # cond part: the selected cond frames (past-only filter at eval)
    cond_ptrs = _take_rows_dot(bank.cond_ptr, cond_slots, ka)  # [Ka, O, C]
    if cfg.only_obj_ptrs_in_the_past_for_eval:
        past_ok = (cond_t >= frame_idx) if reverse else (cond_t <= frame_idx)
    else:
        past_ok = jnp.ones_like(cond_valid)
    cond_ptr_valid = (cond_valid & past_ok)[:, None] & cond_obj_valid  # [Ka, O]
    if cfg.use_signed_tpos_enc_to_obj_ptrs:
        cond_ptr_dist = (frame_idx - cond_t) * tpos_sign
    else:
        # sam2.0-style checkpoints: unsigned distances
        # (sam2_base.py:601-606 abs(frame_idx - t))
        cond_ptr_dist = jnp.abs(frame_idx - cond_t)

    # scan part: t_diff = 1 .. max_obj_ptrs-1; a non-cond entry wins, with
    # fallback to an UNSELECTED cond frame at the same index (the reference
    # reads unselected_cond_outputs there, sam2_base.py:~575)
    max_ptrs = jnp.minimum(num_frames, cfg.max_obj_ptrs_in_encoder)
    t_diffs = jnp.arange(1, cfg.max_obj_ptrs_in_encoder, dtype=jnp.int32)
    scan_t = jnp.where(reverse, frame_idx + t_diffs, frame_idx - t_diffs)
    in_range = (scan_t >= 0) & (scan_t < num_frames) & (t_diffs < max_ptrs)
    eqp = bank.noncond_frame_idx[None, :] == scan_t[:, None]
    nc_found = eqp.any(axis=1)
    scan_slots = jnp.argmax(eqp, axis=1)
    np_scan = scan_t.shape[0]
    scan_ptrs = _take_rows_dot(
        bank.noncond_ptr, scan_slots, np_scan
    )  # [15, O, C]
    scan_obj_valid = _take_rows_dot(bank.noncond_obj_valid, scan_slots,
                                    np_scan)

    # selected[k] = slot k was picked as a (valid) cond tile — comparison
    # form, not a scatter (TPU scatters serialize)
    selected = (
        (cond_slots[:, None] == jnp.arange(valid.shape[0])[None, :])
        & cond_valid[:, None]
    ).any(axis=0)
    eqc = (bank.cond_frame_idx[None, :] == scan_t[:, None]) & (
        valid & ~selected
    )[None, :]
    c_found = eqc.any(axis=1)
    c_slots = jnp.argmax(eqc, axis=1)
    c_ptrs = _take_rows_dot(bank.cond_ptr, c_slots, np_scan)
    c_obj_valid = _take_rows_dot(bank.cond_obj_valid, c_slots, np_scan)

    scan_ptrs = jnp.where(nc_found[:, None, None], scan_ptrs, c_ptrs)
    scan_obj_valid = jnp.where(nc_found[:, None], scan_obj_valid, c_obj_valid)
    scan_found = (nc_found | c_found) & in_range

    ptrs = jnp.concatenate([cond_ptrs, scan_ptrs], axis=0).transpose(1, 0, 2)
    ptr_dist = jnp.concatenate([cond_ptr_dist, t_diffs])
    ptr_valid = jnp.concatenate(
        [cond_ptr_valid, scan_found[:, None] & scan_obj_valid], axis=0
    ).T  # [O, P]

    if not cfg.use_obj_ptrs_in_encoder:
        ptr_valid = jnp.zeros_like(ptr_valid)

    out = {
        "spatial_mem": spatial,
        "spatial_tpos": spatial_tpos,
        "spatial_valid": spatial_valid,
        "ptrs": ptrs,
        "ptr_dist": ptr_dist,
        "ptr_valid": ptr_valid,
        "t_diff_max": max_ptrs - 1,
        "layout": lay,
    }
    if not gather_spatial:
        kc = bank.cond_frame_idx.shape[0]
        out["slots"] = jnp.concatenate([cond_slots, kc + nc_slots]).astype(
            jnp.int32
        )
    return out
