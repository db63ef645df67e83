"""Round-3 review-fix regressions: tracked-frame compaction, demotion
obj_valid carry, all-pinned eviction, unsigned obj-ptr distances."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from det_sam2_tpu import state as bank_ops
from det_sam2_tpu.configs import tiny_test_config
from det_sam2_tpu.state import (
    demote_cond_frame,
    init_bank,
    select_memory,
    write_cond,
)
from det_sam2_tpu.video_predictor import InferenceSession


def test_tracked_compaction_preserves_classification():
    """Releasing old frames must not reclassify them as un-tracked (the
    reference keeps frames_tracked forever); compaction keeps that at
    O(1) memory via merged ranges."""
    cfg = tiny_test_config()
    s = InferenceSession(cfg, 64, 64)
    for t in range(10):
        s.frames_already_tracked[t] = {"reverse": False}
    for t in range(10, 14):
        s.frames_already_tracked[t] = {"reverse": True}
    s.compact_tracked(11)
    # live dict holds only the retained tail
    assert sorted(s.frames_already_tracked) == [12, 13]
    # two direction-homogeneous ranges
    assert [r[:3] for r in s.tracked_ranges] == [(0, 9, False), (10, 11, True)]
    # classification (incl. the reverse flag) survives the release
    assert s.tracked_info(3) == {"reverse": False}
    assert s.tracked_info(11) == {"reverse": True}
    assert s.tracked_info(12) == {"reverse": True}
    assert s.tracked_info(14) is None
    # compacting again merges instead of duplicating
    s.frames_already_tracked[14] = {"reverse": True}
    s.compact_tracked(14)
    assert [r[:3] for r in s.tracked_ranges] == [(0, 9, False), (10, 14, True)]


def test_demote_carries_obj_valid():
    """demote_cond_frame must carry the cond slot's per-object validity
    into the non-cond row — defaulting to all-valid would resurrect a
    removed object's stale memory."""
    cfg = tiny_test_config()
    bank = init_bank(cfg, num_objects=2)
    mem = jnp.ones(bank.cond_mem.shape[1:])
    ptr = jnp.ones(bank.cond_ptr.shape[1:])
    ov = jnp.asarray([True, False])
    bank = write_cond(bank, jnp.int32(5), mem, ptr, obj_valid=ov)
    bank = demote_cond_frame(bank, jnp.int32(5))
    nc = np.asarray(bank.noncond_frame_idx)
    slot = int(np.argmax(nc == 5))
    assert nc[slot] == 5
    np.testing.assert_array_equal(
        np.asarray(bank.noncond_obj_valid[slot]), [True, False]
    )
    assert not np.any(np.asarray(bank.cond_frame_idx) == 5)


def test_all_pinned_eviction_prefers_furthest():
    """With every cond slot pinned (preload bank at capacity), a new
    write evicts the temporally FURTHEST pinned slot, not slot 0."""
    cfg = tiny_test_config()  # cond_bank_size=4
    bank = init_bank(cfg, num_objects=1)
    mem = jnp.ones(bank.cond_mem.shape[1:])
    ptr = jnp.ones(bank.cond_ptr.shape[1:])
    for f in (30, 0, 20, 10):  # furthest-from-31 (frame 0) lands slot 1
        bank = write_cond(bank, jnp.int32(f), mem, ptr, pinned=True)
    assert np.asarray(bank.cond_pinned).all()
    bank = write_cond(bank, jnp.int32(31), mem, ptr)
    idx = set(np.asarray(bank.cond_frame_idx).tolist())
    assert idx == {31, 30, 20, 10}, idx  # frame 0 (furthest) was evicted
    # while an unpinned slot exists, pinned slots stay shielded
    bank2 = init_bank(cfg, num_objects=1)
    bank2 = write_cond(bank2, jnp.int32(0), mem, ptr, pinned=True)
    for f in (10, 20, 30):
        bank2 = write_cond(bank2, jnp.int32(f), mem, ptr)
    bank2 = write_cond(bank2, jnp.int32(31), mem, ptr)
    assert 0 in np.asarray(bank2.cond_frame_idx).tolist()


def test_unsigned_obj_ptr_distance_flag():
    """use_signed_tpos_enc_to_obj_ptrs=False -> abs distances for cond
    pointers (sam2_base.py:601-606), matching the training path's gate."""
    base = tiny_test_config()
    for signed in (True, False):
        cfg = dataclasses.replace(
            base,
            use_signed_tpos_enc_to_obj_ptrs=signed,
            only_obj_ptrs_in_the_past_for_eval=False,
        )
        bank = init_bank(cfg, num_objects=1, attend_cond_tiles=1)
        mem = jnp.ones(bank.cond_mem.shape[1:])
        ptr = jnp.ones(bank.cond_ptr.shape[1:])
        bank = write_cond(bank, jnp.int32(8), mem, ptr)  # future cond
        sel = select_memory(
            cfg, bank, frame_idx=jnp.int32(3), num_frames=jnp.int32(20),
            reverse=False,
        )
        ka = bank_ops.cond_tile_bucket(cfg, 1)
        cond_dist = np.asarray(sel["ptr_dist"])[:ka]
        # the selected cond frame (8) sits 5 frames in the future of 3
        if signed:
            assert (cond_dist == -5).any(), cond_dist
        else:
            assert (cond_dist == 5).any(), cond_dist
            assert (cond_dist >= 0).all(), cond_dist
