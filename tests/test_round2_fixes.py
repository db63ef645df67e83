"""Round-2 regression tests: object-slot holes after remove_object,
direction-aware bank eviction, obj-ptr fallback to unselected cond frames,
and cond-bank behavior beyond the old 8-slot default."""

import numpy as np
import pytest

import jax.numpy as jnp

from det_sam2_tpu.configs import tiny_test_config
from det_sam2_tpu.state import (
    init_bank,
    select_memory,
    write_cond,
    write_noncond,
)
from det_sam2_tpu.track import SAM2Engine
from det_sam2_tpu.video_predictor import SAM2VideoPredictor


def _frames(n, h=96, w=112, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 80, (h, w, 3), np.uint8)
    out = []
    for t in range(n):
        f = base.copy()
        f[20 + 3 * t : 50 + 3 * t, 10 + 6 * t : 40 + 6 * t] = (220, 40, 40)
        f[60:85, 60 + 4 * t : 82 + 4 * t] = (40, 220, 60)
        out.append(f)
    return out


def test_eviction_keeps_frames_near_write_position():
    """Reverse tracking writes descending frame indices; once the non-cond
    ring fills, the evicted slot must be the temporally FURTHEST frame, not
    the numerically smallest (which is the most recently written one)."""
    cfg = tiny_test_config()
    kn = cfg.noncond_bank_size
    s = cfg.image_embedding_size ** 2
    bank = init_bank(cfg, num_objects=1)
    mem = jnp.zeros((1, s, cfg.mem_dim))
    ptr = jnp.zeros((1, cfg.hidden_dim))
    # reverse propagation from frame 100: write 100, 99, ..., 100-kn
    for f in range(100, 100 - kn - 1, -1):
        bank = write_noncond(bank, jnp.int32(f), mem, ptr)
    present = set(np.asarray(bank.noncond_frame_idx).tolist())
    want = set(range(100 - kn, 100))  # the kn most recently written
    assert present == want, f"evicted wrong frame: {sorted(present)}"


def test_obj_ptr_falls_back_to_unselected_cond_frame():
    """The t_diff scan must pick up pointers from cond frames that were not
    among the selected cond slots (reference sam2_base.py ~575)."""
    cfg = tiny_test_config(cond_attn_size=2)
    s = cfg.image_embedding_size ** 2
    bank = init_bank(cfg, num_objects=1)
    mem = jnp.zeros((1, s, cfg.mem_dim))

    def ptr_of(v):
        return jnp.full((1, cfg.hidden_dim), float(v))

    for f in (0, 3, 4):
        bank = write_cond(bank, jnp.int32(f), mem, ptr_of(f + 1))

    sel = select_memory(cfg, bank, jnp.int32(5), jnp.int32(6))
    ka = sel["layout"].num_cond_tiles
    assert ka == 2
    # selected cond = frames 4, 3 (closest); frame 0 is unselected, at
    # t_diff=5 -> scan row index 4
    ptr_valid = np.asarray(sel["ptr_valid"])[0]
    ptrs = np.asarray(sel["ptrs"])[0]
    scan_row = ka + 4
    assert ptr_valid[scan_row], "unselected cond ptr not picked up by scan"
    np.testing.assert_allclose(ptrs[scan_row], 1.0)
    # and the scan must NOT duplicate already-selected cond frames
    assert not ptr_valid[ka + 0], "t_diff=1 duplicates selected cond frame 4"
    # cond part carries the selected frames' pointers
    np.testing.assert_allclose(sorted(ptrs[:ka, 0].tolist()), [4.0, 5.0])


@pytest.mark.slow
def test_remove_object_then_add_new_object():
    """remove_object must not corrupt slot bookkeeping: a later object
    reuses the freed slot, live objects keep tracking, and the freed slot's
    bank rows are blanked."""
    cfg = tiny_test_config()
    engine = SAM2Engine(cfg)
    vp = SAM2VideoPredictor(engine)
    frames = _frames(5)

    session = vp.init_state(frames)
    vp.add_new_points_or_box(session, 0, obj_id=11, box=np.array([8.0, 18.0, 44.0, 52.0]))
    vp.add_new_points_or_box(session, 0, obj_id=22, box=np.array([58.0, 58.0, 84.0, 87.0]))
    for _ in vp.propagate_in_video(session, 0, max_frame_num_to_track=2):
        pass

    vp.remove_object(session, 11)
    assert session.obj_ids == [22]
    assert session.obj_id_to_idx[22] == 1  # non-last removal leaves a hole
    assert not np.asarray(session.bank.cond_obj_valid)[:, 0].any()
    assert not np.asarray(session.bank.noncond_obj_valid)[:, 0].any()

    # new object must take the freed slot 0, not collide with slot 1
    vp.add_new_points_or_box(session, 2, obj_id=33, box=np.array([8.0 + 12, 18.0 + 6, 44.0 + 12, 52.0 + 6]))
    assert session.obj_id_to_idx[33] == 0
    assert session.obj_idx_to_id == {0: 33, 1: 22}

    outs = {}
    for fidx, obj_ids, masks in vp.propagate_in_video(
        session, 2, max_frame_num_to_track=3, reverse=True
    ):
        outs[fidx] = (list(obj_ids), masks)
    assert set(outs) == {0, 1, 2}
    for fidx, (obj_ids, masks) in outs.items():
        assert obj_ids == [22, 33]
        assert masks.shape[0] >= 2
    # the tracked-frame store marks exactly the live slots valid
    for fidx, out in session.noncond_outputs.items():
        assert out["valid"][0] and out["valid"][1]
    # re-adding after tracking started re-consolidated cond frames, so the
    # reused slot 0 has live bank rows again
    assert np.asarray(session.bank.cond_obj_valid)[:, 0].any()
    # re-consolidation after the re-add must not skip live slot 1 (the old
    # range(num_objects) loop stopped at num_objects=1 and marked obj 22
    # invalid on cond frame 0)
    assert session.cond_outputs[0]["valid"][1]


@pytest.mark.slow
def test_many_cond_frames_beyond_old_default():
    """10 prompted (cond) frames must all be retained and attended (the old
    cond_bank_size=8 default silently evicted them)."""
    cfg = tiny_test_config(cond_bank_size=16)
    engine = SAM2Engine(cfg)
    vp = SAM2VideoPredictor(engine)
    frames = _frames(12)

    session = vp.init_state(frames)
    for t in range(10):
        vp.add_new_points_or_box(
            session, t, obj_id=1,
            box=np.array([10.0 + 6 * t, 20.0 + 3 * t, 40.0 + 6 * t, 50.0 + 3 * t]),
        )
    outs = {}
    for fidx, _, masks in vp.propagate_in_video(session, 0):
        outs[fidx] = masks
    # every prompted frame is a retained cond frame in the bank
    live = set(np.asarray(session.bank.cond_frame_idx).tolist()) - {-1}
    assert live == set(range(10)), f"cond frames evicted: {sorted(live)}"
    # tracking continues onto unprompted frames with finite outputs
    for fidx in (10, 11):
        assert np.isfinite(outs[fidx]).all()


@pytest.mark.slow
def test_fast_path_uploads_only_run_frames():
    """Skipped (prompted/consolidated) frames must not upload image bytes:
    the fast path passes a compact image stack + per-step index map."""
    cfg = tiny_test_config()
    engine = SAM2Engine(cfg)
    vp = SAM2VideoPredictor(engine)
    frames = _frames(10)
    session = vp.init_state(frames)
    vp.add_new_points_or_box(session, 0, 1, box=np.array([8.0, 18.0, 44.0, 52.0]))

    seen = {}
    orig = engine.propagate_window

    def spy(images, *a, **kw):
        seen["n_images"] = np.asarray(images).shape[0]
        seen["img_idx"] = np.asarray(kw.get("img_idx"))
        return orig(images, *a, **kw)

    engine.propagate_window = spy
    try:
        outs = dict()
        for fidx, _, masks in vp.propagate_in_video(session, 0):
            outs[fidx] = masks
    finally:
        engine.propagate_window = orig

    # frame 0 is a cond (skip) frame: 9 run frames for a 10-frame window
    assert seen["n_images"] == 9
    assert seen["img_idx"].shape == (10,)
    assert len(outs) == 10 and all(np.isfinite(m).all() for m in outs.values())
