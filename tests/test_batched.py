"""Batched multi-video streaming: the merged-bank lockstep path must
reproduce independent single-video sessions exactly (same engine, same
weights, per-video banks) — including per-video prompt frames, per-video
skips inside a window, and fill-holes on the stacked outputs."""

import jax.numpy as jnp
import numpy as np
import pytest

from det_sam2_tpu.batched import BatchedVideoStreamer
from det_sam2_tpu.configs import tiny_test_config
from det_sam2_tpu.state import init_bank
from det_sam2_tpu.track import SAM2Engine

CFG = tiny_test_config(fill_hole_area=8)
NUM_FRAMES = 12


def _frames(seed, t):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((t, CFG.image_size, CFG.image_size, 3)) * 40
            + 90).clip(0, 255).astype(np.uint8)


def _box(x0, y0, x1, y1):
    pts = np.asarray([[[x0, y0], [x1, y1]]], np.float32)  # [1, 2, 2]
    labels = np.asarray([[2, 3]], np.int32)
    return pts, labels


@pytest.fixture(scope="module")
def engine():
    return SAM2Engine(CFG, seed=0)


def _single_video_run(engine, frames, prompt_specs, frame_indices,
                      num_objects):
    """Reference path: one video through the existing single-video
    prompt + propagate_window machinery."""
    bank = init_bank(CFG, num_objects=num_objects, attend_cond_tiles=1)
    prompted = set()
    for frame_idx, pts, labels in prompt_specs:
        feats = engine.encode_image(jnp.asarray(frames[frame_idx][None]))
        out = engine.prompt_step(
            feats, bank, frame_idx, NUM_FRAMES,
            jnp.asarray(pts), jnp.asarray(labels), is_init=True,
        )
        live = len({f for f, _, _ in prompt_specs if f in prompted} | {frame_idx})
        from det_sam2_tpu.state import cond_tile_bucket
        b = cond_tile_bucket(CFG, max(live, 1))
        if b != bank.attend_cond_tiles:
            bank = bank.replace(attend_cond_tiles=b)
        bank = engine.encode_cond_memory(
            feats, bank, frame_idx, out["pred_masks"],
            out["object_score_logits"], out["obj_ptr"],
            is_mask_from_pts=True,
        )
        prompted.add(frame_idx)
    skips = np.asarray([int(f) in prompted for f in frame_indices], bool)
    run = ~skips
    img_idx = np.zeros((len(frame_indices),), np.int32)
    img_idx[run] = np.arange(int(run.sum()), dtype=np.int32)
    images = frames[np.asarray(frame_indices)][run]
    bank, (low, ptr, logits) = engine.propagate_window(
        images, bank, frame_indices, skips, NUM_FRAMES, img_idx=img_idx
    )
    return np.asarray(low), np.asarray(ptr), np.asarray(logits)


def test_batched_matches_single_video(engine):
    """Two videos, different content, prompted at DIFFERENT frames (0 and
    2), propagated in lockstep over frames 1..7 — per-video rows of the
    merged run must match the independent single-video runs. Covers:
    batched trunk encode, merged-bank cond tiles at two distinct prompt
    frames, a per-video skip step (frame 2 skips only video 1), and
    stacked fill-holes."""
    frames0 = _frames(1, NUM_FRAMES)
    frames1 = _frames(2, NUM_FRAMES)

    p0 = _box(20.0, 24.0, 90.0, 100.0)
    p1 = _box(40.0, 10.0, 110.0, 80.0)

    streamer = BatchedVideoStreamer(engine, counts=(1, 1))
    streamer.add_prompts(
        0, NUM_FRAMES, np.stack([frames0[0], frames1[0]]), {0: p0}
    )
    streamer.add_prompts(
        2, NUM_FRAMES, np.stack([frames0[2], frames1[2]]), {1: p1}
    )

    frame_indices = np.arange(1, 8, dtype=np.int32)
    window = np.stack(
        [frames0[np.asarray(frame_indices)],
         frames1[np.asarray(frame_indices)]], axis=1
    )  # [T, B, H, W, 3]
    low, ptr, logits, skips = streamer.propagate_window(
        window, frame_indices, NUM_FRAMES
    )
    assert skips[1, 1] and not skips[1, 0]  # frame 2 prompted for video 1
    lows = streamer.split(low)
    ptrs = streamer.split(ptr)
    logs = streamer.split(logits)

    ref0 = _single_video_run(engine, frames0, [(0, *p0)], frame_indices, 1)
    ref1 = _single_video_run(engine, frames1, [(2, *p1)], frame_indices, 1)

    for v, ref in ((0, ref0), (1, ref1)):
        rlow, rptr, rlog = ref
        # skipped steps: both paths emit zero rows for that video
        np.testing.assert_allclose(
            np.asarray(lows[v], np.float32), rlow.astype(np.float32),
            atol=2e-2, rtol=0,
        )
        np.testing.assert_allclose(
            np.asarray(ptrs[v]), rptr, atol=1e-3, rtol=0
        )
        np.testing.assert_allclose(
            np.asarray(logs[v]), rlog, atol=1e-3, rtol=0
        )
        # the decisions the predictor actually consumes: identical masks
        assert (
            (np.asarray(lows[v], np.float32) > 0)
            == (rlow.astype(np.float32) > 0)
        ).mean() > 0.999


def test_batched_validation_errors(engine):
    streamer = BatchedVideoStreamer(engine, counts=(1, 1))
    with pytest.raises(ValueError):
        streamer.add_prompts(
            0, NUM_FRAMES, np.zeros((2, CFG.image_size, CFG.image_size, 3),
                                    np.uint8),
            {5: _box(0, 0, 10, 10)},
        )
    with pytest.raises(ValueError):
        # wrong row count for video 0 (2 prompt rows, 1 object)
        pts = np.zeros((2, 2, 2), np.float32)
        labels = np.zeros((2, 2), np.int32)
        streamer.add_prompts(
            0, NUM_FRAMES, np.zeros((2, CFG.image_size, CFG.image_size, 3),
                                    np.uint8),
            {0: (pts, labels)},
        )
    with pytest.raises(ValueError):
        streamer.propagate_window(
            np.zeros((3, 1, CFG.image_size, CFG.image_size, 3), np.uint8),
            np.arange(3), NUM_FRAMES,
        )


def test_same_frame_sequential_prompts_merge(engine):
    """Two add_prompts calls at the SAME frame for different video subsets
    must merge into the existing cond slot, not clobber it: the second
    call's slot-matched write_cond would otherwise wipe the first call's
    rows (zero-mask encodings, obj_valid False) and silently break that
    video's tracking. Both videos must match their independent runs."""
    frames0 = _frames(5, NUM_FRAMES)
    frames1 = _frames(6, NUM_FRAMES)
    p0 = _box(20.0, 24.0, 90.0, 100.0)
    p1 = _box(40.0, 10.0, 110.0, 80.0)

    streamer = BatchedVideoStreamer(engine, counts=(1, 1))
    shared = np.stack([frames0[0], frames1[0]])
    streamer.add_prompts(0, NUM_FRAMES, shared, {0: p0})
    streamer.add_prompts(0, NUM_FRAMES, shared, {1: p1})

    # the frame-0 cond slot must now carry BOTH videos' rows as valid
    slot = int(np.where(np.asarray(streamer.bank.cond_frame_idx) == 0)[0][0])
    assert np.asarray(streamer.bank.cond_obj_valid)[slot].all()

    frame_indices = np.arange(1, 6, dtype=np.int32)
    window = np.stack(
        [frames0[np.asarray(frame_indices)],
         frames1[np.asarray(frame_indices)]], axis=1
    )
    low, ptr, logits, skips = streamer.propagate_window(
        window, frame_indices, NUM_FRAMES
    )
    lows = streamer.split(low)
    ref0 = _single_video_run(engine, frames0, [(0, *p0)], frame_indices, 1)
    ref1 = _single_video_run(engine, frames1, [(0, *p1)], frame_indices, 1)
    for v, (rlow, _, _) in ((0, ref0), (1, ref1)):
        assert (
            (np.asarray(lows[v], np.float32) > 0) == (rlow > 0)
        ).mean() > 0.999


def test_empty_and_overflowing_prompts_raise(engine):
    streamer = BatchedVideoStreamer(engine, counts=(1, 1))
    frames = np.zeros((2, CFG.image_size, CFG.image_size, 3), np.uint8)
    with pytest.raises(ValueError, match="empty prompts"):
        streamer.add_prompts(0, NUM_FRAMES, frames, {})
    # union of live prompt frames beyond min(cond_attn_size,
    # cond_bank_size) would silently drop a video's only cond frame from
    # the attended/stored tile set — must refuse upfront (no compute).
    cap = min(CFG.cond_attn_size, CFG.cond_bank_size)
    streamer.prompt_frames = [set(range(cap - 1)), {cap - 1}]
    with pytest.raises(ValueError, match="split the videos"):
        streamer.add_prompts(
            cap, NUM_FRAMES, frames, {0: _box(0.0, 0.0, 10.0, 10.0)}
        )


def test_window_skip_capacity_guard(engine):
    """propagate_window_batched must refuse a window whose per-video skip
    count can make merged-bank eviction diverge from the single-video
    session (noncond_bank_size < read span + skips)."""
    streamer = BatchedVideoStreamer(engine, counts=(1, 1))
    span = (CFG.num_maskmem - 1) * max(1, CFG.memory_temporal_stride_for_eval)
    n_skip = CFG.noncond_bank_size - span + 1
    assert n_skip >= 1
    t = n_skip + 2
    streamer.prompt_frames = [set(range(n_skip)), set()]
    window = np.zeros((t, 2, CFG.image_size, CFG.image_size, 3), np.uint8)
    with pytest.raises(ValueError, match="single-session-exact"):
        streamer.propagate_window(
            window, np.arange(t, dtype=np.int32), NUM_FRAMES
        )


def test_all_skip_step_uploads_nothing(engine):
    """A step where every video is prompted takes the cond skip: zero
    output rows for all videos and no image consumed for that step."""
    frames0 = _frames(3, NUM_FRAMES)
    frames1 = _frames(4, NUM_FRAMES)
    p0 = _box(20.0, 24.0, 90.0, 100.0)
    p1 = _box(40.0, 10.0, 110.0, 80.0)
    streamer = BatchedVideoStreamer(engine, counts=(1, 1))
    streamer.add_prompts(
        3, NUM_FRAMES, np.stack([frames0[3], frames1[3]]), {0: p0, 1: p1}
    )
    frame_indices = np.arange(2, 6, dtype=np.int32)  # includes frame 3
    window = np.stack(
        [frames0[np.asarray(frame_indices)],
         frames1[np.asarray(frame_indices)]], axis=1
    )
    low, ptr, logits, skips = streamer.propagate_window(
        window, frame_indices, NUM_FRAMES
    )
    assert skips[1].all()
    assert not np.asarray(low)[1].any()
    assert not np.asarray(ptr)[1].any()
