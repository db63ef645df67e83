"""Bank-indirect (slot-compacted) memory cross-attention.

The banked path caches each memory-attention layer's projected+roped keys
in the bank at write time (state.MemoryBank.mem_k/mem_v) and reads K/V
blocks straight from bank rows inside the Pallas kernel via a
scalar-prefetched slot list (ops/attention.flash_attention_banked); the
per-frame temporal-position K term is added in-kernel. These tests pin:
  * the kernel against a dense jnp reference (slot indirection, per-tile
    corrections, dead tiles, the unroped staging tile);
  * the whole engine path (prompt -> cond write -> stream steps -> window
    scan) against the regular gather path on identical weights.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from det_sam2_tpu.configs import tiny_test_config
from det_sam2_tpu.ops.attention import flash_attention_banked
from det_sam2_tpu.state import init_bank
from det_sam2_tpu.track import SAM2Engine


def test_banked_kernel_matches_dense():
    rng = np.random.default_rng(0)
    B, Nq, D, Cm, S, Ktot, T, L, layer = 2, 256, 128, 32, 128, 6, 4, 3, 1
    q = jnp.asarray(rng.standard_normal((B, 1, Nq, D)), jnp.float32)
    mem_k = jnp.asarray(rng.standard_normal((Ktot, B, L, S, D)), jnp.float32)
    mem_v = jnp.asarray(rng.standard_normal((Ktot, B, S, Cm)), jnp.float32)
    slots = jnp.asarray([3, 0, 5, 2], jnp.int32)
    w = jnp.asarray(rng.standard_normal((T, D)), jnp.float32)
    w = w.at[-1].set(0.0)  # staging tile: unroped, no correction
    cos = jnp.asarray(rng.standard_normal((S, D // 2)), jnp.float32)
    sin = jnp.asarray(rng.standard_normal((S, D // 2)), jnp.float32)
    valid = rng.random((B, T, S)) > 0.2
    valid[:, 1] = False  # a fully-dead tile (skipped block)
    valid[1] = False  # an object with NO live key (zero rows, not NaN)
    bias = jnp.asarray(
        np.where(valid, 0.0, -1e30).reshape(B, T * S), jnp.float32
    )

    out = flash_attention_banked(
        q, mem_k, mem_v, slots, w, bias, cos, sin, layer,
        block_q=128, block_k=64,
    )

    cosd = jnp.concatenate([cos, cos], -1)
    sind = jnp.concatenate([sin, sin], -1)
    half = D // 2
    wr = jnp.concatenate([-w[:, half:], w[:, :half]], -1)
    ks, vs = [], []
    for t in range(T):
        corr = (cosd * w[t] + sind * wr[t])[None]
        ks.append(mem_k[slots[t], :, layer] + corr)
        vs.append(mem_v[slots[t]])
    k = jnp.concatenate(ks, axis=1)
    v = jnp.concatenate(vs, axis=1)
    s = jnp.einsum("bqd,bkd->bqk", q[:, 0], k) / np.sqrt(D)
    s = s + bias[:, None, :]
    p = jax.nn.softmax(s, axis=-1)
    ref = jnp.einsum("bqk,bkc->bqc", p, v)[:, None]
    ref = jnp.where(
        jnp.any(bias > -1e29, axis=-1)[:, None, None, None], ref, 0.0
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def _run_session(banked: bool):
    cfg = tiny_test_config()
    engine = SAM2Engine(cfg, seed=11)
    nl = cfg.memory_attention.num_layers if banked else 0
    bank = init_bank(cfg, num_objects=2, attend_cond_tiles=1,
                     banked_layers=nl)
    rng = np.random.default_rng(5)
    frames = rng.integers(
        0, 255, (7, cfg.image_size, cfg.image_size, 3), np.uint8
    )
    img0 = jnp.asarray(frames[0:1], jnp.uint8).astype(jnp.float32)
    feats = engine.encode_image(
        (img0 / 255.0 - np.asarray((0.485, 0.456, 0.406), np.float32))
        / np.asarray((0.229, 0.224, 0.225), np.float32)
    )
    boxes = jnp.asarray(
        [[[5.0, 10.0], [40.0, 52.0]], [[60.0, 30.0], [100.0, 90.0]]],
        jnp.float32,
    )
    labels = jnp.asarray([[2, 3], [2, 3]], jnp.int32)
    out = engine.prompt_step(feats, bank, 0, 100, boxes, labels, is_init=True)
    bank = engine.encode_cond_memory(
        feats, bank, 0, out["pred_masks"], out["object_score_logits"],
        out["obj_ptr"], is_mask_from_pts=True,
    )
    results = []
    # two single-frame stream steps
    for t in (1, 2):
        bank, outs = engine.stream_step(
            jnp.asarray(frames[t : t + 1]), bank, np.int32(t), np.int32(100)
        )
        results.append(np.asarray(outs["pred_masks"], np.float32))
        results.append(np.asarray(outs["obj_ptr"], np.float32))
    # then a whole window through the scan path
    bank, (low, ptr, logits) = engine.propagate_window(
        jnp.asarray(frames[3:7]), bank,
        np.arange(3, 7, dtype=np.int32), np.zeros(4, bool), 100,
    )
    results += [np.asarray(low, np.float32), np.asarray(ptr),
                np.asarray(logits)]
    return results


@pytest.mark.slow
def test_banked_engine_matches_regular():
    reg = _run_session(banked=False)
    bkd = _run_session(banked=True)
    for i, (a, b) in enumerate(zip(reg, bkd)):
        np.testing.assert_allclose(b, a, atol=2e-3, err_msg=f"output {i}")


@pytest.mark.slow
def test_banked_batched_streamer_matches_regular(monkeypatch):
    """Multi-video lockstep streamer: banked bank == regular bank,
    including the same-frame prompt-merge restore of cache rows."""
    from det_sam2_tpu.batched import BatchedVideoStreamer

    cfg = tiny_test_config(cond_bank_size=1)
    rng = np.random.default_rng(4)
    frames = rng.integers(
        0, 255, (5, 2, cfg.image_size, cfg.image_size, 3), np.uint8
    )
    outs = {}
    for banked in (False, True):
        monkeypatch.setenv("DET_SAM2_BANKED_ATTN", "1" if banked else "0")
        engine = SAM2Engine(cfg, seed=13)
        s = BatchedVideoStreamer(engine, counts=(1, 1))
        # two sequential add_prompts at the SAME frame -> merge restore path
        s.add_prompts(
            0, 5, frames[0],
            {0: (np.array([[[4.0, 6.0], [40.0, 52.0]]], np.float32),
                 np.array([[2, 3]], np.int32))},
        )
        s.add_prompts(
            0, 5, frames[0],
            {1: (np.array([[[20.0, 12.0], [90.0, 70.0]]], np.float32),
                 np.array([[2, 3]], np.int32))},
        )
        assert (s.bank.mem_k is not None) == banked
        low, ptr, logits, _ = s.propagate_window(
            frames[1:], np.arange(1, 5, dtype=np.int32), num_frames=5
        )
        outs[banked] = (np.asarray(low, np.float32), np.asarray(ptr),
                        np.asarray(logits))
    for a, b in zip(outs[False], outs[True]):
        np.testing.assert_allclose(b, a, atol=2e-3)


@pytest.mark.slow
def test_banked_predictor_roundtrip(tmp_path, monkeypatch):
    """Video predictor with banked attention forced: propagate, save a
    session (caches stripped from the payload), reload as preload (caches
    rebuilt via attach_bank_caches), keep tracking."""
    monkeypatch.setenv("DET_SAM2_BANKED_ATTN", "1")
    from det_sam2_tpu.video_predictor import SAM2VideoPredictor

    # tiny grids have S=64 staging tokens; cap the cond bank so the
    # worst-case obj-ptr count (Ka + 15) * 4 fits one tile
    cfg = tiny_test_config(cond_bank_size=1)
    engine = SAM2Engine(cfg, seed=7)
    assert engine.banked_layers == cfg.memory_attention.num_layers
    vp = SAM2VideoPredictor(engine)
    rng = np.random.default_rng(2)
    frames = rng.integers(
        0, 255, (5, cfg.image_size, cfg.image_size, 3), np.uint8
    )
    session = vp.init_state(frames)
    vp.add_new_points_or_box(
        session, frame_idx=0, obj_id=1,
        box=np.asarray([8, 20, 72, 90], np.float32),
    )
    masks = {t: m for t, _, m in vp.propagate_in_video(session)}
    assert session.bank.mem_k is not None
    assert set(masks) == {0, 1, 2, 3, 4}

    p = tmp_path / "sess.pkl"
    vp.save_session(session, str(p))
    import pickle

    with open(p, "rb") as f:
        payload = pickle.load(f)
    assert payload["bank"].mem_k is None, "caches must not be serialized"

    loaded = vp.load_session_as_preload(str(p), keep_images=False)
    assert loaded.bank.mem_k is not None, "caches rebuilt on load"
    # the rebuilt cache must equal a projection of the stored memories
    rebuilt = engine.attach_bank_caches(
        loaded.bank.replace(mem_k=None, mem_v=None)
    )
    np.testing.assert_allclose(
        np.asarray(loaded.bank.mem_v, np.float32),
        np.asarray(rebuilt.mem_v, np.float32), atol=1e-6,
    )
