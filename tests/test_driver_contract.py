"""Driver contracts: bench.py imports; entry() constructs; engine glue."""

import numpy as np
import pytest

import jax.numpy as jnp

from det_sam2_tpu.configs import tiny_test_config
from det_sam2_tpu.state import init_bank
from det_sam2_tpu.track import SAM2Engine


def test_bench_module_imports():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert callable(mod.main)
    assert mod.BASELINE_FPS == 24.0


@pytest.mark.slow
def test_graft_entry_constructs():
    import sys
    import os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __graft_entry__ as g

    fn, args = g.entry()
    assert callable(fn)
    params, img, bank, frame_idx, num_frames, obj_valid = args
    assert img.shape[-1] == 3
    assert bank.num_objects == 2
    # the contract must attest the PRODUCTION path: banked-attention
    # caches present, so the trace goes through the bank-indirect kernel
    # (the TPU default behind every BENCH number), not the dense gather
    assert bank.mem_k is not None and bank.mem_v is not None
    # the driver compile-checks fn(*args); tracing must succeed with the
    # example args EXACTLY as given (round-3 regression: a new body arg
    # not threaded through entry() broke the call signature)
    import jax

    out = jax.eval_shape(fn, *args)
    assert out is not None


@pytest.mark.slow
def test_dryrun_multichip():
    """The driver's multi-chip check must pass self-contained, even when
    the environment forces a real-TPU plugin (round-1 red check)."""
    import sys
    import os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __graft_entry__ as g

    g.dryrun_multichip(8)


@pytest.mark.slow
def test_stream_step_matches_encode_plus_track():
    """The fused stream_step must equal encode_image followed by
    track_step (same bank evolution, same outputs)."""
    cfg = tiny_test_config()
    engine = SAM2Engine(cfg)
    rng = np.random.default_rng(0)
    s = cfg.image_size
    frame_u8 = rng.integers(0, 255, (1, s, s, 3)).astype(np.uint8)
    img = jnp.asarray(frame_u8)

    def prompt(bank):
        feats = engine.encode_image(img)
        boxes = jnp.asarray([[[10.0, 10.0], [60.0, 70.0]]], jnp.float32)
        labels = jnp.asarray([[2, 3]], jnp.int32)
        out = engine.prompt_step(feats, bank, 0, 5, boxes, labels,
                                 is_init=True)
        return engine.encode_cond_memory(
            feats, bank, 0, out["pred_masks"], out["object_score_logits"],
            out["obj_ptr"],
        )

    bank_a = prompt(init_bank(cfg, num_objects=1))
    bank_b = prompt(init_bank(cfg, num_objects=1))

    bank_a, out_a = engine.stream_step(img, bank_a, 1, 5)
    feats = engine.encode_image(img)
    bank_b, out_b = engine.track_step(feats, bank_b, 1, 5)

    np.testing.assert_allclose(
        np.asarray(out_a["pred_masks"]), np.asarray(out_b["pred_masks"]),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(bank_a.noncond_mem), np.asarray(bank_b.noncond_mem),
        rtol=1e-5, atol=1e-5,
    )


@pytest.mark.slow
def test_propagate_window_fill_holes_matches_stream_steps():
    """The scan path's batched POST-scan fill-holes must produce the same
    outputs as per-frame stream_step + per-frame fill (fill_hole_area > 0;
    round-3 change: fill moved out of the scan carry onto the stacked
    [T, O, ...] outputs, chunked lax.map)."""
    import dataclasses

    from det_sam2_tpu.track import _maybe_fill_holes

    cfg = dataclasses.replace(tiny_test_config(), fill_hole_area=4)
    engine = SAM2Engine(cfg)
    rng = np.random.default_rng(3)
    s = cfg.image_size
    t = 5
    frames = rng.integers(0, 255, (t, s, s, 3)).astype(np.uint8)

    def prompt(bank):
        feats = engine.encode_image(jnp.asarray(frames[:1]))
        boxes = jnp.asarray([[[10.0, 10.0], [60.0, 70.0]]], jnp.float32)
        labels = jnp.asarray([[2, 3]], jnp.int32)
        out = engine.prompt_step(feats, bank, 0, t + 1, boxes, labels,
                                 is_init=True)
        return engine.encode_cond_memory(
            feats, bank, 0, out["pred_masks"], out["object_score_logits"],
            out["obj_ptr"],
        )

    bank_a = prompt(init_bank(cfg, num_objects=1))
    bank_b = prompt(init_bank(cfg, num_objects=1))

    fi = np.arange(1, t + 1, dtype=np.int32)
    bank_a, (low_a, _, _) = engine.propagate_window(
        frames[1:].repeat(1, axis=0) if False else frames[:t],
        bank_a, fi, np.zeros(t, bool), t + 1,
    )

    per_frame = []
    for k in range(t):
        bank_b, out_b = engine.stream_step(
            jnp.asarray(frames[k : k + 1]), bank_b, int(fi[k]), t + 1
        )
        per_frame.append(np.asarray(out_b["pred_masks"], np.float32))
    ref = np.stack(per_frame)

    # stream_step fills per frame in fp32; the scan path fills the fp16-
    # rounded logits — identical hole decisions away from the 0-crossing
    got = np.asarray(low_a, np.float32)
    assert np.abs(got - ref).max() < 2e-2, np.abs(got - ref).max()
    # the filled value (0.1) must appear identically: compare hole sets
    assert ((got == 0.1) == (ref == 0.1)).mean() > 0.999
    np.testing.assert_allclose(
        np.asarray(bank_a.noncond_mem, np.float32),
        np.asarray(bank_b.noncond_mem, np.float32),
        rtol=1e-4, atol=1e-4,
    )
