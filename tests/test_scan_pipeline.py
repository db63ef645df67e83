"""Pipelined-scan equivalence: DET_SAM2_SCAN_PIPELINE=1 restructures the
propagate_window scan (track frame t from carried features while encoding
frame t+1; epilogue tracks the last frame) — its bank and outputs must
match the cond-based scan, including skip steps and window length 1."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from det_sam2_tpu.configs import tiny_test_config
from det_sam2_tpu.state import init_bank
from det_sam2_tpu.track import SAM2Engine


def _frames(n, size, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 80, (size, size, 3), np.uint8)
    out = []
    for t in range(n):
        f = base.copy()
        f[10 + 2 * t : 30 + 2 * t, 5 + 3 * t : 25 + 3 * t] = (220, 40, 40)
        out.append(f)
    return np.stack(out)


def _run_window(engine, cfg, frames, skips, pipelined: bool):
    prev = os.environ.get("DET_SAM2_SCAN_PIPELINE")
    os.environ["DET_SAM2_SCAN_PIPELINE"] = "1" if pipelined else "0"
    try:
        engine._propagate_window_fn.cache_clear()
        bank = init_bank(cfg, num_objects=2, attend_cond_tiles=1)
        img0 = jnp.asarray(frames[0:1], jnp.uint8).astype(jnp.float32)
        feats = engine.encode_image(
            (img0 / 255.0 - np.asarray((0.485, 0.456, 0.406), np.float32))
            / np.asarray((0.229, 0.224, 0.225), np.float32)
        )
        boxes = jnp.asarray(
            [[[5.0, 10.0], [25.0, 30.0]], [[15.0, 12.0], [35.0, 32.0]]],
            jnp.float32,
        )
        labels = jnp.asarray([[2, 3], [2, 3]], jnp.int32)
        out = engine.prompt_step(feats, bank, 0, 100, boxes, labels,
                                 is_init=True)
        bank = engine.encode_cond_memory(
            feats, bank, 0, out["pred_masks"], out["object_score_logits"],
            out["obj_ptr"], is_mask_from_pts=True,
        )
        t = len(skips)
        run_rows = frames[1 : 1 + t][~np.asarray(skips)]
        img_idx = np.zeros(t, np.int32)
        img_idx[~np.asarray(skips)] = np.arange(len(run_rows), dtype=np.int32)
        new_bank, (low, ptr, logits) = engine.propagate_window(
            jnp.asarray(run_rows),
            bank,
            np.arange(1, t + 1, dtype=np.int32),
            np.asarray(skips),
            100,
            img_idx=img_idx,
        )
        return (
            jax.tree_util.tree_map(np.asarray, new_bank),
            np.asarray(low),
            np.asarray(ptr),
            np.asarray(logits),
        )
    finally:
        if prev is None:
            os.environ.pop("DET_SAM2_SCAN_PIPELINE", None)
        else:
            os.environ["DET_SAM2_SCAN_PIPELINE"] = prev
        engine._propagate_window_fn.cache_clear()


def test_pipelined_batched_matches_cond_batched():
    """Batched lockstep window: the pipelined body (all-skip steps become
    masked no-op writes) must match the cond body, including a step where
    EVERY video skips and a per-video partial skip."""
    cfg = tiny_test_config()
    engine = SAM2Engine(cfg)
    frames = _frames(6, cfg.image_size)
    # two videos: same frames, different noise
    rng = np.random.default_rng(9)
    f2 = np.clip(
        frames.astype(np.int16) + rng.integers(-30, 30, frames.shape), 0, 255
    ).astype(np.uint8)
    t = 4
    skips = np.asarray(
        [[False, False],
         [True, True],     # all-skip step
         [False, True],    # partial skip
         [False, False]]
    )
    prev = os.environ.get("DET_SAM2_SCAN_PIPELINE")
    results = {}
    try:
        for mode in ("0", "1"):
            os.environ["DET_SAM2_SCAN_PIPELINE"] = mode
            engine._batched_window_fn.cache_clear()
            bank = init_bank(cfg, num_objects=2, attend_cond_tiles=1)
            imgs0 = jnp.asarray(frames[0:1], jnp.uint8).astype(jnp.float32)
            feats = engine.encode_image(
                (imgs0 / 255.0 - np.asarray((0.485, 0.456, 0.406), np.float32))
                / np.asarray((0.229, 0.224, 0.225), np.float32)
            )
            boxes = jnp.asarray(
                [[[5.0, 10.0], [25.0, 30.0]], [[15.0, 12.0], [35.0, 32.0]]],
                jnp.float32,
            )
            labels = jnp.asarray([[2, 3], [2, 3]], jnp.int32)
            out = engine.prompt_step(feats, bank, 0, 100, boxes, labels,
                                     is_init=True)
            bank = engine.encode_cond_memory(
                feats, bank, 0, out["pred_masks"],
                out["object_score_logits"], out["obj_ptr"],
                is_mask_from_pts=True,
            )
            run_rows = ~skips.all(axis=1)
            window = np.stack(
                [frames[1 : 1 + t], f2[1 : 1 + t]], axis=1
            )[run_rows]  # [N, B, H, W, 3]
            img_idx = np.zeros(t, np.int32)
            img_idx[run_rows] = np.arange(int(run_rows.sum()), dtype=np.int32)
            new_bank, (low, ptr, logits) = engine.propagate_window_batched(
                jnp.asarray(window), bank,
                np.arange(1, t + 1, dtype=np.int32), skips, 100,
                counts=(1, 1), img_idx=img_idx,
            )
            results[mode] = (
                jax.tree_util.tree_map(np.asarray, new_bank),
                np.asarray(low), np.asarray(ptr), np.asarray(logits),
            )
    finally:
        if prev is None:
            os.environ.pop("DET_SAM2_SCAN_PIPELINE", None)
        else:
            os.environ["DET_SAM2_SCAN_PIPELINE"] = prev
        engine._batched_window_fn.cache_clear()

    (bank_a, low_a, ptr_a, log_a) = results["0"]
    (bank_b, low_b, ptr_b, log_b) = results["1"]
    np.testing.assert_allclose(low_b, low_a, atol=2e-3)
    np.testing.assert_allclose(ptr_b, ptr_a, atol=2e-3)
    np.testing.assert_allclose(log_b, log_a, atol=2e-3)
    for leaf_a, leaf_b in zip(
        jax.tree_util.tree_leaves(bank_a), jax.tree_util.tree_leaves(bank_b)
    ):
        np.testing.assert_allclose(
            np.asarray(leaf_b, np.float32), np.asarray(leaf_a, np.float32),
            atol=2e-3,
        )


@pytest.mark.parametrize(
    "skips",
    [
        [False] * 5,
        [True, False, False, True, False],
        [False],
        [True],
    ],
)
def test_pipelined_scan_matches_cond_scan(skips):
    cfg = tiny_test_config()
    engine = SAM2Engine(cfg)
    frames = _frames(1 + len(skips), cfg.image_size)

    bank_a, low_a, ptr_a, log_a = _run_window(engine, cfg, frames, skips,
                                              pipelined=False)
    bank_b, low_b, ptr_b, log_b = _run_window(engine, cfg, frames, skips,
                                              pipelined=True)

    np.testing.assert_allclose(low_b, low_a, atol=2e-3)
    np.testing.assert_allclose(ptr_b, ptr_a, atol=2e-3)
    np.testing.assert_allclose(log_b, log_a, atol=2e-3)
    for leaf_a, leaf_b in zip(
        jax.tree_util.tree_leaves(bank_a), jax.tree_util.tree_leaves(bank_b)
    ):
        np.testing.assert_allclose(
            np.asarray(leaf_b, np.float32),
            np.asarray(leaf_a, np.float32),
            atol=2e-3,
        )
