"""Scan-gap breakdown, part 2 (hiera-L 1024^2).

profile_scan_gap.py showed (this session): scan 32.56 ms/f, fill-holes
delta 1.63, encode 22.09 -> ~8.8 ms/f of track-side work vs ~6.1 ms of
measured parts (mem-attn 4.5 + heads 1 + mem-enc 0.6). This script times
stream_step (encode+track+write as ONE jit, the same body the scan runs)
to decide whether the missing ~2.7 ms lives in the track components or in
scan framing, and A/Bs the fill chunk size.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax")

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np

from det_sam2_tpu.configs import sam2_1_hiera_l, with_image_size
from det_sam2_tpu.state import init_bank
from det_sam2_tpu.track import SAM2Engine

NUM_OBJECTS = 2
REPS = 30


def setup(cfg):
    engine = SAM2Engine(cfg, dtype=jnp.bfloat16)
    # banked_layers follows the engine default so traces show the
    # PRODUCTION path (bank-indirect kernel on TPU, gather on CPU)
    bank = init_bank(cfg, num_objects=NUM_OBJECTS, dtype=jnp.bfloat16,
                     attend_cond_tiles=1,
                     banked_layers=engine.banked_layers)
    rng = np.random.default_rng(0)
    size = cfg.image_size
    img = jnp.asarray(rng.standard_normal((1, size, size, 3)), jnp.float32)
    feats = engine.encode_image(img)
    boxes = jnp.asarray(
        [[[100.0, 120.0], [300.0, 400.0]], [[400.0, 200.0], [700.0, 600.0]]],
        jnp.float32)
    labels = jnp.asarray([[2, 3], [2, 3]], jnp.int32)
    out = engine.prompt_step(feats, bank, 0, 10_000, boxes, labels,
                             is_init=True)
    bank = engine.encode_cond_memory(
        feats, bank, 0, out["pred_masks"], out["object_score_logits"],
        out["obj_ptr"], is_mask_from_pts=True)
    frame = jnp.asarray(
        (rng.standard_normal((size, size, 3)) * 40 + 80).clip(0, 255),
        jnp.uint8)
    frame = jax.device_put(frame)
    float(jnp.sum(frame[:2, :2, 0].astype(jnp.float32)))
    return engine, bank, frame, feats


def main():
    cfg = with_image_size(sam2_1_hiera_l(), 1024)
    for fill in (0, cfg.fill_hole_area):
        c = dataclasses.replace(cfg, fill_hole_area=fill)
        engine, bank, frame, feats = setup(c)
        bank_t = jax.tree_util.tree_map(jnp.copy, bank)  # both steps donate
        # stream_step: encode + track + bank write, one jit
        bank2, out = engine.stream_step(frame[None], bank, 1, 10_000)
        float(jnp.sum(out["pred_masks"].astype(jnp.float32)))
        t0 = time.perf_counter()
        for i in range(REPS):
            bank2, out = engine.stream_step(frame[None], bank2, 2 + i, 10_000)
        float(jnp.sum(out["pred_masks"].astype(jnp.float32)))
        ms_stream = 1000.0 * (time.perf_counter() - t0) / REPS
        # track_step: track only, precomputed feats
        bank3, out = engine.track_step(feats, bank_t, 1, 10_000)
        float(jnp.sum(out["pred_masks"].astype(jnp.float32)))
        t0 = time.perf_counter()
        for i in range(REPS):
            bank3, out = engine.track_step(feats, bank3, 2 + i, 10_000)
        float(jnp.sum(out["pred_masks"].astype(jnp.float32)))
        ms_track = 1000.0 * (time.perf_counter() - t0) / REPS
        print(f"fill={fill}: stream_step {ms_stream:.2f} ms, "
              f"track_step {ms_track:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
