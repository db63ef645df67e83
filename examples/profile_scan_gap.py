"""Profile the propagate_window scan vs its parts (hiera-L 1024^2).

Round-3 note: sum-of-parts (~27.8 ms) vs scan (~32.4 ms/frame) leaves
~4.6 ms/frame unaccounted. Suspects: per-frame device fill-holes at 256^2
labels, bank write/select index work, lax.cond framing, uint8 slice +
normalize. This script A/Bs the scan with fill_hole_area on/off and
times stream_step + encode_image for the breakdown.
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

from det_sam2_tpu.configs import sam2_1_hiera_l, sam2_1_hiera_s, with_image_size
from det_sam2_tpu.state import init_bank
from det_sam2_tpu.track import SAM2Engine

NUM_OBJECTS = 2
WINDOW = 60
REPEATS = 3


def setup(cfg):
    engine = SAM2Engine(cfg, dtype=jnp.bfloat16)
    bank = init_bank(cfg, num_objects=NUM_OBJECTS, dtype=jnp.bfloat16,
                     attend_cond_tiles=1)
    rng = np.random.default_rng(0)
    size = cfg.image_size
    img = jnp.asarray(rng.standard_normal((1, size, size, 3)), jnp.float32)
    feats = engine.encode_image(img)
    boxes = jnp.asarray(
        [[[100.0, 120.0], [300.0, 400.0]], [[400.0, 200.0], [700.0, 600.0]]],
        jnp.float32)
    labels = jnp.asarray([[2, 3], [2, 3]], jnp.int32)
    out = engine.prompt_step(feats, bank, 0, 10_000, boxes, labels, is_init=True)
    bank = engine.encode_cond_memory(
        feats, bank, 0, out["pred_masks"], out["object_score_logits"],
        out["obj_ptr"], is_mask_from_pts=True)
    frames = jnp.asarray(
        (rng.standard_normal((WINDOW, size, size, 3)) * 40 + 80).clip(0, 255),
        jnp.uint8)
    frames = jax.device_put(frames)
    float(jnp.sum(frames[0, :2, :2, 0].astype(jnp.float32)))
    return engine, bank, frames


def time_scan(engine, bank, frames):
    fi = np.arange(1, WINDOW + 1, dtype=np.int32)
    skips = np.zeros(WINDOW, bool)
    bank, outs = engine.propagate_window(frames, bank, fi, skips, 10_000)
    float(jnp.sum(outs[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for r in range(REPEATS):
        bank, outs = engine.propagate_window(
            frames, bank, fi + (r + 1) * WINDOW, skips, 10_000)
    float(jnp.sum(outs[0].astype(jnp.float32)))
    return 1000.0 * (time.perf_counter() - t0) / (REPEATS * WINDOW)


def time_encode(engine, frames):
    f = engine.encode_image(frames[:1].astype(jnp.float32))
    float(jnp.sum(f[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        f = engine.encode_image(frames[:1].astype(jnp.float32))
    float(jnp.sum(f[0].astype(jnp.float32)))
    return 1000.0 * (time.perf_counter() - t0) / n


def main():
    for name, cfg_fn, size in (("hiera_l", sam2_1_hiera_l, 1024),
                               ("hiera_s", sam2_1_hiera_s, 768)):
        cfg = with_image_size(cfg_fn(), size)
        engine, bank, frames = setup(cfg)
        ms_scan = time_scan(engine, bank, frames)
        ms_enc = time_encode(engine, frames)
        cfg0 = dataclasses.replace(cfg, fill_hole_area=0)
        engine0, bank0, frames0 = setup(cfg0)
        ms_scan0 = time_scan(engine0, bank0, frames0)
        print(f"{name}@{size}: scan {ms_scan:.2f} ms/f "
              f"(fill=0: {ms_scan0:.2f}, delta {ms_scan - ms_scan0:.2f}); "
              f"encode {ms_enc:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
