"""Benchmark: streaming video-predictor throughput on one chip.

Measures the production propagation path — a whole tracking window run as
one jitted lax.scan (engine.propagate_window: per frame image encode +
memory attention + SAM heads + memory encode + bank write) — at 768^2 with
2 tracked objects, the exact conditions of the baseline: the reference
reports 24 FPS for the 768^2 model with 2 objects on a single A100-class
GPU (sam2/sam2_video_predictor.py:71-72). Emits one JSON line per model:
hiera-S (the fast config) and hiera-L (the BASELINE.md north-star config,
target >= 2x = 48 FPS).

Sync note: timings are forced with a scalar readback (block_until_ready does
not reliably synchronize over remote device tunnels).

Transfer note: the synthetic frames are staged on the device BEFORE the
timed region. On a real TPU host the per-window frame upload is noise
(~106 MB over PCIe/DMA, <1 ms/frame); this harness's device tunnel has
highly variable bandwidth (measured as low as 19 MB/s), which would turn
the benchmark into a tunnel-bandwidth test. The metric is propagation
compute throughput.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax")

import jax
import jax.numpy as jnp
import numpy as np

from det_sam2_tpu.configs import sam2_1_hiera_l, sam2_1_hiera_s, with_image_size
from det_sam2_tpu.state import init_bank
from det_sam2_tpu.track import SAM2Engine

BASELINE_FPS = 24.0  # reference: 768^2 model, 2 objects, offload off
NUM_OBJECTS = 2
WINDOW = 60  # the app's max_frame_num_to_track default (det_sam2_RT.py:41)
REPEATS = 4


def bench_model(cfg) -> float:
    engine = SAM2Engine(cfg, dtype=jnp.bfloat16)
    # one cond frame is written below -> attend bucket 1 (what the video
    # predictor would set for this session)
    bank = init_bank(
        cfg, num_objects=NUM_OBJECTS, dtype=jnp.bfloat16, attend_cond_tiles=1
    )

    rng = np.random.default_rng(0)
    size = cfg.image_size
    img = jnp.asarray(rng.standard_normal((1, size, size, 3)), jnp.float32)

    # prompt frame 0 with two boxes so the memory bank is non-empty
    feats = engine.encode_image(img)
    boxes = jnp.asarray(
        [[[100.0, 120.0], [300.0, 400.0]], [[400.0, 200.0], [700.0, 600.0]]],
        jnp.float32,
    )
    labels = jnp.asarray([[2, 3], [2, 3]], jnp.int32)
    out = engine.prompt_step(feats, bank, 0, 10_000, boxes, labels, is_init=True)
    bank = engine.encode_cond_memory(
        feats, bank, 0, out["pred_masks"], out["object_score_logits"],
        out["obj_ptr"], is_mask_from_pts=True,
    )

    frames = jnp.asarray(
        (rng.standard_normal((WINDOW, size, size, 3)) * 40 + 80).clip(0, 255),
        jnp.uint8,
    )
    frames = jax.device_put(frames)
    float(jnp.sum(frames[0, :2, :2, 0].astype(jnp.float32)))  # force upload
    frame_indices = np.arange(1, WINDOW + 1, dtype=np.int32)
    skips = np.zeros(WINDOW, bool)

    # warmup/compile + forced sync
    bank, outs = engine.propagate_window(
        frames, bank, frame_indices, skips, 10_000
    )
    float(jnp.sum(outs[0].astype(jnp.float32)))

    t0 = time.perf_counter()
    for r in range(REPEATS):
        bank, outs = engine.propagate_window(
            frames, bank, frame_indices + (r + 1) * WINDOW, skips, 10_000
        )
    float(jnp.sum(outs[0].astype(jnp.float32)))
    dt = time.perf_counter() - t0
    return REPEATS * WINDOW / dt


def main():
    for name, cfg_fn in (("hiera_s", sam2_1_hiera_s), ("hiera_l", sam2_1_hiera_l)):
        fps = bench_model(with_image_size(cfg_fn(), 768))
        print(
            json.dumps(
                {
                    "metric": f"propagate_fps_{name}_768_2obj",
                    "value": round(fps, 2),
                    "unit": "frames/sec/chip",
                    "vs_baseline": round(fps / BASELINE_FPS, 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
