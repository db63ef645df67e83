"""Benchmark: streaming video-predictor throughput on one chip.

Measures the fused per-frame step (image encode + memory attention + SAM
heads + memory encode + bank write) for hiera-S at 768^2 with 2 tracked
objects — the hot loop of the Det-SAM2 pipeline (SURVEY.md section 3.1) at
the exact conditions of the baseline: the reference reports 24 FPS for the
768^2 model with 2 objects on a single A100-class GPU
(sam2/sam2_video_predictor.py:71-72).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax")

import jax
import jax.numpy as jnp
import numpy as np

from det_sam2_tpu.configs import sam2_1_hiera_s, with_image_size
from det_sam2_tpu.state import init_bank
from det_sam2_tpu.track import SAM2Engine

BASELINE_FPS = 24.0  # reference: 768^2 model, 2 objects, offload off
NUM_OBJECTS = 2
WARMUP = 3
ITERS = 20


def main():
    cfg = with_image_size(sam2_1_hiera_s(), 768)
    engine = SAM2Engine(cfg, dtype=jnp.bfloat16)
    bank = init_bank(cfg, num_objects=NUM_OBJECTS, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    img = jnp.asarray(
        rng.standard_normal((1, cfg.image_size, cfg.image_size, 3)), jnp.float32
    )

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

    # warmup / compile; the final jnp.sum forces the whole dispatch chain
    # (block_until_ready alone does not reliably synchronize over remote
    # device tunnels)
    t = 1
    for _ in range(WARMUP):
        bank, out = engine.stream_step(img, bank, t, 10_000)
        t += 1
    float(jnp.sum(out["pred_masks"]))

    t0 = time.perf_counter()
    for _ in range(ITERS):
        bank, out = engine.stream_step(img, bank, t, 10_000)
        t += 1
    float(jnp.sum(out["pred_masks"]))
    dt = time.perf_counter() - t0

    fps = ITERS / dt
    print(
        json.dumps(
            {
                "metric": "stream_fps_hiera_s_768_2obj",
                "value": round(fps, 2),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
