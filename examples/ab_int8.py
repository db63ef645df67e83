"""On-chip A/B of the int8 W8A8 trunk serving mode (VERDICT r3 #3).

    python examples/ab_int8.py hiera_s 768
    python examples/ab_int8.py hiera_l 1024 --int8

Measures the same whole-window scan as bench.py (per CLAUDE.md, only
whole-pipeline timings are trustworthy here) with the engine built through
build_sam2_engine so the int8 path is exactly the serving --int8 flag's.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model", choices=["hiera_s", "hiera_l"])
    ap.add_argument("size", type=int)
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--window", type=int, default=60)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    from det_sam2_tpu.build import build_sam2_engine
    from det_sam2_tpu.state import init_bank

    engine = build_sam2_engine(
        args.model, dtype=jnp.bfloat16, quantize_int8=args.int8,
        image_size=args.size,
    )
    cfg = engine.cfg
    # banked_layers follows the engine default so the A/B measures the
    # PRODUCTION path (bank-indirect kernel on TPU) on both sides
    bank = init_bank(cfg, num_objects=2, dtype=jnp.bfloat16,
                     attend_cond_tiles=1,
                     banked_layers=engine.banked_layers)

    rng = np.random.default_rng(0)
    size = cfg.image_size
    img = jnp.asarray(rng.standard_normal((1, size, size, 3)), jnp.float32)
    feats = engine.encode_image(img)
    boxes = jnp.asarray(
        [[[100.0, 120.0], [300.0, 400.0]], [[400.0, 200.0], [700.0, 600.0]]],
        jnp.float32,
    )
    labels = jnp.asarray([[2, 3], [2, 3]], jnp.int32)
    out = engine.prompt_step(feats, bank, 0, 10_000, boxes, labels,
                             is_init=True)
    bank = engine.encode_cond_memory(
        feats, bank, 0, out["pred_masks"], out["object_score_logits"],
        out["obj_ptr"], is_mask_from_pts=True,
    )

    window = args.window
    frames = jnp.asarray(
        (rng.standard_normal((window, size, size, 3)) * 40 + 80).clip(0, 255),
        jnp.uint8,
    )
    frames = jax.device_put(frames)
    float(jnp.sum(frames[0, :2, :2, 0].astype(jnp.float32)))
    frame_indices = np.arange(1, window + 1, dtype=np.int32)
    skips = np.zeros(window, bool)

    bank, outs = engine.propagate_window(
        frames, bank, frame_indices, skips, 10_000
    )
    float(jnp.sum(outs[0].astype(jnp.float32)))

    t0 = time.perf_counter()
    for r in range(args.reps):
        bank, outs = engine.propagate_window(
            frames, bank, frame_indices + (r + 1) * window, skips, 10_000
        )
    float(jnp.sum(outs[0].astype(jnp.float32)))
    fps = args.reps * window / (time.perf_counter() - t0)
    print(json.dumps({
        "model": args.model, "size": args.size,
        "int8": bool(args.int8), "fps": round(fps, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
