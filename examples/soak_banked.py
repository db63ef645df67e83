"""On-chip HBM-flatness soak for BANKED attention at the worst-case
configuration: hiera-L @1024^2, 8 objects, bank-indirect caches live.

The banked caches add mem_k [Kc+Kn+1, O, L, S, Dk] + mem_v [Kc+Kn+1, O,
S, Cm] to the device bank — the largest static allocations in the whole
framework (printed exactly below). They are static-shape by construction
(ring-buffer slot writes, no growth), so HBM must stay bit-flat over an
unbounded stream; this drives thousands of frames through the production
scan path (engine.propagate_window) and asserts it.

Matches the reference claim of constant-memory unbounded video
(det_sam2_RT.py:39-42) at the hardware level, in the banked mode that
round 4 made the TPU production default.

Usage: python examples/soak_banked.py [frames] [--model hiera_l]
       [--size 1024] [--objects 8]
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

from det_sam2_tpu.configs import sam2_1_hiera_l, sam2_1_hiera_s, with_image_size
from det_sam2_tpu.state import init_bank
from det_sam2_tpu.track import SAM2Engine

WINDOW = 60  # the app's max_frame_num_to_track default


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("frames", nargs="?", type=int, default=2400)
    ap.add_argument("--model", default="hiera_l",
                    choices=["hiera_s", "hiera_l"])
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--objects", type=int, default=8)
    args = ap.parse_args()
    if args.frames < 3 * WINDOW:
        ap.error(
            f"frames must be >= {3 * WINDOW}: flatness is judged on the "
            f"samples AFTER the first window (one sample per {WINDOW} "
            "frames, >=2 required)"
        )

    cfg_fn = {"hiera_s": sam2_1_hiera_s, "hiera_l": sam2_1_hiera_l}[args.model]
    cfg = with_image_size(cfg_fn(), args.size)
    engine = SAM2Engine(cfg, dtype=jnp.bfloat16)
    nl = engine.banked_layers
    assert nl > 0, "banked attention must be the default on this backend"
    bank = init_bank(
        cfg, num_objects=args.objects, dtype=jnp.bfloat16,
        attend_cond_tiles=1, banked_layers=nl,
    )
    cache_gib = (bank.mem_k.nbytes + bank.mem_v.nbytes) / 2**30
    print(
        f"# banked caches: mem_k {bank.mem_k.shape} "
        f"({bank.mem_k.nbytes / 2**30:.3f} GiB) + mem_v {bank.mem_v.shape} "
        f"({bank.mem_v.nbytes / 2**30:.3f} GiB) = {cache_gib:.3f} GiB "
        f"static", flush=True,
    )

    rng = np.random.default_rng(0)
    s = cfg.image_size
    img = jnp.asarray(rng.standard_normal((1, s, s, 3)), jnp.float32)
    feats = engine.encode_image(img)
    # prompt grid mirrors bench.py bench_model so the soak exercises the
    # exact benchmarked configuration — keep the two in sync
    box_np = np.empty((args.objects, 2, 2), np.float32)
    for o in range(args.objects):
        x0 = 60.0 + 83.0 * o
        y0 = 90.0 + 61.0 * (o % 4)
        box_np[o] = [[x0, y0], [x0 + 210.0, y0 + 260.0]]
    labels = jnp.asarray(np.tile([2, 3], (args.objects, 1)), jnp.int32)
    out = engine.prompt_step(
        feats, bank, 0, 10**6, jnp.asarray(box_np), labels, is_init=True
    )
    bank = engine.encode_cond_memory(
        feats, bank, 0, out["pred_masks"], out["object_score_logits"],
        out["obj_ptr"], is_mask_from_pts=True,
    )
    assert bank.mem_k is not None

    frames = jnp.asarray(
        (rng.standard_normal((WINDOW, s, s, 3)) * 40 + 80).clip(0, 255),
        jnp.uint8,
    )
    float(jnp.sum(frames[0, :2, :2, 0].astype(jnp.float32)))  # force upload
    skips = np.zeros(WINDOW, bool)

    samples = []
    t0 = time.perf_counter()
    done = 0
    while done < args.frames:
        fi = np.arange(done + 1, done + WINDOW + 1, dtype=np.int32)
        bank, outs = engine.propagate_window(frames, bank, fi, skips, 10**6)
        float(jnp.sum(outs[0].astype(jnp.float32)))  # forced sync
        done += WINDOW
        raw = jax.local_devices()[0].memory_stats() or {}
        gib = raw.get("bytes_in_use", 0) / 2**30
        source = "bytes_in_use"
        if gib == 0:
            # the tunneled device reports no memory_stats; account every
            # live jax.Array this process holds on the device instead
            gib = sum(x.nbytes for x in jax.live_arrays()) / 2**30
            source = "live_arrays"
        samples.append((done, round(gib, 4)))
        if done % (WINDOW * 5) == 0 or done >= args.frames:
            print(
                f"frame {done}: {gib:.4f} GiB ({source}, "
                f"{done / (time.perf_counter() - t0):.1f} fps wall)",
                flush=True,
            )

    gibs = [g for _, g in samples[1:]]  # skip pre-steady-state
    nonzero = all(g > 0 for g in gibs)
    flat = len(gibs) >= 2 and nonzero and max(gibs) - min(gibs) < 0.05
    print(json.dumps({
        "metric": "soak_banked_hbm_gib",
        "model": args.model, "size": args.size, "objects": args.objects,
        "frames": args.frames,
        "banked_cache_gib": round(cache_gib, 3),
        "samples": samples[:3] + samples[-3:],
        "hbm_flat": bool(flat),
        "hbm_min_gib": min(gibs) if gibs else None,
        "hbm_max_gib": max(gibs) if gibs else None,
    }), flush=True)
    assert nonzero, "no usable memory measurement (all samples zero)"
    assert flat, f"HBM not flat: {samples}"


if __name__ == "__main__":
    main()
