"""Time one on-chip train step at the reference's MOSE finetune shape:
hiera-b+ @1024^2, T=8 frames, B=1, <=3 objects (GT has up to 3 tracks),
the recipe of sam2.1_hiera_b+_MOSE_finetune.yaml:3-12.

Usage: python examples/bench_mose_trainstep.py [--size 1024] [--t 8]
[--remat] [--fsdp-off]. Prints one JSON line; on OOM prints the failure
diagnosis instead (the HBM ceiling is a legitimate outcome to document).
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
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--t", type=int, default=8)
    ap.add_argument("--objects", type=int, default=3)
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import dataclasses

    from det_sam2_tpu.track import SAM2Engine
    from det_sam2_tpu.training.recipes import mose_finetune_recipe
    from det_sam2_tpu.training.train_step import make_optimizer, make_train_step

    recipe = mose_finetune_recipe(total_steps=1000, image_size=args.size)
    cfg = recipe.model
    # make_train_step always remats the image encoder; --no-remat is kept
    # only to label the output record honestly
    if not args.no_remat:
        cfg = dataclasses.replace(cfg, remat_image_encoder=True)

    engine = SAM2Engine(cfg)
    opt = make_optimizer(recipe.optim, params=engine.params, cfg=cfg)
    step = make_train_step(
        cfg, engine.model, opt, loss_fn=recipe.loss, schedule=None
    )

    t, s, k = args.t, cfg.image_size, args.objects
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.standard_normal((t, 1, s, s, 3)).astype(np.float32) * 0.2
    )
    gt = np.zeros((t, k, s, s), np.float32)
    for j in range(k):
        y0, x0 = 100 + 150 * j, 120 + 180 * j
        for ti in range(t):
            gt[ti, j, y0 + 8 * ti : y0 + 160 + 8 * ti, x0 : x0 + 160] = 1.0
    gt = jnp.asarray(gt)[:, None]  # [T, B=1, K, H, W]
    if k == 1:  # single-track layout is [T, B, H, W]
        gt = gt[:, :, 0]

    params, opt_state = engine.params, opt.init(engine.params)
    try:
        t0 = time.perf_counter()
        params, opt_state, metrics = step(
            params, opt_state, images, gt, jax.random.PRNGKey(0)
        )
        loss0 = float(metrics["core_loss"])
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for i in range(args.reps):
            params, opt_state, metrics = step(
                params, opt_state, images, gt, jax.random.PRNGKey(i + 1)
            )
        loss = float(metrics["core_loss"])
        ms = 1000.0 * (time.perf_counter() - t0) / args.reps
        print(json.dumps({
            "metric": f"train_step_ms_hiera_bplus_{s}_T{t}_{k}obj",
            "value": round(ms, 1),
            "unit": "ms/step",
            "remat": not args.no_remat,
            "compile_s": round(compile_s, 1),
            "loss_first": round(loss0, 3),
            "loss_last": round(loss, 3),
        }), flush=True)
    except Exception as e:
        print(json.dumps({
            "metric": f"train_step_ms_hiera_bplus_{s}_T{t}_{k}obj",
            "error": f"{type(e).__name__}: {str(e)[:400]}",
        }), flush=True)
        raise


if __name__ == "__main__":
    main()
