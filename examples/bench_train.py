"""On-chip training-step benchmark: hiera-S, T frames, B=1, flash-VJP path.

Round-3 directive: the training stack was verified only on the CPU mesh in
interpret mode; this script compiles and times one real `make_train_step`
on the TPU with the Pallas flash-attention custom VJP active (the memory
cross-attention at 512^2 is 1024 queries x ~7k keys > the 4M-flops flash
threshold, so both the forward kernel and the dq/dkv backward kernels run
on hardware).

Reference capability matched: training/trainer.py:845-889 (_run_step on
8xA100). Usage:  python examples/bench_train.py [--size 512] [--frames 4]
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
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--repeats", type=int, default=8)
    ap.add_argument("--corrections", type=int, default=0)
    ap.add_argument(
        "--converge", type=int, default=0,
        help="after timing, run N more optimizer steps on the SAME batch "
        "and print the core-loss trajectory — on-hardware proof that the "
        "flash-VJP gradients actually optimize (loss must drop)",
    )
    ap.add_argument("--lr", type=float, default=1e-5)
    args = ap.parse_args()

    from det_sam2_tpu.configs import sam2_1_hiera_s, with_image_size
    from det_sam2_tpu.track import SAM2Engine
    from det_sam2_tpu.training.train_step import (
        OptimConf,
        make_optimizer,
        make_train_step,
    )

    cfg = with_image_size(sam2_1_hiera_s(), args.size)
    engine = SAM2Engine(cfg)
    opt = make_optimizer(OptimConf(base_lr=args.lr, total_steps=100))
    step = make_train_step(
        cfg, engine.model, opt, num_correction_steps=args.corrections
    )

    t, b, s = args.frames, args.batch, cfg.image_size
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.standard_normal((t, b, s, s, 3)).astype(np.float32) * 0.2
    )
    gt = np.zeros((t, b, s, s), np.float32)
    gt[:, :, s // 4 : s // 2, s // 4 : s // 2] = 1.0
    gt = jnp.asarray(gt)
    key = jax.random.PRNGKey(0)

    opt_state = opt.init(engine.params)
    params = engine.params

    print(f"compiling train step (size={s}, T={t}, B={b}) ...", flush=True)
    t0 = time.perf_counter()
    params, opt_state, metrics = step(params, opt_state, images, gt, key)
    # forced sync: block_until_ready does not synchronize over the tunnel
    loss = float(metrics["core_loss"])
    compile_s = time.perf_counter() - t0
    print(f"compile+first step: {compile_s:.1f}s, core_loss={loss:.4f}",
          flush=True)
    assert np.isfinite(loss), f"non-finite loss {loss}"

    t0 = time.perf_counter()
    for i in range(args.repeats):
        params, opt_state, metrics = step(
            params, opt_state, images, gt, jax.random.PRNGKey(i + 1)
        )
    loss = float(metrics["core_loss"])
    dt = time.perf_counter() - t0
    ms = 1000.0 * dt / args.repeats
    print(
        json.dumps(
            {
                "metric": f"train_step_ms_hiera_s_{s}_T{t}",
                "value": round(ms, 1),
                "unit": "ms/step",
                "steps_per_sec": round(1000.0 / ms, 3),
                "core_loss": round(loss, 4),
            }
        ),
        flush=True,
    )

    if args.converge:
        curve = [loss]
        for i in range(args.converge):
            params, opt_state, metrics = step(
                params, opt_state, images, gt,
                jax.random.PRNGKey(1000 + i),
            )
            curve.append(float(metrics["core_loss"]))
        print(
            json.dumps(
                {
                    "metric": "train_convergence",
                    "steps": args.converge,
                    "loss_first": round(curve[0], 4),
                    "loss_last": round(curve[-1], 4),
                    "curve_every_5": [round(v, 4) for v in curve[::5]],
                }
            ),
            flush=True,
        )
        assert curve[-1] < curve[0], (
            f"loss did not decrease on-chip: {curve[0]:.4f} -> "
            f"{curve[-1]:.4f}"
        )
        print("CONVERGENCE OK", flush=True)


if __name__ == "__main__":
    main()
