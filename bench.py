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

import argparse
import json
import os
import subprocess
import sys
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


def bench_model(cfg, num_objects: int = NUM_OBJECTS, banked: bool = None) -> float:
    engine = SAM2Engine(cfg, dtype=jnp.bfloat16)
    layers = (
        engine.banked_layers if banked is None
        else (cfg.memory_attention.num_layers if banked else 0)
    )
    # one cond frame is written below -> attend bucket 1 (what the video
    # predictor would set for this session)
    bank = init_bank(
        cfg, num_objects=num_objects, dtype=jnp.bfloat16, attend_cond_tiles=1,
        banked_layers=layers,
    )

    rng = np.random.default_rng(0)
    size = cfg.image_size
    img = jnp.asarray(rng.standard_normal((1, size, size, 3)), jnp.float32)

    # prompt frame 0 with one box per object so the memory bank is non-empty
    feats = engine.encode_image(img)
    box_np = np.empty((num_objects, 2, 2), np.float32)
    for o in range(num_objects):
        x0 = 60.0 + 83.0 * o
        y0 = 90.0 + 61.0 * (o % 4)
        box_np[o] = [[x0, y0], [x0 + 210.0, y0 + 260.0]]
    boxes = jnp.asarray(box_np)
    labels = jnp.asarray(np.tile([2, 3], (num_objects, 1)), jnp.int32)
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


def bench_train_step() -> float:
    """One real train step on the chip (hiera-S 512^2, T=4, B=1, the Pallas
    flash-VJP path active on the memory cross-attention). Reference
    capability: training/trainer.py:845-889 on A100s."""
    from det_sam2_tpu.training.train_step import (
        OptimConf,
        make_optimizer,
        make_train_step,
    )

    cfg = with_image_size(sam2_1_hiera_s(), 512)
    engine = SAM2Engine(cfg)
    opt = make_optimizer(OptimConf(base_lr=1e-5, total_steps=100))
    step = make_train_step(cfg, engine.model, opt)

    t, s = 4, cfg.image_size
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.standard_normal((t, 1, s, s, 3)).astype(np.float32) * 0.2
    )
    gt = np.zeros((t, 1, s, s), np.float32)
    gt[:, :, s // 4 : s // 2, s // 4 : s // 2] = 1.0
    gt = jnp.asarray(gt)

    params, opt_state = engine.params, opt.init(engine.params)
    params, opt_state, metrics = step(
        params, opt_state, images, gt, jax.random.PRNGKey(0)
    )
    assert np.isfinite(float(metrics["core_loss"]))  # also forces sync
    reps = 5
    t0 = time.perf_counter()
    for i in range(reps):
        params, opt_state, metrics = step(
            params, opt_state, images, gt, jax.random.PRNGKey(i + 1)
        )
    float(metrics["core_loss"])
    return 1000.0 * (time.perf_counter() - t0) / reps


def bench_mose_train_step() -> dict:
    """One train step at the reference's ACTUAL finetune shape: hiera-b+
    @1024^2, T=8 frames, B=1, 3 objects, through the packaged MOSE recipe
    (sam2/configs/sam2.1_training/sam2.1_hiera_b+_MOSE_finetune.yaml:3-12).
    Encoder remat keeps the T=8 1024^2 activations inside HBM."""
    from det_sam2_tpu.training.recipes import mose_finetune_recipe
    from det_sam2_tpu.training.train_step import make_optimizer, make_train_step

    recipe = mose_finetune_recipe(total_steps=1000, image_size=1024)
    cfg = recipe.model
    engine = SAM2Engine(cfg)
    opt = make_optimizer(recipe.optim, params=engine.params, cfg=cfg)
    step = make_train_step(cfg, engine.model, opt, loss_fn=recipe.loss,
                           schedule=None)

    t, s, k = 8, cfg.image_size, 3
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.standard_normal((t, 1, s, s, 3)).astype(np.float32) * 0.2
    )
    gt = np.zeros((t, 1, k, s, s), np.float32)
    for j in range(k):
        y0, x0 = 100 + 150 * j, 120 + 180 * j
        for ti in range(t):
            gt[ti, 0, j, y0 + 8 * ti : y0 + 160 + 8 * ti, x0 : x0 + 160] = 1.0
    gt = jnp.asarray(gt)

    params, opt_state = engine.params, opt.init(engine.params)
    params, opt_state, metrics = step(
        params, opt_state, images, gt, jax.random.PRNGKey(0)
    )
    assert np.isfinite(float(metrics["core_loss"]))
    reps = 3
    t0 = time.perf_counter()
    for i in range(reps):
        params, opt_state, metrics = step(
            params, opt_state, images, gt, jax.random.PRNGKey(i + 1)
        )
    float(metrics["core_loss"])
    return {
        "metric": "train_step_ms_hiera_bplus_1024_T8_3obj",
        "value": round(1000.0 * (time.perf_counter() - t0) / reps, 1),
        "unit": "ms/step",
        "vs_baseline": 0.0,  # no reference per-step time published
    }


def run_propagate_benches():
    for name, cfg_fn in (("hiera_s", sam2_1_hiera_s), ("hiera_l", sam2_1_hiera_l)):
        for size in (768, 1024):
            fps = bench_model(with_image_size(cfg_fn(), size))
            rec = {
                "metric": f"propagate_fps_{name}_{size}_2obj",
                "value": round(fps, 2),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
            if size != 768:
                # the 24-FPS A100 baseline was measured for the 768^2
                # model; no published A100 number exists at 1024^2 (the
                # reference's native config resolution), so the ratio is
                # conservative — an A100 would be slower at 1024
                rec["baseline_note"] = "vs the 768^2 A100 baseline"
            print(json.dumps(rec), flush=True)
    # object-count scaling guard: 8 objects is the steepest point of the
    # scaling curve (3.5x degradation from 1 obj on hiera-S in round 3);
    # emit it so regressions in object batching fail loudly
    fps8 = bench_model(with_image_size(sam2_1_hiera_l(), 768), num_objects=8)
    print(
        json.dumps(
            {
                "metric": "propagate_fps_hiera_l_768_8obj",
                "value": round(fps8, 2),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps8 / BASELINE_FPS, 3),
                "baseline_note": "vs the 2-object A100 baseline",
            }
        ),
        flush=True,
    )


def run_scaling_benches(model: str = "hiera_l", size: int = 768):
    """Object-count scaling sweep (1/2/4/8) — the README table generator.
    Not part of the default driver run (time budget)."""
    cfg_fn = {"hiera_s": sam2_1_hiera_s, "hiera_l": sam2_1_hiera_l}[model]
    for n in (1, 2, 4, 8):
        fps = bench_model(with_image_size(cfg_fn(), size), num_objects=n)
        print(
            json.dumps(
                {
                    "metric": f"propagate_fps_{model}_{size}_{n}obj",
                    "value": round(fps, 2),
                    "unit": "frames/sec/chip",
                    "vs_baseline": round(fps / BASELINE_FPS, 3),
                }
            ),
            flush=True,
        )


def _run_section_subprocess(section: str, timeout_s: int):
    """Run one training section in a FRESH process and forward its JSON
    lines. Isolation is the point: round 4's MOSE-shape step compiled and
    ran standalone (1238 ms/step) but hit RESOURCE_EXHAUSTED inside the
    full bench process — the propagate benches' live HBM buffers plus a
    T=8 1024^2 backward don't coexist on a 16 GB chip — and its
    compile+OOM-retry time consumed the driver budget (BENCH_r04 rc=124).
    A child OOM/timeout here costs its section, never the whole record."""
    try:
        res = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--section", section],
            capture_output=True, text=True, timeout=timeout_s,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        emitted = False
        for line in res.stdout.splitlines():
            if line.startswith("{"):
                print(line, flush=True)
                emitted = True
        if not emitted:
            tail = (res.stderr or res.stdout or "").strip().splitlines()
            print(
                f"# section {section} produced no metric (rc={res.returncode}): "
                + "; ".join(tail[-3:]),
                flush=True,
            )
    except subprocess.TimeoutExpired:
        print(f"# section {section} timed out after {timeout_s}s", flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--section",
        choices=["all", "propagate", "train_s", "mose", "scaling"],
        default="all",
    )
    ap.add_argument("--model", default="hiera_l", help="scaling sweep model")
    ap.add_argument("--size", type=int, default=768, help="scaling sweep size")
    args = ap.parse_args(argv)

    if args.section in ("all", "propagate"):
        run_propagate_benches()
    if args.section == "scaling":
        run_scaling_benches(args.model, args.size)
    if args.section == "train_s":
        ms = bench_train_step()
        print(
            json.dumps(
                {
                    "metric": "train_step_ms_hiera_s_512_T4",
                    "value": round(ms, 1),
                    "unit": "ms/step",
                    "vs_baseline": 0.0,  # no reference per-step time published
                }
            ),
            flush=True,
        )
    if args.section == "mose":
        print(json.dumps(bench_mose_train_step()), flush=True)
    if args.section == "all":
        # training sections in fresh processes: frees this process's HBM,
        # bounds each section's time, and reuses the persistent compilation
        # cache (JAX_COMPILATION_CACHE_DIR) so warm runs take seconds
        _run_section_subprocess("train_s", timeout_s=900)
        # cold MOSE compile measured ~14 min on this harness; warm (the
        # persistent cache) is ~1 min. Budget for cold.
        _run_section_subprocess("mose", timeout_s=1500)


if __name__ == "__main__":
    main()
