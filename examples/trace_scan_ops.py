"""Op-level attribution of the streaming window scan.

Runs one propagate_window under jax.profiler.trace, parses the perfetto
JSON directly (no TensorBoard needed), and prints per-frame op costs with
XLA source attribution (tf_op) plus category buckets. This is the tool
that located the 1.3 ms patch-embed im2col, the 0.4 ms K-rope build, and
the layout-copy budget at hiera-L 1024^2 (see CLAUDE.md round-4 notes).

Usage: python examples/trace_scan_ops.py [--size 1024] [--model l]
       [--frames 12] [--top 40]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax")

import jax
import jax.numpy as jnp
import numpy as np


def bucket(n: str) -> str:
    if "_flash" in n:
        return "flash-kernels"
    if n.startswith("copy"):
        return "layout-copies"
    if "convolution" in n:
        return "convs"
    if "convert_reduce" in n:
        return "LN-stats"
    if n.startswith(("dynamic-update-slice", "dynamic_update")):
        return "dus"
    if n.startswith(("dynamic-slice", "dynamic_slice")):
        return "ds"
    if "reduce" in n:
        return "reduces"
    if n.startswith("fusion") or "fusion" in n:
        return "fusions"
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--model", choices=("s", "l"), default="l")
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--logdir", default="/tmp/trace_scan_ops")
    args = ap.parse_args()

    from det_sam2_tpu.configs import (
        sam2_1_hiera_l,
        sam2_1_hiera_s,
        with_image_size,
    )
    from profile_scan_gap2 import setup

    cfg_fn = sam2_1_hiera_l if args.model == "l" else sam2_1_hiera_s
    cfg = with_image_size(cfg_fn(), args.size)
    engine, bank, frame, feats = setup(cfg)
    t = args.frames
    rng = np.random.default_rng(1)
    frames = jax.device_put(jnp.asarray(
        (rng.standard_normal((t, cfg.image_size, cfg.image_size, 3)) * 40
         + 80).clip(0, 255), jnp.uint8))
    float(jnp.sum(frames[0, :2, :2, 0].astype(jnp.float32)))
    fi = np.arange(1, t + 1, dtype=np.int32)
    skips = np.zeros(t, bool)
    bank, outs = engine.propagate_window(frames, bank, fi, skips, 10_000)
    float(jnp.sum(outs[0].astype(jnp.float32)))  # warm compile

    os.system(f"rm -rf {args.logdir}")
    with jax.profiler.trace(args.logdir):
        bank, outs = engine.propagate_window(
            frames, bank, fi + t, skips, 10_000
        )
        float(jnp.sum(outs[0].astype(jnp.float32)))

    path = glob.glob(f"{args.logdir}/**/*.trace.json.gz", recursive=True)[0]
    with gzip.open(path, "rt") as f:
        tr = json.load(f)
    events = tr["traceEvents"]
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    tpid = [p for p, n in names.items()
            if "TPU" in n and "XLA Ops" in n] or \
           [p for p, n in names.items() if "TPU" in n]
    agg = collections.Counter()
    cnt = collections.Counter()
    meta = {}
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in tpid:
            n = e["name"]
            if n.startswith(("jit_", "while")):  # parents double-count
                continue
            agg[n] += e.get("dur", 0) / 1e3
            cnt[n] += 1
            if n not in meta:
                meta[n] = e.get("args", {})
    total = sum(agg.values())
    print(f"leaf device busy: {total:.1f} ms over {t} frames = "
          f"{total / t:.2f} ms/frame")
    buckets = collections.Counter()
    for n, ms in agg.items():
        buckets[bucket(n)] += ms
    for b, ms in buckets.most_common():
        print(f"  {b:14s} {ms / t:7.2f} ms/frame")
    print(f"\n{'ms/frame':>9} {'count':>6}  op / source")
    for n, ms in agg.most_common(args.top):
        src = meta.get(n, {}).get("tf_op", "")
        print(f"{ms / t:9.3f} {cnt[n]:6d}  {n[:36]:36s} {src[:110]}")


if __name__ == "__main__":
    main()
