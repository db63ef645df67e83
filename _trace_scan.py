"""Trace ONE propagate_window scan at hiera-L 1024 and aggregate XLA op
durations per frame (perfetto JSON parsing per CLAUDE.md HOWTO)."""
import glob, gzip, json, os, sys, time, collections
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax")
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo/examples")
from profile_scan_gap2 import setup
from det_sam2_tpu.configs import sam2_1_hiera_l, with_image_size

T = 12
cfg = with_image_size(sam2_1_hiera_l(), 1024)
engine, bank, frame, feats = setup(cfg)
rng = np.random.default_rng(1)
frames = jnp.asarray(
    (rng.standard_normal((T, cfg.image_size, cfg.image_size, 3)) * 40 + 80)
    .clip(0, 255), jnp.uint8)
frames = jax.device_put(frames)
float(jnp.sum(frames[0, :2, :2, 0].astype(jnp.float32)))
fi = np.arange(1, T + 1, dtype=np.int32)
skips = np.zeros(T, bool)
bank, outs = engine.propagate_window(frames, bank, fi, skips, 10_000)
float(jnp.sum(outs[0].astype(jnp.float32)))  # warm

logdir = "/tmp/trace_scan"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    bank, outs = engine.propagate_window(frames, bank, fi + T, skips, 10_000)
    float(jnp.sum(outs[0].astype(jnp.float32)))

path = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)[0]
with gzip.open(path, "rt") as f:
    tr = json.load(f)
events = tr["traceEvents"]
# find the pid/tid of the TPU XLA Ops track
names = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        names[e["pid"]] = e["args"].get("name", "")
tpid = [p for p, n in names.items() if "TPU" in n and "XLA Ops" in n]
if not tpid:
    tpid = [p for p, n in names.items() if "TPU" in n]
agg = collections.Counter()
cnt = collections.Counter()
total = 0.0
for e in events:
    if e.get("ph") == "X" and e.get("pid") in tpid:
        d = e.get("dur", 0) / 1e3  # us -> ms
        agg[e["name"]] += d
        cnt[e["name"]] += 1
        total += d
print(f"total device busy: {total:.2f} ms over {T} frames = "
      f"{total / T:.3f} ms/frame")
print(f"{'ms/frame':>9} {'count':>6}  op")
for name, ms in agg.most_common(60):
    print(f"{ms / T:9.3f} {cnt[name]:6d}  {name[:110]}")
