"""System-level benchmark: the full Det-SAM2 self-prompting pipeline.

Drives VideoProcessor end to end — detector prompts every
`detect_interval` frames, prompt consolidation + memory encoding,
propagation windows as jitted scans, constant-memory frame release, host
mask resize — over a synthetic billiards-style stream, and reports
wall-clock frames/sec (the throughput a deployment actually sees, unlike
bench.py's propagation-only number). Mirrors the reference's
det_sam2_RT.py scenario (detect every 30, track window 60).

Usage: python examples/bench_pipeline.py [hiera_s|hiera_l] [frames]
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from det_sam2_tpu.app.detector import CallableDetector, Detection
from det_sam2_tpu.app.video_processor import VideoProcessor
from det_sam2_tpu.configs import MODEL_CONFIGS, with_image_size
from det_sam2_tpu.track import SAM2Engine
from det_sam2_tpu.video_predictor import SAM2VideoPredictor


def synth_frames(n, h=1080, w=1920, seed=0):
    """Billiards-ish frames: green felt + two moving balls."""
    rng = np.random.default_rng(seed)
    base = np.full((h, w, 3), (20, 90, 30), np.uint8)
    noise = rng.integers(0, 12, (h, w, 3), np.uint8)
    base = base + noise
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(n):
        f = base.copy()
        for ball, (cx, cy, vx, vy, col) in enumerate(
            [(300, 400, 6, 3, (240, 240, 240)), (900, 600, -4, 5, (200, 30, 30))]
        ):
            x = (cx + vx * t) % (w - 100) + 50
            y = (cy + vy * t) % (h - 100) + 50
            m = (yy - y) ** 2 + (xx - x) ** 2 < 28 ** 2
            f[m] = col
        frames.append(f)
    return frames


def make_detector():
    """Oracle detector: thresholds the bright/red balls to boxes."""

    def detect(img, idx):
        dets = []
        for cls, mask in (
            (0, (img > 180).all(-1)),
            (1, (img[..., 0] > 150) & (img[..., 1] < 90)),
        ):
            ys, xs = np.nonzero(mask)
            if len(ys) > 50:
                dets.append((xs.min(), ys.min(), xs.max(), ys.max(),
                             cls, 0.9))
        return dets

    return CallableDetector(detect)


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "hiera_s"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    cfg = with_image_size(MODEL_CONFIGS[model](), 768)
    engine = SAM2Engine(cfg, dtype=jnp.bfloat16)
    predictor = SAM2VideoPredictor(engine)
    frames = synth_frames(n)
    proc = VideoProcessor(
        predictor,
        detector=make_detector(),
        skip_classes=set(),
        special_classes=0,
        frame_buffer_size=30,
        detect_interval=30,
        max_frame_num_to_track=60,
        max_inference_state_frames=60,
    )
    # warmup on a short prefix (compiles all graphs), then timed full run
    proc.run(frames[:61])
    proc.clear()
    t0 = time.perf_counter()
    segments = proc.run(frames)
    dt = time.perf_counter() - t0
    tracked = sum(len(v) for v in segments.values())
    stats = proc.stats
    prop_fps = (
        stats["frames_propagated"] / stats["propagate_s"]
        if stats["propagate_s"] else 0.0
    )
    print(json.dumps({
        "metric": f"pipeline_fps_{model}_768_1080p",
        "value": round(n / dt, 2),
        "unit": "frames/sec end-to-end",
        "frames": n,
        "masks": tracked,
        # where the wall-clock went: detector, state upload (tunnel-bound
        # on this harness), propagation windows (device compute + mask
        # download). propagation_fps counts re-tracked overlap frames.
        "propagation_fps": round(prop_fps, 2),
        "detect_s": round(stats["detect_s"], 2),
        "update_state_s": round(stats["update_state_s"], 2),
        "propagate_s": round(stats["propagate_s"], 2),
        "frames_propagated": int(stats["frames_propagated"]),
    }), flush=True)


if __name__ == "__main__":
    main()
