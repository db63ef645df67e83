"""On-chip A/B of the fill-holes CC histogram forms (DET_SAM2_CC_HIST).

Run one mode per process (the env is read ONCE at module import):
    python examples/ab_cc_hist.py int8     # current single-dot int8
    python examples/ab_cc_hist.py bf16     # round-2 two-dot bf16 (2876cdc^)
    python examples/ab_cc_hist.py bf16x1   # bf16 single-dot, width-2w V

Only whole-window scans are trustworthy on this setup (CLAUDE.md: isolated
small ops have a ~300 us dispatch floor); this reuses bench.bench_model.
"""

import json
import os
import sys

mode = sys.argv[1] if len(sys.argv) > 1 else "int8"
os.environ["DET_SAM2_CC_HIST"] = mode
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import bench_model  # noqa: E402
from det_sam2_tpu.configs import (  # noqa: E402
    sam2_1_hiera_l,
    sam2_1_hiera_s,
    with_image_size,
)

for name, cfg in (
    ("hiera_s_768", with_image_size(sam2_1_hiera_s(), 768)),
    ("hiera_l_1024", with_image_size(sam2_1_hiera_l(), 1024)),
):
    fps = bench_model(cfg)
    print(json.dumps({"mode": mode, "model": name, "fps": round(fps, 2)}),
          flush=True)
