"""Multi-chip single-frame encoding: shard the IMAGE spatially.

The reference has no per-frame model parallelism at all (one GPU encodes
each frame, sam2/modeling/sam2_base.py forward_image). On TPU the image
encoder is the per-frame latency floor of the streaming pipeline, and a
v5e/v4 slice can cut it by sharding the image's height axis across the
mesh: Hiera's windowed stages are spatially local (each device keeps its
own rows; convs exchange only kernel-height halos), and XLA/GSPMD inserts
the halo exchanges and the collectives for the few global-attention
blocks and the FPN top-down pathway automatically — the program stays the
single-device program, partitioned.

This is latency scaling (one frame faster), complementary to
inference_sharding.py's object-axis throughput scaling. Validated by
tests/test_spatial_sharding.py on the 8-device CPU mesh (sharded output
== single-device output) and exercised by __graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

import flax.linen as nn
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def spatial_image_sharding(mesh: Mesh, axis_name: str = "spatial"
                           ) -> NamedSharding:
    """[B, H, W, 3] image sharding: H split over the mesh axis."""
    return NamedSharding(mesh, P(None, axis_name, None, None))


def make_spatial_encode(engine, mesh: Mesh, axis_name: str = "spatial"):
    """Jit engine.encode_image with the image height sharded over `mesh`.

    Returns fn(img [1, H, W, 3]) -> (feat_s0, feat_s1, feat), replicated
    outputs (ready for the — single-device or object-sharded — tracking
    step). H after patch embed must be divisible by the mesh axis size
    times the stage-1 window size for an even, halo-only partition; other
    shapes still run (GSPMD falls back to resharding) but lose the
    locality win.
    """
    from det_sam2_tpu.track import normalize_image

    img_sh = spatial_image_sharding(mesh, axis_name)
    rep = NamedSharding(mesh, P())
    fn = nn.apply(
        lambda m, x: m.forward_image(normalize_image(x)), engine.model
    )
    jitted = jax.jit(fn, in_shardings=(rep, img_sh), out_shardings=rep)

    def encode(img):
        img = jax.device_put(img, img_sh)
        return jitted({"params": engine.params}, img)

    return encode
