"""Spatially-sharded single-frame encoding (parallel/spatial.py): the
height-sharded multi-device encode must produce the single-device result
(GSPMD partitions the same program), on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from det_sam2_tpu.configs import tiny_test_config
from det_sam2_tpu.parallel.mesh import make_mesh
from det_sam2_tpu.parallel.spatial import make_spatial_encode
from det_sam2_tpu.track import SAM2Engine


def test_spatial_encode_matches_single_device():
    cfg = tiny_test_config(image_size=256)
    engine = SAM2Engine(cfg, seed=0)
    rng = np.random.default_rng(0)
    img = jnp.asarray(
        rng.standard_normal((1, cfg.image_size, cfg.image_size, 3)),
        jnp.float32,
    )

    want = engine.encode_image(img)

    mesh = make_mesh(axis_names=("spatial",))
    assert mesh.shape["spatial"] == 8
    encode = make_spatial_encode(engine, mesh)
    got = encode(img)

    for g, w in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(want)):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=1e-4, rtol=1e-4
        )


def test_spatial_encode_feeds_track_step():
    """Sharded-encode features drive a normal tracking step end to end."""
    from det_sam2_tpu.state import init_bank

    cfg = tiny_test_config(image_size=256)
    engine = SAM2Engine(cfg, seed=0)
    mesh = make_mesh(axis_names=("spatial",))
    encode = make_spatial_encode(engine, mesh)

    rng = np.random.default_rng(1)
    img = jnp.asarray(
        rng.standard_normal((1, cfg.image_size, cfg.image_size, 3)),
        jnp.float32,
    )
    feats = encode(img)
    bank = init_bank(cfg, num_objects=2)
    boxes = jnp.asarray(
        [[[20.0, 20.0], [90.0, 100.0]], [[120.0, 40.0], [200.0, 180.0]]],
        jnp.float32,
    )
    labels = jnp.asarray([[2, 3], [2, 3]], jnp.int32)
    out = engine.prompt_step(feats, bank, 0, 100, boxes, labels, is_init=True)
    assert np.isfinite(np.asarray(out["pred_masks"])).all()
