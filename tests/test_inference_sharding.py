"""Object-sharded inference on the 8-device CPU mesh: identical outputs to
the single-device path, with the step actually partitioned."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from det_sam2_tpu.configs import tiny_test_config
from det_sam2_tpu.parallel.inference_sharding import shard_bank
from det_sam2_tpu.parallel.mesh import make_mesh
from det_sam2_tpu.state import init_bank
from det_sam2_tpu.track import SAM2Engine


@pytest.mark.slow
def test_object_sharded_track_matches_single_device():
    cfg = tiny_test_config()
    engine = SAM2Engine(cfg)
    mesh = make_mesh(axis_names=("objects",))
    assert mesh.devices.size == 8
    o = 8

    rng = np.random.default_rng(0)
    img = jnp.asarray(
        rng.standard_normal((1, cfg.image_size, cfg.image_size, 3)),
        jnp.float32,
    )
    feats = engine.encode_image(img)
    boxes = jnp.asarray(
        np.stack([[[10.0 + 4 * i, 20.0], [60.0 + 4 * i, 80.0]]
                  for i in range(o)]),
        jnp.float32,
    )
    labels = jnp.broadcast_to(jnp.asarray([2, 3], jnp.int32)[None], (o, 2))

    def run(bank):
        out = engine.prompt_step(feats, bank, 0, 10, boxes, labels,
                                 is_init=True)
        bank = engine.encode_cond_memory(
            feats, bank, 0, out["pred_masks"], out["object_score_logits"],
            out["obj_ptr"],
        )
        bank, out = engine.track_step(feats, bank, 1, 10)
        return bank, np.asarray(out["pred_masks"], np.float32)

    _, single = run(init_bank(cfg, num_objects=o))
    bank_sh = shard_bank(mesh, init_bank(cfg, num_objects=o), "objects")
    bank_sh2, sharded = run(bank_sh)

    np.testing.assert_allclose(sharded, single, rtol=1e-4, atol=1e-4)
    # the bank stayed sharded through the step
    mem_sharding = bank_sh2.noncond_mem.sharding
    assert not mem_sharding.is_fully_replicated
