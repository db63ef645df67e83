"""FSDP-lite train step: params/opt-state sharded over the data axis
(ZeRO-3 style — beyond the reference's DDP-only trainer). Runs on the
forced 8-device CPU mesh from conftest."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from det_sam2_tpu.configs import tiny_test_config
from det_sam2_tpu.parallel.mesh import make_mesh, shard_batch
from det_sam2_tpu.track import SAM2Engine
from det_sam2_tpu.training.loss_fns import CORE_LOSS_KEY
from det_sam2_tpu.training.train_step import (
    OptimConf,
    make_optimizer,
    make_train_step,
)


@pytest.mark.slow
def test_fsdp_step_shards_params_and_matches_ddp():
    cfg = tiny_test_config()
    engine = SAM2Engine(cfg)
    mesh = make_mesh()
    assert mesh.devices.size == 8
    opt = make_optimizer(OptimConf(base_lr=1e-4, total_steps=10))

    t, b, s = 2, 8, cfg.image_size
    rng = np.random.default_rng(0)
    images = rng.standard_normal((t, b, s, s, 3)).astype(np.float32) * 0.2
    gt = np.zeros((t, b, s, s), np.float32)
    gt[:, :, 30:70, 40:90] = 1.0
    images, gt = shard_batch(
        mesh, (jnp.asarray(images), jnp.asarray(gt)), axis=1
    )

    # replicated (DDP-equivalent) baseline — steps donate, so keep a copy
    params0 = jax.tree_util.tree_map(jnp.copy, engine.params)
    ddp_step = make_train_step(cfg, engine.model, opt, mesh=mesh)
    opt_state = opt.init(engine.params)
    _, _, m_ddp = ddp_step(
        engine.params, opt_state, images, gt, jax.random.PRNGKey(0)
    )
    loss_ddp = float(m_ddp[CORE_LOSS_KEY])

    # FSDP: factory binds shardings to the concrete trees
    make = make_train_step(cfg, engine.model, opt, mesh=mesh, fsdp=True)
    params = jax.device_put(params0, make.tree_shardings(params0))
    opt_state = opt.init(params)
    opt_state = jax.device_put(opt_state, make.tree_shardings(opt_state))
    step = make(params, opt_state)
    params, opt_state, m_fsdp = step(
        params, opt_state, images, gt, jax.random.PRNGKey(0)
    )
    loss_fsdp = float(m_fsdp[CORE_LOSS_KEY])

    # same math, different layout: losses agree to reduction tolerance
    assert np.isfinite(loss_fsdp)
    np.testing.assert_allclose(loss_fsdp, loss_ddp, rtol=2e-4)

    # at least one large leaf is ACTUALLY sharded (distinct shard indices)
    sharded = 0
    for leaf in jax.tree_util.tree_leaves(params):
        idx = {tuple(map(str, s.index)) for s in leaf.addressable_shards}
        if len(idx) > 1:
            sharded += 1
    assert sharded > 10, f"only {sharded} leaves sharded"

    # second step runs with donated sharded trees
    params, opt_state, m2 = step(
        params, opt_state, images, gt, jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(m2[CORE_LOSS_KEY]))
