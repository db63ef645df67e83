"""Drop-path through the real train step: the 'dropout' rng that
make_train_step supplies must activate trunk stochastic depth when
hiera.drop_path_rate > 0 (reference hieradet dpr schedule), and the loss
stays finite with moving params."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from det_sam2_tpu.configs import tiny_test_config
from det_sam2_tpu.track import SAM2Engine
from det_sam2_tpu.training.loss_fns import CORE_LOSS_KEY
from det_sam2_tpu.training.train_step import make_optimizer, make_train_step, OptimConf


@pytest.mark.slow
def test_train_step_with_drop_path():
    base = tiny_test_config()
    cfg = dataclasses.replace(
        base, hiera=dataclasses.replace(base.hiera, drop_path_rate=0.3)
    )
    engine = SAM2Engine(cfg)
    opt = make_optimizer(OptimConf(base_lr=1e-4, total_steps=10))
    step = make_train_step(cfg, engine.model, opt)

    t, b, s = 2, 1, cfg.image_size
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.standard_normal((t, b, s, s, 3)).astype(np.float32) * 0.2
    )
    gt = np.zeros((t, b, s, s), np.float32)
    gt[:, :, 30:70, 40:90] = 1.0
    gt = jnp.asarray(gt)

    opt_state = opt.init(engine.params)
    params, opt_state, m1 = step(
        engine.params, opt_state, images, gt, jax.random.PRNGKey(0)
    )
    assert np.isfinite(float(m1[CORE_LOSS_KEY]))

    # identical params/data/rng with drop_path_rate=0: the prompt-sampling
    # rng stream is the same (the dropout rng is a separate fold_in), so
    # any loss difference is attributable to stochastic depth being live
    engine0 = SAM2Engine(base)  # same seed -> same initial params
    step0 = make_train_step(base, engine0.model, opt)
    opt_state0 = opt.init(engine0.params)
    _, _, m0 = step0(
        engine0.params, opt_state0, images, gt, jax.random.PRNGKey(0)
    )
    assert float(m0[CORE_LOSS_KEY]) != float(m1[CORE_LOSS_KEY]), (
        "drop_path_rate=0.3 must change the forward pass vs rate 0"
    )
