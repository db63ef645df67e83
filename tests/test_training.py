"""Loss parity vs reference training/loss_fns.py + data-parallel train step."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from det_sam2_tpu.configs import tiny_test_config
from det_sam2_tpu.parallel.mesh import make_mesh, shard_batch
from det_sam2_tpu.training.loss_fns import (
    CORE_LOSS_KEY,
    MultiStepMultiMasksAndIous,
)
from det_sam2_tpu.training.train_step import (
    OptimConf,
    make_optimizer,
    make_train_step,
)
from det_sam2_tpu.training.sam2_train import mask_to_box

from torch_ref import load_reference, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)


def _ref_loss():
    load_reference()
    import sys
    import types

    # training/loss_fns.py imports CORE_LOSS_KEY from training.trainer, which
    # drags in heavy deps; stub the constant.
    if "training.trainer" not in sys.modules:
        stub = types.ModuleType("training.trainer")
        stub.CORE_LOSS_KEY = "core_loss"
        sys.modules["training.trainer"] = stub
    from training.loss_fns import MultiStepMultiMasksAndIous as RefLoss

    return RefLoss(
        weight_dict={"loss_mask": 20.0, "loss_dice": 1.0, "loss_iou": 1.0,
                     "loss_class": 1.0},
        supervise_all_iou=True,
        iou_use_l1_loss=True,
        pred_obj_scores=True,
    )


def test_multistep_loss_parity():
    ref = _ref_loss()
    rng = np.random.default_rng(0)
    t, n, m, h, w = 3, 2, 3, 16, 16
    targets = (rng.uniform(size=(t, n, h, w)) > 0.6).astype(np.float32)
    outs_t, outs_j = [], []
    for i in range(t):
        masks = rng.standard_normal((n, m, h, w)).astype(np.float32) * 3
        ious = rng.uniform(size=(n, m)).astype(np.float32)
        obj = rng.standard_normal((n, 1)).astype(np.float32) * 3
        outs_t.append(
            {
                "multistep_pred_multimasks_high_res": [torch.from_numpy(masks)],
                "multistep_pred_ious": [torch.from_numpy(ious)],
                "multistep_object_score_logits": [torch.from_numpy(obj)],
            }
        )
        outs_j.append(
            {
                "multistep_pred_multimasks_high_res": [jnp.asarray(masks)],
                "multistep_pred_ious": [jnp.asarray(ious)],
                "multistep_object_score_logits": [jnp.asarray(obj)],
            }
        )
    want = ref(outs_t, torch.from_numpy(targets))
    mine = MultiStepMultiMasksAndIous(
        {"loss_mask": 20.0, "loss_dice": 1.0, "loss_iou": 1.0, "loss_class": 1.0},
        supervise_all_iou=True,
        iou_use_l1_loss=True,
        pred_obj_scores=True,
    )
    got = mine(outs_j, jnp.asarray(targets))
    for k in ("loss_mask", "loss_dice", "loss_iou", "loss_class", CORE_LOSS_KEY):
        np.testing.assert_allclose(
            float(got[k]), float(want[k]), rtol=1e-4, atol=1e-5, err_msg=k
        )


def test_mask_to_box_matches_reference():
    load_reference()
    from sam2.utils.misc import mask_to_box as ref_box

    rng = np.random.default_rng(1)
    masks = (rng.uniform(size=(3, 24, 32)) > 0.9).astype(np.float32)
    masks[1] = 0  # empty mask row
    want = ref_box(torch.from_numpy(masks)[:, None].bool()).numpy()[:, 0]
    got = np.asarray(mask_to_box(jnp.asarray(masks)))
    # reference leaves empty-mask rows undefined-ish (min/max of empty); only
    # compare non-empty rows
    np.testing.assert_allclose(got[[0, 2]], want[[0, 2]], atol=1e-5)


@pytest.mark.slow
def test_train_step_runs_on_mesh():
    cfg = tiny_test_config()
    from det_sam2_tpu.track import SAM2Engine

    engine = SAM2Engine(cfg)
    mesh = make_mesh()  # 8 fake CPU devices on 'data'
    assert mesh.devices.size == 8

    opt = make_optimizer(OptimConf(base_lr=1e-4, total_steps=10))
    step = make_train_step(cfg, engine.model, opt, mesh=mesh)

    t, b, s = 2, 8, cfg.image_size
    rng = np.random.default_rng(0)
    images = rng.standard_normal((t, b, s, s, 3)).astype(np.float32) * 0.2
    gt = np.zeros((t, b, s, s), np.float32)
    gt[:, :, 30:70, 40:90] = 1.0

    opt_state = opt.init(engine.params)
    images, gt = shard_batch(mesh, (jnp.asarray(images), jnp.asarray(gt)), axis=1)
    leaf_before = np.asarray(
        jax.tree_util.tree_leaves(engine.params)[0]
    ).copy()
    params, opt_state, metrics = step(engine.params, opt_state, images, gt,
                                      jax.random.PRNGKey(0))
    loss = float(metrics[CORE_LOSS_KEY])
    assert np.isfinite(loss) and loss > 0
    # one more step (params/opt_state are donated): loss stays finite and
    # params move (warmup lr is 0 at step 0, >0 at step 1)
    params2, _, metrics2 = step(params, opt_state, images, gt,
                                jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics2[CORE_LOSS_KEY]))
    leaf_after = np.asarray(jax.tree_util.tree_leaves(params2)[0])
    assert np.abs(leaf_after - leaf_before).sum() > 0


def test_scheduled_weight_decay_matches_torch():
    """wd scheduled 0.1 -> 0.01 over training: the optax chain matches a
    torch AdamW whose group weight_decay is set per step from the same
    cosine curve (reference training/optimizer.py:34-299 option
    schedulers; Optimizer.step_schedulers sets param_group[option] before
    each step)."""
    import torch

    from det_sam2_tpu.training.train_step import cosine_param_schedule

    total = 10
    conf = OptimConf(
        base_lr=1e-3, weight_decay=0.1, weight_decay_end=0.01,
        warmup_steps=0, total_steps=total, cosine_end_ratio=0.1,
        grad_clip_norm=1e9,  # disable clipping for exact comparison
    )
    opt = make_optimizer(conf)

    rng = np.random.default_rng(0)
    w0 = rng.standard_normal((4, 3)).astype(np.float32)
    b0 = rng.standard_normal((3,)).astype(np.float32)
    params = {"dense": {"kernel": jnp.asarray(w0), "bias": jnp.asarray(b0)}}
    state = opt.init(params)

    tw = torch.nn.Parameter(torch.tensor(w0))
    tb = torch.nn.Parameter(torch.tensor(b0))
    topt = torch.optim.AdamW(
        [
            {"params": [tw], "weight_decay": 0.1},
            {"params": [tb], "weight_decay": 0.0},  # bias: wd masked
        ],
        lr=1.0, betas=(conf.b1, conf.b2), eps=1e-8,
    )

    wd_fn = cosine_param_schedule(0.1, 0.01, total)
    lr_fn = __import__("optax").warmup_cosine_decay_schedule(
        init_value=conf.base_lr, peak_value=conf.base_lr, warmup_steps=0,
        decay_steps=total, end_value=conf.base_lr * conf.cosine_end_ratio,
    )

    for step_i in range(4):
        gw = rng.standard_normal((4, 3)).astype(np.float32)
        gb = rng.standard_normal((3,)).astype(np.float32)
        grads = {"dense": {"kernel": jnp.asarray(gw), "bias": jnp.asarray(gb)}}
        updates, state = opt.update(grads, state, params)
        params = __import__("optax").apply_updates(params, updates)

        # torch: set the scheduled lr/wd on the groups, then step
        lr_t = float(lr_fn(step_i))
        wd_t = float(wd_fn(step_i))
        topt.param_groups[0]["lr"] = lr_t
        topt.param_groups[0]["weight_decay"] = wd_t
        topt.param_groups[1]["lr"] = lr_t
        tw.grad = torch.tensor(gw)
        tb.grad = torch.tensor(gb)
        topt.step()

        np.testing.assert_allclose(
            np.asarray(params["dense"]["kernel"]), tw.detach().numpy(),
            atol=2e-6, err_msg=f"kernel step {step_i}",
        )
        np.testing.assert_allclose(
            np.asarray(params["dense"]["bias"]), tb.detach().numpy(),
            atol=2e-6, err_msg=f"bias step {step_i}",
        )
