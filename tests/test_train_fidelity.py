"""Training fidelity v2: loss parity vs the reference SAM2Train on a
2-cond-frame + 1-correction-click schedule, and layer-decay lr groups
matching the reference's computed param groups."""

import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from det_sam2_tpu.configs import tiny_test_config
from det_sam2_tpu.convert import convert_sam2_base
from det_sam2_tpu.training.loss_fns import (
    CORE_LOSS_KEY,
    DEFAULT_WEIGHTS,
    MultiStepMultiMasksAndIous,
)
from det_sam2_tpu.training.sam2_train import (
    PromptSchedule,
    PromptSimConf,
    forward_training,
    sample_prompt_schedule,
)
from det_sam2_tpu.modeling.layers import sdpa
from det_sam2_tpu.modeling.sam2_base import SAM2Model

from torch_ref import build_reference_sam2, load_reference, reference_available, torch_sd

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)

CFG = tiny_test_config(only_obj_ptrs_in_the_past_for_eval=False)
T, B, S = 4, 1, CFG.image_size


def _stub_tensordict():
    if "tensordict" not in sys.modules:
        mod = types.ModuleType("tensordict")
        mod.tensorclass = lambda cls: cls  # import-time only; never built
        sys.modules["tensordict"] = mod


@pytest.fixture(scope="module")
def train_pair():
    load_reference()
    _stub_tensordict()
    from training.model.sam2 import SAM2Train

    ref = build_reference_sam2(
        CFG,
        cls=SAM2Train,
        prob_to_use_pt_input_for_train=1.0,
        prob_to_use_box_input_for_train=1.0,
        num_frames_to_correct_for_train=2,
        rand_frames_to_correct_for_train=False,
        num_init_cond_frames_for_train=2,
        rand_init_cond_frames_for_train=False,
        num_correction_pt_per_frame=1,
        prob_to_sample_from_gt_for_train=0.0,
    )
    # train() enables the training branches (stride-1 memory, no past-only
    # ptr filter); dropout must be inert for determinism
    for m in ref.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    ref.train()
    # fork latent bug: SAM2Train.track_step calls _track_step without the
    # fork-added preloading_memory_cond_frame_idx arg; default it to None
    orig = type(ref).__mro__[1]._track_step  # SAM2Base._track_step

    def _track_step_fixed(self_, *args, **kw):
        if len(args) == 11 and "preloading_memory_cond_frame_idx" not in kw:
            kw["preloading_memory_cond_frame_idx"] = None
        return orig(self_, *args, **kw)

    ref._track_step = types.MethodType(_track_step_fixed, ref)
    params = convert_sam2_base(torch_sd(ref), CFG)
    model = SAM2Model(cfg=CFG, attention_fn=sdpa)
    return ref, model, params


def _loss_pair():
    ours = MultiStepMultiMasksAndIous(
        DEFAULT_WEIGHTS, supervise_all_iou=True, iou_use_l1_loss=True,
        pred_obj_scores=True,
    )
    if "training.trainer" not in sys.modules:
        stub = types.ModuleType("training.trainer")
        stub.CORE_LOSS_KEY = "core_loss"
        sys.modules["training.trainer"] = stub
    from training.loss_fns import MultiStepMultiMasksAndIous as RefLoss

    ref = RefLoss(
        weight_dict={"loss_mask": 20.0, "loss_dice": 1.0, "loss_iou": 1.0,
                     "loss_class": 1.0},
        supervise_all_iou=True,
        iou_use_l1_loss=True,
        pred_obj_scores=True,
    )
    return ours, ref


def _make_clip(seed=0):
    rng = np.random.default_rng(seed)
    images = rng.standard_normal((T, B, S, S, 3)).astype(np.float32) * 0.2
    gt = np.zeros((T, B, S, S), np.float32)
    for t in range(T):
        gt[t, :, 30 + 4 * t : 70 + 4 * t, 40 : 90] = 1.0
    return images, gt


class _FakeDatapoint:
    """Minimal stand-in for BatchedVideoDatapoint (B=1, one object)."""

    def __init__(self, images_tbhwc: np.ndarray, gt_tbhw: np.ndarray):
        t, b = images_tbhwc.shape[:2]
        assert b == 1
        nchw = np.transpose(images_tbhwc[:, 0], (0, 3, 1, 2))  # [T,3,H,W]
        self.flat_img_batch = torch.from_numpy(nchw).float()
        self.masks = torch.from_numpy(gt_tbhw[:, 0:1] > 0)  # [T,1,H,W] bool
        self.num_frames = t
        self.flat_obj_to_img_idx = [
            torch.tensor([ti], dtype=torch.long) for ti in range(t)
        ]


@pytest.mark.slow
def test_loss_parity_two_cond_one_correction(train_pair):
    """Same schedule + identical sampled prompts => same per-frame outputs
    and the same multistep loss as the reference SAM2Train
    (/root/reference/training/model/sam2.py:146-520)."""
    ref, model, params = train_pair
    images, gt = _make_clip()
    dp = _FakeDatapoint(images, gt)

    # --- reference prepare (its host rng picks the 2nd cond frame) ---
    with torch.no_grad():
        backbone_out = ref.forward_image(dp.flat_img_batch)
        backbone_out = ref.prepare_prompt_inputs(backbone_out, dp)
    init_cond = list(backbone_out["init_cond_frames"])
    frames_to_correct = list(backbone_out["frames_to_add_correction_pt"])
    assert len(init_cond) == 2 and backbone_out["use_pt_input"]
    assert sorted(frames_to_correct) == sorted(init_cond)

    # --- ours: same schedule, eager run recording every sampled prompt ---
    schedule = PromptSchedule(
        init_cond_frames=tuple(init_cond),
        frames_to_correct=tuple(frames_to_correct),
        use_pt_input=True,
        use_box_per_frame=(True, True),
        num_correction_pt=1,
        prob_to_sample_from_gt=0.0,
    )
    recorder = []
    outs = model.apply(
        {"params": params},
        CFG,
        jnp.asarray(images),
        jnp.asarray(gt),
        method=lambda m, c, i, g: forward_training(
            m, c, i, g, rng=jax.random.PRNGKey(3), schedule=schedule,
            prompt_recorder=recorder,
        ),
    )

    # --- replay our sampled prompts into the reference ---
    inits = {r["t"]: r for r in recorder if r["kind"] == "init"}
    corrections = [r for r in recorder if r["kind"] == "correction"]
    for t in init_cond:
        backbone_out["point_inputs_per_frame"][t] = {
            "point_coords": torch.from_numpy(np.asarray(inits[t]["coords"])),
            "point_labels": torch.from_numpy(np.asarray(inits[t]["labels"])),
        }
    replay = iter(corrections)

    import training.model.sam2 as ref_mod

    orig_get_next_point = ref_mod.get_next_point

    def replay_next_point(gt_masks, pred_masks, method):
        r = next(replay)
        return (
            torch.from_numpy(np.asarray(r["coords"])),
            torch.from_numpy(np.asarray(r["labels"])),
        )

    ref_mod.get_next_point = replay_next_point
    try:
        with torch.no_grad():
            ref_outs = ref.forward_tracking(backbone_out, dp)
    finally:
        ref_mod.get_next_point = orig_get_next_point
    assert not list(replay), "reference consumed fewer clicks than recorded"

    # per-frame final mask parity
    for t in range(T):
        np.testing.assert_allclose(
            np.asarray(outs[t]["pred_masks_high_res"]),
            ref_outs[t]["pred_masks_high_res"].numpy(),
            rtol=1e-2, atol=5e-2, err_msg=f"frame {t} final masks",
        )
        assert len(outs[t]["multistep_pred_ious"]) == len(
            ref_outs[t]["multistep_pred_ious"]
        ), f"frame {t} multistep count"

    # loss parity
    our_loss_fn, ref_loss_fn = _loss_pair()
    our_losses = our_loss_fn(outs, jnp.asarray(gt))
    ref_losses = ref_loss_fn(ref_outs, torch.from_numpy(gt).float())
    ref_core = float(ref_losses["core_loss"])
    our_core = float(our_losses[CORE_LOSS_KEY])
    assert abs(our_core - ref_core) / max(abs(ref_core), 1e-6) < 2e-2, (
        f"core loss {our_core} vs reference {ref_core}"
    )


@pytest.mark.slow
def test_mask_prompt_bypass_parity(train_pair):
    """GT-mask-prompted init cond frames with use_mask_input_as_output_
    without_sam=True bypass the SAM heads entirely: the mask becomes the
    output at +-10 logits (reference prepare_prompt_inputs with
    use_pt_input=False, sam2.py:222-252, + _use_mask_as_output). Final
    masks, multistep counts, and the loss must match the reference."""
    ref, model, params = train_pair
    assert ref.use_mask_input_as_output_without_sam
    images, gt = _make_clip(seed=5)
    dp = _FakeDatapoint(images, gt)

    old_prob = ref.prob_to_use_pt_input_for_train
    ref.prob_to_use_pt_input_for_train = 0.0
    try:
        with torch.no_grad():
            backbone_out = ref.forward_image(dp.flat_img_batch)
            backbone_out = ref.prepare_prompt_inputs(backbone_out, dp)
            assert not backbone_out["use_pt_input"]
            assert backbone_out["frames_to_add_correction_pt"] == []
            init_cond = list(backbone_out["init_cond_frames"])
            ref_outs = ref.forward_tracking(backbone_out, dp)
    finally:
        ref.prob_to_use_pt_input_for_train = old_prob

    schedule = PromptSchedule(
        init_cond_frames=tuple(init_cond),
        frames_to_correct=(),
        use_pt_input=False,
        use_box_per_frame=tuple(False for _ in init_cond),
        num_correction_pt=0,
    )
    outs = model.apply(
        {"params": params},
        CFG,
        jnp.asarray(images),
        jnp.asarray(gt),
        method=lambda m, c, i, g: forward_training(
            m, c, i, g, rng=jax.random.PRNGKey(0), schedule=schedule,
        ),
    )

    for t in range(T):
        np.testing.assert_allclose(
            np.asarray(outs[t]["pred_masks_high_res"]),
            ref_outs[t]["pred_masks_high_res"].numpy(),
            rtol=1e-2, atol=5e-2, err_msg=f"frame {t} final masks",
        )
        assert len(outs[t]["multistep_pred_ious"]) == len(
            ref_outs[t]["multistep_pred_ious"]
        ), f"frame {t} multistep count"
    # cond frames emit the GT mask verbatim at +-10 logits
    for t in init_cond:
        ours_t = np.asarray(outs[t]["pred_masks_high_res"])[:, 0]
        np.testing.assert_allclose(
            ours_t, np.where(gt[t] > 0, 10.0, -10.0), atol=1e-5
        )

    our_loss_fn, ref_loss_fn = _loss_pair()
    our_losses = our_loss_fn(outs, jnp.asarray(gt))
    ref_losses = ref_loss_fn(ref_outs, torch.from_numpy(gt).float())
    ref_core = float(ref_losses["core_loss"])
    our_core = float(our_losses[CORE_LOSS_KEY])
    assert abs(our_core - ref_core) / max(abs(ref_core), 1e-6) < 2e-2, (
        f"core loss {our_core} vs reference {ref_core}"
    )


def test_sample_prompt_schedule_distribution():
    """Host sampling reproduces prepare_prompt_inputs' structure: frame 0
    always cond; counts within bounds; correction frames superset of cond
    frames; mask-input schedules have no corrections."""
    conf = PromptSimConf()
    rng = np.random.default_rng(42)
    saw_two_cond = saw_mask = saw_extra_correct = False
    for _ in range(200):
        s = sample_prompt_schedule(rng, 8, conf)
        assert s.init_cond_frames[0] == 0
        assert 1 <= len(s.init_cond_frames) <= 2
        assert len(set(s.init_cond_frames)) == len(s.init_cond_frames)
        if not s.use_pt_input:
            saw_mask = True
            assert s.frames_to_correct == ()
            assert s.num_correction_pt == 0
        else:
            assert set(s.init_cond_frames) <= set(s.frames_to_correct)
            assert s.num_correction_pt == 7
            if len(s.frames_to_correct) > len(s.init_cond_frames):
                saw_extra_correct = True
        if len(s.init_cond_frames) == 2:
            saw_two_cond = True
    assert saw_two_cond and saw_mask and saw_extra_correct


@pytest.mark.slow
def test_layer_decay_groups_match_reference(train_pair):
    """lr_scale_tree reproduces the reference layer_decay_param_modifier
    groups (training/optimizer.py:422 + hieradet.get_layer_id) and the
    vision-lr split."""
    ref, model, params = train_pair
    from det_sam2_tpu.training.train_step import OptimConf, lr_scale_tree

    conf = OptimConf(base_lr=5e-6, vision_lr=3e-6, layer_decay=0.9)
    scales = lr_scale_tree(params, CFG, conf)
    vis = conf.vision_lr / conf.base_lr

    trunk = ref.image_encoder.trunk
    num_layers = trunk.get_num_layers() + 1
    decays = [0.9 ** (num_layers - i) for i in range(num_layers + 1)]

    def our_scale(*path_keys):
        node = scales
        for k in path_keys:
            node = node[k]
        leaf = jax.tree_util.tree_leaves(node)[0]
        return float(leaf)

    # every torch trunk param's group scale must equal ours
    for name, _ in trunk.named_parameters():
        layer_id = trunk.get_layer_id("image_encoder.trunk." + name)
        want = decays[layer_id] * vis
        if "pos_embed" in name:
            want = 1.0 * vis  # the MOSE yaml '*pos_embed*' override
        if name.startswith("blocks."):
            i = int(name.split(".")[1])
            got = our_scale("image_encoder", "trunk", f"blocks_{i}")
        elif "patch_embed" in name:
            got = our_scale("image_encoder", "trunk", "patch_embed")
        elif "pos_embed" in name:
            got = our_scale("image_encoder", "trunk", "pos_embed")
        else:
            continue
        np.testing.assert_allclose(got, want, rtol=1e-6, err_msg=name)

    # non-trunk encoder params: vision ratio; non-encoder params: 1.0
    np.testing.assert_allclose(our_scale("image_encoder", "neck"), vis)
    non_enc = {k: v for k, v in scales.items() if k != "image_encoder"}
    for leaf in jax.tree_util.tree_leaves(non_enc):
        np.testing.assert_allclose(float(leaf), 1.0)
