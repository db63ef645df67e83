"""End-to-end track-step parity: SAM2Engine vs the torch SAM2Base driven the
way SAM2VideoPredictor drives it (prompt frame 0 with a box, consolidate +
encode cond memory, then track subsequent frames off the memory bank)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from det_sam2_tpu.configs import tiny_test_config
from det_sam2_tpu.convert import convert_sam2_base
from det_sam2_tpu.state import init_bank
from det_sam2_tpu.track import SAM2Engine

from torch_ref import (
    build_reference_sam2,
    load_reference,
    reference_available,
    torch_sd,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)

CFG = tiny_test_config()


def _ref_features(model, img):
    backbone_out = model.forward_image(img)
    (_, vision_feats, vision_pos, feat_sizes) = model._prepare_backbone_features(
        backbone_out
    )
    return vision_feats, vision_pos, feat_sizes


def _ref_encode_cond(model, vision_feats, feat_sizes, pred_masks, obj_logits):
    high_res = F.interpolate(
        pred_masks, size=(CFG.image_size, CFG.image_size),
        mode="bilinear", align_corners=False,
    )
    feats, pos = model._encode_new_memory(
        vision_feats, feat_sizes, high_res, obj_logits, is_mask_from_pts=True
    )
    return feats, pos


@pytest.mark.slow
def test_track_parity_box_prompt_then_track():
    torch.set_num_threads(1)
    ref = build_reference_sam2(CFG)
    params = convert_sam2_base(torch_sd(ref), CFG)
    engine = SAM2Engine(CFG, params=params)

    rng = np.random.default_rng(0)
    n_frames = 4
    frames = rng.standard_normal((n_frames, 3, CFG.image_size, CFG.image_size))
    frames = frames.astype(np.float32) * 0.3

    # ---- torch side: emulate the video predictor's calls ----
    box_points = np.array([[[20.0, 24.0], [90.0, 100.0]]], dtype=np.float32)
    box_labels = np.array([[2, 3]], dtype=np.int32)
    output_dict = {"cond_frame_outputs": {}, "non_cond_frame_outputs": {}}
    ref_outs = []
    with torch.no_grad():
        for t in range(n_frames):
            img = torch.from_numpy(frames[t : t + 1])
            vision_feats, vision_pos, feat_sizes = _ref_features(ref, img)
            if t == 0:
                out = ref.track_step(
                    frame_idx=0,
                    is_init_cond_frame=True,
                    current_vision_feats=vision_feats,
                    current_vision_pos_embeds=vision_pos,
                    feat_sizes=feat_sizes,
                    point_inputs={
                        "point_coords": torch.from_numpy(box_points),
                        "point_labels": torch.from_numpy(box_labels),
                    },
                    mask_inputs=None,
                    output_dict=output_dict,
                    num_frames=n_frames,
                    run_mem_encoder=False,
                )
                # consolidation: re-encode memory from the (single-object)
                # consolidated mask with is_mask_from_pts=True
                mm, mpe = _ref_encode_cond(
                    ref, vision_feats, feat_sizes,
                    out["pred_masks"], out["object_score_logits"],
                )
                output_dict["cond_frame_outputs"][0] = {
                    "maskmem_features": mm,
                    "maskmem_pos_enc": mpe,
                    "pred_masks": out["pred_masks"],
                    "obj_ptr": out["obj_ptr"],
                    "object_score_logits": out["object_score_logits"],
                }
            else:
                out = ref.track_step(
                    frame_idx=t,
                    is_init_cond_frame=False,
                    current_vision_feats=vision_feats,
                    current_vision_pos_embeds=vision_pos,
                    feat_sizes=feat_sizes,
                    point_inputs=None,
                    mask_inputs=None,
                    output_dict=output_dict,
                    num_frames=n_frames,
                    run_mem_encoder=True,
                )
                output_dict["non_cond_frame_outputs"][t] = out
            ref_outs.append(
                {
                    "pred_masks": out["pred_masks"].numpy(),
                    "obj_ptr": out["obj_ptr"].numpy(),
                    "score": out["object_score_logits"].numpy(),
                }
            )

    # ---- jax side ----
    bank = init_bank(CFG, num_objects=1)
    got = []
    for t in range(n_frames):
        img = jnp.asarray(frames[t : t + 1].transpose(0, 2, 3, 1))
        feats = engine.encode_image(img)
        if t == 0:
            out = engine.prompt_step(
                feats, bank, 0, n_frames,
                jnp.asarray(box_points), jnp.asarray(box_labels), is_init=True,
            )
            bank = engine.encode_cond_memory(
                feats, bank, 0, out["pred_masks"],
                out["object_score_logits"], out["obj_ptr"],
                is_mask_from_pts=True,
            )
        else:
            bank, out = engine.track_step(feats, bank, t, n_frames)
        got.append(
            {
                "pred_masks": np.asarray(out["pred_masks"]),
                "obj_ptr": np.asarray(out["obj_ptr"]),
                "score": np.asarray(out["object_score_logits"]),
            }
        )

    for t in range(n_frames):
        np.testing.assert_allclose(
            got[t]["score"], ref_outs[t]["score"], rtol=1e-3, atol=2e-3,
            err_msg=f"frame {t} score",
        )
        np.testing.assert_allclose(
            got[t]["obj_ptr"], ref_outs[t]["obj_ptr"], rtol=1e-3, atol=2e-3,
            err_msg=f"frame {t} obj_ptr",
        )
        np.testing.assert_allclose(
            got[t]["pred_masks"], ref_outs[t]["pred_masks"],
            rtol=1e-3, atol=5e-3, err_msg=f"frame {t} masks",
        )


@pytest.mark.slow
def test_track_parity_with_temporal_stride():
    """memory_temporal_stride_for_eval=2: the stride-r non-cond selection
    arithmetic (sam2_base.py:528-562) must match the reference."""
    import dataclasses

    torch.set_num_threads(1)
    cfg = dataclasses.replace(CFG, memory_temporal_stride_for_eval=2)
    ref = build_reference_sam2(cfg)
    params = convert_sam2_base(torch_sd(ref), cfg)
    engine = SAM2Engine(cfg, params=params)

    rng = np.random.default_rng(5)
    n_frames = 8
    frames = rng.standard_normal(
        (n_frames, 3, cfg.image_size, cfg.image_size)
    ).astype(np.float32) * 0.3
    box_points = np.array([[[20.0, 24.0], [90.0, 100.0]]], dtype=np.float32)
    box_labels = np.array([[2, 3]], dtype=np.int32)

    output_dict = {"cond_frame_outputs": {}, "non_cond_frame_outputs": {}}
    ref_masks = []
    with torch.no_grad():
        for t in range(n_frames):
            img = torch.from_numpy(frames[t : t + 1])
            vision_feats, vision_pos, feat_sizes = _ref_features(ref, img)
            if t == 0:
                out = ref.track_step(
                    frame_idx=0, is_init_cond_frame=True,
                    current_vision_feats=vision_feats,
                    current_vision_pos_embeds=vision_pos,
                    feat_sizes=feat_sizes,
                    point_inputs={
                        "point_coords": torch.from_numpy(box_points),
                        "point_labels": torch.from_numpy(box_labels),
                    },
                    mask_inputs=None, output_dict=output_dict,
                    num_frames=n_frames, run_mem_encoder=False,
                )
                mm, mpe = _ref_encode_cond(
                    ref, vision_feats, feat_sizes,
                    out["pred_masks"], out["object_score_logits"],
                )
                output_dict["cond_frame_outputs"][0] = {
                    "maskmem_features": mm, "maskmem_pos_enc": mpe,
                    "pred_masks": out["pred_masks"], "obj_ptr": out["obj_ptr"],
                    "object_score_logits": out["object_score_logits"],
                }
            else:
                out = ref.track_step(
                    frame_idx=t, is_init_cond_frame=False,
                    current_vision_feats=vision_feats,
                    current_vision_pos_embeds=vision_pos,
                    feat_sizes=feat_sizes, point_inputs=None, mask_inputs=None,
                    output_dict=output_dict, num_frames=n_frames,
                    run_mem_encoder=True,
                )
                output_dict["non_cond_frame_outputs"][t] = out
            ref_masks.append(out["pred_masks"].numpy())

    bank = init_bank(cfg, num_objects=1)
    for t in range(n_frames):
        img = jnp.asarray(frames[t : t + 1].transpose(0, 2, 3, 1))
        feats = engine.encode_image(img)
        if t == 0:
            out = engine.prompt_step(
                feats, bank, 0, n_frames,
                jnp.asarray(box_points), jnp.asarray(box_labels), is_init=True,
            )
            bank = engine.encode_cond_memory(
                feats, bank, 0, out["pred_masks"],
                out["object_score_logits"], out["obj_ptr"],
            )
        else:
            bank, out = engine.track_step(feats, bank, t, n_frames)
        np.testing.assert_allclose(
            np.asarray(out["pred_masks"]), ref_masks[t],
            rtol=1e-3, atol=5e-3, err_msg=f"stride-2 frame {t}",
        )
