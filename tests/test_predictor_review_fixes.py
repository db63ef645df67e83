"""Regression tests for the round-3 predictor/build review fixes.

Covers: batched box prompts on predict() (reference _predict :393-406),
normalize_coords=False semantics (transforms.py transform_coords scales to
model pixels unconditionally), sprinkle components computed on the ORIGINAL
mask (transforms.py postprocess_masks builds mask_flat once), box_batch on
the same-image predict_batch path, AMG's temporary (not permanent)
predictor fill-area override, build image_size override deriving the RoPE
grid, clear_all_prompts_in_frame bookkeeping (reference :1090-1110), the
tracked_ranges direction stamp, and save_session consolidating pending
prompts."""

import numpy as np
import pytest

from det_sam2_tpu.build import _resolve_cfg
from det_sam2_tpu.configs import tiny_test_config
from det_sam2_tpu.image_predictor import SAM2ImagePredictor
from det_sam2_tpu.ops.connected_components import fill_holes_and_sprinkles_np
from det_sam2_tpu.track import SAM2Engine
from det_sam2_tpu.video_predictor import InferenceSession, SAM2VideoPredictor

H, W = 96, 128


@pytest.fixture(scope="module")
def engine():
    return SAM2Engine(tiny_test_config())


@pytest.fixture(scope="module")
def predictor(engine):
    return SAM2ImagePredictor(engine)


@pytest.fixture(scope="module")
def video_predictor(engine):
    return SAM2VideoPredictor(engine)


def _two_square_image():
    img = np.full((H, W, 3), 20, np.uint8)
    img[20:44, 10:40] = (220, 40, 40)
    img[60:88, 70:110] = (40, 220, 40)
    return img


def test_predict_batched_boxes(predictor):
    predictor.set_image(_two_square_image())
    boxes = np.asarray([[10, 20, 40, 44], [70, 60, 110, 88]], np.float32)
    masks, ious, low = predictor.predict(box=boxes, multimask_output=False)
    # reference semantics: B prompt rows -> BxCxHxW (no squeeze for B>1)
    assert masks.shape == (2, 1, H, W)
    assert ious.shape == (2, 1)
    m0, m1 = masks[0, 0], masks[1, 0]
    # each mask concentrates inside its own box
    assert m0[22:42, 12:38].mean() > 0.5 * max(m0.mean(), 1e-6)
    assert not np.array_equal(m0, m1)
    # single box still squeezes like the reference
    masks1, ious1, _ = predictor.predict(
        box=boxes[0], multimask_output=False
    )
    assert masks1.shape == (1, H, W)
    np.testing.assert_allclose(masks1[0], m0)


def test_predict_box_and_point_batches_must_pair(predictor):
    predictor.set_image(_two_square_image())
    boxes = np.asarray([[10, 20, 40, 44], [70, 60, 110, 88]], np.float32)
    pts = np.asarray([[[25, 30]]], np.float32)  # batch 1 vs box batch 2
    with pytest.raises(ValueError, match="box batch"):
        predictor.predict(point_coords=pts,
                          point_labels=np.asarray([[1]]), box=boxes)


def test_normalize_coords_false_means_unit_range(predictor):
    predictor.set_image(_two_square_image())
    # the same physical click expressed both ways must agree exactly
    px = np.asarray([[25.0, 30.0]], np.float32)
    unit = px / np.asarray([W, H], np.float32)
    m_px, i_px, _ = predictor.predict(
        point_coords=px, point_labels=np.asarray([1]),
        multimask_output=False, normalize_coords=True,
    )
    m_unit, i_unit, _ = predictor.predict(
        point_coords=unit, point_labels=np.asarray([1]),
        multimask_output=False, normalize_coords=False,
    )
    np.testing.assert_allclose(m_px, m_unit)
    np.testing.assert_allclose(i_px, i_unit)


def test_predict_batch_same_image_uses_boxes(predictor):
    predictor.set_image(_two_square_image())
    boxes = np.asarray([[10, 20, 40, 44], [70, 60, 110, 88]], np.float32)
    bm, bi, _ = predictor.predict_batch(
        box_batch=boxes, multimask_output=False
    )
    sm, si, _ = predictor.predict(box=boxes, multimask_output=False)
    np.testing.assert_allclose(np.asarray(bm), np.asarray(sm))
    # and boxes must not be silently dropped when points are also given
    pts = np.asarray([[[25, 30]], [[90, 74]]], np.float32)
    lbl = np.asarray([[1], [1]], np.int32)
    with_box, _, _ = predictor.predict_batch(
        point_coords_batch=pts, point_labels_batch=lbl, box_batch=boxes,
        multimask_output=False,
    )
    no_box, _, _ = predictor.predict_batch(
        point_coords_batch=pts, point_labels_batch=lbl,
        multimask_output=False,
    )
    assert not np.array_equal(np.asarray(with_box), np.asarray(no_box))


def test_sprinkle_pass_uses_original_mask():
    # a hole (area 1) INSIDE fg, and a sprinkle (area 1) diagonally
    # adjacent to the hole: on the original mask the sprinkle is its own
    # 1-px fg component -> removed; if components were recomputed on the
    # hole-FILLED mask it would merge with the patch and survive
    m = -np.ones((1, 8, 8), np.float32)
    m[0, 2:5, 2:5] = 1.0     # fg block
    m[0, 3, 3] = -1.0        # 1-px hole inside it
    # carve a diagonal channel so the sprinkle is 8-connected to the hole
    # position but NOT to the fg block
    m[0, 5, 5] = -1.0
    m[0, 4, 4] = -1.0        # enlarge hole region corner
    m[0, 5, 6] = 1.0         # the sprinkle (its own component)
    m[0, 4, 5] = -1.0
    m[0, 5, 4] = -1.0
    m[0, 6, 5] = -1.0
    m[0, 6, 6] = -1.0
    m[0, 4, 6] = -1.0
    m[0, 6, 4] = -1.0
    out = fill_holes_and_sprinkles_np(m, 0.0, 4.0, 2.0)
    assert out[0, 5, 6] < 0.0, "sprinkle must be removed (original-mask CC)"


def test_amg_restores_predictor_fill_areas(predictor):
    from det_sam2_tpu.automatic_mask_generator import (
        SAM2AutomaticMaskGenerator,
    )

    predictor.max_hole_area = 0.0
    predictor.max_sprinkle_area = 0.0
    amg = SAM2AutomaticMaskGenerator(
        predictor, points_per_side=2, min_mask_region_area=25,
        pred_iou_thresh=0.0, stability_score_thresh=0.0,
    )
    assert predictor.max_hole_area == 0.0  # constructor no longer mutates
    amg.generate(_two_square_image())
    assert predictor.max_hole_area == 0.0
    assert predictor.max_sprinkle_area == 0.0


def test_build_image_size_override_derives_rope():
    cfg = _resolve_cfg("hiera_s", image_size=768)
    s = 768 // cfg.backbone_stride
    assert cfg.image_size == 768
    assert cfg.memory_attention.rope_feat_sizes == (s, s)
    base = tiny_test_config()
    cfg2 = _resolve_cfg(base, image_size=256)
    assert cfg2.memory_attention.rope_feat_sizes == (
        256 // base.backbone_stride, 256 // base.backbone_stride)


def _frames(n):
    out = []
    for t in range(n):
        f = np.full((H, W, 3), 30, np.uint8)
        f[20:50, 8 + 3 * t: 32 + 3 * t] = (200, 30, 30)
        out.append(f)
    return out


def test_clear_all_prompts_bookkeeping(video_predictor):
    vp = video_predictor
    session = vp.init_state(np.stack(_frames(6)))
    vp.add_new_points_or_box(
        session, frame_idx=0, obj_id=1,
        box=np.asarray([8, 20, 32, 50], np.float32),
    )
    list(vp.propagate_in_video(session, 0, 3))
    # correction on a tracked frame -> consolidated as non-cond
    vp.add_new_points_or_box(
        session, frame_idx=2, obj_id=1,
        points=np.asarray([[20.0, 35.0]], np.float32),
        labels=np.asarray([1], np.int32),
    )
    vp.propagate_in_video_preflight(session)
    assert 2 in session.consolidated_noncond
    vp.clear_all_prompts_in_frame(session, 2, 1)
    # the cleared correction leaves the consolidated set (reference
    # :1090-1094) so propagation re-infers frame 2
    assert 2 not in session.consolidated_noncond
    # clearing the ONLY cond frame resets tracking but keeps the object
    vp.clear_all_prompts_in_frame(session, 0, 1)
    assert session.cond_outputs == {}
    assert session.noncond_outputs == {}
    assert not session.tracking_has_started
    assert session.frames_already_tracked == {}
    assert 1 in session.obj_id_to_idx  # objects stay registered
    # session is reusable: prompt + propagate again from scratch
    vp.add_new_points_or_box(
        session, frame_idx=0, obj_id=1,
        box=np.asarray([8, 20, 32, 50], np.float32),
    )
    outs = list(vp.propagate_in_video(session, 0, 2))
    assert [o[0] for o in outs] == [0, 1, 2]


def test_demoted_cond_frame_leaves_frames_tracked(video_predictor):
    vp = video_predictor
    session = vp.init_state(np.stack(_frames(6)))
    vp.add_new_points_or_box(
        session, frame_idx=0, obj_id=1,
        box=np.asarray([8, 20, 32, 50], np.float32),
    )
    # second cond frame via a correction treated as cond
    vp.add_new_points_or_box(
        session, frame_idx=3, obj_id=1,
        box=np.asarray([17, 20, 41, 50], np.float32),
    )
    list(vp.propagate_in_video(session, 0, 5))
    assert 3 in session.cond_outputs and 3 in session.frames_already_tracked
    vp.clear_all_prompts_in_frame(session, 3, 1)
    # demoted cond frame: no longer cond, no longer "tracked" (a fresh
    # prompt on it must be an init cond frame, not a correction)
    assert 3 not in session.cond_outputs
    assert 3 in session.noncond_outputs
    assert 3 not in session.frames_already_tracked


def test_tracked_ranges_latest_direction_wins():
    session = InferenceSession(tiny_test_config(), H, W)
    session.frames_already_tracked.update(
        {i: {"reverse": False} for i in range(0, 5)}
    )
    session.compact_tracked(10)
    assert session.tracked_info(3) == {"reverse": False}
    # frame 3 re-tracked in REVERSE, then released again
    session.frames_already_tracked[3] = {"reverse": True}
    session.compact_tracked(10)
    assert session.tracked_info(3)["reverse"] is True
    assert session.tracked_info(2)["reverse"] is False
    assert session.tracked_info(4)["reverse"] is False


def test_save_session_consolidates_pending_prompts(
    video_predictor, tmp_path
):
    vp = video_predictor
    session = vp.init_state(np.stack(_frames(4)))
    vp.add_new_points_or_box(
        session, frame_idx=0, obj_id=1,
        box=np.asarray([8, 20, 32, 50], np.float32),
    )
    # save BEFORE any propagation: the prompt lives only in temp stores
    p = tmp_path / "sess.pkl"
    vp.save_session(session, str(p))
    loaded = vp.load_session_as_preload(str(p))
    assert loaded.cond_outputs, "pending prompt must be consolidated"
    assert loaded.bank is not None
    assert 1 in loaded.obj_id_to_idx
