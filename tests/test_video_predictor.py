"""Full state-machine parity: our SAM2VideoPredictor vs the reference
SAM2VideoPredictor driven identically (init -> box prompt -> propagate
forward -> streaming append -> new prompt -> reverse propagate)."""

import numpy as np
import pytest
import torch

from det_sam2_tpu.configs import tiny_test_config
from det_sam2_tpu.convert import convert_sam2_base
from det_sam2_tpu.track import SAM2Engine
from det_sam2_tpu.video_predictor import SAM2VideoPredictor

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
H_VID, W_VID = 96, 112  # non-square video resolution


def _make_frames(n, seed=0):
    rng = np.random.default_rng(seed)
    # smooth-ish uint8 RGB frames with a moving bright square
    frames = []
    base = rng.integers(0, 80, (H_VID, W_VID, 3), np.uint8)
    for t in range(n):
        f = base.copy()
        x = 10 + 6 * t
        y = 20 + 3 * t
        f[y : y + 30, x : x + 30] = (220, 40, 40)
        frames.append(f)
    return frames


@pytest.fixture(scope="module")
def predictors():
    load_reference()
    # the reference's loader probes os.path.isfile on every list element
    # (misc.py:301) which raises TypeError for ndarrays on modern numpy;
    # make it tolerant so the fork's list-of-frames path is reachable
    import os.path as _osp

    _orig_isfile = _osp.isfile

    def _safe_isfile(p):
        try:
            return isinstance(p, (str, bytes, int)) and _orig_isfile(p)
        except TypeError:
            return False

    _osp.isfile = _safe_isfile

    from sam2.sam2_video_predictor import SAM2VideoPredictor as RefVP

    torch.set_num_threads(1)
    ref = build_reference_sam2(CFG, cls=RefVP, fill_hole_area=0)
    # the fork dropped this upstream ctor param; prompting an
    # already-tracked frame crashes without it (reference latent bug)
    ref.add_all_frames_to_correct_as_cond = False
    params = convert_sam2_base(torch_sd(ref), CFG)
    engine = SAM2Engine(CFG, params=params)
    mine = SAM2VideoPredictor(engine)
    return ref, mine


def _iou(a, b):
    inter = np.logical_and(a, b).sum()
    union = np.logical_or(a, b).sum()
    return inter / max(union, 1)


@pytest.mark.slow
def test_video_predictor_state_machine_parity(predictors):
    ref, mine = predictors
    frames = _make_frames(6)

    # --- reference ---
    with torch.no_grad():
        rstate = ref.init_state(
            frames[:4], offload_video_to_cpu=False, offload_state_to_cpu=False
        )
        _, _, rmask0 = ref.add_new_points_or_box(
            rstate, frame_idx=0, obj_id=1, box=np.array([8.0, 18.0, 44.0, 52.0])
        )
        ref_masks = {}
        for fidx, _, masks in ref.propagate_in_video(
            rstate, start_frame_idx=0, max_frame_num_to_track=3, reverse=False
        ):
            ref_masks[fidx] = masks.cpu().numpy()
        # streaming append + second prompt + reverse propagation
        ref.update_state(frames[4:], rstate)
        ref.add_new_points_or_box(
            rstate, frame_idx=4, obj_id=1,
            box=np.array([8.0 + 24, 18.0 + 12, 44.0 + 24, 52.0 + 12]),
        )
        ref_masks_rev = {}
        for fidx, _, masks in ref.propagate_in_video(
            rstate, start_frame_idx=4, max_frame_num_to_track=4, reverse=True
        ):
            ref_masks_rev[fidx] = masks.cpu().numpy()

    # --- ours ---
    session = mine.init_state(frames[:4])
    _, _, mmask0 = mine.add_new_points_or_box(
        session, frame_idx=0, obj_id=1, box=np.array([8.0, 18.0, 44.0, 52.0])
    )
    my_masks = {}
    for fidx, _, masks in mine.propagate_in_video(
        session, start_frame_idx=0, max_frame_num_to_track=3, reverse=False
    ):
        my_masks[fidx] = masks[: 1]  # active objects only
    mine.update_state(frames[4:], session)
    mine.add_new_points_or_box(
        session, frame_idx=4, obj_id=1,
        box=np.array([8.0 + 24, 18.0 + 12, 44.0 + 24, 52.0 + 12]),
    )
    my_masks_rev = {}
    for fidx, _, masks in mine.propagate_in_video(
        session, start_frame_idx=4, max_frame_num_to_track=4, reverse=True
    ):
        my_masks_rev[fidx] = masks[: 1]

    # prompt-frame output parity
    np.testing.assert_allclose(
        mmask0[:1], rmask0.cpu().numpy(), rtol=1e-2, atol=5e-2
    )
    assert set(my_masks) == set(ref_masks)
    assert set(my_masks_rev) == set(ref_masks_rev)
    for fidx in ref_masks:
        a = my_masks[fidx][0, 0] > 0
        b = ref_masks[fidx][0, 0] > 0
        union = np.logical_or(a, b).sum()
        if union > 0:
            assert _iou(a, b) > 0.99, f"fwd frame {fidx}: IoU {_iou(a, b)}"
        np.testing.assert_allclose(
            my_masks[fidx][0, 0], ref_masks[fidx][0, 0], rtol=1e-2, atol=5e-2,
            err_msg=f"fwd frame {fidx} logits",
        )
    for fidx in ref_masks_rev:
        a = my_masks_rev[fidx][0, 0] > 0
        b = ref_masks_rev[fidx][0, 0] > 0
        union = np.logical_or(a, b).sum()
        if union > 0:
            assert _iou(a, b) > 0.99, f"rev frame {fidx}: IoU {_iou(a, b)}"


@pytest.mark.slow
def test_online_new_object_addition(predictors):
    """Fork feature: adding a new object id after tracking has started."""
    ref, mine = predictors
    frames = _make_frames(6, seed=3)

    with torch.no_grad():
        rstate = ref.init_state(
            frames, offload_video_to_cpu=False, offload_state_to_cpu=False
        )
        ref.add_new_points_or_box(
            rstate, frame_idx=0, obj_id=1, box=np.array([8.0, 18.0, 44.0, 52.0])
        )
        for _ in ref.propagate_in_video(
            rstate, start_frame_idx=0, max_frame_num_to_track=3, reverse=False
        ):
            pass
        # new object id after tracking started (fork path :224-333); the
        # fork's app always reverse-propagates after prompting (stale
        # forward memories from before the object existed would be
        # shape-inconsistent in the reference)
        ref.add_new_points_or_box(
            rstate, frame_idx=3, obj_id=2,
            box=np.array([40.0, 20.0, 80.0, 60.0]),
        )
        ref_out = {}
        for fidx, _, masks in ref.propagate_in_video(
            rstate, start_frame_idx=3, max_frame_num_to_track=4, reverse=True
        ):
            ref_out[fidx] = masks.cpu().numpy()

    session = mine.init_state(frames)
    mine.add_new_points_or_box(
        session, frame_idx=0, obj_id=1, box=np.array([8.0, 18.0, 44.0, 52.0])
    )
    for _ in mine.propagate_in_video(
        session, start_frame_idx=0, max_frame_num_to_track=3, reverse=False
    ):
        pass
    mine.add_new_points_or_box(
        session, frame_idx=3, obj_id=2, box=np.array([40.0, 20.0, 80.0, 60.0])
    )
    my_out = {}
    for fidx, _, masks in mine.propagate_in_video(
        session, start_frame_idx=3, max_frame_num_to_track=4, reverse=True
    ):
        my_out[fidx] = masks[:2]

    assert set(my_out) == set(ref_out)
    for fidx in ref_out:
        for obj in range(2):
            a = my_out[fidx][obj, 0] > 0
            b = ref_out[fidx][obj, 0] > 0
            union = np.logical_or(a, b).sum()
            if union > 20:
                assert _iou(a, b) > 0.98, (
                    f"frame {fidx} obj {obj}: IoU {_iou(a, b)}"
                )


@pytest.mark.slow
def test_two_objects_same_frame_parity(predictors):
    """Two objects prompted on the same frame -> consolidation across the
    object batch must match the reference."""
    ref, mine = predictors
    frames = _make_frames(5, seed=7)
    # add a second moving square so object 2 has signal
    for t, f in enumerate(frames):
        x = 60 + 4 * t
        f[60:85, x : x + 22] = (40, 220, 60)

    b1 = np.array([8.0, 18.0, 44.0, 52.0])
    b2 = np.array([58.0, 58.0, 84.0, 87.0])
    with torch.no_grad():
        rstate = ref.init_state(
            frames, offload_video_to_cpu=False, offload_state_to_cpu=False
        )
        ref.add_new_points_or_box(rstate, 0, 1, box=b1)
        ref.add_new_points_or_box(rstate, 0, 2, box=b2)
        ref_out = {}
        for fidx, _, masks in ref.propagate_in_video(
            rstate, start_frame_idx=0, max_frame_num_to_track=4
        ):
            ref_out[fidx] = masks.cpu().numpy()

    session = mine.init_state(frames)
    mine.add_new_points_or_box(session, 0, 1, box=b1)
    mine.add_new_points_or_box(session, 0, 2, box=b2)
    my_out = {}
    for fidx, _, masks in mine.propagate_in_video(
        session, start_frame_idx=0, max_frame_num_to_track=4
    ):
        my_out[fidx] = masks[:2]

    assert set(my_out) == set(ref_out)
    for fidx in ref_out:
        for obj in range(2):
            a = my_out[fidx][obj, 0] > 0
            b = ref_out[fidx][obj, 0] > 0
            union = np.logical_or(a, b).sum()
            if union > 20:
                assert _iou(a, b) > 0.99, (
                    f"frame {fidx} obj {obj}: IoU {_iou(a, b)}"
                )


@pytest.mark.slow
def test_mask_prompt_parity(predictors):
    """add_new_mask (use_mask_input_as_output_without_sam path) parity."""
    ref, mine = predictors
    frames = _make_frames(4, seed=11)
    gt = np.zeros((H_VID, W_VID), bool)
    gt[20:50, 10:40] = True

    with torch.no_grad():
        rstate = ref.init_state(
            frames, offload_video_to_cpu=False, offload_state_to_cpu=False
        )
        _, _, rmask = ref.add_new_mask(rstate, 0, 1, torch.from_numpy(gt))
        ref_out = {}
        for fidx, _, masks in ref.propagate_in_video(
            rstate, start_frame_idx=0, max_frame_num_to_track=3
        ):
            ref_out[fidx] = masks.cpu().numpy()

    session = mine.init_state(frames)
    _, _, mmask = mine.add_new_mask(session, 0, 1, gt)
    np.testing.assert_allclose(
        mmask[:1], rmask.cpu().numpy(), rtol=1e-2, atol=5e-2
    )
    my_out = {}
    for fidx, _, masks in mine.propagate_in_video(
        session, start_frame_idx=0, max_frame_num_to_track=3
    ):
        my_out[fidx] = masks[:1]
    for fidx in ref_out:
        a = my_out[fidx][0, 0] > 0
        b = ref_out[fidx][0, 0] > 0
        if np.logical_or(a, b).sum() > 0:
            assert _iou(a, b) > 0.99, f"frame {fidx}: IoU {_iou(a, b)}"
