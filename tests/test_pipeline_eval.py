"""Async pipeline + evaluation harness over a synthetic billiards fixture."""

import json

import numpy as np
import pytest

from det_sam2_tpu.app.detector import CallableDetector
from det_sam2_tpu.app.eval import (
    EvalDetSAM2PostProcess,
    evaluate_video,
    precision_recall_f1,
)
from det_sam2_tpu.app.pipeline import DetSAM2Pipeline
from det_sam2_tpu.app.postprocess import VideoPostProcessor
from det_sam2_tpu.app.video_processor import VideoProcessor
from det_sam2_tpu.configs import tiny_test_config
from det_sam2_tpu.track import SAM2Engine
from det_sam2_tpu.video_predictor import SAM2VideoPredictor

H, W = 96, 128


def _frames(n):
    frames = []
    for t in range(n):
        f = np.full((H, W, 3), 30, np.uint8)
        x = 8 + 3 * t
        f[20:50, x : x + 24] = (200, 30, 30)
        frames.append(f)
    return frames


def _detector():
    def det(frame, idx):
        x = 8 + 3 * idx
        dets = [(x, 20, x + 24, 50, 5, 0.99)]
        for cx, cy in [(10, 10), (W // 2, 5), (W - 10, 10),
                       (10, H - 10), (W // 2, H - 10), (W - 10, H - 10)]:
            dets.append((cx - 5, cy - 5, cx + 5, cy + 5, 11, 0.9))
        return dets

    return CallableDetector(det)


@pytest.fixture(scope="module")
def predictor():
    return SAM2VideoPredictor(SAM2Engine(tiny_test_config()))


@pytest.mark.slow
def test_async_pipeline_runs(predictor):
    # six pockets -> postprocess thread starts; small table geometry
    anchors = {
        "left_up": (10, 10), "middle_up": (W // 2, 5), "right_up": (W - 10, 10),
        "left_down": (10, H - 10), "middle_down": (W // 2, H - 10),
        "right_down": (W - 10, H - 10),
    }
    vp = VideoProcessor(
        predictor=predictor,
        detector=_detector(),
        skip_classes={11},
        frame_buffer_size=4,
        detect_interval=4,
        max_frame_num_to_track=8,
        max_inference_state_frames=8,
    )
    pipe = DetSAM2Pipeline(
        vp,
        VideoPostProcessor(hole_anchors=anchors, table_margin=10.0),
        max_inference_state_frames=8,
    )
    post = pipe.inference(_frames(12))
    assert pipe.postprocess_started.is_set()
    assert pipe.inference_done.is_set()
    # every delivered frame was position-processed
    assert len(post.balls_positions) >= 12
    assert isinstance(post.events(), dict)


@pytest.mark.slow
def test_pipeline_late_first_detection(predictor):
    """The detector first fires mid-stream: the first reverse window starts
    past frame 0, so the postprocessor anchors at the first delivered frame
    instead of crashing on a 'gap' (reference drops such frames silently,
    Det_SAM2_pipeline.py:190)."""
    anchors = {
        "left_up": (10, 10), "middle_up": (W // 2, 5), "right_up": (W - 10, 10),
        "left_down": (10, H - 10), "middle_down": (W // 2, H - 10),
        "right_down": (W - 10, H - 10),
    }

    def det(frame, idx):
        dets = []
        for cx, cy in anchors.values():
            dets.append((cx - 5, cy - 5, cx + 5, cy + 5, 11, 0.9))
        if idx >= 8:  # ball only detected from frame 8 on
            x = 8 + 3 * idx
            dets.append((x, 20, x + 24, 50, 5, 0.99))
        return dets

    vp = VideoProcessor(
        predictor=predictor,
        detector=CallableDetector(det),
        skip_classes={11},
        frame_buffer_size=4,
        detect_interval=4,
        max_frame_num_to_track=8,
        max_inference_state_frames=8,
    )
    pipe = DetSAM2Pipeline(
        vp, VideoPostProcessor(hole_anchors=anchors, table_margin=10.0),
        max_inference_state_frames=8,
    )
    post = pipe.inference(_frames(12))
    assert pipe.inference_done.is_set()
    assert not pipe._errors
    assert pipe.skipped_frames == []
    # frames before the first reverse window were never delivered
    assert 0 not in post.balls_positions
    assert any(k >= 8 for k in post.balls_positions)


def test_pipeline_rejects_truncating_saved_session(tmp_path, predictor):
    """A VideoProcessor saving a session keeps all frames; the pipeline must
    not silently re-enable eviction (which would truncate the saved
    session)."""
    vp = VideoProcessor(
        predictor=predictor,
        save_session_path=str(tmp_path / "sess.pkl"),
        max_inference_state_frames=-1,
    )
    with pytest.raises(ValueError, match="save_session_path"):
        DetSAM2Pipeline(vp)
    pipe = DetSAM2Pipeline(vp, max_inference_state_frames=-1)
    assert vp.max_inference_state_frames == -1


def test_velocity_towards_hole_frame1_no_velocities():
    """A ball disappearing at frame 1 (velocities start at frame 1) must
    not KeyError on the missing frame-0 velocities."""
    anchors = {
        "left_up": (10, 10), "middle_up": (60, 5), "right_up": (120, 10),
        "left_down": (10, 90), "middle_down": (60, 90), "right_down": (120, 90),
    }
    post = VideoPostProcessor(hole_anchors=anchors, table_margin=10.0)
    post.get_hole_name([np.array([5, 5, 15, 15]), np.array([55, 0, 65, 10]),
                        np.array([115, 5, 125, 15]), np.array([5, 85, 15, 95]),
                        np.array([55, 85, 65, 95]), np.array([115, 85, 125, 95])])
    post.get_boundary_from_holes()
    m = np.zeros((96, 128), bool)
    m[8:14, 8:14] = True  # ball near the left_up hole
    post.process_single_frame(0, {3: m})
    post.process_single_frame(1, {3: np.zeros((96, 128), bool)})  # vanishes
    assert isinstance(post.events(), dict)  # no KeyError


def test_precision_recall_f1_edge_cases():
    assert precision_recall_f1(set(), set()) == (1.0, 1.0, 1.0)
    p, r, f = precision_recall_f1({1, 2}, {2, 3})
    assert (p, r) == (0.5, 0.5) and abs(f - 0.5) < 1e-9


def test_evaluate_video_metrics():
    post = VideoPostProcessor()
    post.disappeared_balls = {4: {"last_frame": 9, "hole": "left_up",
                                  "last_position": (0, 0)}}
    post.ball_collision = {7: [(2, 3), (3, 2)]}
    post.ball_rebound = {6: [(1, "right")]}
    gt = {
        "pot": {"4": "left_up"},
        "collision": [[2, 3]],
        "rebound": {"1": ["right"], "2": ["top"]},
    }
    out = evaluate_video(post, gt)
    assert out["pot"]["f1"] == 1.0
    assert out["collision"]["f1"] == 1.0
    assert out["rebound"]["precision"] == 1.0
    assert out["rebound"]["recall"] == 0.5


@pytest.mark.slow
def test_eval_grid_search(tmp_path, predictor):
    def factory(**params):
        vp = VideoProcessor(
            predictor=predictor,
            detector=_detector(),
            skip_classes={11},
            frame_buffer_size=params["frame_buffer_size"],
            detect_interval=params["detect_interval"],
            max_frame_num_to_track=params["max_frame_num_to_track"],
            max_inference_state_frames=params["max_inference_state_frames"],
        )
        anchors = {
            "left_up": (10, 10), "middle_up": (W // 2, 5),
            "right_up": (W - 10, 10), "left_down": (10, H - 10),
            "middle_down": (W // 2, H - 10), "right_down": (W - 10, H - 10),
        }
        pp = VideoPostProcessor(hole_anchors=anchors, table_margin=10.0)
        return vp, pp

    gt_path = tmp_path / "postprocess.jsonl"
    gt_path.write_text(
        json.dumps({"video": "synthetic", "pot": {}, "collision": [],
                    "rebound": {}}) + "\n"
    )
    ev = EvalDetSAM2PostProcess(factory)
    grid = {
        "frame_buffer_size": [4],
        "detect_interval": [4],
        "max_frame_num_to_track": [8, 2],  # 2 is invalid (< buffer) -> skipped
        "max_inference_state_frames": [8],
        "load_inference_state_path": [None],
    }
    results = ev.eval_all_settings(
        {"synthetic": _frames(8)}, str(gt_path), str(tmp_path), grid
    )
    assert len(results) == 1  # only the valid combo ran
    assert "pot" in results[0]["average_results"]
