"""Dense billiards-event fixture: multi-pot, SIMULTANEOUS collisions, and
rebounds on two cushions, with exact P/R/F1 assertions through
EvalDetSAM2PostProcess.eval_all_settings (grid constraints included) —
the eval harness beyond the happy path (reference:
det_sam2_inference/eval_det-sam2.py:95-176, :263-340)."""

import json

import numpy as np
import pytest

from det_sam2_tpu.app.eval import EvalDetSAM2PostProcess, evaluate_video
from det_sam2_tpu.app.postprocess import VideoPostProcessor

H, W = 1080, 1920


def _ball_mask(cx, cy, r=20):
    m = np.zeros((1, H, W), bool)
    yy, xx = np.ogrid[:H, :W]
    m[0] = (xx - cx) ** 2 + (yy - cy) ** 2 <= r * r
    return m


def _pockets():
    out = []
    for cx, cy in [(100, 100), (960, 20), (1820, 100),
                   (100, 720), (960, 720), (1820, 720)]:
        out.append(np.asarray([cx - 30, cy - 30, cx + 30, cy + 30],
                              np.float32))
    return out


def _dense_segments():
    """Scripted scenario with overlapping event types:
      * ball 1 rebounds off the RIGHT cushion (apex t=3);
      * ball 8 rebounds off the BOTTOM cushion (apex t=4);
      * balls 2/3 and balls 6/7 collide SIMULTANEOUSLY (both pairs swap
        momentum between t=6 and t=7);
      * ball 4 pots into left_up (disappears at t=10);
      * ball 5 pots into right_down (disappears at t=10);
      * white ball 16 sits still."""
    segs = {}
    for t in range(14):
        frame = {}
        # rebound off right cushion (boundary x=1720, buffer to 1820)
        frame[1] = _ball_mask(1770 - 40 * abs(t - 3), 500)
        # rebound off bottom cushion (boundary y=620, buffer to 720)
        frame[8] = _ball_mask(700, 670 - 35 * abs(t - 4))
        # collision pair A: 2 hits static 3, both separate after t=6
        if t <= 6:
            frame[2] = _ball_mask(600 + 30 * t, 600)
            frame[3] = _ball_mask(850, 600)
        else:
            frame[2] = _ball_mask(780 - 20 * (t - 6), 600)
            frame[3] = _ball_mask(850 + 20 * (t - 6), 600)
        # collision pair B: 6 hits static 7 at the SAME frame
        if t <= 6:
            frame[6] = _ball_mask(1000 + 30 * t, 380)
            frame[7] = _ball_mask(1250, 380)
        else:
            frame[6] = _ball_mask(1180 - 20 * (t - 6), 380)
            frame[7] = _ball_mask(1250 + 20 * (t - 6), 380)
        # pot into left_up: toward (100, 100), gone at t=10
        if t < 10:
            frame[4] = _ball_mask(400 - 30 * t, 550 - 45 * t)
        # pot into right_down: toward (1820, 720), gone at t=10
        if t < 10:
            frame[5] = _ball_mask(1600 + 20 * t, 500 + 20 * t)
        frame[16] = _ball_mask(1000, 900)
        segs[t] = frame
    return segs


@pytest.fixture(scope="module")
def post_done():
    post = VideoPostProcessor()
    post.get_hole_name(_pockets())
    post.get_boundary_from_holes()
    post.run(_dense_segments())
    return post


def test_dense_events_detected(post_done):
    post = post_done
    # both pots, with the right holes
    assert post.disappeared_balls[4]["hole"] == "left_up"
    assert post.disappeared_balls[5]["hole"] == "right_down"
    assert set(post.disappeared_balls) == {4, 5}
    # both collision pairs fire at the SAME frame
    pairs = {
        (f, tuple(sorted(p)))
        for f, ps in post.ball_collision.items()
        for p in ps
    }
    frames_23 = {f for f, p in pairs if p == (2, 3)}
    frames_67 = {f for f, p in pairs if p == (6, 7)}
    assert frames_23 and frames_23 == frames_67
    # collision detection must not cross-pair distant balls
    assert {p for _, p in pairs} == {(2, 3), (6, 7)}
    # the two rebounds, on the right sides
    sides = {(b, s) for items in post.ball_rebound.values()
             for b, s in items}
    assert (1, "right") in sides
    assert (8, "bottom") in sides
    assert {b for b, _ in sides} == {1, 8}


def test_exact_metrics_full_and_partial_gt(post_done):
    full_gt = {
        "pot": {"4": "left_up", "5": "right_down"},
        "collision": [[2, 3], [6, 7]],
        "rebound": {"1": ["right"], "8": ["bottom"]},
    }
    m = evaluate_video(post_done, full_gt)
    for event in ("pot", "collision", "rebound"):
        assert m[event] == {"precision": 1.0, "recall": 1.0, "f1": 1.0}, event

    # partial GT with known exact P/R/F1: one matched pot + one GT-only
    # pot (fn) vs one extra prediction (fp) -> P=R=F1=0.5; one of two
    # collisions in GT -> P=0.5, R=1.0, F1=2/3; rebounds: GT has an extra
    # side -> P=1.0, R=2/3, F1=0.8
    partial_gt = {
        "pot": {"4": "left_up", "9": "left_down"},
        "collision": [[2, 3]],
        "rebound": {"1": ["right"], "8": ["bottom", "left"]},
    }
    m = evaluate_video(post_done, partial_gt)
    assert m["pot"] == {"precision": 0.5, "recall": 0.5, "f1": 0.5}
    assert m["collision"]["precision"] == 0.5
    assert m["collision"]["recall"] == 1.0
    assert m["collision"]["f1"] == pytest.approx(2 / 3)
    assert m["rebound"]["precision"] == 1.0
    assert m["rebound"]["recall"] == pytest.approx(2 / 3)
    assert m["rebound"]["f1"] == pytest.approx(0.8)


class _ReplayProcessor:
    """Stub VideoProcessor: replays the scripted segments (the eval
    harness contract is run() + special_classes_detection +
    video_segments + pre_frames)."""

    def __init__(self):
        self.pre_frames = 0
        self.video_segments = {}
        self.special_classes_detection = []

    def run(self, source):
        self.video_segments = _dense_segments()
        self.special_classes_detection = _pockets()


def test_eval_all_settings_dense(tmp_path):
    gt_path = tmp_path / "postprocess.jsonl"
    gt_path.write_text(
        json.dumps({
            "video": "dense",
            "pot": {"4": "left_up", "5": "right_down"},
            "collision": [[2, 3], [6, 7]],
            "rebound": {"1": ["right"], "8": ["bottom"]},
        }) + "\n"
    )

    built = []

    def factory(**params):
        built.append(params)
        return _ReplayProcessor(), VideoPostProcessor()

    ev = EvalDetSAM2PostProcess(factory)
    grid = {
        "frame_buffer_size": [30],
        "detect_interval": [30, 0],  # 0 invalid without preload
        "max_frame_num_to_track": [20, 60],  # 20 invalid (< buffer)
        "max_inference_state_frames": [40, 60],  # 40 invalid (< track 60)
    }
    results = ev.eval_all_settings(
        {"dense": None}, str(gt_path), str(tmp_path), grid
    )
    # constraints (eval_det-sam2.py:134-143): only detect=30, track=60,
    # state=60 survives out of 8 combos
    assert len(results) == 1
    assert built and all(p["max_frame_num_to_track"] == 60 for p in built)
    avg = results[0]["average_results"]
    for event in ("pot", "collision", "rebound"):
        assert avg[event] == {"precision": 1.0, "recall": 1.0, "f1": 1.0}
    # results persisted (appended) to eval_results.json
    with open(tmp_path / "eval_results.json") as f:
        assert len(json.load(f)) == 1
