"""Postprocessor event parity vs the reference VideoPostProcessor."""

import importlib.util


import numpy as np
import pytest

from det_sam2_tpu.app.postprocess import VideoPostProcessor

from torch_ref import REFERENCE_ROOT, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)

H, W = 1080, 1920


def _load_ref_postprocessor():
    # (postprocess_det_sam2.py has a stray `from sympy import andre`; the
    # real sympy satisfies it)
    spec = importlib.util.spec_from_file_location(
        "ref_postprocess",
        f"{REFERENCE_ROOT}/det_sam2_inference/postprocess_det_sam2.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.VideoPostProcessor


def _ball_mask(cx, cy, r=20):
    m = np.zeros((1, H, W), bool)
    yy, xx = np.ogrid[:H, :W]
    m[0] = (xx - cx) ** 2 + (yy - cy) ** 2 <= r * r
    return m


def _make_segments():
    """Scripted scenario: ball 1 rolls right and rebounds off the right
    cushion; ball 2 collides with ball 3; ball 4 pots into left_up."""
    segs = {}
    for t in range(14):
        frame = {}
        # ball 1: crosses into the right buffer zone and bounces back
        # (right cushion at x=1720; buffer extends to 1820)
        x1 = 1770 - 40 * abs(t - 3)
        frame[1] = _ball_mask(x1, 500)
        # ball 2 approaches static ball 3, then both separate
        if t <= 6:
            frame[2] = _ball_mask(600 + 30 * t, 600)
            frame[3] = _ball_mask(850, 600)
        else:
            frame[2] = _ball_mask(780 - 20 * (t - 6), 600)
            frame[3] = _ball_mask(850 + 20 * (t - 6), 600)
        # ball 4 rolls straight at the left_up hole and disappears at t=10
        if t < 10:
            frame[4] = _ball_mask(400 - 30 * t, 550 - 45 * t)
        # white ball sits still somewhere
        frame[16] = _ball_mask(1000, 900)
        segs[t] = frame
    return segs


@pytest.fixture(scope="module")
def pockets():
    # six pocket boxes around the canonical anchors
    out = []
    for cx, cy in [(100, 100), (960, 20), (1820, 100),
                   (100, 720), (960, 720), (1820, 720)]:
        out.append(np.asarray([cx - 30, cy - 30, cx + 30, cy + 30], np.float32))
    return out


def test_event_parity_with_reference(pockets):
    RefPP = _load_ref_postprocessor()
    segs = _make_segments()

    ref = RefPP()
    ref.get_hole_name(pockets)
    ref.get_boundary_from_holes()

    mine = VideoPostProcessor()
    mine.get_hole_name(pockets)
    mine.get_boundary_from_holes()

    # reference runs from a pickle path; give it the dict via a temp pkl
    import pickle
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".pkl", delete=False) as f:
        pickle.dump(segs, f)
        path = f.name
    ref.run(path)
    mine.run(segs)

    assert mine.effective_boundary == tuple(ref.effective_boundary)
    assert sorted(mine.hole_names_and_positions) == sorted(
        ref.hole_names_and_positions
    )

    # positions identical on every frame
    for t in segs:
        assert mine.balls_positions[t] == ref.balls_positions[t], f"frame {t}"
    for t in mine.balls_velocities:
        assert mine.balls_velocities[t] == ref.balls_velocities[t], f"frame {t}"

    # events identical
    assert mine.disappeared_balls == ref.disappeared_balls
    assert mine.ball_collision == ref.ball_collision
    assert mine.ball_rebound == ref.ball_rebound

    # sanity: the scripted scenario actually triggered each event type
    assert 4 in mine.disappeared_balls
    assert any(mine.ball_collision.values())
    assert any(mine.ball_rebound.values())


def test_event_overlay_visualize(pockets, tmp_path):
    """Overlay rendering: annotations land on event frames and an mp4 is
    written (reference postprocess_det_sam2.py:61-232 visualize())."""
    cv2 = pytest.importorskip("cv2")
    segs = _make_segments()
    pp = VideoPostProcessor()
    pp.get_hole_name(pockets)
    pp.get_boundary_from_holes()
    pp.run(segs)
    assert any(pp.ball_collision.values()) and pp.disappeared_balls

    # collision ring lands around the colliding balls' centroids
    cframe = min(f for f, pairs in pp.ball_collision.items() if pairs)
    id1, id2 = pp.ball_collision[cframe][0]
    frame = np.zeros((H, W, 3), np.uint8)
    out = pp.draw_frame_overlay(frame, cframe, len(segs))
    for bid in (id1, id2):
        pos = pp.balls_positions[cframe].get(bid)
        if pos is None:
            continue
        x, y = int(pos[0]), int(pos[1])
        ring = out[max(y - 30, 0) : y + 30, max(x - 30, 0) : x + 30]
        assert (ring[..., 2] > 200).any(), f"no red ring near ball {bid}"

    # pot label appears on the frame after the ball disappears
    bid, info = next(iter(pp.disappeared_balls.items()))
    pframe = info["last_frame"] + 1
    out2 = pp.draw_frame_overlay(np.zeros((H, W, 3), np.uint8), pframe, len(segs))
    x, y = (int(v) for v in info["last_position"])
    assert (out2[max(y - 15, 0) : y + 15, max(x - 15, 0) : x + 15] > 0).any()

    # non-event frame far from everything stays black away from static overlay
    frames = [np.zeros((H, W, 3), np.uint8) for _ in range(len(segs))]
    path = pp.visualize(frames, str(tmp_path), fps=2)
    import os

    assert os.path.isfile(path) and os.path.getsize(path) > 0
    cap = cv2.VideoCapture(path)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == len(segs)
    cap.release()


def test_pipeline_visualize_option(tmp_path):
    """DetSAM2Pipeline(visualize_postprocess=True) retains frames and
    renders the overlay mp4 (Det_SAM2_pipeline.py:28,224-235)."""
    from det_sam2_tpu.app.pipeline import DetSAM2Pipeline

    class _FakeVP:
        pre_frames = 0
        max_frame_num_to_track = 2
        special_classes_detection = [
            np.asarray([70, 70, 130, 130], np.float32),
            np.asarray([930, 0, 990, 50], np.float32),
            np.asarray([1790, 70, 1850, 130], np.float32),
            np.asarray([70, 690, 130, 750], np.float32),
            np.asarray([930, 690, 990, 750], np.float32),
            np.asarray([1790, 690, 1850, 750], np.float32),
        ]

        def __init__(self):
            self.video_segments = {}
            self._segs = _make_segments()
            self.max_inference_state_frames = None

        def process_frame(self, idx, frame):
            if idx in self._segs:
                self.video_segments[idx] = self._segs[idx]

        def finish(self):
            pass

    vp = _FakeVP()
    # misconfiguration is rejected up front, not after a full inference run
    with pytest.raises(ValueError, match="output_video_dir"):
        DetSAM2Pipeline(_FakeVP(), visualize_postprocess=True)
    pipe = DetSAM2Pipeline(
        vp, visualize_postprocess=True, output_video_dir=str(tmp_path)
    )
    frames = [np.zeros((H, W, 3), np.uint8) for _ in range(14)]
    pp = pipe.inference(frames)
    assert pp.ball_collision
    import os

    assert pipe.visualized_video_path is not None
    assert os.path.isfile(pipe.visualized_video_path)
