"""VideoProcessor streaming mechanics: self-prompting, constant memory,
preload save/restore. (Mask-quality parity is covered by the predictor
parity tests; these use random weights and check the state machine.)"""

import numpy as np
import pytest

import jax

from det_sam2_tpu.app.detector import CallableDetector
from det_sam2_tpu.app.video_processor import VideoProcessor
from det_sam2_tpu.configs import tiny_test_config
from det_sam2_tpu.track import SAM2Engine
from det_sam2_tpu.video_predictor import SAM2VideoPredictor

H, W = 96, 128


def _square_frames(n, speed=3):
    frames = []
    for t in range(n):
        f = np.full((H, W, 3), 30, np.uint8)
        x = 8 + speed * t
        f[20:50, x : x + 24] = (200, 30, 30)
        frames.append(f)
    return frames


def _square_box(t, speed=3):
    x = 8 + speed * t
    return (x, 20, x + 24, 50)


@pytest.fixture(scope="module")
def processor_factory():
    engine = SAM2Engine(tiny_test_config())
    predictor = SAM2VideoPredictor(engine)

    def make(**kw):
        detector = CallableDetector(
            lambda frame, idx: [(*_square_box(idx), 5, 0.99)]
        )
        defaults = dict(
            predictor=predictor,
            detector=detector,
            skip_classes=set(),
            frame_buffer_size=4,
            detect_interval=4,
            max_frame_num_to_track=8,
            max_inference_state_frames=8,
        )
        defaults.update(kw)
        return VideoProcessor(**defaults)

    return make


@pytest.mark.slow
def test_streaming_constant_memory(processor_factory):
    proc = processor_factory()
    n = 20
    segments = proc.run(_square_frames(n))

    # every frame got a segmentation entry with the prompted object id
    assert sorted(segments.keys()) == list(range(n))
    for t, segs in segments.items():
        assert 5 in segs
        assert segs[5].shape[-2:] == (H, W)

    # constant memory: bank shape fixed, host stores bounded
    s = proc.session
    assert s.bank.cond_mem.shape[0] == s.cfg.cond_bank_size
    assert len(s.frames) <= proc.max_inference_state_frames + proc.frame_buffer_size
    assert len(s.noncond_outputs) <= proc.max_inference_state_frames + 1
    # streaming more frames does not grow the device state
    before = jax.tree_util.tree_map(lambda x: x.shape, s.bank)
    proc.frame_buffer = []
    for t in range(n, n + 8):
        proc.process_frame(t, _square_frames(t + 1)[-1])
    after = jax.tree_util.tree_map(lambda x: x.shape, proc.session.bank)
    assert before == after


@pytest.mark.slow
def test_no_detection_stream_bounds_memory(processor_factory):
    """Hours of detection-free stream must not accumulate host frames:
    release_old_frames runs even before the first prompt."""
    from det_sam2_tpu.app.detector import NullDetector

    proc = processor_factory(detector=NullDetector())
    proc.run(_square_frames(32))
    s = proc.session
    assert s.num_objects == 0
    assert (
        len(s.frames)
        <= proc.max_inference_state_frames + proc.frame_buffer_size
    ), "detection-free stream grew session.frames unboundedly"


@pytest.mark.slow
def test_preload_memory_bank_roundtrip(tmp_path, processor_factory):
    save_path = str(tmp_path / "preload.pkl")
    proc = processor_factory(
        max_inference_state_frames=-1, save_session_path=save_path
    )
    proc.run(_square_frames(8))
    assert proc.session.num_frames == 8

    # new processor for a NEW video, preloaded with the saved memory bank
    proc2 = processor_factory(load_session_path=save_path)
    segments = proc2.run(_square_frames(8, speed=2))
    assert proc2.pre_frames == 8
    # new-video frames are indexed after the preload and results exclude it
    assert min(segments.keys()) >= 8
    assert proc2.session.num_frames == 16
    # preload cond frames are pinned in the bank
    assert bool(np.asarray(proc2.session.bank.cond_pinned).any())


@pytest.mark.slow
def test_special_class_collection(processor_factory):
    def det(frame, idx):
        dets = [(*_square_box(idx), 5, 0.99)]
        # two "pockets" (class 11) on every detect frame
        dets.append((0, 0, 10, 10, 11, 0.9))
        dets.append((W - 10, 0, W, 10, 11, 0.9))
        return dets

    proc = processor_factory(
        detector=CallableDetector(det), skip_classes={11}
    )
    proc.run(_square_frames(8))
    assert len(proc.special_classes_detection) == 2
    # pockets were not tracked as objects
    assert proc.session.obj_ids == [5]


def test_max_objects_cap(processor_factory):
    import pytest as _pytest

    proc = processor_factory()
    frames = _square_frames(4)
    proc.session = proc.predictor.init_state(frames)
    # tiny config caps at 2 objects
    proc.predictor.add_new_points_or_box(
        proc.session, 0, 1, box=np.asarray([8.0, 20.0, 32.0, 50.0])
    )
    proc.predictor.add_new_points_or_box(
        proc.session, 0, 2, box=np.asarray([40.0, 20.0, 64.0, 50.0])
    )
    with _pytest.raises(ValueError, match="max_objects"):
        proc.predictor.add_new_points_or_box(
            proc.session, 0, 3, box=np.asarray([60.0, 20.0, 84.0, 50.0])
        )
