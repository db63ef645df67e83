"""Serving HTTP API + VOS tools + J&F benchmark."""

import json
import os
import threading
import urllib.request

import numpy as np
import pytest

from det_sam2_tpu.configs import tiny_test_config
from det_sam2_tpu.serving.inference_api import InferenceAPI
from det_sam2_tpu.serving.server import make_handler
from det_sam2_tpu.tools.sav_benchmark import (
    db_eval_boundary,
    db_eval_iou,
    evaluate_object,
    evaluate_videos,
)
from det_sam2_tpu.tools.vos_inference import (
    save_palettised_png,
    vos_inference,
)
from det_sam2_tpu.track import SAM2Engine
from det_sam2_tpu.utils.amg import rle_to_mask
from det_sam2_tpu.video_predictor import SAM2VideoPredictor

H, W = 96, 128


def _frames(n):
    out = []
    for t in range(n):
        f = np.full((H, W, 3), 30, np.uint8)
        f[20:50, 8 + 3 * t : 32 + 3 * t] = (200, 30, 30)
        out.append(f)
    return out


@pytest.fixture(scope="module")
def predictor():
    return SAM2VideoPredictor(SAM2Engine(tiny_test_config()))


@pytest.mark.slow
def test_http_serving_roundtrip(predictor, tmp_path_factory):
    from http.server import ThreadingHTTPServer

    api = InferenceAPI(predictor)
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(api))
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()

    # write frames to disk so start_session can take a path
    frames_dir = tmp_path_factory.mktemp("frames")
    from PIL import Image

    for i, f in enumerate(_frames(4)):
        Image.fromarray(f).save(frames_dir / f"{i:05d}.png")

    def post(route, payload):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{route}",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        return urllib.request.urlopen(req, timeout=120)

    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}/healthy", timeout=10
    ) as r:
        assert json.load(r)["status"] == "ok"

    with post("/start_session", {"video_path": str(frames_dir)}) as r:
        session = json.load(r)
    sid = session["session_id"]
    assert session["num_frames"] == 4

    with post("/add_box", {"session_id": sid, "frame_index": 0,
                           "object_id": 1, "box": [8, 20, 32, 50]}) as r:
        out = json.load(r)
    assert out["frame_index"] == 0
    rle = out["results"][0]["mask"]
    mask = rle_to_mask(rle)
    assert mask.shape == (H, W)

    with post("/propagate_in_video",
              {"session_id": sid, "start_frame_index": 0,
               "max_frame_num_to_track": 3}) as r:
        lines = [json.loads(l) for l in r.read().decode().splitlines()]
    assert [l["frame_index"] for l in lines] == [0, 1, 2, 3]
    for l in lines:
        assert l["results"][0]["object_id"] == 1

    with post("/close_session", {"session_id": sid}) as r:
        assert json.load(r)["success"]
    server.shutdown()


def test_jf_metrics():
    a = np.zeros((64, 64), bool)
    a[10:40, 10:40] = True
    assert db_eval_iou(a, a) == 1.0
    assert db_eval_boundary(a, a) == 1.0
    b = np.zeros((64, 64), bool)
    b[12:42, 10:40] = True  # shifted by 2
    assert 0.7 < db_eval_iou(a, b) < 1.0
    assert 0.5 < db_eval_boundary(a, b) <= 1.0
    # empty-vs-empty and empty-vs-something
    e = np.zeros((64, 64), bool)
    assert db_eval_iou(e, e) == 1.0 and db_eval_boundary(e, e) == 1.0
    assert db_eval_iou(a, e) == 0.0 and db_eval_boundary(a, e) == 0.0

    res = evaluate_object([a, a, a, a], [a, b, b, a])
    assert 0 < res["J&F"] < 1
    agg = evaluate_videos({"v": {1: ([a, a, a], [a, a, a])}})
    assert agg["J&F"] == 1.0


@pytest.mark.slow
def test_vos_inference_tool(predictor, tmp_path):
    from PIL import Image

    frames_dir = tmp_path / "frames"
    masks_dir = tmp_path / "gt"
    out_dir = tmp_path / "out"
    frames_dir.mkdir()
    masks_dir.mkdir()
    for i, f in enumerate(_frames(4)):
        Image.fromarray(f).save(frames_dir / f"{i:05d}.png")
    gt0 = {1: np.zeros((H, W), bool)}
    gt0[1][20:50, 8:32] = True
    save_palettised_png(gt0, str(masks_dir / "00000.png"))

    vos_inference(predictor, str(frames_dir), str(masks_dir), str(out_dir))
    outs = sorted(os.listdir(out_dir))
    assert outs == [f"{i:05d}.png" for i in range(4)]
    arr = np.asarray(Image.open(out_dir / "00000.png"))
    assert set(np.unique(arr)) <= {0, 1}


@pytest.mark.slow
def test_vos_separate_per_object_later_appearance(predictor, tmp_path):
    """An object first annotated at frame 2 must be tracked by the
    per-object protocol (its own session, propagated from frame 2) and
    absent before it; the joint path without the track-later flag must
    reject it (reference vos_inference.py:196-205, :249-366)."""
    from PIL import Image

    from det_sam2_tpu.tools.vos_inference import (
        vos_separate_inference_per_object,
    )

    frames_dir = tmp_path / "frames"
    masks_dir = tmp_path / "gt"
    out_dir = tmp_path / "out"
    frames_dir.mkdir()
    masks_dir.mkdir()
    frames = []
    for t in range(4):
        f = np.full((H, W, 3), 30, np.uint8)
        f[20:50, 8 + 3 * t : 32 + 3 * t] = (200, 30, 30)
        if t >= 2:  # second object appears at frame 2
            f[60:88, 70 + 2 * t : 100 + 2 * t] = (30, 200, 30)
        frames.append(f)
        Image.fromarray(f).save(frames_dir / f"{t:05d}.png")
    gt0 = {1: np.zeros((H, W), bool)}
    gt0[1][20:50, 8:32] = True
    save_palettised_png(gt0, str(masks_dir / "00000.png"))
    gt2 = {2: np.zeros((H, W), bool)}
    gt2[2][60:88, 74:104] = True
    save_palettised_png(gt2, str(masks_dir / "00002.png"))

    with pytest.raises(RuntimeError, match="track_object_appearing_later"):
        vos_inference(
            predictor, str(frames_dir), str(masks_dir), str(tmp_path / "x"),
            use_all_masks=True,
        )

    vos_separate_inference_per_object(
        predictor, str(frames_dir), str(masks_dir), str(out_dir)
    )
    from PIL import Image as PILImage

    outs = sorted(os.listdir(out_dir))
    assert outs == [f"{i:05d}.png" for i in range(4)]
    a0 = np.asarray(PILImage.open(out_dir / "00000.png"))
    a2 = np.asarray(PILImage.open(out_dir / "00002.png"))
    assert 2 not in np.unique(a0), "object 2 must be absent before frame 2"
    # prompted frames keep their GT masks (cond-frame outputs), so these
    # hold even with random tiny-model weights
    assert (a0 == 1).any(), "object 1 at its prompt frame 0"
    assert (a2 == 2).any(), "object 2 at its prompt frame 2"


@pytest.mark.slow
def test_init_state_async_loading(predictor, tmp_path):
    """init_state(async_loading_frames=True) over a frame dir: tracking
    results identical to the eager path (reference init_state flag,
    sam2_video_predictor.py:43-120)."""
    from PIL import Image

    frames_dir = tmp_path / "frames"
    frames_dir.mkdir()
    for i, f in enumerate(_frames(5)):
        Image.fromarray(f).save(frames_dir / f"{i:05d}.png")

    def run(async_flag):
        s = predictor.init_state(
            str(frames_dir), async_loading_frames=async_flag
        )
        predictor.add_new_points_or_box(
            s, frame_idx=0, obj_id=1,
            box=np.asarray([8, 20, 32, 50], np.float32),
        )
        return {
            fi: m.copy()
            for fi, _, m in predictor.propagate_in_video(s)
        }

    sync_out = run(False)
    async_out = run(True)
    assert sorted(async_out) == sorted(sync_out) == [0, 1, 2, 3, 4]
    for fi in sync_out:
        np.testing.assert_array_equal(async_out[fi], sync_out[fi])


def test_async_frame_loader(tmp_path):
    from PIL import Image

    from det_sam2_tpu.utils.misc import (
        AsyncFrameLoader, _load_image_file, prepare_frame,
    )

    frames = _frames(5)
    paths = []
    for i, f in enumerate(frames):
        p = tmp_path / f"{i:03d}.png"
        Image.fromarray(f).save(p)
        paths.append(str(p))
    loader = AsyncFrameLoader(paths, image_size=64)
    assert len(loader) == 5
    assert loader[4].shape == (64, 64, 3)
    assert loader.video_height == H and loader.video_width == W
    # path sources are byte-identical with the eager loader (PIL resize)
    np.testing.assert_array_equal(loader[2], _load_image_file(paths[2], 64)[0])
    with pytest.raises(IndexError):
        loader[5]
    # ndarray sources resize the streaming way (prepare_frame/cv2)
    loader2 = AsyncFrameLoader(frames, image_size=32)
    assert loader2[0].dtype == np.uint8
    np.testing.assert_array_equal(loader2[1], prepare_frame(frames[1], 32))


def test_transcode_and_extract(tmp_path):
    import cv2

    from det_sam2_tpu.serving.transcode import get_video_metadata, transcode
    from det_sam2_tpu.tools.extract_frames import extract_frames

    src = str(tmp_path / "in.mp4")
    writer = cv2.VideoWriter(
        src, cv2.VideoWriter_fourcc(*"mp4v"), 30.0, (320, 240)
    )
    for f in _frames(30):
        writer.write(cv2.cvtColor(
            cv2.resize(f, (320, 240)), cv2.COLOR_RGB2BGR
        ))
    writer.release()

    meta = get_video_metadata(src)
    assert meta["width"] == 320 and meta["num_frames"] == 30

    out = str(tmp_path / "out.mp4")
    meta2 = transcode(src, out, max_seconds=0.5, max_dim=160, fps=10.0)
    assert meta2["width"] <= 160 and meta2["num_frames"] <= 6

    frames_dir = str(tmp_path / "frames")
    n = extract_frames(src, frames_dir, fps=10.0)
    assert n == 10
    assert len(os.listdir(frames_dir)) == 10


def test_sav_dataset_browsing(tmp_path):
    from PIL import Image

    from det_sam2_tpu.tools.sav_utils import SAVDataset
    from det_sam2_tpu.tools.vos_inference import save_palettised_png

    img_dir = tmp_path / "JPEGImages" / "vid0"
    ann_dir = tmp_path / "Annotations" / "vid0"
    img_dir.mkdir(parents=True)
    ann_dir.mkdir(parents=True)
    for i, f in enumerate(_frames(3)):
        Image.fromarray(f).save(img_dir / f"{i:05d}.jpg")
        m = np.zeros((H, W), bool)
        m[20:50, 8 + 3 * i : 32 + 3 * i] = True
        save_palettised_png({1: m}, str(ann_dir / f"{i:05d}.png"))

    ds = SAVDataset(str(tmp_path))
    assert ds.videos == ["vid0"]
    assert len(ds.frame_paths("vid0")) == 3
    anns = ds.load_annotations("vid0")
    assert set(anns.keys()) == {0, 1, 2}
    assert 1 in anns[0]
    overlay = ds.render_overlay("vid0", 1, out_path=str(tmp_path / "o.png"))
    assert overlay.shape == (H, W, 3)
    assert (tmp_path / "o.png").exists()


@pytest.mark.slow
def test_cancel_mid_stream_then_session_usable(predictor, tmp_path_factory):
    """Cancel arriving from a second connection mid-propagation stops the
    ndjson stream early and leaves the session usable (reference behavior:
    demo/backend app.py propagate route + predictor cancel)."""
    from http.server import ThreadingHTTPServer

    class PausingPredictor:
        """Delegates to the real predictor but pauses after the first
        propagated frame so the cancel deterministically lands mid-window."""

        def __init__(self, inner):
            self._inner = inner
            self.first_yield = threading.Event()
            self.resume = threading.Event()
            self.paused_once = False

        def __getattr__(self, name):
            return getattr(self._inner, name)

        def propagate_in_video(self, *a, **kw):
            for i, item in enumerate(self._inner.propagate_in_video(*a, **kw)):
                yield item
                if i == 0 and not self.paused_once:
                    self.paused_once = True
                    self.first_yield.set()
                    assert self.resume.wait(timeout=60)

    pausing = PausingPredictor(predictor)
    api = InferenceAPI(pausing)
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(api))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    frames_dir = tmp_path_factory.mktemp("cancel_frames")
    from PIL import Image

    for i, f in enumerate(_frames(8)):
        Image.fromarray(f).save(frames_dir / f"{i:05d}.png")

    def post(route, payload, timeout=120):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{route}",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        return urllib.request.urlopen(req, timeout=timeout)

    with post("/start_session", {"video_path": str(frames_dir)}) as r:
        sid = json.load(r)["session_id"]
    with post("/add_box", {"session_id": sid, "frame_index": 0,
                           "object_id": 1, "box": [8, 20, 32, 50]}):
        pass

    stream_lines = []

    def consume_stream():
        with post("/propagate_in_video",
                  {"session_id": sid, "start_frame_index": 0}) as r:
            for line in r:
                stream_lines.append(json.loads(line))

    t = threading.Thread(target=consume_stream)
    t.start()
    assert pausing.first_yield.wait(timeout=120)
    # second connection cancels while the stream is paused mid-window
    with post("/cancel_propagate_in_video", {"session_id": sid}) as r:
        assert json.load(r)["success"]
    pausing.resume.set()
    t.join(timeout=120)
    assert not t.is_alive()
    assert 1 <= len(stream_lines) < 8, stream_lines

    # the session stays usable: new prompt + a full (uncanceled) propagation
    with post("/add_box", {"session_id": sid, "frame_index": 0,
                           "object_id": 1, "box": [8, 20, 32, 50]}) as r:
        assert json.load(r)["frame_index"] == 0
    with post("/propagate_in_video",
              {"session_id": sid, "start_frame_index": 0}) as r:
        lines = [json.loads(l) for l in r.read().decode().splitlines()]
    assert [l["frame_index"] for l in lines] == list(range(8))
    with post("/close_session", {"session_id": sid}) as r:
        assert json.load(r)["success"]
    server.shutdown()
