"""Regression tests for the round-3 serving review fixes.

Covers: propagate-route error handling (no second response inside an open
chunked stream), /video Range/MIME streaming, GraphQL non-ASCII string
literals, the server-side upload-duration cap, and cv2-fallback transcode
fps semantics (ffmpeg `fps=` filter behavior: real-time speed preserved in
both up- and downsampling, `-t` cap measured in source time)."""

import json
import os
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from det_sam2_tpu.serving.graphql import GraphQLAPI, _Parser, _tokenize
from det_sam2_tpu.serving.transcode import get_video_metadata, transcode


def _parse_one_field(query):
    return _Parser(_tokenize(query)).parse_document()["fields"][0]


def test_graphql_string_literals_non_ascii_and_escapes():
    field = _parse_one_field(
        'mutation { startSession(input: {path: "/gallery/vidéo — 视频.mp4"})'
        " { sessionId } }"
    )
    assert field["args"]["input"]["path"] == "/gallery/vidéo — 视频.mp4"
    field = _parse_one_field(
        r'query { q(s: "line1\nline2\ttab \"quoted\" ué") { x } }'
    )
    assert field["args"]["s"] == 'line1\nline2\ttab "quoted" ué'


def test_video_url_is_percent_encoded(tmp_path, monkeypatch):
    gql = GraphQLAPI.__new__(GraphQLAPI)  # no InferenceAPI needed
    gql.gallery_dir = str(tmp_path)
    gql.uploads_dir = None
    import det_sam2_tpu.serving.transcode as tc

    monkeypatch.setattr(
        tc, "get_video_metadata",
        lambda p: {"fps": 24.0, "width": 2, "height": 2,
                   "num_frames": 1, "duration_sec": 1 / 24},
    )
    info = gql._video_info(str(tmp_path / "my clip #1 & 2.mp4"))
    assert "#" not in info["url"] and " " not in info["url"]
    from urllib.parse import parse_qs, unquote, urlparse

    q = parse_qs(urlparse(info["url"]).query)
    assert q["path"][0] == str(tmp_path / "my clip #1 & 2.mp4")
    assert unquote(info["url"]) != info["url"]


def test_upload_duration_capped(tmp_path, monkeypatch):
    gql = GraphQLAPI(api=None, uploads_dir=str(tmp_path))
    seen = {}

    import det_sam2_tpu.serving.transcode as tc

    def fake_transcode(raw, out, max_seconds, **caps):
        seen["max_seconds"] = max_seconds
        with open(out, "wb"):
            pass
        return {}

    monkeypatch.setattr(tc, "transcode", fake_transcode)
    monkeypatch.setattr(
        tc, "get_video_metadata",
        lambda p: {"fps": 24.0, "width": 2, "height": 2,
                   "num_frames": 1, "duration_sec": 1 / 24},
    )
    import base64

    args = {
        "file": {"contentBase64": base64.b64encode(b"x").decode(),
                 "filename": "a.mp4"},
        "durationTimeSec": 1e9,
    }
    gql.upload_video(args)
    assert seen["max_seconds"] == GraphQLAPI.MAX_UPLOAD_DURATION
    args["durationTimeSec"] = 3.0  # client may lower it
    gql.upload_video(args)
    assert seen["max_seconds"] == 3.0


def _write_video(path, n_frames, fps, w=64, h=48):
    import cv2

    wr = cv2.VideoWriter(
        str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
    )
    for i in range(n_frames):
        frame = np.full((h, w, 3), (i * 7) % 256, np.uint8)
        wr.write(frame)
    wr.release()


def test_transcode_upsample_preserves_realtime_speed(tmp_path):
    # 12 fps source, 24 frames = 2.0 s of content; cap at 1 s, out 24 fps
    src = tmp_path / "src.mp4"
    _write_video(src, 24, 12.0)
    out = tmp_path / "out.mp4"
    meta = transcode(str(src), str(out), max_seconds=1.0, fps=24.0)
    # 1 s of source (12 frames) -> 24 output frames via duplication:
    # playback duration stays 1 s instead of compressing 1.6 s into 1 s
    assert meta["num_frames"] == 24
    assert abs(meta["duration_sec"] - 1.0) < 1e-6


def test_transcode_downsample_drops_frames(tmp_path):
    # 48 fps source, 48 frames = 1 s; out 24 fps -> 24 frames, 1 s
    src = tmp_path / "src48.mp4"
    _write_video(src, 48, 48.0)
    out = tmp_path / "out24.mp4"
    meta = transcode(str(src), str(out), max_seconds=10.0, fps=24.0)
    assert meta["num_frames"] == 24
    assert abs(meta["duration_sec"] - 1.0) < 1e-6


@pytest.fixture(scope="module")
def http_server(tmp_path_factory):
    """Server over a stub InferenceAPI (no model) + a gallery file."""
    from http.server import ThreadingHTTPServer

    from det_sam2_tpu.serving.server import make_handler

    gallery = tmp_path_factory.mktemp("gallery")
    blob = bytes(range(256)) * 40  # 10240 bytes
    with open(gallery / "clip.mkv", "wb") as f:
        f.write(blob)

    class StubAPI:
        def propagate_in_video(self, session_id, start, max_num, reverse):
            if session_id != "good":
                raise KeyError(f"unknown session {session_id!r}")
            yield {"frame_index": 0}
            yield {"frame_index": 1}
            raise RuntimeError("mid-stream boom")

    class StubGQL:
        gallery_dir = str(gallery)
        uploads_dir = None

    server = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(StubAPI(), StubGQL())
    )
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield server.server_address[1], blob, str(gallery / "clip.mkv")
    server.shutdown()


def _post(port, route, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{route}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    return urllib.request.urlopen(req, timeout=30)


def test_propagate_unknown_session_is_clean_500(http_server):
    port, _, _ = http_server
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(port, "/propagate_in_video", {"session_id": "nope"})
    assert ei.value.code == 500
    assert "unknown session" in json.load(ei.value)["error"]
    # the server (and a fresh connection) still serves normally afterwards
    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}/healthy", timeout=10
    ) as r:
        assert json.load(r)["status"] == "ok"


def test_propagate_mid_stream_error_terminates_stream(http_server):
    port, _, _ = http_server
    with _post(port, "/propagate_in_video", {"session_id": "good"}) as r:
        assert r.status == 200
        lines = [json.loads(l) for l in r.read().decode().splitlines()]
    # two good frames, then ONE final error line and a proper 0-chunk
    # (read() returning at all proves chunked termination)
    assert [l.get("frame_index") for l in lines[:2]] == [0, 1]
    assert "mid-stream boom" in lines[2]["error"]
    assert len(lines) == 3


def test_video_range_and_mime(http_server):
    port, blob, path = http_server
    from urllib.parse import quote

    url = f"http://127.0.0.1:{port}/video?path={quote(path)}"
    with urllib.request.urlopen(url, timeout=10) as r:
        assert r.headers["Content-Type"] != "video/mp4"  # .mkv guessed
        assert r.headers["Accept-Ranges"] == "bytes"
        assert r.read() == blob
    req = urllib.request.Request(url, headers={"Range": "bytes=100-199"})
    with urllib.request.urlopen(req, timeout=10) as r:
        assert r.status == 206
        assert r.headers["Content-Range"] == f"bytes 100-199/{len(blob)}"
        assert r.read() == blob[100:200]
    req = urllib.request.Request(url, headers={"Range": "bytes=-100"})
    with urllib.request.urlopen(req, timeout=10) as r:
        assert r.status == 206
        assert r.read() == blob[-100:]
    # out-of-range start -> 416
    req = urllib.request.Request(
        url, headers={"Range": f"bytes={len(blob) + 5}-"}
    )
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=10)
    assert ei.value.code == 416
