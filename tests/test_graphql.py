"""GraphQL endpoint: parser subset + the reference demo schema's operations
(demo/backend/server/data/schema.py:57-357) over the tiny model."""

import base64
import json
import os
import threading
import urllib.request

import numpy as np
import pytest

from det_sam2_tpu.configs import tiny_test_config
from det_sam2_tpu.serving.graphql import (
    GraphQLAPI,
    _Parser,
    _filter_selection,
    _tokenize,
)
from det_sam2_tpu.serving.inference_api import InferenceAPI
from det_sam2_tpu.track import SAM2Engine
from det_sam2_tpu.video_predictor import SAM2VideoPredictor

H, W = 72, 96


def _parse(q):
    return _Parser(_tokenize(q)).parse_document()


def test_parser_literals_and_variables():
    doc = _parse(
        'mutation Go($i: AddPointsInput!) { addPoints(input: $i) '
        '{ frameIndex rleMaskList { objectId rleMask { size counts } } } }'
    )
    assert doc["operation"] == "mutation"
    f = doc["fields"][0]
    assert f["name"] == "addPoints"
    assert f["args"]["input"].name == "i"
    names = [s["name"] for s in f["selections"]]
    assert names == ["frameIndex", "rleMaskList"]

    doc2 = _parse(
        'query { videos(first: 3, flag: true, who: "a\\"b", '
        'pt: {x: 1.5, y: [1, 2]}) { edges } }'
    )
    args = doc2["fields"][0]["args"]
    assert args["first"] == 3 and args["flag"] is True
    assert args["who"] == 'a"b'
    assert args["pt"] == {"x": 1.5, "y": [1, 2]}


def test_selection_filtering():
    data = {"a": 1, "b": {"c": 2, "d": 3}, "e": [{"f": 4, "g": 5}]}
    sels = _parse("query { x { a b { c } e { g } } }")["fields"][0][
        "selections"]
    out = _filter_selection(data, sels)
    assert out == {"a": 1, "b": {"c": 2}, "e": [{"g": 5}]}


def _make_video(path, n=4):
    import cv2

    wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (W, H))
    for t in range(n):
        f = np.full((H, W, 3), 30, np.uint8)
        f[18 + 2 * t:40 + 2 * t, 10:40] = (30, 30, 200)
        wr.write(f)
    wr.release()


@pytest.fixture(scope="module")
def gql(tmp_path_factory):
    gallery = tmp_path_factory.mktemp("gallery")
    _make_video(str(gallery / "clip.mp4"))
    api = InferenceAPI(SAM2VideoPredictor(SAM2Engine(tiny_test_config())))
    return GraphQLAPI(api, gallery_dir=str(gallery),
                      uploads_dir=str(tmp_path_factory.mktemp("uploads")))


@pytest.mark.slow
def test_schema_operations_roundtrip(gql):
    d = gql.execute("query { videos { totalCount edges { node { path "
                    "width height numFrames } } } }")
    assert "errors" not in d
    vids = d["data"]["videos"]
    assert vids["totalCount"] == 1
    node = vids["edges"][0]["node"]
    assert node["width"] == W and node["numFrames"] == 4

    d = gql.execute("query { defaultVideo { path } }")
    path = d["data"]["defaultVideo"]["path"]

    d = gql.execute(
        "mutation($i: StartSessionInput!) { startSession(input: $i) "
        "{ sessionId } }", {"i": {"path": path}})
    sid = d["data"]["startSession"]["sessionId"]

    d = gql.execute(
        "mutation($i: AddPointsInput!) { addPoints(input: $i) { frameIndex "
        "rleMaskList { objectId rleMask { size counts } } } }",
        {"i": {"sessionId": sid, "frameIndex": 0, "objectId": 1,
               "points": [[24.0, 30.0]], "labels": [1],
               "clearOldPoints": True}})
    res = d["data"]["addPoints"]
    assert res["frameIndex"] == 0
    assert res["rleMaskList"][0]["objectId"] == 1
    assert res["rleMaskList"][0]["rleMask"]["size"] == [H, W]

    for q, key in [
        ("mutation($i: ClearPointsInFrameInput!) { clearPointsInFrame("
         "input: $i) { success } }", "clearPointsInFrame"),
        ("mutation($i: CancelPropagateInVideoInput!) { "
         "cancelPropagateInVideo(input: $i) { success } }",
         "cancelPropagateInVideo"),
        ("mutation($i: ClearPointsInVideoInput!) { clearPointsInVideo("
         "input: $i) { success } }", "clearPointsInVideo"),
    ]:
        d = gql.execute(q, {"i": {"sessionId": sid, "frameIndex": 0,
                                  "objectId": 1}})
        assert d["data"][key]["success"] is True, d

    d = gql.execute(
        "mutation($i: RemoveObjectInput!) { removeObject(input: $i) }",
        {"i": {"sessionId": sid, "objectId": 1}})
    assert d["data"]["removeObject"] == []

    d = gql.execute(
        "mutation($i: CloseSessionInput!) { closeSession(input: $i) "
        "{ success } }", {"i": {"sessionId": sid}})
    assert d["data"]["closeSession"]["success"] is True

    # error envelope
    d = gql.execute("query { nope }")
    assert "errors" in d


@pytest.mark.slow
def test_upload_video(gql):
    src = os.path.join(gql.gallery_dir, "clip.mp4")
    content = base64.b64encode(open(src, "rb").read()).decode()
    d = gql.execute(
        "mutation($f: VideoFile!) { uploadVideo(file: $f) "
        "{ path numFrames width height } }",
        {"f": {"contentBase64": content, "filename": "my.mp4"}})
    assert "errors" not in d, d
    up = d["data"]["uploadVideo"]
    assert os.path.exists(up["path"])
    assert up["numFrames"] >= 1
    # uploaded video now appears in the gallery
    d = gql.execute("query { videos { totalCount } }")
    assert d["data"]["videos"]["totalCount"] == 2


@pytest.mark.slow
def test_http_graphql_and_frontend(gql):
    from http.server import ThreadingHTTPServer

    from det_sam2_tpu.serving.server import make_handler

    server = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(gql.api, gql))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        html = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=10).read().decode()
        assert "det_sam2_tpu" in html and "/graphql" in html

        body = json.dumps({
            "query": "query { defaultVideo { path } }"}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/graphql", data=body,
            headers={"Content-Type": "application/json"})
        d = json.loads(urllib.request.urlopen(req, timeout=30).read())
        path = d["data"]["defaultVideo"]["path"]

        body = json.dumps({
            "query": "mutation($i: StartSessionInput!) { startSession("
                     "input: $i) { sessionId } }",
            "variables": {"i": {"path": path}}}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/graphql", data=body,
            headers={"Content-Type": "application/json"})
        d = json.loads(urllib.request.urlopen(req, timeout=60).read())
        sid = d["data"]["startSession"]["sessionId"]

        info = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/session_info?session_id={sid}",
            timeout=10).read())
        assert info["num_frames"] == 4

        jpg = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/frame?session_id={sid}&index=0",
            timeout=10).read()
        assert jpg[:2] == b"\xff\xd8"  # JPEG magic

        vid = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/video?path={path}", timeout=10).read()
        assert len(vid) > 0
    finally:
        server.shutdown()
