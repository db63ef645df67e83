"""Deployment packaging: env-var config surface (serving/server.py
env_config) + consistency of the deploy/ recipes (reference analogue:
docker-compose.yaml + backend.Dockerfile at the reference repo root)."""

import os

import pytest
import yaml

from det_sam2_tpu.serving.server import env_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEPLOY = os.path.join(REPO, "deploy")


def test_env_config_defaults():
    cfg = env_config({})
    assert cfg == {
        "model": "hiera_s",
        "checkpoint": None,
        "port": 7263,
        "gallery": None,
        "uploads": None,
    }


def test_env_config_reference_vocabulary():
    # the reference container speaks tiny/small/base_plus/large
    for ref, ours in [("tiny", "hiera_t"), ("small", "hiera_s"),
                      ("base_plus", "hiera_b+"), ("large", "hiera_l")]:
        assert env_config({"MODEL_SIZE": ref})["model"] == ours
    # our names pass through untouched
    assert env_config({"MODEL_SIZE": "hiera_l"})["model"] == "hiera_l"


def test_env_config_data_path_and_overrides():
    cfg = env_config({"DATA_PATH": "/data"})
    assert cfg["gallery"] == os.path.join("/data", "gallery")
    assert cfg["uploads"] == os.path.join("/data", "uploads")
    cfg = env_config({"DATA_PATH": "/data", "GALLERY_PATH": "/g"})
    assert cfg["gallery"] == "/g"
    assert cfg["uploads"] == os.path.join("/data", "uploads")
    # the reference compose file sets GUNICORN_PORT; SERVER_PORT wins
    assert env_config({"GUNICORN_PORT": "5000"})["port"] == 5000
    assert env_config(
        {"GUNICORN_PORT": "5000", "SERVER_PORT": "8080"})["port"] == 8080
    assert env_config({"CHECKPOINT_PATH": "/w.pt"})["checkpoint"] == "/w.pt"


def test_compose_file_consistent():
    with open(os.path.join(DEPLOY, "docker-compose.yaml")) as f:
        compose = yaml.safe_load(f)
    svc = compose["services"]["backend"]
    # the dockerfile the compose file builds must exist, relative to its
    # declared context (the repo root)
    ctx = os.path.normpath(os.path.join(DEPLOY, svc["build"]["context"]))
    assert ctx == REPO
    assert os.path.isfile(os.path.join(ctx, svc["build"]["dockerfile"]))
    # MODEL_SIZE build arg must be a size the checkpoint downloader knows
    from det_sam2_tpu.tools.download_ckpts import CHECKPOINTS
    assert svc["build"]["args"]["MODEL_SIZE"] in CHECKPOINTS
    # every env var the compose file sets must be one the code reads
    known = {
        "MODEL_SIZE", "CHECKPOINT_PATH", "SERVER_PORT", "GUNICORN_PORT",
        "DATA_PATH", "GALLERY_PATH", "UPLOADS_PATH", "DEFAULT_VIDEO_PATH",
        "VIDEO_ENCODE_FPS", "VIDEO_ENCODE_MAX_WIDTH",
        "VIDEO_ENCODE_MAX_HEIGHT", "MAX_UPLOAD_VIDEO_DURATION",
        "JAX_COMPILATION_CACHE_DIR",
    }
    for item in svc["environment"]:
        assert item.split("=", 1)[0] in known, item
    # host networking: Docker IGNORES port mappings under
    # network_mode: host, so a ports block would be dead/misleading
    # config — SERVER_PORT is the only effective knob
    assert svc.get("network_mode") == "host"
    assert "ports" not in svc
    env = dict(kv.split("=", 1) for kv in svc["environment"])
    assert env_config(env)["port"] == int(env["SERVER_PORT"])


def test_dockerfile_paths_exist():
    with open(os.path.join(DEPLOY, "backend.Dockerfile")) as f:
        text = f.read()
    lines = text.splitlines()
    copied = [ln.split()[1] for ln in lines if ln.startswith("COPY ")]
    assert copied, "Dockerfile copies nothing"
    for src in copied:
        assert os.path.exists(os.path.join(REPO, src)), src
    # the entrypoint module must exist and expose main()
    cmds = [ln for ln in lines if ln.startswith("CMD ")]
    assert any("det_sam2_tpu.serving.server" in c for c in cmds)
    from det_sam2_tpu.serving import server
    assert callable(server.main)


def test_dockerfile_runtime_is_torch_free():
    """The runtime image must boot without torch: the checkpoint is
    converted to the native .npz at build time (torch installed and
    uninstalled inside the SAME layer), and CHECKPOINT_PATH points at the
    .npz, which build._load_params reads torch-free."""
    with open(os.path.join(DEPLOY, "backend.Dockerfile")) as f:
        # comments mention torch legitimately; check instructions only
        text = "\n".join(
            ln for ln in f.read().splitlines()
            if not ln.lstrip().startswith("#")
        )
    # the conversion layer: install torch -> convert -> uninstall, one RUN
    convert_runs = [
        chunk for chunk in text.split("RUN ")
        if "det_sam2_tpu.convert" in chunk
    ]
    assert len(convert_runs) == 1
    run = convert_runs[0]
    assert "pip install" in run and "torch" in run
    assert "pip uninstall -y torch" in run
    # no TPU at build time: the conversion must pin the CPU backend
    assert "JAX_PLATFORMS=cpu" in run
    # the served checkpoint is the torch-free artifact
    assert "ENV CHECKPOINT_PATH=" in text
    ckpt = [ln for ln in text.splitlines()
            if ln.startswith("ENV CHECKPOINT_PATH=")][-1]
    assert ckpt.endswith(".npz")
    # and the runtime pip layer itself never installs torch
    runtime_runs = [c for c in text.split("RUN ")
                    if "pip install" in c
                    and "det_sam2_tpu.convert" not in c]
    assert all("torch" not in c for c in runtime_runs)


def test_env_config_rejects_unknown_model_size():
    with pytest.raises(ValueError, match="MODEL_SIZE"):
        env_config({"MODEL_SIZE": "Large"})  # case typo
    with pytest.raises(ValueError, match="base_plus"):
        env_config({"MODEL_SIZE": "base-plus"})


def test_npz_checkpoint_roundtrip(tmp_path):
    """save_params_npz/load_params_npz: nested tree, bf16 widening with
    dtype restore, and build._load_params dispatching on the suffix."""
    import numpy as np
    import jax.numpy as jnp

    from det_sam2_tpu.build import _load_params
    from det_sam2_tpu.convert import load_params_npz, save_params_npz

    params = {
        "trunk": {
            "blocks_0": {"kernel": jnp.ones((4, 8), jnp.bfloat16),
                         "bias": np.arange(8, dtype=np.float32)},
        },
        "scale": np.float32(2.5) * np.ones((3,), np.float32),
    }
    path = str(tmp_path / "model.npz")
    save_params_npz(params, path)
    for loader in (load_params_npz,
                   lambda p: _load_params(p, cfg=None)):
        restored = loader(path)
        assert restored["trunk"]["blocks_0"]["kernel"].dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(restored["trunk"]["blocks_0"]["kernel"],
                       dtype=np.float32),
            np.ones((4, 8), np.float32))
        np.testing.assert_array_equal(
            restored["trunk"]["blocks_0"]["bias"],
            np.arange(8, dtype=np.float32))
        assert restored["scale"].dtype == np.float32


def test_systemd_unit_consistent():
    with open(os.path.join(DEPLOY, "det-sam2-serving.service")) as f:
        unit = f.read()
    assert "det_sam2_tpu.serving.server" in unit
    assert "Restart=" in unit and "WantedBy=" in unit


@pytest.fixture()
def tiny_gql(tmp_path, monkeypatch):
    """GraphQLAPI over a 2-video gallery, no model (gallery ops only)."""
    import cv2
    import numpy as np

    from det_sam2_tpu.serving.graphql import GraphQLAPI

    gal = tmp_path / "gallery"
    gal.mkdir()
    for name in ("a_first.mp4", "b_second.mp4"):
        w = cv2.VideoWriter(str(gal / name),
                            cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 48))
        for _ in range(3):
            w.write(np.zeros((48, 64, 3), np.uint8))
        w.release()

    def make(env):
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        return GraphQLAPI(api=None, gallery_dir=str(gal),
                          uploads_dir=str(tmp_path / "up"))

    return make


def test_default_video_env(tiny_gql):
    # unset: first gallery item
    api = tiny_gql({})
    assert api.default_video({})["path"].endswith("a_first.mp4")
    # data-root-relative form, like the reference's
    # DEFAULT_VIDEO_PATH=gallery/05_default_juggle.mp4
    api = tiny_gql({"DEFAULT_VIDEO_PATH": "gallery/b_second.mp4"})
    assert api.default_video({})["path"].endswith("b_second.mp4")
    # a name not in the gallery falls back to the first item
    api = tiny_gql({"DEFAULT_VIDEO_PATH": "gallery/missing.mp4"})
    assert api.default_video({})["path"].endswith("a_first.mp4")


def test_video_encode_env_plumbs_to_transcode(tiny_gql, monkeypatch):
    import base64

    api = tiny_gql({"VIDEO_ENCODE_FPS": "12",
                    "VIDEO_ENCODE_MAX_WIDTH": "640",
                    "VIDEO_ENCODE_MAX_HEIGHT": "480"})
    assert api.encode_fps == 12.0
    assert (api.encode_max_w, api.encode_max_h) == (640, 480)

    seen = {}

    def fake_transcode(in_path, out_path, max_seconds, max_w, max_h, fps):
        seen.update(max_w=max_w, max_h=max_h, fps=fps)
        open(out_path, "wb").close()
        return {}

    monkeypatch.setattr(
        "det_sam2_tpu.serving.transcode.transcode", fake_transcode)

    src = os.path.join(api.gallery_dir, "a_first.mp4")
    content = base64.b64encode(open(src, "rb").read()).decode()
    try:
        api.upload_video({"file": {"contentBase64": content,
                                   "filename": "x.mp4"}})
    except Exception:
        pass  # _video_info on the empty fake output may fail; knobs captured
    assert seen == {"max_w": 640, "max_h": 480, "fps": 12.0}


def test_transcode_independent_axis_caps(tmp_path):
    """1280x720 under (1280, 720) caps must pass through unscaled — the
    single long-side min() form would wrongly shrink it to 720x405."""
    import cv2
    import numpy as np

    from det_sam2_tpu.serving.transcode import get_video_metadata, transcode

    src = str(tmp_path / "wide.mp4")
    w = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"mp4v"), 10, (256, 144))
    for _ in range(5):
        w.write(np.zeros((144, 256, 3), np.uint8))
    w.release()

    out = str(tmp_path / "out.mp4")
    transcode(src, out, max_seconds=10, fps=10, max_w=256, max_h=144)
    meta = get_video_metadata(out)
    assert (meta["width"], meta["height"]) == (256, 144)

    # the height cap binds alone when only it is exceeded
    out2 = str(tmp_path / "out2.mp4")
    transcode(src, out2, max_seconds=10, fps=10, max_w=256, max_h=72)
    meta2 = get_video_metadata(out2)
    assert (meta2["width"], meta2["height"]) == (128, 72)
