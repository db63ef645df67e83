"""Builders, profiling utilities, result visualization, dataset correction."""

import json
import os

import numpy as np
import pytest

from det_sam2_tpu.build import _resolve_cfg, build_sam2, build_sam2_video_predictor
from det_sam2_tpu.configs import MODEL_CONFIGS, tiny_test_config
from det_sam2_tpu.utils.profiling import (
    device_memory_stats,
    pytree_nbytes,
    session_size_report,
)


def test_load_video_frames_ndarray_stack():
    """A [N, H, W, 3] uint8 stack loads as N frames (same as a list of
    frames — reference misc.py accepts list-of-ndarray)."""
    from det_sam2_tpu.utils.misc import load_video_frames

    stack = np.zeros((3, 40, 60, 3), np.uint8)
    frames, h, w = load_video_frames(stack, image_size=32)
    assert len(frames) == 3 and (h, w) == (40, 60)
    single, h1, w1 = load_video_frames(stack[0], image_size=32)
    assert len(single) == 1 and (h1, w1) == (40, 60)


def test_resolve_cfg_aliases():
    for alias in ("hiera_s", "sam2.1_hiera_s", "configs/sam2.1/sam2.1_hiera_s.yaml",
                  "facebook/sam2.1-hiera-small"):
        cfg = _resolve_cfg(alias)
        assert cfg.hiera.stages == (1, 2, 11, 2)
    with pytest.raises(ValueError):
        _resolve_cfg("nope")
    cfg = _resolve_cfg("hiera_t", fill_hole_area=0)
    assert cfg.fill_hole_area == 0


def test_model_config_shapes():
    for name, fn in MODEL_CONFIGS.items():
        cfg = fn()
        assert cfg.image_size == 1024
        assert cfg.neck.backbone_channel_list[0] == cfg.hiera.channel_list[0]


@pytest.mark.slow
def test_builders_and_profiling(tmp_path):
    import jax.numpy as jnp

    predictor = build_sam2_video_predictor(
        tiny_test_config(), dtype=jnp.float32
    )
    frames = [np.zeros((64, 64, 3), np.uint8) for _ in range(2)]
    session = predictor.init_state(frames)
    predictor.add_new_points_or_box(
        session, 0, 1, box=np.asarray([4.0, 4.0, 30.0, 30.0])
    )
    report = session_size_report(session)
    assert report["bank_device_mib"] > 0
    assert report["num_frames_held"] == 2
    stats = device_memory_stats()
    assert stats["bytes_in_use_gib"] >= 0
    assert pytree_nbytes({"a": np.zeros(4, np.float32)}) == 16


def test_result_visualize(tmp_path):
    from det_sam2_tpu.app.result_visualize import load_results, plot_heatmaps

    data = []
    for buf in (4, 8):
        for trk in (8, 16):
            data.append({
                "params_setting": {"frame_buffer_size": buf,
                                   "max_frame_num_to_track": trk},
                "average_results": {
                    e: {"precision": 0.5, "recall": 0.5, "f1": 0.5}
                    for e in ("pot", "collision", "rebound")
                },
            })
    path = tmp_path / "eval_results.json"
    path.write_text(json.dumps(data))
    df = load_results(str(path))
    assert len(df) == 4
    saved = plot_heatmaps(str(path), str(tmp_path / "plots"))
    assert saved and all(os.path.exists(p) for p in saved)


@pytest.mark.slow
def test_process_dataset_tool(tmp_path):
    from det_sam2_tpu.tools.process_dataset import process_dataset
    from PIL import Image

    predictor = build_sam2(tiny_test_config())
    img_dir, lbl_dir, out_dir = (
        tmp_path / "img", tmp_path / "lbl", tmp_path / "out"
    )
    img_dir.mkdir()
    lbl_dir.mkdir()
    img = np.full((64, 64, 3), 40, np.uint8)
    img[16:48, 16:48] = (220, 60, 60)
    Image.fromarray(img).save(img_dir / "a.jpg")
    (lbl_dir / "a.txt").write_text("5 0.5 0.5 0.5 0.5\n")
    process_dataset(predictor, str(img_dir), str(lbl_dir), str(out_dir))
    refined = (out_dir / "a.txt").read_text().strip().split()
    assert refined[0] == "5" and len(refined) == 5


@pytest.mark.slow
def test_torch_checkpoint_file_roundtrip(tmp_path):
    """Save a reference-format .pt checkpoint and load it through
    build.py (the deployment path for real SAM2.1 weights)."""
    import torch

    import jax.numpy as jnp
    from torch_ref import build_reference_sam2, reference_available

    if not reference_available():
        pytest.skip("reference repo not mounted")
    cfg = tiny_test_config()
    ref = build_reference_sam2(cfg)
    path = tmp_path / "ckpt.pt"
    torch.save({"model": ref.state_dict()}, path)

    from det_sam2_tpu.build import build_sam2_video_predictor

    predictor = build_sam2_video_predictor(
        cfg, checkpoint=str(path), dtype=jnp.float32
    )
    # converted params drive a real prompt+track flow
    frames = [np.full((64, 64, 3), 30, np.uint8) for _ in range(2)]
    for f in frames:
        f[20:50, 20:50] = (200, 40, 40)
    session = predictor.init_state(frames)
    _, _, masks = predictor.add_new_points_or_box(
        session, 0, 1, box=np.asarray([20.0, 20.0, 50.0, 50.0])
    )
    assert np.isfinite(masks).all()
    outs = list(predictor.propagate_in_video(session))
    assert len(outs) == 2
