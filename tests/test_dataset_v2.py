"""Data-pipeline round 2: COCO RLE decode, SA-V JSON + SA-1B raw datasets,
EvalSampler, and the consistent affine/grayscale augs."""

import json
import os
import random

import numpy as np
import pytest

from det_sam2_tpu.training.dataset import (
    EvalSampler,
    JSONRawDataset,
    SA1BRawDataset,
    VOSDataLoader,
    affine_clip,
    decode_coco_rle,
    grayscale_clip,
    VideoClip,
)


def _encode_coco_rle(mask: np.ndarray) -> dict:
    """COCO-compressed RLE encoder (test-side inverse of decode_coco_rle)."""
    h, w = mask.shape
    flat = np.asarray(mask, bool).T.reshape(-1)  # column-major
    # run lengths starting with zeros
    counts = []
    prev, run = False, 0
    for v in flat:
        if v == prev:
            run += 1
        else:
            counts.append(run)
            prev, run = v, 1
    counts.append(run)
    # LEB128-style with delta coding (pycocotools rleToString)
    out = bytearray()
    for i, x in enumerate(counts):
        if i > 2:
            x -= counts[i - 2]
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = not ((x == 0 and not (c & 0x10)) or (x == -1 and (c & 0x10)))
            if more:
                c |= 0x20
            out.append(c + 48)
    return {"size": [h, w], "counts": out.decode()}


def test_coco_rle_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(5):
        m = rng.uniform(size=(23, 17)) > 0.6
        rle = _encode_coco_rle(m)
        np.testing.assert_array_equal(decode_coco_rle(rle), m)
    # uncompressed list form
    m = np.zeros((4, 6), bool)
    m[1:3, 2:4] = True
    flat = m.T.reshape(-1)
    counts, prev, run = [], False, 0
    for v in flat:
        if v == prev:
            run += 1
        else:
            counts.append(run)
            prev, run = v, 1
    counts.append(run)
    np.testing.assert_array_equal(
        decode_coco_rle({"size": [4, 6], "counts": counts}), m
    )


@pytest.fixture()
def sav_layout(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(1)
    img_root = tmp_path / "JPEGImages"
    gt_root = tmp_path / "Annotations"
    video = "vid_000"
    (img_root / video).mkdir(parents=True)
    (gt_root / video).mkdir(parents=True)
    masks = []
    masklet = []
    for t in range(3):
        frame = rng.integers(0, 255, (32, 40, 3), np.uint8)
        Image.fromarray(frame).save(img_root / video / f"{t:05d}.jpg")
        m0 = np.zeros((32, 40), bool)
        m0[4 + t : 12 + t, 6 : 16] = True
        m1 = np.zeros((32, 40), bool)
        m1[20:28, 22 + t : 30 + t] = True
        masks.append((m0, m1))
        masklet.append([_encode_coco_rle(m0), _encode_coco_rle(m1)])
    with open(gt_root / video / f"{video}_manual.json", "w") as f:
        json.dump({"masklet": masklet, "fps": 24}, f)
    return str(img_root), str(gt_root), video, masks


def test_json_raw_dataset(sav_layout):
    img_root, gt_root, video, masks = sav_layout
    ds = JSONRawDataset(img_root, gt_root, frames_fps=24)
    assert ds.videos == [video]
    names = ds.frame_names(video)
    assert names == ["00000", "00001", "00002"]
    clip = ds.load_frames(video, names)
    for t in range(3):
        np.testing.assert_array_equal(clip.masks[t][1], masks[t][0])
        np.testing.assert_array_equal(clip.masks[t][2], masks[t][1])


def test_sa1b_raw_dataset(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (28, 36, 3), np.uint8)
    Image.fromarray(img).save(tmp_path / "sa_7.jpg")
    m_keep = np.zeros((28, 36), bool)
    m_keep[3:14, 5:20] = True
    m_zero_area = np.zeros((28, 36), bool)
    with open(tmp_path / "sa_7.json", "w") as f:
        json.dump(
            {
                "annotations": [
                    {"area": int(m_keep.sum()),
                     "segmentation": _encode_coco_rle(m_keep)},
                    {"area": 0,
                     "segmentation": _encode_coco_rle(m_zero_area)},
                ]
            },
            f,
        )
    ds = SA1BRawDataset(str(tmp_path), str(tmp_path))
    assert ds.videos == ["sa_7"]
    clip = ds.load_frames("sa_7", ds.frame_names("sa_7"))
    assert len(clip.frames) == 1 and len(clip.masks[0]) == 1
    np.testing.assert_array_equal(clip.masks[0][1], m_keep)
    # loader integration: 1-frame static video batches
    from det_sam2_tpu.training.dataset import RandomUniformSampler

    loader = VOSDataLoader(
        ds, sampler=RandomUniformSampler(num_frames=1, max_num_objects=1),
        image_size=32, batch_size=1, hflip_prob=0, color_jitter_prob=0,
    )
    imgs, gts = next(loader.batches(1))
    assert imgs.shape[:2] == (1, 1) and gts.shape[-2:] == (32, 32)


def test_eval_sampler_returns_all_frames():
    s = EvalSampler()
    names = [f"{i:05d}" for i in range(7)]
    shuffled = names[::-1]
    assert s.sample(random.Random(0), shuffled) == names


def test_affine_and_grayscale_consistency():
    rng = np.random.default_rng(3)
    frames = [rng.integers(0, 255, (40, 40, 3), np.uint8) for _ in range(3)]
    m = np.zeros((40, 40), bool)
    m[10:20, 12:26] = True
    clip = VideoClip(frames, [{1: m.copy()} for _ in range(3)])

    out = affine_clip(clip, random.Random(5))
    # same warp applied to every frame: mask transforms identically
    for t in range(1, 3):
        np.testing.assert_array_equal(out.masks[t][1], out.masks[0][1])
    # mask moved but preserved roughly in area
    assert out.masks[0][1].sum() > 0.5 * m.sum()
    assert not np.array_equal(out.masks[0][1], m)

    g = grayscale_clip(clip)
    for f in g.frames:
        np.testing.assert_array_equal(f[..., 0], f[..., 1])
        np.testing.assert_array_equal(f[..., 1], f[..., 2])
