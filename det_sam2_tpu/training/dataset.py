"""VOS training data pipeline (host numpy).

Behavioral equivalent of /root/reference/training/dataset/* :
  * PNGRawDataset-style raw videos (JPEG frame dirs + palettised PNG masks,
    vos_raw_dataset.py:56) and static images as 1-frame videos
    (SA1B-style, :148);
  * RandomUniformSampler (vos_sampler.py:31): sample num_frames frames and
    up to max_num_objects objects per clip;
  * video-consistent augmentations (transforms.py: horizontal flip, resize,
    color jitter — the same transform applied to every frame of a clip);
  * batching to the [T, B, H, W, 3] images / [T, B, H, W] per-object masks
    layout of BatchedVideoDatapoint (data_utils.py:36-113): each batch row
    is one (video, object) track.
"""

from __future__ import annotations

import dataclasses
import os
import random
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from det_sam2_tpu.utils.misc import IMG_MEAN, IMG_STD


@dataclasses.dataclass
class VideoClip:
    frames: List[np.ndarray]  # RGB uint8 [H, W, 3]
    masks: List[Dict[int, np.ndarray]]  # per frame: obj_id -> bool [H, W]


class PNGRawDataset:
    """<root>/JPEGImages/<video>/*.jpg + <root>/Annotations/<video>/*.png
    (DAVIS/MOSE layout)."""

    def __init__(self, img_folder: str, gt_folder: str,
                 file_list: Optional[Sequence[str]] = None):
        self.img_folder = img_folder
        self.gt_folder = gt_folder
        self.videos = (
            list(file_list) if file_list else sorted(os.listdir(img_folder))
        )

    def __len__(self):
        return len(self.videos)

    def frame_names(self, video: str) -> List[str]:
        d = os.path.join(self.img_folder, video)
        return sorted(
            os.path.splitext(n)[0]
            for n in os.listdir(d)
            if os.path.splitext(n)[-1].lower() in (".jpg", ".jpeg", ".png")
        )

    def load_frames(self, video: str, names: Sequence[str]) -> VideoClip:
        from PIL import Image

        frames, masks = [], []
        for name in names:
            for ext in (".jpg", ".jpeg", ".png"):
                p = os.path.join(self.img_folder, video, name + ext)
                if os.path.exists(p):
                    frames.append(np.asarray(Image.open(p).convert("RGB")))
                    break
            mask_path = os.path.join(self.gt_folder, video, name + ".png")
            per_obj: Dict[int, np.ndarray] = {}
            if os.path.exists(mask_path):
                arr = np.asarray(Image.open(mask_path))
                for obj_id in np.unique(arr):
                    if obj_id != 0:
                        per_obj[int(obj_id)] = arr == obj_id
            masks.append(per_obj)
        return VideoClip(frames, masks)


class SyntheticRawDataset:
    """Procedural moving-shape videos for tests/smoke training."""

    def __init__(self, num_videos: int = 8, num_frames: int = 8,
                 hw: Tuple[int, int] = (128, 128), seed: int = 0):
        self.num_videos = num_videos
        self.num_frames = num_frames
        self.hw = hw
        self.seed = seed
        self.videos = [f"synthetic_{i}" for i in range(num_videos)]

    def __len__(self):
        return self.num_videos

    def frame_names(self, video: str) -> List[str]:
        return [f"{i:05d}" for i in range(self.num_frames)]

    def load_frames(self, video: str, names: Sequence[str]) -> VideoClip:
        h, w = self.hw
        vid_idx = self.videos.index(video)
        rng = np.random.default_rng(self.seed + vid_idx)
        x0, y0 = rng.integers(5, w // 3), rng.integers(5, h // 3)
        dx, dy = rng.integers(1, 5), rng.integers(1, 4)
        size = int(rng.integers(16, 32))
        frames, masks = [], []
        for t, _ in enumerate(names):
            f = np.full((h, w, 3), 30, np.uint8)
            x = min(x0 + dx * t, w - size - 1)
            y = min(y0 + dy * t, h - size - 1)
            f[y : y + size, x : x + size] = (200, 40, 40)
            m = np.zeros((h, w), bool)
            m[y : y + size, x : x + size] = True
            frames.append(f)
            masks.append({1: m})
        return VideoClip(frames, masks)


class RandomUniformSampler:
    """Pick num_frames sorted frames and <= max_num_objects objects
    (vos_sampler.py:31-78)."""

    def __init__(self, num_frames: int = 8, max_num_objects: int = 3,
                 reverse_time_prob: float = 0.0):
        self.num_frames = num_frames
        self.max_num_objects = max_num_objects
        self.reverse_time_prob = reverse_time_prob

    def sample(self, rng: random.Random, names: List[str]) -> List[str]:
        if len(names) < self.num_frames:
            picks = sorted(rng.choices(range(len(names)), k=self.num_frames))
        else:
            start = rng.randint(0, len(names) - self.num_frames)
            picks = list(range(start, start + self.num_frames))
        if rng.random() < self.reverse_time_prob:
            picks = picks[::-1]
        return [names[i] for i in picks]


# ---------------------------------------------------------------------------
# video-consistent augmentations
# ---------------------------------------------------------------------------


def hflip_clip(clip: VideoClip) -> VideoClip:
    return VideoClip(
        [f[:, ::-1] for f in clip.frames],
        [{k: m[:, ::-1] for k, m in per.items()} for per in clip.masks],
    )


def color_jitter_clip(clip: VideoClip, rng: random.Random,
                      strength: float = 0.1) -> VideoClip:
    scale = np.asarray(
        [1.0 + rng.uniform(-strength, strength) for _ in range(3)], np.float32
    )
    shift = rng.uniform(-strength, strength) * 255 * 0.2
    frames = [
        np.clip(f.astype(np.float32) * scale + shift, 0, 255).astype(np.uint8)
        for f in clip.frames
    ]
    return VideoClip(frames, clip.masks)


def resize_clip(clip: VideoClip, size: int) -> VideoClip:
    import cv2

    frames = [cv2.resize(f, (size, size)) for f in clip.frames]
    masks = [
        {
            k: cv2.resize(m.astype(np.uint8), (size, size),
                          interpolation=cv2.INTER_NEAREST).astype(bool)
            for k, m in per.items()
        }
        for per in clip.masks
    ]
    return VideoClip(frames, masks)


# ---------------------------------------------------------------------------
# loader
# ---------------------------------------------------------------------------


class VOSDataLoader:
    """Random-clip iterator producing jit-ready batches.

    Each element: (images [T, B, S, S, 3] fp32 normalized,
                   gt_masks [T, B, S, S] fp32) where B rows are
    (video, object) tracks."""

    def __init__(
        self,
        dataset,
        sampler: Optional[RandomUniformSampler] = None,
        image_size: int = 128,
        batch_size: int = 2,
        hflip_prob: float = 0.5,
        color_jitter_prob: float = 0.8,
        seed: int = 0,
    ):
        self.dataset = dataset
        self.sampler = sampler or RandomUniformSampler()
        self.image_size = image_size
        self.batch_size = batch_size
        self.hflip_prob = hflip_prob
        self.color_jitter_prob = color_jitter_prob
        self.seed = seed

    def _load_track(self, rng: random.Random):
        video = rng.choice(self.dataset.videos)
        names = self.sampler.sample(rng, self.dataset.frame_names(video))
        clip = self.dataset.load_frames(video, names)
        if rng.random() < self.hflip_prob:
            clip = hflip_clip(clip)
        if rng.random() < self.color_jitter_prob:
            clip = color_jitter_clip(clip, rng)
        clip = resize_clip(clip, self.image_size)
        # choose up to max_num_objects present in the first frame
        # (vos_sampler.py:31-78; missing objects pad with empty masks)
        k = max(self.sampler.max_num_objects, 1)
        obj_ids = sorted(clip.masks[0].keys()) or sorted(
            {o for per in clip.masks for o in per.keys()}
        )
        if not obj_ids:
            return None
        chosen = rng.sample(obj_ids, k=min(k, len(obj_ids)))
        imgs = np.stack(
            [
                ((f.astype(np.float32) / 255.0) - IMG_MEAN) / IMG_STD
                for f in clip.frames
            ]
        )
        hw = imgs.shape[1:3]
        masks = np.stack(
            [
                np.stack(
                    [
                        per.get(chosen[j], np.zeros(hw, bool))
                        if j < len(chosen)
                        else np.zeros(hw, bool)
                        for j in range(k)
                    ]
                )
                for per in clip.masks
            ]
        ).astype(np.float32)  # [T, K, H, W]
        if k == 1:
            masks = masks[:, 0]
        return imgs, masks

    def batches(self, num_batches: int) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        rng = random.Random(self.seed)
        for _ in range(num_batches):
            rows = []
            while len(rows) < self.batch_size:
                item = self._load_track(rng)
                if item is not None:
                    rows.append(item)
            imgs = np.stack([r[0] for r in rows], axis=1)  # [T, B, S, S, 3]
            masks = np.stack([r[1] for r in rows], axis=1)  # [T, B, S, S]
            yield imgs, masks


class MixedDataLoader:
    """Sample batches from multiple datasets with per-dataset weights
    (reference TorchTrainMixedDataset / MixedDataLoader,
    training/dataset/sam2_datasets.py:18-113 — chunked multi-dataset epochs
    become weighted sampling over per-dataset loaders)."""

    def __init__(self, loaders, weights=None, seed: int = 0):
        self.loaders = list(loaders)
        if weights is None:
            weights = [1.0] * len(self.loaders)
        w = np.asarray(weights, np.float64)
        self.probs = w / w.sum()
        self.seed = seed

    def batches(self, num_batches: int):
        rng = np.random.default_rng(self.seed)
        iters = [None] * len(self.loaders)
        for _ in range(num_batches):
            i = int(rng.choice(len(self.loaders), p=self.probs))
            if iters[i] is None:
                iters[i] = self.loaders[i].batches(num_batches)
            try:
                yield next(iters[i])
            except StopIteration:
                iters[i] = self.loaders[i].batches(num_batches)
                yield next(iters[i])
