"""Host-side frame I/O and mask utilities.

Behavioral equivalents of /root/reference/sam2/utils/misc.py:
load_video_frames (:236-363, fork-extended to ndarray stream buffers,
fp16 storage), tensor_to_frame_rgb (:203-232), mask_to_box (:64-87).
All numpy (host); frames are NHWC float16, normalized with ImageNet stats.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple, Union

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

IMG_MEAN = np.asarray((0.485, 0.456, 0.406), np.float32)
IMG_STD = np.asarray((0.229, 0.224, 0.225), np.float32)


def _load_image_file(path: str, image_size: int) -> Tuple[np.ndarray, int, int]:
    from PIL import Image

    img = Image.open(path).convert("RGB")
    w, h = img.size
    return np.asarray(img.resize((image_size, image_size))), h, w


def prepare_frame(frame_rgb: np.ndarray, image_size: int) -> np.ndarray:
    """One RGB frame [H, W, 3] -> resized uint8
    [image_size, image_size, 3]. The reference resizes the uint8 frame with
    cv2 and only then normalizes (misc.py:329-346); storing the resized
    uint8 is byte-exact with that pipeline, 4x smaller than fp16, and the
    /255 + ImageNet normalization runs on-device in fp32 (more precise than
    the fork's fp16 frame buffer).

    Float frames are accepted in either [0, 1] (common from skimage /
    matplotlib decoders) or [0, 255] — a [0, 1] frame cast straight to
    uint8 would silently collapse to {0, 1} (near-black)."""
    if frame_rgb.dtype != np.uint8:
        frame_rgb = np.asarray(frame_rgb, np.float32)
        if frame_rgb.size and float(frame_rgb.max()) <= 1.0:
            frame_rgb = frame_rgb * 255.0
        frame_rgb = np.clip(frame_rgb, 0, 255).astype(np.uint8)
    if cv2 is not None:
        return cv2.resize(frame_rgb, (image_size, image_size))
    from PIL import Image

    return np.asarray(
        Image.fromarray(frame_rgb).resize((image_size, image_size))
    )


def normalize_frame(frame_rgb: np.ndarray, image_size: int) -> np.ndarray:
    """Resize + normalize on host (fp32). Prefer prepare_frame + on-device
    normalization for the streaming path."""
    img = prepare_frame(frame_rgb, image_size).astype(np.float32) / 255.0
    return ((img - IMG_MEAN) / IMG_STD).astype(np.float32)


def list_frame_dir(video_path: str) -> List[str]:
    """List a JPEG/PNG frame directory in frame-number order (the single
    convention shared by the eager and async loaders — int-named stems,
    reference misc.py load_video_frames_from_jpg_images)."""
    names = [
        p
        for p in os.listdir(video_path)
        if os.path.splitext(p)[-1].lower() in (".jpg", ".jpeg", ".png")
    ]
    names.sort(key=lambda p: int(os.path.splitext(p)[0]))
    if not names:
        raise RuntimeError(f"no frames found in {video_path}")
    return [os.path.join(video_path, n) for n in names]


def load_video_frames(
    video_path: Union[str, List, np.ndarray],
    image_size: int,
) -> Tuple[List[np.ndarray], int, int]:
    """Polymorphic loader: JPEG dir / list of paths / single image path /
    single ndarray frame / [N, H, W, 3] ndarray stack / list of ndarray
    frames / video file (cv2).

    Returns (list of RESIZED UINT8 HWC frames, video_height, video_width);
    /255 + ImageNet normalization happens on-device (see prepare_frame).
    """
    if isinstance(video_path, np.ndarray):
        if video_path.ndim == 4:  # [N, H, W, 3] frame stack
            h, w = video_path.shape[1:3]
            return (
                [prepare_frame(f, image_size) for f in video_path], h, w
            )
        h, w = video_path.shape[:2]
        return [prepare_frame(video_path, image_size)], h, w

    if isinstance(video_path, list) and video_path and isinstance(
        video_path[0], np.ndarray
    ):
        h, w = video_path[0].shape[:2]
        return [prepare_frame(f, image_size) for f in video_path], h, w

    if isinstance(video_path, list):
        img_paths = list(video_path)
    elif isinstance(video_path, str) and os.path.isdir(video_path):
        img_paths = list_frame_dir(video_path)
    elif isinstance(video_path, str) and os.path.isfile(video_path):
        ext = os.path.splitext(video_path)[-1].lower()
        if ext in (".mp4", ".avi", ".mov", ".mkv") and cv2 is not None:
            cap = cv2.VideoCapture(video_path)
            frames = []
            h = w = None
            while True:
                ok, frame = cap.read()
                if not ok:
                    break
                rgb = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
                if h is None:
                    h, w = rgb.shape[:2]
                frames.append(prepare_frame(rgb, image_size))
            cap.release()
            if not frames:
                raise RuntimeError(f"no frames decoded from {video_path}")
            return frames, h, w
        img_paths = [video_path]
    else:
        raise NotImplementedError(f"unsupported video input: {type(video_path)}")

    frames = []
    h = w = None
    for p in img_paths:
        arr, h, w = _load_image_file(p, image_size)
        frames.append(arr)
    return frames, h, w


def tensor_to_frame_rgb(
    frame: np.ndarray,
    original_size: Tuple[int, int] = (1920, 1080),
) -> np.ndarray:
    """Inverse of frame preparation: stored frame (uint8 resized, or
    normalized float) -> uint8 RGB at original (W, H) size
    (misc.py:203-232)."""
    if frame.dtype == np.uint8:
        img = frame.astype(np.float32) / 255.0
    else:
        img = frame.astype(np.float32) * IMG_STD + IMG_MEAN
    if cv2 is not None:
        img = cv2.resize(img, original_size)
    else:
        from PIL import Image

        img = np.asarray(
            Image.fromarray(
                np.clip(img * 255.0, 0, 255).astype(np.uint8)
            ).resize(original_size)
        ).astype(np.float32) / 255.0
    return np.clip(img * 255.0, 0, 255).astype(np.uint8)


def mask_to_box_np(masks: np.ndarray) -> np.ndarray:
    """[..., H, W] binary -> xyxy [..., 4]; empty masks -> zeros
    (misc.py:64-87; also the AMG's batched_mask_to_box, amg.py:328-369 —
    one vectorized implementation instead of a per-mask nonzero loop)."""
    shape = masks.shape[:-2]
    h, w = masks.shape[-2:]
    if masks.size == 0:
        return np.zeros((*shape, 4), np.float32)
    flat = masks.reshape(-1, h, w) > 0
    any_y = flat.any(axis=2)  # [B, H] rows containing foreground
    any_x = flat.any(axis=1)  # [B, W] columns containing foreground
    y_min = np.argmax(any_y, axis=1)
    y_max = h - 1 - np.argmax(any_y[:, ::-1], axis=1)
    x_min = np.argmax(any_x, axis=1)
    x_max = w - 1 - np.argmax(any_x[:, ::-1], axis=1)
    out = np.stack([x_min, y_min, x_max, y_max], axis=-1).astype(np.float32)
    out[~any_y.any(axis=1)] = 0.0
    return out.reshape(*shape, 4)


def concat_points(old, points: np.ndarray, labels: np.ndarray):
    """Merge point prompts (misc.py:396-404). old is None or a dict."""
    if old is None:
        return {"point_coords": points, "point_labels": labels}
    return {
        "point_coords": np.concatenate([old["point_coords"], points], axis=1),
        "point_labels": np.concatenate([old["point_labels"], labels], axis=1),
    }


_RESIZE_TAPS: dict = {}


def _bilinear_taps(src: int, dst: int):
    """(i0, i1, w0, w1) per output position: bilinear rows have at most two
    nonzero weights (torch half-pixel convention via resize_weights)."""
    key = (src, dst)
    taps = _RESIZE_TAPS.get(key)
    if taps is None:
        from det_sam2_tpu.utils.resize import resize_weights

        w = resize_weights(src, dst, "bilinear")  # [dst, src]
        order = np.argsort(-w, axis=1)[:, :2]
        i0, i1 = order[:, 0], order[:, 1]
        rows = np.arange(dst)
        taps = (
            i0, i1,
            w[rows, i0].astype(np.float32)[:, None],
            w[rows, i1].astype(np.float32)[:, None],
        )
        _RESIZE_TAPS[key] = taps
    return taps


def resize_masks_np(masks: np.ndarray, out_hw: Tuple[int, int]) -> np.ndarray:
    """Host-side bilinear resize of mask logits [..., h, w] -> [..., H, W]
    (cv2 INTER_LINEAR matches torch align_corners=False semantics; used to
    avoid large device->host transfers of video-res masks). Without cv2,
    a separable 2-tap gather resize with the same torch-exact weights."""
    h, w = masks.shape[-2:]
    oh, ow = int(out_hw[0]), int(out_hw[1])
    if (h, w) == (oh, ow):
        return masks
    lead = masks.shape[:-2]
    flat = masks.reshape(-1, h, w).astype(np.float32)
    if cv2 is not None:
        # batch masks through cv2's channel axis (this build rejects >128
        # channels): AMG resizes hundreds of masks per point batch, and one
        # multi-channel resize beats a Python loop of single-mask calls
        b = flat.shape[0]
        chunks = []
        for i in range(0, b, 128):
            hwc = np.ascontiguousarray(np.moveaxis(flat[i : i + 128], 0, -1))
            r = cv2.resize(hwc, (ow, oh), interpolation=cv2.INTER_LINEAR)
            if r.ndim == 2:  # cv2 squeezes single-channel outputs
                r = r[:, :, None]
            chunks.append(np.moveaxis(r, -1, 0))
        out = np.concatenate(chunks, axis=0)
    else:
        j0, j1, v0, v1 = _bilinear_taps(w, ow)
        x = flat[:, :, j0] * v0[:, 0] + flat[:, :, j1] * v1[:, 0]
        i0, i1, u0, u1 = _bilinear_taps(h, oh)
        out = x[:, i0, :] * u0 + x[:, i1, :] * u1
    return out.reshape(*lead, oh, ow)


class AsyncFrameLoader:
    """Background-thread frame preparation (the fork's AsyncVideoFrameLoader,
    misc.py:102-200): accepts image paths or RGB ndarrays, resizes on a
    daemon thread ahead of consumption, and exposes indexed access that
    blocks only until the requested frame is ready."""

    def __init__(self, sources, image_size: int, prefetch: int = 64):
        import threading

        self.sources = list(sources)
        self.image_size = image_size
        self.prefetch = prefetch
        self._frames: dict = {}
        self._cond = threading.Condition()
        self._error = None
        self._max_requested = 0
        self.video_height = None
        self.video_width = None
        if self.sources:
            first = self._load(0)
            with self._cond:
                self._frames[0] = first
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _load(self, idx: int) -> np.ndarray:
        src = self.sources[idx]
        if isinstance(src, np.ndarray):
            if self.video_height is None:
                self.video_height, self.video_width = src.shape[:2]
            return prepare_frame(src, self.image_size)
        # byte-identical with the eager loader's PIL resize so
        # async_loading_frames changes scheduling, not pixels
        arr, h, w = _load_image_file(src, self.image_size)
        if self.video_height is None:
            self.video_height, self.video_width = h, w
        return arr

    def _worker(self):
        try:
            for i in range(len(self.sources)):
                if i in self._frames:
                    continue
                # decode at most `prefetch` frames ahead of the furthest
                # consumer request: a 10k-frame list must not be decoded
                # (and held) up-front when only the head is being read.
                # Loaded frames stay cached for random access — the same
                # retention as the fork's AsyncVideoFrameLoader images list.
                with self._cond:
                    while (
                        i > self._max_requested + self.prefetch
                        and self._error is None
                    ):
                        self._cond.wait(timeout=5)
                frame = self._load(i)
                with self._cond:
                    self._frames[i] = frame
                    self._cond.notify_all()
        except Exception as e:  # surfaced on next access
            with self._cond:
                self._error = e
                self._cond.notify_all()

    def __len__(self):
        return len(self.sources)

    def __getitem__(self, idx: int) -> np.ndarray:
        if not (0 <= idx < len(self.sources)):
            raise IndexError(
                f"frame {idx} out of range [0, {len(self.sources)})"
            )
        with self._cond:
            if idx > self._max_requested:
                self._max_requested = idx
                self._cond.notify_all()  # wake the worker's prefetch gate
            while idx not in self._frames and self._error is None:
                self._cond.wait(timeout=30)
            if self._error is not None:
                raise self._error
            return self._frames[idx]

    def to_list(self):
        return [self[i] for i in range(len(self))]
