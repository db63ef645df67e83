"""Interactive-prompt simulation: box noising and correction-click sampling.

Behavioral equivalents of /root/reference/sam2/modeling/sam2_utils.py
(sample_box_points :164, sample_random_points_from_errors :212,
sample_one_point_from_error_center :255, get_next_point :313).

`sample_box_points` and `sample_random_points_from_errors` are pure jnp
(PRNG-key driven) so correction clicks run INSIDE the jitted train step —
the reference's cv2-based "center" method is provided as a host/numpy
variant for evaluation tooling.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from det_sam2_tpu.training.sam2_train import mask_to_box


def sample_box_points(
    key: jax.Array,
    masks: jnp.ndarray,  # [B, H, W] bool/float
    noise: float = 0.1,
    noise_bound: int = 20,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """GT masks -> noised corner prompts ([B,2,2] coords, [B,2] labels 2/3)."""
    b, h, w = masks.shape
    box = mask_to_box(masks)  # [B, 4] xyxy
    labels = jnp.broadcast_to(jnp.asarray([2, 3], jnp.int32)[None], (b, 2))
    if noise > 0.0:
        bw = box[:, 2] - box[:, 0]
        bh = box[:, 3] - box[:, 1]
        max_dx = jnp.minimum(bw * noise, float(noise_bound))
        max_dy = jnp.minimum(bh * noise, float(noise_bound))
        eps = 2.0 * jax.random.uniform(key, (b, 4)) - 1.0
        eps = eps * jnp.stack([max_dx, max_dy, max_dx, max_dy], axis=-1)
        box = box + eps
        bounds = jnp.asarray([w - 1, h - 1, w - 1, h - 1], jnp.float32)
        box = jnp.clip(box, 0.0, bounds)
    return box.reshape(b, 2, 2), labels


def sample_random_points_from_errors(
    key: jax.Array,
    gt_masks: jnp.ndarray,  # [B, H, W] bool
    pred_masks: Optional[jnp.ndarray],  # [B, H, W] bool or None
    num_pt: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample correction clicks uniformly from FP/FN error regions
    (sam2_utils.py:212-253, the random-argmax trick)."""
    gt = gt_masks > 0
    pred = jnp.zeros_like(gt) if pred_masks is None else pred_masks > 0
    b, h, w = gt.shape
    fp = ~gt & pred
    fn = gt & ~pred
    all_correct = jnp.all((gt == pred).reshape(b, -1), axis=1)[:, None, None]

    noise = jax.random.uniform(key, (b, num_pt, h, w, 2))
    chan0 = (fp | (all_correct & ~gt))[:, None, :, :]
    chan1 = fn[:, None, :, :]
    noise = noise * jnp.stack(
        [chan0.astype(noise.dtype), chan1.astype(noise.dtype)], axis=-1
    ).reshape(b, 1, h, w, 2)
    idx = jnp.argmax(noise.reshape(b, num_pt, -1), axis=2)
    labels = (idx % 2).astype(jnp.int32)
    pix = idx // 2
    x = (pix % w).astype(jnp.float32)
    y = (pix // w).astype(jnp.float32)
    return jnp.stack([x, y], axis=2), labels


def sample_one_point_from_error_center_np(
    gt_masks: np.ndarray, pred_masks: Optional[np.ndarray], padding: bool = True
) -> Tuple[np.ndarray, np.ndarray]:
    """RITM center-click sampling via distance transform (host numpy/cv2,
    sam2_utils.py:255-311)."""
    import cv2

    gt = np.asarray(gt_masks) > 0
    pred = np.zeros_like(gt) if pred_masks is None else np.asarray(pred_masks) > 0
    b, h, w = gt.shape
    fp = ~gt & pred
    fn = gt & ~pred
    points = np.zeros((b, 1, 2), np.float32)
    labels = np.ones((b, 1), np.int32)
    for i in range(b):
        fn_m, fp_m = fn[i], fp[i]
        if padding:
            fn_m = np.pad(fn_m, 1)
            fp_m = np.pad(fp_m, 1)
        fn_dt = cv2.distanceTransform(fn_m.astype(np.uint8), cv2.DIST_L2, 0)
        fp_dt = cv2.distanceTransform(fp_m.astype(np.uint8), cv2.DIST_L2, 0)
        if padding:
            fn_dt = fn_dt[1:-1, 1:-1]
            fp_dt = fp_dt[1:-1, 1:-1]
        fn_idx = int(np.argmax(fn_dt))
        fp_idx = int(np.argmax(fp_dt))
        is_pos = fn_dt.reshape(-1)[fn_idx] > fp_dt.reshape(-1)[fp_idx]
        idx = fn_idx if is_pos else fp_idx
        points[i, 0] = (idx % w, idx // w)
        labels[i, 0] = int(is_pos)
    return points, labels


def get_next_point(key, gt_masks, pred_masks, method: str = "uniform"):
    """(sam2_utils.py:313-321)"""
    if method == "uniform":
        return sample_random_points_from_errors(key, gt_masks, pred_masks)
    raise ValueError(f"unknown in-graph sampling method {method}")
