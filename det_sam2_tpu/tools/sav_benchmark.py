"""SA-V / DAVIS-style J&F benchmark.

Behavioral equivalent of /root/reference/sav_dataset/utils/sav_benchmark.py
(VideoEvaluator :26-...): per-object J (region IoU) and F (boundary measure,
bipartite boundary matching with a dilated tolerance band), skipping the
first and last annotated frames like the reference, averaged into J&F.
"""

from __future__ import annotations

import math
import os
from typing import Dict, List, Sequence, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def db_eval_iou(annotation: np.ndarray, segmentation: np.ndarray) -> float:
    """Region similarity J = |A & S| / |A | S| (empty-empty -> 1)."""
    a = annotation > 0
    s = segmentation > 0
    union = np.logical_or(a, s).sum()
    if union == 0:
        return 1.0
    return float(np.logical_and(a, s).sum() / union)


def _seg_to_boundary(seg: np.ndarray) -> np.ndarray:
    """Boundary pixels of a binary mask (morphological gradient)."""
    seg = seg.astype(np.uint8)
    if cv2 is not None:
        kernel = np.ones((3, 3), np.uint8)
        er = cv2.erode(seg, kernel)
        return (seg - er) > 0
    pad = np.pad(seg, 1)
    er = np.min(
        np.stack([
            pad[i : i + seg.shape[0], j : j + seg.shape[1]]
            for i in range(3) for j in range(3)
        ]),
        axis=0,
    )
    return (seg - er) > 0


def db_eval_boundary(
    annotation: np.ndarray, segmentation: np.ndarray, bound_th: float = 0.008
) -> float:
    """Boundary F-measure with a bound_th*diagonal matching tolerance
    (DAVIS semantics as in sav_benchmark.py)."""
    a = annotation > 0
    s = segmentation > 0
    fg_b = _seg_to_boundary(s)
    gt_b = _seg_to_boundary(a)

    bound_pix = max(
        1, int(np.ceil(bound_th * np.linalg.norm(annotation.shape)))
    )
    if cv2 is not None:
        kernel = cv2.getStructuringElement(
            cv2.MORPH_ELLIPSE, (2 * bound_pix + 1, 2 * bound_pix + 1)
        )
        fg_dil = cv2.dilate(fg_b.astype(np.uint8), kernel) > 0
        gt_dil = cv2.dilate(gt_b.astype(np.uint8), kernel) > 0
    else:
        from scipy import ndimage

        st = np.zeros((2 * bound_pix + 1,) * 2, bool)
        yy, xx = np.ogrid[: st.shape[0], : st.shape[1]]
        st[(yy - bound_pix) ** 2 + (xx - bound_pix) ** 2 <= bound_pix ** 2] = 1
        fg_dil = ndimage.binary_dilation(fg_b, st)
        gt_dil = ndimage.binary_dilation(gt_b, st)

    gt_match = gt_b & fg_dil
    fg_match = fg_b & gt_dil
    n_fg = fg_b.sum()
    n_gt = gt_b.sum()
    if n_fg == 0 and n_gt == 0:
        return 1.0
    if n_fg == 0 or n_gt == 0:
        return 0.0
    precision = fg_match.sum() / n_fg
    recall = gt_match.sum() / n_gt
    if precision + recall == 0:
        return 0.0
    return float(2 * precision * recall / (precision + recall))


def evaluate_object(
    gt_masks: Sequence[np.ndarray], pred_masks: Sequence[np.ndarray],
    skip_first_and_last: bool = True,
) -> Dict[str, float]:
    """Per-object J/F over a video (first/last frames skipped like the
    reference's semi-supervised protocol)."""
    assert len(gt_masks) == len(pred_masks)
    idxs = range(len(gt_masks))
    if skip_first_and_last and len(gt_masks) > 2:
        idxs = range(1, len(gt_masks) - 1)
    js, fs = [], []
    for i in idxs:
        js.append(db_eval_iou(gt_masks[i], pred_masks[i]))
        fs.append(db_eval_boundary(gt_masks[i], pred_masks[i]))
    j = float(np.mean(js)) if js else 1.0
    f = float(np.mean(fs)) if fs else 1.0
    return {"J": j, "F": f, "J&F": (j + f) / 2}


def evaluate_videos(
    results: Dict[str, Dict[int, Tuple[List[np.ndarray], List[np.ndarray]]]],
    skip_first_and_last: bool = True,
) -> Dict[str, float]:
    """results: {video: {obj_id: (gt_list, pred_list)}} -> global means."""
    per_obj = []
    for video, objs in results.items():
        for obj_id, (gt, pred) in objs.items():
            per_obj.append(evaluate_object(gt, pred, skip_first_and_last))
    if not per_obj:
        return {"J": 0.0, "F": 0.0, "J&F": 0.0}
    return {
        "J": float(np.mean([r["J"] for r in per_obj])),
        "F": float(np.mean([r["F"] for r in per_obj])),
        "J&F": float(np.mean([r["J&F"] for r in per_obj])),
    }


def load_palettised_png_masks(mask_dir: str) -> Dict[int, Dict[int, np.ndarray]]:
    """Load DAVIS-style palettised PNGs: {frame_idx: {obj_id: mask}}."""
    from PIL import Image

    out: Dict[int, Dict[int, np.ndarray]] = {}
    for name in sorted(os.listdir(mask_dir)):
        if not name.endswith(".png"):
            continue
        frame_idx = int(os.path.splitext(name)[0])
        arr = np.asarray(Image.open(os.path.join(mask_dir, name)))
        per_obj = {}
        for obj_id in np.unique(arr):
            if obj_id == 0:
                continue
            per_obj[int(obj_id)] = arr == obj_id
        out[frame_idx] = per_obj
    return out
