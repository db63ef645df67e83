"""SAM2ImagePredictor: single-image promptable segmentation.

Behavioral equivalent of /root/reference/sam2/sam2_image_predictor.py
(SAM2ImagePredictor :20-466): set_image caches the FPN features (with the
no_mem_embed added, :119-121), predict() encodes point/box/mask prompts and
returns masks at the original image resolution. Batched prompts run as one
jitted decoder call.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from det_sam2_tpu.track import SAM2Engine
from det_sam2_tpu.utils.misc import prepare_frame, resize_masks_np


class SAM2ImagePredictor:
    def __init__(
        self,
        engine: SAM2Engine,
        mask_threshold: float = 0.0,
        max_hole_area: float = 0.0,
        max_sprinkle_area: float = 0.0,
    ):
        self.engine = engine
        self.cfg = engine.cfg
        self.image_size = engine.cfg.image_size
        self.mask_threshold = mask_threshold
        self.max_hole_area = max_hole_area
        self.max_sprinkle_area = max_sprinkle_area
        self.reset_predictor()

    def reset_predictor(self) -> None:
        self._features = None
        self._orig_hw: Optional[Tuple[int, int]] = None
        self._is_image_set = False

    # ------------------------------------------------------------------

    def set_image(self, image: np.ndarray) -> None:
        """image: RGB uint8 [H, W, 3]."""
        self._orig_hw = image.shape[:2]
        frame = prepare_frame(image, self.image_size)
        self._features = self.engine.encode_image(jnp.asarray(frame)[None])
        self._is_image_set = True

    def _transform_coords(self, coords: np.ndarray, normalize: bool) -> np.ndarray:
        coords = np.asarray(coords, np.float32)
        if normalize:
            h, w = self._orig_hw
            coords = coords / np.asarray([w, h], np.float32)
            coords = coords * self.image_size
        return coords

    def predict(
        self,
        point_coords: Optional[np.ndarray] = None,
        point_labels: Optional[np.ndarray] = None,
        box: Optional[np.ndarray] = None,
        mask_input: Optional[np.ndarray] = None,
        multimask_output: bool = True,
        return_logits: bool = False,
        normalize_coords: bool = True,
    ):
        """Returns (masks [M, H, W], iou_predictions [M], low_res [M, s4, s4]).

        Coordinates are in original-image pixels when normalize_coords=True
        (reference predict :~170-260)."""
        if not self._is_image_set:
            raise RuntimeError("call set_image before predict")
        coords, labels = self._prepare_prompts(
            point_coords, point_labels, box, normalize_coords
        )
        mi = None
        if mask_input is not None:
            mi = np.asarray(mask_input, np.float32)
            if mi.ndim == 3:
                mi = mi[None]
        out = self.engine.predict_step(
            self._features, coords[None] if coords.ndim == 2 else coords,
            labels[None] if labels.ndim == 1 else labels,
            mask_input=mi, multimask=multimask_output,
        )
        multimasks = np.asarray(out["multimasks"], np.float32)[0]  # [M, s4, s4]
        ious = np.asarray(out["ious"], np.float32)[0]
        masks = self._postprocess(multimasks, return_logits)
        return masks, ious, multimasks

    def predict_batch(
        self,
        point_coords_batch: np.ndarray,  # [B, P, 2]
        point_labels_batch: np.ndarray,  # [B, P]
        mask_input_batch: np.ndarray = None,  # [B, 1, s4, s4] logits
        multimask_output: bool = True,
        return_logits: bool = False,
        normalize_coords: bool = True,
    ):
        """Batch of prompts against the SAME image (AMG hot path)."""
        coords = self._transform_coords(point_coords_batch, normalize_coords)
        out = self.engine.predict_step(
            self._features, coords, np.asarray(point_labels_batch, np.int32),
            mask_input=mask_input_batch,
            multimask=multimask_output,
        )
        multimasks = np.asarray(out["multimasks"], np.float32)  # [B, M, s4, s4]
        ious = np.asarray(out["ious"], np.float32)
        masks = resize_masks_np(multimasks, self._orig_hw)
        if not return_logits:
            masks = masks > self.mask_threshold
        return masks, ious, multimasks

    def _prepare_prompts(self, point_coords, point_labels, box, normalize):
        parts_c, parts_l = [], []
        if box is not None:
            b = self._transform_coords(
                np.asarray(box, np.float32).reshape(2, 2), normalize
            )
            parts_c.append(b)
            parts_l.append(np.asarray([2, 3], np.int32))
        if point_coords is not None:
            assert point_labels is not None
            parts_c.append(self._transform_coords(
                np.asarray(point_coords, np.float32), normalize
            ))
            parts_l.append(np.asarray(point_labels, np.int32))
        if not parts_c:
            parts_c.append(np.zeros((1, 2), np.float32))
            parts_l.append(-np.ones((1,), np.int32))
        return np.concatenate(parts_c, axis=0), np.concatenate(parts_l, axis=0)

    def _postprocess(self, low_res_masks: np.ndarray, return_logits: bool):
        """Upscale to original resolution (+ optional hole/sprinkle cleanup,
        reference sam2/utils/transforms.py:84-120)."""
        masks = resize_masks_np(low_res_masks, self._orig_hw)
        if self.max_hole_area > 0 or self.max_sprinkle_area > 0:
            from det_sam2_tpu.ops.connected_components import (
                fill_holes_and_sprinkles_np,
            )

            masks = fill_holes_and_sprinkles_np(
                masks, self.mask_threshold,
                self.max_hole_area, self.max_sprinkle_area,
            )
        if not return_logits:
            masks = masks > self.mask_threshold
        return masks
