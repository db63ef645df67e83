"""Training losses: focal + dice + IoU + object-score, multi-step multi-mask.

Behavioral equivalent of /root/reference/training/loss_fns.py (dice_loss :20,
sigmoid_focal_loss :52, iou_loss :93, MultiStepMultiMasksAndIous :126) as
pure jnp functions. The distributed num_objects all-reduce of the reference
(:171-174) becomes a jax.lax.pmean over the data axis when run under a mesh
(handled by the caller passing the globally-averaged num_objects).
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp

CORE_LOSS_KEY = "core_loss"

DEFAULT_WEIGHTS = {
    # sam2.1_hiera_b+_MOSE_finetune.yaml:285-296
    "loss_mask": 20.0,
    "loss_dice": 1.0,
    "loss_iou": 1.0,
    "loss_class": 1.0,
}


def _bce_with_logits(logits, targets):
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


def sigmoid_focal_loss(
    inputs, targets, num_objects, alpha: float = 0.25, gamma: float = 2.0,
    loss_on_multimask: bool = False,
):
    prob = jax.nn.sigmoid(inputs)
    ce = _bce_with_logits(inputs, targets)
    p_t = prob * targets + (1 - prob) * (1 - targets)
    loss = ce * (1 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    if loss_on_multimask:
        return loss.reshape(*loss.shape[:2], -1).mean(-1) / num_objects
    return loss.mean(axis=1).sum() / num_objects


def dice_loss(inputs, targets, num_objects, loss_on_multimask: bool = False):
    inputs = jax.nn.sigmoid(inputs)
    if loss_on_multimask:
        inputs = inputs.reshape(*inputs.shape[:2], -1)
        targets = targets.reshape(*targets.shape[:2], -1)
        numerator = 2 * (inputs * targets).sum(-1)
    else:
        inputs = inputs.reshape(inputs.shape[0], -1)
        targets = targets.reshape(targets.shape[0], -1)
        numerator = 2 * (inputs * targets).sum(1)
    denominator = inputs.sum(-1) + targets.sum(-1)
    loss = 1 - (numerator + 1) / (denominator + 1)
    if loss_on_multimask:
        return loss / num_objects
    return loss.sum() / num_objects


def iou_loss(
    inputs, targets, pred_ious, num_objects, loss_on_multimask: bool = False,
    use_l1_loss: bool = False,
):
    pred_mask = inputs.reshape(*inputs.shape[:2], -1) > 0
    gt_mask = targets.reshape(*targets.shape[:2], -1) > 0
    area_i = jnp.sum(pred_mask & gt_mask, axis=-1).astype(jnp.float32)
    area_u = jnp.sum(pred_mask | gt_mask, axis=-1).astype(jnp.float32)
    actual_ious = area_i / jnp.clip(area_u, min=1.0)
    if use_l1_loss:
        loss = jnp.abs(pred_ious - actual_ious)
    else:
        loss = jnp.square(pred_ious - actual_ious)
    if loss_on_multimask:
        return loss / num_objects
    return loss.sum() / num_objects


class MultiStepMultiMasksAndIous:
    """Multi-step loss over prediction steps; per step, supervise the
    multimask channel with the lowest focal+dice combo
    (training/loss_fns.py:126-307)."""

    def __init__(
        self,
        weight_dict: Dict[str, float] = None,
        focal_alpha: float = 0.25,
        focal_gamma: float = 2.0,
        supervise_all_iou: bool = False,
        iou_use_l1_loss: bool = False,
        pred_obj_scores: bool = False,
        focal_gamma_obj_score: float = 0.0,
        focal_alpha_obj_score: float = -1.0,
    ):
        self.weight_dict = dict(weight_dict or DEFAULT_WEIGHTS)
        self.weight_dict.setdefault("loss_class", 0.0)
        self.focal_alpha = focal_alpha
        self.focal_gamma = focal_gamma
        self.supervise_all_iou = supervise_all_iou
        self.iou_use_l1_loss = iou_use_l1_loss
        self.pred_obj_scores = pred_obj_scores
        self.focal_gamma_obj_score = focal_gamma_obj_score
        self.focal_alpha_obj_score = focal_alpha_obj_score

    def __call__(self, outs_batch: List[Dict], targets_batch: jnp.ndarray):
        """outs_batch: per-frame dicts with 'multistep_pred_multimasks_high_res'
        (list of [N, M, H, W]), 'multistep_pred_ious', and
        'multistep_object_score_logits'. targets_batch: [T, N, H, W]."""
        assert len(outs_batch) == targets_batch.shape[0]
        # object rows are PADDED to a static count (dataset._load_track);
        # the reference batches only real tracks and divides by their
        # number (loss_fns.py:168-174), so padded all-empty rows must not
        # dilute the scale or be supervised. A real row is non-empty in at
        # least one frame (selection requires first-frame visibility).
        row_valid = (targets_batch > 0).any(axis=(0, 2, 3))  # [N]
        num_objects = jnp.maximum(
            row_valid.sum().astype(jnp.float32), 1.0
        )
        losses = {"loss_mask": 0.0, "loss_dice": 0.0, "loss_iou": 0.0,
                  "loss_class": 0.0}
        for outs, targets in zip(outs_batch, targets_batch):
            self._forward(losses, outs, targets, num_objects, row_valid)
        losses[CORE_LOSS_KEY] = self.reduce_loss(losses)
        return losses

    def _forward(self, losses, outputs, targets, num_objects, row_valid):
        target_masks = targets[:, None].astype(jnp.float32)  # [N, 1, H, W]
        for src_masks, ious, object_score_logits in zip(
            outputs["multistep_pred_multimasks_high_res"],
            outputs["multistep_pred_ious"],
            outputs["multistep_object_score_logits"],
        ):
            self._update_losses(
                losses, src_masks, target_masks, ious, num_objects,
                object_score_logits, row_valid,
            )

    def _update_losses(self, losses, src_masks, target_masks, ious,
                       num_objects, object_score_logits, row_valid):
        target_masks = jnp.broadcast_to(target_masks, src_masks.shape)
        loss_multimask = sigmoid_focal_loss(
            src_masks, target_masks, num_objects,
            alpha=self.focal_alpha, gamma=self.focal_gamma,
            loss_on_multimask=True,
        )
        loss_multidice = dice_loss(
            src_masks, target_masks, num_objects, loss_on_multimask=True
        )
        if not self.pred_obj_scores:
            loss_class = jnp.asarray(0.0, jnp.float32)
            target_obj = jnp.ones((loss_multimask.shape[0], 1), jnp.float32)
        else:
            target_obj = jnp.any(
                (target_masks[:, 0] > 0).reshape(target_masks.shape[0], -1),
                axis=-1,
            )[..., None].astype(jnp.float32)
            loss_class_rows = sigmoid_focal_loss(
                object_score_logits, target_obj, num_objects,
                alpha=self.focal_alpha_obj_score,
                gamma=self.focal_gamma_obj_score,
                loss_on_multimask=True,  # per-row, gated below
            )
            loss_class = (
                loss_class_rows * row_valid[:, None].astype(jnp.float32)
            ).sum()

        loss_multiiou = iou_loss(
            src_masks, target_masks, ious, num_objects,
            loss_on_multimask=True, use_l1_loss=self.iou_use_l1_loss,
        )
        if loss_multimask.shape[1] > 1:
            loss_combo = (
                loss_multimask * self.weight_dict["loss_mask"]
                + loss_multidice * self.weight_dict["loss_dice"]
            )
            best = jnp.argmin(loss_combo, axis=-1)
            onehot = jax.nn.one_hot(best, loss_combo.shape[-1],
                                    dtype=loss_multimask.dtype)
            loss_mask = (loss_multimask * onehot).sum(-1, keepdims=True)
            loss_dice = (loss_multidice * onehot).sum(-1, keepdims=True)
            if self.supervise_all_iou:
                loss_iou = loss_multiiou.mean(axis=-1, keepdims=True)
            else:
                loss_iou = (loss_multiiou * onehot).sum(-1, keepdims=True)
        else:
            loss_mask, loss_dice, loss_iou = (
                loss_multimask, loss_multidice, loss_multiiou
            )

        gate = target_obj * row_valid[:, None].astype(jnp.float32)
        loss_mask = loss_mask * gate
        loss_dice = loss_dice * gate
        loss_iou = loss_iou * gate

        losses["loss_mask"] += loss_mask.sum()
        losses["loss_dice"] += loss_dice.sum()
        losses["loss_iou"] += loss_iou.sum()
        losses["loss_class"] += loss_class

    def reduce_loss(self, losses):
        reduced = 0.0
        for key, weight in self.weight_dict.items():
            if key not in losses:
                raise ValueError(f"missing loss term {key}")
            if weight != 0:
                reduced = reduced + losses[key] * weight
        return reduced
