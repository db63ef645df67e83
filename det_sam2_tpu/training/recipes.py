"""Packaged training recipes mapping the reference's composed YAMLs.

`mose_finetune_recipe()` resolves every scratch knob of
/root/reference/sam2/configs/sam2.1_training/sam2.1_hiera_b+_MOSE_finetune.yaml
(:3-12 scratch block, :26-51 transforms, :181-200 prompt simulation,
:236-279 optimizer, :281-293 loss) into our config objects, so a user of
the reference's `python training/train.py -c <yaml>` flow finds the same
recipe packaged here. Parity-tested against the YAML's resolved values in
tests/test_recipes.py.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

from det_sam2_tpu.configs import SAM2Config, sam2_1_hiera_bplus
from det_sam2_tpu.training.loss_fns import MultiStepMultiMasksAndIous
from det_sam2_tpu.training.sam2_train import PromptSimConf
from det_sam2_tpu.training.train_step import OptimConf


@dataclasses.dataclass(frozen=True)
class FinetuneRecipe:
    """Everything a trainer run needs, resolved from one reference YAML."""

    model: SAM2Config
    optim: OptimConf
    sample: PromptSimConf
    loss: MultiStepMultiMasksAndIous
    # data pipeline (scratch + vos.train_transforms blocks)
    num_frames: int  # frames per sampled clip (scratch.num_frames)
    max_num_objects: int  # tracks per clip (scratch.max_num_objects)
    batch_size: int  # per-chip batch (scratch.train_batch_size)
    num_epochs: int  # scratch.num_epochs * phases_per_epoch
    dataset_multiplier: int  # dataset.multiplier (repeat factor)
    loader_kwargs: dict = dataclasses.field(default_factory=dict)


def mose_finetune_recipe(
    total_steps: Optional[int] = None,
    image_size: Optional[int] = None,
) -> FinetuneRecipe:
    """The MOSE finetune recipe (hiera-b+ @1024^2, T=8, <=3 objects,
    bs 1/chip, 40-epoch cosine 5e-6 -> 5e-7 with vision_lr 3e-6 and trunk
    layer-decay 0.9, loss weights {mask 20, dice 1, iou 1, class 1}).

    total_steps: optimizer schedule length (the reference steps its
    schedulers on where=fraction-of-run; pass steps_per_epoch * 40).
    image_size: override scratch.resolution (e.g. 512 for smoke runs).
    """
    from det_sam2_tpu.configs import with_image_size

    model = sam2_1_hiera_bplus()
    # trainer yaml trunk override: drop_path_rate 0.1 (:71-73)
    model = dataclasses.replace(
        model, hiera=dataclasses.replace(model.hiera, drop_path_rate=0.1)
    )
    if image_size is not None and image_size != model.image_size:
        model = with_image_size(model, image_size)

    optim = OptimConf(
        base_lr=5.0e-6,  # scratch.base_lr
        vision_lr=3.0e-6,  # scratch.vision_lr
        weight_decay=0.1,  # options.weight_decay ConstantParamScheduler
        grad_clip_norm=0.1,  # gradient_clip.max_norm
        warmup_steps=0,  # the reference recipe has no warmup
        total_steps=total_steps if total_steps is not None else 10_000,
        layer_decay=0.9,  # layer_decay_param_modifier (:245-249)
        cosine_end_ratio=0.1,  # CosineParamScheduler end = base/10
    )

    sample = PromptSimConf(
        prob_to_use_pt_input=0.5,  # :181
        prob_to_use_box_input=0.5,  # :183
        num_frames_to_correct=2,  # :186
        rand_frames_to_correct=True,  # :188
        num_init_cond_frames=2,  # :191
        rand_init_cond_frames=True,  # :192
        num_correction_pt_per_frame=7,  # :193
        prob_to_sample_from_gt=0.1,  # :185
    )

    loss = MultiStepMultiMasksAndIous(
        weight_dict={
            "loss_mask": 20.0,
            "loss_dice": 1.0,
            "loss_iou": 1.0,
            "loss_class": 1.0,
        },
        supervise_all_iou=True,
        iou_use_l1_loss=True,
        focal_gamma_obj_score=0.0,
        focal_alpha_obj_score=-1.0,
    )

    loader_kwargs = dict(
        image_size=model.image_size,
        batch_size=1,  # scratch.train_batch_size
        hflip_prob=0.5,  # RandomHorizontalFlip default p
        affine_prob=1.0,  # RandomAffine applies unconditionally (:28-32)
        color_jitter_prob=1.0,  # ColorJitter applies unconditionally
        color_jitter_strengths=(0.1, 0.03, 0.03),  # :39-41
        per_frame_jitter_strengths=(0.1, 0.05, 0.05),  # :48-50
        grayscale_prob=0.05,  # :43-44
    )

    return FinetuneRecipe(
        model=model,
        optim=optim,
        sample=sample,
        loss=loss,
        num_frames=8,  # scratch.num_frames
        max_num_objects=3,  # scratch.max_num_objects
        batch_size=1,
        num_epochs=40,  # scratch.num_epochs * phases_per_epoch(=1)
        dataset_multiplier=2,  # dataset.multiplier
        loader_kwargs=loader_kwargs,
    )
