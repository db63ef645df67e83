"""Semi-supervised VOS inference (DAVIS / MOSE / SA-V protocol).

Behavioral equivalent of /root/reference/tools/vos_inference.py (:118-501):
load ground-truth PNG masks as prompts (first frame, or per-object first
appearance with --track_object_appearing_later_in_video), run
propagate_in_video, write palettised PNGs per frame. Supports joint
multi-object inference and per-object separate inference.
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, Optional

import numpy as np

from det_sam2_tpu.video_predictor import SAM2VideoPredictor

# DAVIS palette (the reference writes palettised PNGs with this palette)
DAVIS_PALETTE = np.zeros((256, 3), np.uint8)
for i in range(256):
    v, p = i, np.zeros(3, np.uint8)
    for j in range(8):
        p[0] |= ((v >> 0) & 1) << (7 - j)
        p[1] |= ((v >> 1) & 1) << (7 - j)
        p[2] |= ((v >> 2) & 1) << (7 - j)
        v >>= 3
    DAVIS_PALETTE[i] = p


def save_palettised_png(mask_per_obj: Dict[int, np.ndarray], path: str):
    from PIL import Image

    if mask_per_obj:
        h, w = next(iter(mask_per_obj.values())).shape
    else:
        raise ValueError("no masks to save")
    canvas = np.zeros((h, w), np.uint8)
    for obj_id, m in sorted(mask_per_obj.items()):
        canvas[m > 0] = obj_id
    img = Image.fromarray(canvas, mode="P")
    img.putpalette(DAVIS_PALETTE.reshape(-1).tolist())
    img.save(path)


def load_gt_masks(mask_dir: str) -> Dict[int, Dict[int, np.ndarray]]:
    from det_sam2_tpu.tools.sav_benchmark import load_palettised_png_masks

    return load_palettised_png_masks(mask_dir)


def vos_inference(
    predictor: SAM2VideoPredictor,
    frames_dir: str,
    gt_mask_dir: str,
    output_dir: str,
    use_all_masks: bool = False,
    track_object_appearing_later: bool = False,
    per_object_png: bool = False,
) -> None:
    """Joint multi-object VOS (reference vos_inference :118-247)."""
    os.makedirs(output_dir, exist_ok=True)
    session = predictor.init_state(frames_dir)
    gt = load_gt_masks(gt_mask_dir)

    if not track_object_appearing_later:
        prompt_frames = [min(gt.keys())]
    elif use_all_masks:
        prompt_frames = sorted(gt.keys())
    else:
        # first appearance per object
        seen = set()
        prompt_frames = []
        for fidx in sorted(gt.keys()):
            new = set(gt[fidx].keys()) - seen
            if new:
                prompt_frames.append(fidx)
                seen |= set(gt[fidx].keys())

    prompted_objs = set()
    for fidx in prompt_frames:
        for obj_id, mask in gt[fidx].items():
            if not track_object_appearing_later and obj_id in prompted_objs:
                continue
            if use_all_masks or obj_id not in prompted_objs:
                predictor.add_new_mask(session, fidx, obj_id, mask)
                prompted_objs.add(obj_id)

    results: Dict[int, Dict[int, np.ndarray]] = {}
    for frame_idx, obj_ids, masks in predictor.propagate_in_video(session):
        results[frame_idx] = {
            obj_id: (masks[i, 0] > 0.0) for i, obj_id in enumerate(obj_ids)
        }
    for frame_idx, per_obj in sorted(results.items()):
        save_palettised_png(
            per_obj, os.path.join(output_dir, f"{frame_idx:05d}.png")
        )


def vos_separate_inference_per_object(
    predictor: SAM2VideoPredictor,
    frames_dir: str,
    gt_mask_dir: str,
    output_dir: str,
) -> None:
    """Per-object independent tracking, merged by score at the end
    (reference :249-366)."""
    os.makedirs(output_dir, exist_ok=True)
    gt = load_gt_masks(gt_mask_dir)
    first = min(gt.keys())
    all_objs = sorted(gt[first].keys())

    per_obj_results: Dict[int, Dict[int, np.ndarray]] = {}
    for obj_id in all_objs:
        session = predictor.init_state(frames_dir)
        predictor.add_new_mask(session, first, obj_id, gt[first][obj_id])
        for frame_idx, obj_ids, masks in predictor.propagate_in_video(session):
            per_obj_results.setdefault(frame_idx, {})[obj_id] = (
                masks[0, 0] > 0.0
            )
    for frame_idx, per_obj in sorted(per_obj_results.items()):
        save_palettised_png(
            per_obj, os.path.join(output_dir, f"{frame_idx:05d}.png")
        )


def main():  # pragma: no cover (CLI)
    import jax.numpy as jnp

    from det_sam2_tpu.configs import MODEL_CONFIGS
    from det_sam2_tpu.convert import load_torch_checkpoint
    from det_sam2_tpu.track import SAM2Engine

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="hiera_b+", choices=MODEL_CONFIGS)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--base_video_dir", required=True)
    ap.add_argument("--input_mask_dir", required=True)
    ap.add_argument("--output_mask_dir", required=True)
    ap.add_argument("--video_list_file", default=None)
    ap.add_argument("--use_all_masks", action="store_true")
    ap.add_argument("--track_object_appearing_later_in_video",
                    action="store_true")
    ap.add_argument("--per_obj_png_file", action="store_true")
    args = ap.parse_args()

    cfg = MODEL_CONFIGS[args.model]()
    params = (
        load_torch_checkpoint(args.checkpoint, cfg) if args.checkpoint else None
    )
    engine = SAM2Engine(cfg, params=params, dtype=jnp.bfloat16)
    predictor = SAM2VideoPredictor(engine)

    if args.video_list_file:
        with open(args.video_list_file) as f:
            videos = [v.strip() for v in f if v.strip()]
    else:
        videos = sorted(os.listdir(args.base_video_dir))
    for video in videos:
        frames_dir = os.path.join(args.base_video_dir, video)
        gt_dir = os.path.join(args.input_mask_dir, video)
        out_dir = os.path.join(args.output_mask_dir, video)
        if args.per_obj_png_file:
            vos_separate_inference_per_object(
                predictor, frames_dir, gt_dir, out_dir
            )
        else:
            vos_inference(
                predictor, frames_dir, gt_dir, out_dir,
                use_all_masks=args.use_all_masks,
                track_object_appearing_later=(
                    args.track_object_appearing_later_in_video
                ),
            )


if __name__ == "__main__":  # pragma: no cover
    main()
