"""Interactive video tracking (the reference's
notebooks/video_predictor_example.ipynb flow): load a video, prompt objects
with boxes/points/masks, propagate, save palettised PNGs."""

import argparse

import numpy as np

from det_sam2_tpu.build import build_sam2_video_predictor
from det_sam2_tpu.tools.vos_inference import save_palettised_png


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--video", required=True, help="mp4 / frame dir")
    ap.add_argument("--model", default="hiera_s")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--box", type=float, nargs=4, required=True,
                    metavar=("X1", "Y1", "X2", "Y2"))
    ap.add_argument("--out_dir", default="tracking_out")
    args = ap.parse_args()

    predictor = build_sam2_video_predictor(args.model, args.checkpoint)
    session = predictor.init_state(args.video)
    predictor.add_new_points_or_box(
        session, frame_idx=0, obj_id=1, box=np.asarray(args.box)
    )
    import os

    os.makedirs(args.out_dir, exist_ok=True)
    for frame_idx, obj_ids, masks in predictor.propagate_in_video(session):
        per_obj = {oid: masks[i, 0] > 0 for i, oid in enumerate(obj_ids)}
        save_palettised_png(
            per_obj, os.path.join(args.out_dir, f"{frame_idx:05d}.png")
        )
    print(f"wrote {session.num_frames} masks to {args.out_dir}")


if __name__ == "__main__":
    main()
