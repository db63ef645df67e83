"""Detector-self-prompted streaming segmentation (the reference's
det_sam2_inference/det_sam2_RT.py __main__ flow) with the async pipeline and
billiards postprocessing."""

import argparse

from det_sam2_tpu.app.detector import NullDetector, TorchYoloDetector
from det_sam2_tpu.app.pipeline import DetSAM2Pipeline
from det_sam2_tpu.app.postprocess import VideoPostProcessor
from det_sam2_tpu.app.video_processor import VideoProcessor
from det_sam2_tpu.build import build_sam2_video_predictor


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--video", required=True, help="mp4 path or rtsp:// url")
    ap.add_argument("--model", default="hiera_s")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--yolo_weights", default=None,
                    help="ultralytics weights (optional)")
    ap.add_argument("--max_frames", type=int, default=None)
    ap.add_argument("--save_results", default="video_segments.pkl")
    args = ap.parse_args()

    predictor = build_sam2_video_predictor(args.model, args.checkpoint)
    detector = (
        TorchYoloDetector(args.yolo_weights)
        if args.yolo_weights
        else NullDetector()
    )
    processor = VideoProcessor(
        predictor=predictor,
        detector=detector,
        frame_buffer_size=30,
        detect_interval=30,
        max_frame_num_to_track=60,
        max_inference_state_frames=2000,
    )
    pipeline = DetSAM2Pipeline(processor, VideoPostProcessor())
    post = pipeline.inference(args.video, max_frames=args.max_frames)
    processor.save_results(args.save_results)
    print("events:", post.events())


if __name__ == "__main__":
    main()
