"""det_sam2_tpu: a TPU-native (JAX/XLA/Pallas) video-segmentation framework.

From-scratch re-design of the capabilities of Det-SAM2 (motern88/Det-SAM2,
itself a fork of facebookresearch/sam2): the SAM 2.1 model family, a
streaming detector-self-prompted video instance segmentation pipeline with
constant-memory state, a billiards event postprocessor, evaluation harnesses,
and a data-parallel training stack.

Design stance (see SURVEY.md section 7): a static-shape inference-state
pytree (ring-buffer memory bank, padded object slots) drives a single jitted
per-frame step; layouts are NHWC; every torch ``F.interpolate`` in the
reference is realized as a precomputed dense resize matrix (MXU matmuls).
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level exports (avoid importing jax at package import)."""
    if name in ("build_sam2", "build_sam2_video_predictor",
                "build_sam2_engine"):
        from det_sam2_tpu import build

        return getattr(build, name)
    if name == "SAM2VideoPredictor":
        from det_sam2_tpu.video_predictor import SAM2VideoPredictor

        return SAM2VideoPredictor
    if name == "SAM2ImagePredictor":
        from det_sam2_tpu.image_predictor import SAM2ImagePredictor

        return SAM2ImagePredictor
    if name == "SAM2AutomaticMaskGenerator":
        from det_sam2_tpu.automatic_mask_generator import (
            SAM2AutomaticMaskGenerator,
        )

        return SAM2AutomaticMaskGenerator
    raise AttributeError(f"module 'det_sam2_tpu' has no attribute {name!r}")
