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
