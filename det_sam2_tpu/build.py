"""Model builders: the public construction API.

Behavioral equivalent of /root/reference/sam2/build_sam.py (build_sam2 :68,
build_sam2_video_predictor :111, HF model table :33-66). Hydra YAML is
replaced by the dataclass configs in det_sam2_tpu/configs.py; checkpoints
are the reference's torch ``.pt`` files converted on load (convert.py) or
orbax directories saved by the trainer.
"""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp

from det_sam2_tpu.configs import MODEL_CONFIGS, SAM2Config, with_image_size
from det_sam2_tpu.image_predictor import SAM2ImagePredictor
from det_sam2_tpu.track import SAM2Engine
from det_sam2_tpu.video_predictor import SAM2VideoPredictor

# reference HF-hub ids (build_sam.py:33-66), for user-facing error messages
HF_MODEL_IDS = {
    "facebook/sam2.1-hiera-tiny": "hiera_t",
    "facebook/sam2.1-hiera-small": "hiera_s",
    "facebook/sam2.1-hiera-base-plus": "hiera_b+",
    "facebook/sam2.1-hiera-large": "hiera_l",
}


def _resolve_cfg(model_cfg, **overrides) -> SAM2Config:
    # image_size is NOT an independent field: the memory-attention RoPE
    # grid tracks image_size/backbone_stride, so route it through
    # with_image_size (a bare dataclasses.replace builds a config that
    # compiles but asserts at the first memory-conditioned frame)
    image_size = overrides.pop("image_size", None)

    def _sized(cfg: SAM2Config) -> SAM2Config:
        return cfg if image_size is None else with_image_size(cfg, image_size)

    if isinstance(model_cfg, SAM2Config):
        cfg = model_cfg
        if overrides:
            import dataclasses

            cfg = dataclasses.replace(cfg, **overrides)
        return _sized(cfg)
    if isinstance(model_cfg, str):
        if model_cfg.endswith((".yaml", ".yml")) and os.path.isfile(model_cfg):
            # reference Hydra YAML file: ingest with the video-predictor
            # postprocessing injections (build_sam.py:121-136) so the
            # result matches our presets; explicit kwargs still win.
            from det_sam2_tpu.config_yaml import (
                load_reference_yaml,
                video_predictor_overrides,
            )

            cfg = load_reference_yaml(model_cfg, video_predictor_overrides())
            if overrides:
                import dataclasses

                cfg = dataclasses.replace(cfg, **overrides)
            return _sized(cfg)
        key = model_cfg
        if key in HF_MODEL_IDS:
            key = HF_MODEL_IDS[key]
        key = (
            key.replace("sam2.1_", "").replace(".yaml", "")
            .replace("configs/sam2.1/", "")
        )
        if key in MODEL_CONFIGS:
            return _sized(MODEL_CONFIGS[key](**overrides))
    raise ValueError(
        f"unknown model config {model_cfg!r}; use one of {list(MODEL_CONFIGS)}"
        " or a reference YAML file path"
    )


def _load_params(checkpoint: Optional[str], cfg: SAM2Config):
    if checkpoint is None:
        return None
    if os.path.isdir(checkpoint):  # orbax directory from the trainer
        import jax
        import orbax.checkpoint as ocp

        engine = SAM2Engine(cfg)  # template structure (random init)
        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(
            os.path.abspath(checkpoint),
            {"params": engine.params},
        )
        return restored["params"]
    if checkpoint.endswith(".npz"):  # torch-free native format
        from det_sam2_tpu.convert import load_params_npz

        return load_params_npz(checkpoint)
    from det_sam2_tpu.convert import load_torch_checkpoint

    return load_torch_checkpoint(checkpoint, cfg)


def build_sam2_engine(
    model_cfg="hiera_s",
    checkpoint: Optional[str] = None,
    dtype=jnp.bfloat16,
    quantize_int8: bool = False,
    **overrides,
) -> SAM2Engine:
    """quantize_int8=True loads the fp checkpoint, rewrites the trunk
    dense kernels to int8 (ops/quant.py W8A8), and builds the engine with
    the quantized trunk — an inference-serving opt-in the reference's
    fp16 autocast path has no analogue for."""
    cfg = _resolve_cfg(model_cfg, **overrides)
    params = _load_params(checkpoint, cfg)
    if quantize_int8:
        import dataclasses

        from det_sam2_tpu.ops.quant import quantize_trunk

        if params is None:  # random init, then quantize (tests/smoke)
            params = SAM2Engine(cfg, dtype=dtype).params
        cfg = dataclasses.replace(
            cfg, hiera=dataclasses.replace(cfg.hiera, quantize_int8=True)
        )
        params = quantize_trunk(params, skip=cfg.hiera.quant_skip)
    return SAM2Engine(cfg, params=params, dtype=dtype)


def build_sam2(
    model_cfg="hiera_s", checkpoint: Optional[str] = None,
    dtype=jnp.bfloat16, quantize_int8: bool = False, **overrides,
) -> SAM2ImagePredictor:
    """Image predictor (reference build_sam2 :68)."""
    return SAM2ImagePredictor(
        build_sam2_engine(
            model_cfg, checkpoint, dtype, quantize_int8, **overrides
        )
    )


def build_sam2_video_predictor(
    model_cfg="hiera_s", checkpoint: Optional[str] = None,
    dtype=jnp.bfloat16, quantize_int8: bool = False, **overrides,
) -> SAM2VideoPredictor:
    """Video predictor with the reference's postprocessing defaults already
    baked into SAM2Config (binarize_mask_from_pts, fill_hole_area=8,
    dynamic multimask stability — build_sam.py:111-146)."""
    return SAM2VideoPredictor(
        build_sam2_engine(
            model_cfg, checkpoint, dtype, quantize_int8, **overrides
        )
    )
