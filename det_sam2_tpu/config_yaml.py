"""Reference Hydra-YAML config ingestion.

Maps a reference model YAML (sam2/configs/{sam2,sam2.1}/*.yaml) onto a
:class:`~det_sam2_tpu.configs.SAM2Config`, closing the last interop seam:
drop a reference checkpoint + its YAML in, get a predictor out.

Semantics follow the reference builder (/root/reference/sam2/build_sam.py):
  * the YAML's ``model:`` tree is Hydra ``instantiate`` input; ``_target_``
    selects classes we don't need (our modules are fixed), every other key
    is a constructor kwarg;
  * keys MISSING from the YAML take the reference constructor defaults
    (sam2/modeling/sam2_base.py:24-120) — NOT our dataclass defaults, which
    bake in the sam2.1 + video-predictor values;
  * ``++model.x=y`` override strings compose on top (build_sam.py:92-99);
  * ``apply_postprocessing``/video-predictor injections
    (build_sam.py:121-136) are expressed as the usual override strings by
    the caller (see :func:`video_predictor_overrides`).

One deliberate divergence: the YAML's RoPE ``feat_sizes`` init value is
ignored — the reference recomputes the rotary table whenever the runtime
sequence length differs (sam2/modeling/sam/transformer.py:287-...), so the
effective grid is always image_size/backbone_stride; our static config
encodes that directly (configs.with_image_size).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Mapping, Sequence

from det_sam2_tpu.configs import (
    FpnNeckConfig,
    HieraConfig,
    MemoryAttentionConfig,
    MemoryEncoderConfig,
    SAM2Config,
)

# reference constructor defaults for model-level flags missing from a YAML
# (sam2/modeling/sam2_base.py:24-120); sam2.1 YAMLs set most of these
# explicitly, sam2 (2.0) YAMLs rely on several defaults.
_SAM2_BASE_DEFAULTS = dict(
    num_maskmem=7,
    image_size=512,
    backbone_stride=16,
    sigmoid_scale_for_mem_enc=1.0,
    sigmoid_bias_for_mem_enc=0.0,
    binarize_mask_from_pts_for_mem_enc=False,
    use_mask_input_as_output_without_sam=False,
    max_cond_frames_in_attn=20,
    directly_add_no_mem_embed=False,
    use_high_res_features_in_sam=False,
    multimask_output_in_sam=False,
    multimask_min_pt_num=1,
    multimask_max_pt_num=1,
    multimask_output_for_tracking=False,
    use_multimask_token_for_obj_ptr=False,
    iou_prediction_use_sigmoid=False,
    memory_temporal_stride_for_eval=1,
    non_overlap_masks_for_mem_enc=False,
    use_obj_ptrs_in_encoder=False,
    max_obj_ptrs_in_encoder=16,
    add_tpos_enc_to_obj_ptrs=True,
    proj_tpos_enc_in_obj_ptrs=False,
    use_signed_tpos_enc_to_obj_ptrs=False,
    only_obj_ptrs_in_the_past_for_eval=False,
    pred_obj_scores=False,
    pred_obj_scores_mlp=False,
    fixed_no_obj_ptr=False,
    soft_no_obj_ptr=False,
    use_mlp_for_obj_ptr_proj=False,
    no_obj_embed_spatial=False,
)

# model-level keys consumed by machinery we replace outright
_IGNORED_MODEL_KEYS = {
    "_target_",
    "compile_image_encoder",
    "image_encoder",
    "memory_attention",
    "memory_encoder",
    "sam_mask_decoder_extra_args",
}

# decoder extra-args (reference: sam_mask_decoder_extra_args dict) that map
# onto flat SAM2Config fields
_DECODER_EXTRA_KEYS = {
    "dynamic_multimask_via_stability",
    "dynamic_multimask_stability_delta",
    "dynamic_multimask_stability_thresh",
}


def video_predictor_overrides() -> list:
    """The ++model overrides build_sam2_video_predictor injects
    (build_sam.py:121-136, apply_postprocessing=True)."""
    return [
        "++model.sam_mask_decoder_extra_args.dynamic_multimask_via_stability=true",
        "++model.sam_mask_decoder_extra_args.dynamic_multimask_stability_delta=0.05",
        "++model.sam_mask_decoder_extra_args.dynamic_multimask_stability_thresh=0.98",
        "++model.binarize_mask_from_pts_for_mem_enc=true",
        "++model.fill_hole_area=8",
    ]


def image_predictor_overrides() -> list:
    """build_sam2's apply_postprocessing overrides (build_sam.py:92-99)."""
    return [
        "++model.sam_mask_decoder_extra_args.dynamic_multimask_via_stability=true",
        "++model.sam_mask_decoder_extra_args.dynamic_multimask_stability_delta=0.05",
        "++model.sam_mask_decoder_extra_args.dynamic_multimask_stability_thresh=0.98",
    ]


def _apply_override(tree: Dict, spec: str) -> None:
    """Apply one Hydra-style ``[++]model.a.b=value`` override in place."""
    key, _, raw = spec.partition("=")
    if not _ or not key:
        raise ValueError(f"override {spec!r} is not key=value")
    key = key.lstrip("+")
    import yaml

    value = yaml.safe_load(raw)
    parts = key.split(".")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
        if not isinstance(node, dict):
            raise ValueError(f"override {spec!r} descends through a scalar")
    node[parts[-1]] = value


def _tup(x):
    return tuple(x) if isinstance(x, (list, tuple)) else x


def _coerce(value, default):
    """YAML 1.1 parses dot-less scientific notation ('1e-6') as a string;
    coerce scalars to the default's numeric type."""
    if isinstance(default, bool) or value is None:
        return value
    if isinstance(default, float):
        return float(value)
    if isinstance(default, int) and not isinstance(value, (list, tuple)):
        return int(value)
    return value


def config_from_model_tree(
    model: Mapping, overrides: Sequence[str] = ()
) -> SAM2Config:
    """Map a parsed reference ``model:`` tree (+ overrides) to SAM2Config."""
    tree: Dict = {"model": _deep_dict(model)}
    for spec in overrides:
        _apply_override(tree, spec)
    m = tree["model"]

    enc = m.get("image_encoder", {})
    trunk = enc.get("trunk", {})
    neck = enc.get("neck", {})
    pos = neck.get("position_encoding", {})

    hiera = HieraConfig(
        embed_dim=trunk.get("embed_dim", 96),
        num_heads=trunk.get("num_heads", 1),
        stages=_tup(trunk.get("stages", (2, 3, 16, 3))),
        dim_mul=trunk.get("dim_mul", 2.0),
        head_mul=trunk.get("head_mul", 2.0),
        q_pool=trunk.get("q_pool", 3),
        q_stride=_tup(trunk.get("q_stride", (2, 2))),
        window_pos_embed_bkg_spatial_size=_tup(
            trunk.get("window_pos_embed_bkg_spatial_size", (14, 14))
        ),
        window_spec=_tup(trunk.get("window_spec", (8, 4, 14, 7))),
        global_att_blocks=_tup(trunk.get("global_att_blocks", (12, 16, 20))),
        drop_path_rate=trunk.get("drop_path_rate", 0.0),
    )
    neck_cfg = FpnNeckConfig(
        d_model=neck.get("d_model", 256),
        backbone_channel_list=_tup(
            neck.get("backbone_channel_list", hiera.channel_list)
        ),
        fpn_top_down_levels=_tup(neck.get("fpn_top_down_levels", (2, 3))),
        fpn_interp_model=neck.get("fpn_interp_model", "bilinear"),
        fuse_type=neck.get("fuse_type", "sum"),
        pos_num_feats=pos.get("num_pos_feats", 256),
    )

    ma = m.get("memory_attention", {})
    layer = ma.get("layer", {})
    self_att = layer.get("self_attention", {})
    cross_att = layer.get("cross_attention", {})
    image_size = m.get("image_size", _SAM2_BASE_DEFAULTS["image_size"])
    backbone_stride = m.get(
        "backbone_stride", _SAM2_BASE_DEFAULTS["backbone_stride"]
    )
    s = image_size // backbone_stride
    ma_cfg = MemoryAttentionConfig(
        d_model=ma.get("d_model", 256),
        num_layers=ma.get("num_layers", 4),
        dim_feedforward=layer.get("dim_feedforward", 2048),
        num_heads=self_att.get("num_heads", 1),
        rope_theta=self_att.get("rope_theta", 10000.0),
        # feat_sizes deliberately derived, not read (module docstring)
        rope_feat_sizes=(s, s),
        kv_in_dim=cross_att.get("kv_in_dim", 64),
        pos_enc_at_input=ma.get("pos_enc_at_input", True),
        pos_enc_at_attn=layer.get("pos_enc_at_attn", False),
        pos_enc_at_cross_attn_keys=layer.get(
            "pos_enc_at_cross_attn_keys", True
        ),
        pos_enc_at_cross_attn_queries=layer.get(
            "pos_enc_at_cross_attn_queries", False
        ),
        activation=layer.get("activation", "relu"),
        dropout=layer.get("dropout", 0.1),
    )

    me = m.get("memory_encoder", {})
    me_pos = me.get("position_encoding", {})
    md = me.get("mask_downsampler", {})
    fuser = me.get("fuser", {})
    cx = fuser.get("layer", {})
    me_cfg = MemoryEncoderConfig(
        out_dim=me.get("out_dim", 64),
        in_dim=me.get("in_dim", 256),
        mask_downsampler_kernel=md.get("kernel_size", 3),
        mask_downsampler_stride=md.get("stride", 2),
        mask_downsampler_padding=md.get("padding", 1),
        fuser_num_layers=fuser.get("num_layers", 2),
        fuser_dim=cx.get("dim", 256),
        cx_kernel=cx.get("kernel_size", 7),
        cx_padding=cx.get("padding", 3),
        layer_scale_init_value=_coerce(
            cx.get("layer_scale_init_value", 1e-6), 1e-6
        ),
        pos_num_feats=me_pos.get("num_pos_feats", 64),
    )

    extra = m.get("sam_mask_decoder_extra_args") or {}
    unknown_extra = set(extra) - _DECODER_EXTRA_KEYS
    if unknown_extra:
        raise ValueError(
            f"unsupported sam_mask_decoder_extra_args {sorted(unknown_extra)}"
        )

    flags = dict(_SAM2_BASE_DEFAULTS)
    extra_flat = {}
    for k, v in m.items():
        if k in _IGNORED_MODEL_KEYS:
            continue
        if k in flags:
            flags[k] = _coerce(v, _SAM2_BASE_DEFAULTS[k])
        elif k in SAM2Config.__dataclass_fields__:
            extra_flat[k] = v  # e.g. fill_hole_area via override
        else:
            raise ValueError(f"unknown model config key {k!r}")
    flags.update({k: extra[k] for k in extra})
    # dynamic multimask defaults when extra args absent: the reference
    # MaskDecoder constructor (sam2/modeling/sam/mask_decoder.py:15)
    flags.setdefault("dynamic_multimask_via_stability", False)

    return SAM2Config(
        hiera=hiera,
        neck=neck_cfg,
        memory_attention=ma_cfg,
        memory_encoder=me_cfg,
        scalp=enc.get("scalp", 0),
        mem_dim=me_cfg.out_dim,
        hidden_dim=ma_cfg.d_model,
        **flags,
        **extra_flat,
    )


def _deep_dict(node):
    if isinstance(node, Mapping):
        return {k: _deep_dict(v) for k, v in node.items()}
    if isinstance(node, list):
        return list(node)
    return node


def load_reference_yaml(
    path: str, overrides: Sequence[str] = ()
) -> SAM2Config:
    """Parse a reference model YAML file into a SAM2Config.

    ``overrides`` are Hydra-style ``++model.x=y`` strings; use
    :func:`video_predictor_overrides` / :func:`image_predictor_overrides`
    for the reference builders' apply_postprocessing injections.
    """
    import yaml

    with open(path) as f:
        doc = yaml.safe_load(f)
    if not isinstance(doc, Mapping) or "model" not in doc:
        raise ValueError(f"{path} has no top-level 'model:' tree")
    cfg = config_from_model_tree(doc["model"], overrides)
    # SAM2Config defaults fill_hole_area=8 for convenience; a bare YAML
    # build (no overrides) must match the reference's build_sam2 result,
    # where fill_hole_area defaults to 0 (sam2_base has no such field —
    # the video predictor override injects it).
    if not any("fill_hole_area" in o for o in overrides):
        cfg = dataclasses.replace(cfg, fill_hole_area=0)
    return cfg
