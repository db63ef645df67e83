"""det_sam2_tpu parameter pytree -> torch SAM2.1 state_dict export.

The structural INVERSE of convert.py: after training or fine-tuning in this
framework, export the flax parameters back into the reference's torch
``state_dict`` layout (sam2/build_sam.py:166-178 loads it strictly), so a
model trained here can be deployed on the reference runtime (or shared with
torch users). Round-trip tested: torch -> convert -> export == torch
bit-exactly (tests/test_export.py).

Layout conventions (mirror of convert.py):
  flax Dense kernel [in, out]            -> torch Linear weight [out, in]
  flax Conv kernel [kh, kw, in, out]     -> torch Conv2d [out, in, kh, kw]
  ConvTranspose2x kernel (stored verbatim) -> torch ConvTranspose2d
  flax scale/bias                        -> torch LayerNorm weight/bias
  NHWC buffers [1, H, W, C]              -> NCHW [1, C, H, W]
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _n(x) -> np.ndarray:
    """jax array / numpy -> numpy fp32 (params are stored fp32)."""
    return np.asarray(x, dtype=np.float32)


def _linear(out: Dict, prefix: str, p: Dict) -> None:
    out[f"{prefix}.weight"] = _n(p["kernel"]).T
    if "bias" in p:
        out[f"{prefix}.bias"] = _n(p["bias"])


def _conv2d(out: Dict, prefix: str, p: Dict) -> None:
    out[f"{prefix}.weight"] = _n(p["kernel"]).transpose(3, 2, 0, 1)
    if "bias" in p:
        out[f"{prefix}.bias"] = _n(p["bias"])


def _conv_transpose2d(out: Dict, prefix: str, p: Dict) -> None:
    # stored verbatim in torch's [in, out, kh, kw] layout (convert.py:45)
    out[f"{prefix}.weight"] = _n(p["kernel"])
    if "bias" in p:
        out[f"{prefix}.bias"] = _n(p["bias"])


def _layernorm(out: Dict, prefix: str, p: Dict) -> None:
    out[f"{prefix}.weight"] = _n(p["scale"])
    out[f"{prefix}.bias"] = _n(p["bias"])


def _mlp(out: Dict, prefix: str, p: Dict) -> None:
    for name, leaf in p.items():
        i = int(name.split("_")[1])
        _linear(out, f"{prefix}.layers.{i}", leaf)


def _nhwc_to_nchw(x) -> np.ndarray:
    return _n(x).transpose(0, 3, 1, 2)


# ---------------------------------------------------------------------------
# component exporters (each inverts the same-named convert.py function)
# ---------------------------------------------------------------------------


def export_hiera(params: Dict, prefix: str = "") -> Dict:
    p = prefix
    out: Dict[str, np.ndarray] = {
        f"{p}pos_embed": _nhwc_to_nchw(params["pos_embed"]),
        f"{p}pos_embed_window": _nhwc_to_nchw(params["pos_embed_window"]),
    }
    _conv2d(out, f"{p}patch_embed.proj", params["patch_embed"]["proj"])
    for name, blk in params.items():
        if not name.startswith("blocks_"):
            continue
        i = int(name.split("_")[1])
        _layernorm(out, f"{p}blocks.{i}.norm1", blk["norm1"])
        _layernorm(out, f"{p}blocks.{i}.norm2", blk["norm2"])
        _linear(out, f"{p}blocks.{i}.attn.qkv", blk["attn"]["qkv"])
        _linear(out, f"{p}blocks.{i}.attn.proj", blk["attn"]["proj"])
        _mlp(out, f"{p}blocks.{i}.mlp", blk["mlp"])
        if "proj" in blk:
            _linear(out, f"{p}blocks.{i}.proj", blk["proj"])
    return out


def export_image_encoder(params: Dict, prefix: str = "image_encoder.") -> Dict:
    out = export_hiera(params["trunk"], prefix=f"{prefix}trunk.")
    for name, leaf in params["neck"].items():
        i = int(name.split("_")[1])
        _conv2d(out, f"{prefix}neck.convs.{i}.conv", leaf)
    return out


def export_prompt_encoder(
    params: Dict, prefix: str = "sam_prompt_encoder."
) -> Dict:
    p = prefix
    out: Dict[str, np.ndarray] = {
        f"{p}pe_layer.positional_encoding_gaussian_matrix": _n(
            params["pe_gaussian"]
        ),
        f"{p}not_a_point_embed.weight": _n(params["not_a_point_embed"]),
        f"{p}no_mask_embed.weight": _n(params["no_mask_embed"]),
    }
    pts = _n(params["point_embeds"])  # [4, C] (concat of 4 x [1, C])
    for i in range(4):
        out[f"{p}point_embeddings.{i}.weight"] = pts[i : i + 1]
    _conv2d(out, f"{p}mask_downscaling.0", params["mask_downscaling_conv0"])
    _layernorm(out, f"{p}mask_downscaling.1", params["mask_downscaling_ln0"])
    _conv2d(out, f"{p}mask_downscaling.3", params["mask_downscaling_conv1"])
    _layernorm(out, f"{p}mask_downscaling.4", params["mask_downscaling_ln1"])
    _conv2d(out, f"{p}mask_downscaling.6", params["mask_downscaling_conv2"])
    return out


def _export_attention(out: Dict, prefix: str, p: Dict) -> None:
    _linear(out, f"{prefix}.q_proj", p["q_proj"])
    _linear(out, f"{prefix}.k_proj", p["k_proj"])
    _linear(out, f"{prefix}.v_proj", p["v_proj"])
    _linear(out, f"{prefix}.out_proj", p["out_proj"])


def export_two_way_transformer(params: Dict, prefix: str) -> Dict:
    out: Dict[str, np.ndarray] = {}
    for name, layer in params.items():
        if not name.startswith("layers_"):
            continue
        i = int(name.split("_")[1])
        lp = f"{prefix}layers.{i}"
        _export_attention(out, f"{lp}.self_attn", layer["self_attn"])
        _export_attention(
            out, f"{lp}.cross_attn_token_to_image",
            layer["cross_attn_token_to_image"],
        )
        _export_attention(
            out, f"{lp}.cross_attn_image_to_token",
            layer["cross_attn_image_to_token"],
        )
        for k in ("norm1", "norm2", "norm3", "norm4"):
            _layernorm(out, f"{lp}.{k}", layer[k])
        _mlp(out, f"{lp}.mlp", layer["mlp"])
    _export_attention(
        out, f"{prefix}final_attn_token_to_image",
        params["final_attn_token_to_image"],
    )
    _layernorm(out, f"{prefix}norm_final_attn", params["norm_final_attn"])
    return out


def export_mask_decoder(params: Dict, prefix: str = "sam_mask_decoder.") -> Dict:
    p = prefix
    out: Dict[str, np.ndarray] = {
        f"{p}iou_token.weight": _n(params["iou_token"]),
        f"{p}mask_tokens.weight": _n(params["mask_tokens"]),
    }
    out.update(export_two_way_transformer(params["transformer"], f"{p}transformer."))
    _conv_transpose2d(out, f"{p}output_upscaling.0", params["upscale_conv1"])
    _layernorm(out, f"{p}output_upscaling.1", params["upscale_ln"])
    _conv_transpose2d(out, f"{p}output_upscaling.3", params["upscale_conv2"])
    _mlp(out, f"{p}iou_prediction_head", params["iou_prediction_head"])
    for name, leaf in params.items():
        if name.startswith("hypernet_"):
            i = int(name.split("_")[1])
            _mlp(out, f"{p}output_hypernetworks_mlps.{i}", leaf)
    if "obj_score_token" in params:
        out[f"{p}obj_score_token.weight"] = _n(params["obj_score_token"])
    if "pred_obj_score_head" in params:
        head = params["pred_obj_score_head"]
        if len(head) == 1:  # single Linear (pred_obj_scores_mlp=False)
            _linear(out, f"{p}pred_obj_score_head", head["layers_0"])
        else:
            _mlp(out, f"{p}pred_obj_score_head", head)
    if "conv_s0" in params:
        _conv2d(out, f"{p}conv_s0", params["conv_s0"])
        _conv2d(out, f"{p}conv_s1", params["conv_s1"])
    return out


def export_memory_attention(
    params: Dict, prefix: str = "memory_attention."
) -> Dict:
    p = prefix
    out: Dict[str, np.ndarray] = {}
    _layernorm(out, f"{p}norm", params["norm"])
    for name, layer in params.items():
        if not name.startswith("layers_"):
            continue
        i = int(name.split("_")[1])
        lp = f"{p}layers.{i}"
        _export_attention(out, f"{lp}.self_attn", layer["self_attn"])
        _export_attention(out, f"{lp}.cross_attn_image", layer["cross_attn_image"])
        for k in ("norm1", "norm2", "norm3"):
            _layernorm(out, f"{lp}.{k}", layer[k])
        _linear(out, f"{lp}.linear1", layer["linear1"])
        _linear(out, f"{lp}.linear2", layer["linear2"])
    return out


def export_memory_encoder(params: Dict, prefix: str = "memory_encoder.") -> Dict:
    p = prefix
    out: Dict[str, np.ndarray] = {}
    _conv2d(out, f"{p}pix_feat_proj", params["pix_feat_proj"])
    ds = params["mask_downsampler"]
    n_ds = sum(1 for k in ds if k.startswith("conv_") and k != "conv_out")
    for i in range(n_ds):
        _conv2d(out, f"{p}mask_downsampler.encoder.{3 * i}", ds[f"conv_{i}"])
        _layernorm(out, f"{p}mask_downsampler.encoder.{3 * i + 1}", ds[f"ln_{i}"])
    _conv2d(out, f"{p}mask_downsampler.encoder.{3 * n_ds}", ds["conv_out"])
    for name, layer in params["fuser"].items():
        i = int(name.split("_")[1])
        lp = f"{p}fuser.layers.{i}"
        _conv2d(out, f"{lp}.dwconv", layer["dwconv"])
        _layernorm(out, f"{lp}.norm", layer["norm"])
        _linear(out, f"{lp}.pwconv1", layer["pwconv1"])
        _linear(out, f"{lp}.pwconv2", layer["pwconv2"])
        out[f"{lp}.gamma"] = _n(layer["gamma"])
    if "out_proj" in params:
        _conv2d(out, f"{p}out_proj", params["out_proj"])
    return out


def export_sam2_base(params: Dict) -> Dict:
    """Full SAM2Model params -> reference state_dict (numpy fp32 values).

    The inverse of convert.convert_sam2_base; optional submodules are
    emitted iff present in the param tree, so the output matches whatever
    config the params were built with. Values are numpy — pass through
    ``to_torch_state_dict`` for tensors / ``save_torch_checkpoint`` for a
    reference-loadable ``.pt`` file.
    """
    out: Dict[str, np.ndarray] = {}
    out.update(export_image_encoder(params["image_encoder"]))
    out.update(export_prompt_encoder(params["sam_prompt_encoder"]))
    out.update(export_mask_decoder(params["sam_mask_decoder"]))
    out.update(export_memory_attention(params["memory_attention"]))
    out.update(export_memory_encoder(params["memory_encoder"]))
    out["maskmem_tpos_enc"] = _n(params["maskmem_tpos_enc"])
    out["no_mem_embed"] = _n(params["no_mem_embed"])
    out["no_mem_pos_enc"] = _n(params["no_mem_pos_enc"])
    if "no_obj_ptr" in params:
        out["no_obj_ptr"] = _n(params["no_obj_ptr"])
    if "no_obj_embed_spatial" in params:
        out["no_obj_embed_spatial"] = _n(params["no_obj_embed_spatial"])
    if "mask_downsample" in params:
        _conv2d(out, "mask_downsample", params["mask_downsample"])
        proj = params["obj_ptr_proj"]
        if len(proj) > 1:  # 3-layer MLP (use_mlp_for_obj_ptr_proj=True)
            _mlp(out, "obj_ptr_proj", proj)
        else:  # plain Linear (convert.py:272)
            _linear(out, "obj_ptr_proj", proj["layers_0"])
    if "obj_ptr_tpos_proj" in params:
        _linear(out, "obj_ptr_tpos_proj", params["obj_ptr_tpos_proj"])
    return out


def to_torch_state_dict(params: Dict) -> Dict:
    """Params -> {key: torch.Tensor} ready for reference load_state_dict."""
    import torch

    return {k: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in export_sam2_base(params).items()}


def save_torch_checkpoint(params: Dict, path: str) -> None:
    """Write a reference-loadable checkpoint file ({"model": state_dict},
    the layout sam2/build_sam.py:166-178 expects)."""
    import torch

    torch.save({"model": to_torch_state_dict(params)}, path)
