"""Torch SAM2.1 checkpoint -> det_sam2_tpu parameter conversion.

The reference ships torch ``.pt`` checkpoints (loaded strictly by
sam2/build_sam.py:166-178). This module maps that state_dict layout onto our
flax parameter pytree. It is also used by the parity test-suite, which
instantiates the reference torch modules with random weights and checks our
modules produce identical outputs.

Layout conventions:
  torch Linear weight [out, in]        -> flax Dense kernel [in, out]
  torch Conv2d weight [out, in, kh, kw]-> flax Conv kernel [kh, kw, in, out]
  torch ConvTranspose2d [in, out, kh, kw] -> flax ConvTranspose [kh, kw, in, out]
  torch LayerNorm weight/bias          -> flax scale/bias
  NCHW buffers [1, C, H, W]            -> NHWC [1, H, W, C]
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _t(x) -> np.ndarray:
    """torch tensor -> numpy (cpu, fp32 preserved)."""
    if hasattr(x, "detach"):
        return x.detach().cpu().numpy()
    return np.asarray(x)


def linear(sd: Dict, prefix: str) -> Dict:
    out = {"kernel": _t(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def conv2d(sd: Dict, prefix: str) -> Dict:
    out = {"kernel": _t(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def conv_transpose2d(sd: Dict, prefix: str) -> Dict:
    # torch layout [in, out, kh, kw] is stored verbatim: our ConvTranspose2x
    # (mask_decoder.py) consumes it directly as a Dense + depth-to-space.
    out = {"kernel": _t(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def layernorm(sd: Dict, prefix: str) -> Dict:
    return {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}


def mlp(sd: Dict, prefix: str, num_layers: int) -> Dict:
    return {
        f"layers_{i}": linear(sd, f"{prefix}.layers.{i}") for i in range(num_layers)
    }


def nchw_to_nhwc(x) -> np.ndarray:
    return _t(x).transpose(0, 2, 3, 1)


# ---------------------------------------------------------------------------
# component converters
# ---------------------------------------------------------------------------


def convert_hiera(sd: Dict, cfg, prefix: str = "") -> Dict:
    """cfg: HieraConfig; sd keys like '{prefix}patch_embed.proj.weight'."""
    p = prefix
    out = {
        "patch_embed": {"proj": conv2d(sd, f"{p}patch_embed.proj")},
        "pos_embed": nchw_to_nhwc(sd[f"{p}pos_embed"]),
        "pos_embed_window": nchw_to_nhwc(sd[f"{p}pos_embed_window"]),
    }
    embed_dim = cfg.embed_dim
    stage_ends = cfg.stage_ends
    for i in range(cfg.depth):
        dim_out = int(embed_dim * cfg.dim_mul) if (i - 1) in stage_ends else embed_dim
        blk = {
            "norm1": layernorm(sd, f"{p}blocks.{i}.norm1"),
            "norm2": layernorm(sd, f"{p}blocks.{i}.norm2"),
            "attn": {
                "qkv": linear(sd, f"{p}blocks.{i}.attn.qkv"),
                "proj": linear(sd, f"{p}blocks.{i}.attn.proj"),
            },
            "mlp": mlp(sd, f"{p}blocks.{i}.mlp", 2),
        }
        if dim_out != embed_dim:
            blk["proj"] = linear(sd, f"{p}blocks.{i}.proj")
        out[f"blocks_{i}"] = blk
        embed_dim = dim_out
    return out


def convert_fpn_neck(sd: Dict, num_levels: int, prefix: str = "neck.") -> Dict:
    return {
        f"convs_{i}": conv2d(sd, f"{prefix}convs.{i}.conv") for i in range(num_levels)
    }


def convert_image_encoder(sd: Dict, hiera_cfg, prefix: str = "image_encoder.") -> Dict:
    return {
        "trunk": convert_hiera(sd, hiera_cfg, prefix=f"{prefix}trunk."),
        "neck": convert_fpn_neck(
            sd, num_levels=len(hiera_cfg.stages), prefix=f"{prefix}neck."
        ),
    }


def convert_prompt_encoder(sd: Dict, prefix: str = "sam_prompt_encoder.") -> Dict:
    p = prefix
    out = {
        "pe_gaussian": _t(sd[f"{p}pe_layer.positional_encoding_gaussian_matrix"]),
        "not_a_point_embed": _t(sd[f"{p}not_a_point_embed.weight"]),
        "no_mask_embed": _t(sd[f"{p}no_mask_embed.weight"]),
        "point_embeds": np.concatenate(
            [_t(sd[f"{p}point_embeddings.{i}.weight"]) for i in range(4)], axis=0
        ),
        "mask_downscaling_conv0": conv2d(sd, f"{p}mask_downscaling.0"),
        "mask_downscaling_ln0": layernorm(sd, f"{p}mask_downscaling.1"),
        "mask_downscaling_conv1": conv2d(sd, f"{p}mask_downscaling.3"),
        "mask_downscaling_ln1": layernorm(sd, f"{p}mask_downscaling.4"),
        "mask_downscaling_conv2": conv2d(sd, f"{p}mask_downscaling.6"),
    }
    return out


def _attention(sd: Dict, prefix: str) -> Dict:
    return {
        "q_proj": linear(sd, f"{prefix}.q_proj"),
        "k_proj": linear(sd, f"{prefix}.k_proj"),
        "v_proj": linear(sd, f"{prefix}.v_proj"),
        "out_proj": linear(sd, f"{prefix}.out_proj"),
    }


def convert_two_way_transformer(sd: Dict, depth: int, prefix: str) -> Dict:
    out = {}
    for i in range(depth):
        lp = f"{prefix}layers.{i}"
        out[f"layers_{i}"] = {
            "self_attn": _attention(sd, f"{lp}.self_attn"),
            "cross_attn_token_to_image": _attention(
                sd, f"{lp}.cross_attn_token_to_image"
            ),
            "cross_attn_image_to_token": _attention(
                sd, f"{lp}.cross_attn_image_to_token"
            ),
            "norm1": layernorm(sd, f"{lp}.norm1"),
            "norm2": layernorm(sd, f"{lp}.norm2"),
            "norm3": layernorm(sd, f"{lp}.norm3"),
            "norm4": layernorm(sd, f"{lp}.norm4"),
            "mlp": mlp(sd, f"{lp}.mlp", 2),
        }
    out["final_attn_token_to_image"] = _attention(
        sd, f"{prefix}final_attn_token_to_image"
    )
    out["norm_final_attn"] = layernorm(sd, f"{prefix}norm_final_attn")
    return out


def convert_mask_decoder(
    sd: Dict, prefix: str = "sam_mask_decoder.", num_mask_tokens: int = 4
) -> Dict:
    p = prefix
    out = {
        "iou_token": _t(sd[f"{p}iou_token.weight"]),
        "mask_tokens": _t(sd[f"{p}mask_tokens.weight"]),
        "transformer": convert_two_way_transformer(sd, 2, f"{p}transformer."),
        "upscale_conv1": conv_transpose2d(sd, f"{p}output_upscaling.0"),
        "upscale_ln": layernorm(sd, f"{p}output_upscaling.1"),
        "upscale_conv2": conv_transpose2d(sd, f"{p}output_upscaling.3"),
        "iou_prediction_head": mlp(sd, f"{p}iou_prediction_head", 3),
    }
    for i in range(num_mask_tokens):
        out[f"hypernet_{i}"] = mlp(sd, f"{p}output_hypernetworks_mlps.{i}", 3)
    if f"{p}obj_score_token.weight" in sd:
        out["obj_score_token"] = _t(sd[f"{p}obj_score_token.weight"])
    if f"{p}pred_obj_score_head.layers.0.weight" in sd:
        out["pred_obj_score_head"] = mlp(sd, f"{p}pred_obj_score_head", 3)
    elif f"{p}pred_obj_score_head.weight" in sd:
        out["pred_obj_score_head"] = {"layers_0": linear(sd, f"{p}pred_obj_score_head")}
    if f"{p}conv_s0.weight" in sd:
        out["conv_s0"] = conv2d(sd, f"{p}conv_s0")
        out["conv_s1"] = conv2d(sd, f"{p}conv_s1")
    return out


def convert_memory_attention(
    sd: Dict, num_layers: int = 4, prefix: str = "memory_attention."
) -> Dict:
    p = prefix
    out = {"norm": layernorm(sd, f"{p}norm")}
    for i in range(num_layers):
        lp = f"{p}layers.{i}"
        out[f"layers_{i}"] = {
            "self_attn": _attention(sd, f"{lp}.self_attn"),
            "cross_attn_image": _attention(sd, f"{lp}.cross_attn_image"),
            "norm1": layernorm(sd, f"{lp}.norm1"),
            "norm2": layernorm(sd, f"{lp}.norm2"),
            "norm3": layernorm(sd, f"{lp}.norm3"),
            "linear1": linear(sd, f"{lp}.linear1"),
            "linear2": linear(sd, f"{lp}.linear2"),
        }
    return out


def convert_memory_encoder(
    sd: Dict, num_ds_layers: int, num_fuser_layers: int = 2,
    prefix: str = "memory_encoder.",
) -> Dict:
    p = prefix
    out = {"pix_feat_proj": conv2d(sd, f"{p}pix_feat_proj")}
    ds = {}
    for i in range(num_ds_layers):
        # Sequential: conv at 3k, LN at 3k+1, GELU at 3k+2
        ds[f"conv_{i}"] = conv2d(sd, f"{p}mask_downsampler.encoder.{3 * i}")
        ds[f"ln_{i}"] = layernorm(sd, f"{p}mask_downsampler.encoder.{3 * i + 1}")
    ds["conv_out"] = conv2d(sd, f"{p}mask_downsampler.encoder.{3 * num_ds_layers}")
    out["mask_downsampler"] = ds
    fuser = {}
    for i in range(num_fuser_layers):
        lp = f"{p}fuser.layers.{i}"
        fuser[f"layers_{i}"] = {
            "dwconv": conv2d(sd, f"{lp}.dwconv"),
            "norm": layernorm(sd, f"{lp}.norm"),
            "pwconv1": linear(sd, f"{lp}.pwconv1"),
            "pwconv2": linear(sd, f"{lp}.pwconv2"),
            "gamma": _t(sd[f"{lp}.gamma"]),
        }
    out["fuser"] = fuser
    if f"{p}out_proj.weight" in sd:
        out["out_proj"] = conv2d(sd, f"{p}out_proj")
    return out


def convert_sam2_base(sd: Dict, cfg) -> Dict:
    """Full SAM2 state_dict -> params for modeling.sam2_base.SAM2Model."""
    import math

    num_ds_layers = int(
        math.log2(cfg.memory_encoder.mask_downsampler_total_stride)
        // math.log2(cfg.memory_encoder.mask_downsampler_stride)
    )
    params = {
        "image_encoder": convert_image_encoder(sd, cfg.hiera),
        "sam_prompt_encoder": convert_prompt_encoder(sd),
        "sam_mask_decoder": convert_mask_decoder(sd),
        "memory_attention": convert_memory_attention(
            sd, cfg.memory_attention.num_layers
        ),
        "memory_encoder": convert_memory_encoder(sd, num_ds_layers),
        "maskmem_tpos_enc": _t(sd["maskmem_tpos_enc"]),  # [num_maskmem,1,1,mem_dim]
        "no_mem_embed": _t(sd["no_mem_embed"]),
        "no_mem_pos_enc": _t(sd["no_mem_pos_enc"]),
    }
    if "no_obj_ptr" in sd:
        params["no_obj_ptr"] = _t(sd["no_obj_ptr"])
    if "no_obj_embed_spatial" in sd:
        params["no_obj_embed_spatial"] = _t(sd["no_obj_embed_spatial"])
    if cfg.use_obj_ptrs_in_encoder:
        params["mask_downsample"] = conv2d(sd, "mask_downsample")
        if cfg.use_mlp_for_obj_ptr_proj:
            params["obj_ptr_proj"] = mlp(sd, "obj_ptr_proj", 3)
        else:
            params["obj_ptr_proj"] = {"layers_0": linear(sd, "obj_ptr_proj")}
    if cfg.proj_tpos_enc_in_obj_ptrs:
        params["obj_ptr_tpos_proj"] = linear(sd, "obj_ptr_tpos_proj")
    return params


def load_torch_checkpoint(path: str, cfg) -> Dict:
    """Load a SAM2.1 ``.pt`` checkpoint file into a flax param pytree."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    sd = ckpt["model"] if "model" in ckpt else ckpt
    return convert_sam2_base(sd, cfg)


def save_params_npz(params: Dict, path: str) -> None:
    """Save a flax param pytree as a torch-free native ``.npz`` checkpoint.

    Keys are '/'-joined tree paths. Non-builtin numpy dtypes (bfloat16 via
    ml_dtypes) aren't portable through np.savez without pickle, so those
    arrays are widened to fp32 and the original dtype recorded under the
    reserved ``__dtypes__`` key (restored on load). This is the deployment
    format: a serving container can load it without torch installed
    (deploy/backend.Dockerfile converts at build time and ships only this).
    """
    import json

    flat: Dict[str, np.ndarray] = {}

    def walk(prefix: str, node) -> None:
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}/{k}" if prefix else str(k), v)
        else:
            flat[prefix] = np.asarray(node)

    walk("", params)
    dtypes: Dict[str, str] = {}
    arrays: Dict[str, np.ndarray] = {}
    for k, v in flat.items():
        if "__dtypes__" in k:
            raise ValueError(f"reserved key in param tree: {k!r}")
        if v.dtype.isbuiltin != 1:  # ml_dtypes (bfloat16, fp8, ...): 2
            dtypes[k] = str(v.dtype)
            v = v.astype(np.float32)
        arrays[k] = v
    arrays["__dtypes__"] = np.asarray(json.dumps(dtypes))
    np.savez(path, **arrays)


def load_params_npz(path: str) -> Dict:
    """Load a ``save_params_npz`` checkpoint back into a nested pytree.
    Torch-free counterpart of load_torch_checkpoint for the serving path
    (reference loads strictly via torch, sam2/build_sam.py:166-178)."""
    import json

    params: Dict = {}
    with np.load(path, allow_pickle=False) as z:
        dtypes = (
            json.loads(str(z["__dtypes__"])) if "__dtypes__" in z.files else {}
        )
        for key in z.files:
            if key == "__dtypes__":
                continue
            v = z[key]
            if key in dtypes:
                import ml_dtypes  # noqa: F401  (registers bfloat16 et al.)

                v = v.astype(np.dtype(dtypes[key]))
            node = params
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = v
    return params


def main(argv=None) -> None:
    """CLI: convert a reference ``.pt`` checkpoint to the native ``.npz``
    (the only step that needs torch; the serving image runs torch-free).

        python -m det_sam2_tpu.convert sam2.1_hiera_base_plus.pt model.npz \\
            --model base_plus
    """
    import argparse

    from det_sam2_tpu.configs import MODEL_CONFIGS, MODEL_SIZE_ALIASES

    ap = argparse.ArgumentParser(description=main.__doc__)
    ap.add_argument("src", help="reference torch .pt checkpoint")
    ap.add_argument("dst", help="output .npz path")
    ap.add_argument(
        "--model", default="base_plus",
        help=f"preset or reference size name: {sorted(MODEL_CONFIGS)} "
        f"/ {sorted(MODEL_SIZE_ALIASES)}",
    )
    args = ap.parse_args(argv)
    name = MODEL_SIZE_ALIASES.get(args.model, args.model)
    if name not in MODEL_CONFIGS:
        ap.error(f"unknown --model {args.model!r}")
    params = load_torch_checkpoint(args.src, MODEL_CONFIGS[name]())
    save_params_npz(params, args.dst)


if __name__ == "__main__":
    main()
