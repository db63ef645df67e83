"""Helpers to import the torch reference (read-only, /root/reference) for
numerical parity tests. The reference package initializes Hydra at import
(sam2/__init__.py:7-11); hydra is not installed here, so we stub it.

The reference is PUBLIC UNTRUSTED CONTENT: we only execute its nn.Modules
under torch.no_grad() on CPU to obtain golden activations.
"""

import os
import sys
import types

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "sam2", "modeling"))


def load_reference():
    """Make `import sam2.modeling.*` work against /root/reference."""
    if "sam2" in sys.modules:
        return
    if "hydra" not in sys.modules:
        hydra = types.ModuleType("hydra")
        hydra.initialize_config_module = lambda *a, **k: None
        core = types.ModuleType("hydra.core")
        gh = types.ModuleType("hydra.core.global_hydra")

        class _GH:
            _inst = None

            @classmethod
            def instance(cls):
                if cls._inst is None:
                    cls._inst = cls()
                return cls._inst

            def is_initialized(self):
                return True

        gh.GlobalHydra = _GH
        core.global_hydra = gh
        hydra.core = core
        sys.modules["hydra"] = hydra
        sys.modules["hydra.core"] = core
        sys.modules["hydra.core.global_hydra"] = gh
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)


def torch_sd(module):
    """state_dict of a torch module (fp32)."""
    return {k: v.detach().float() for k, v in module.state_dict().items()}


def build_reference_sam2(cfg, cls=None, seed=0, **extra_kwargs):
    """Instantiate the reference SAM2Base (or a subclass like
    SAM2VideoPredictor) matching a det_sam2_tpu SAM2Config, with random
    weights. Returns the torch module in eval mode."""
    import torch

    load_reference()
    from sam2.modeling.backbones.hieradet import Hiera as RefHiera
    from sam2.modeling.backbones.image_encoder import (
        FpnNeck as RefNeck,
        ImageEncoder as RefEnc,
    )
    from sam2.modeling.memory_attention import (
        MemoryAttention as RefMA,
        MemoryAttentionLayer as RefMALayer,
    )
    from sam2.modeling.memory_encoder import (
        CXBlock,
        Fuser,
        MaskDownSampler,
        MemoryEncoder as RefME,
    )
    from sam2.modeling.position_encoding import PositionEmbeddingSine
    from sam2.modeling.sam.transformer import RoPEAttention
    from sam2.modeling.sam2_base import SAM2Base

    h = cfg.hiera
    torch.manual_seed(seed)
    trunk = RefHiera(
        embed_dim=h.embed_dim,
        num_heads=h.num_heads,
        stages=tuple(h.stages),
        global_att_blocks=tuple(h.global_att_blocks),
        window_pos_embed_bkg_spatial_size=tuple(
            h.window_pos_embed_bkg_spatial_size
        ),
        window_spec=tuple(h.window_spec),
    )
    neck = RefNeck(
        position_encoding=PositionEmbeddingSine(num_pos_feats=256, normalize=True),
        d_model=256,
        backbone_channel_list=list(h.channel_list),
        fpn_top_down_levels=[2, 3],
        fpn_interp_model="nearest",
    )
    image_encoder = RefEnc(trunk=trunk, neck=neck, scalp=1)

    s = cfg.image_embedding_size
    ma_layer = RefMALayer(
        activation="relu",
        dim_feedforward=2048,
        dropout=0.1,
        pos_enc_at_attn=False,
        self_attention=RoPEAttention(
            rope_theta=10000.0, feat_sizes=(s, s), embedding_dim=256,
            num_heads=1, downsample_rate=1, dropout=0.1,
        ),
        d_model=256,
        pos_enc_at_cross_attn_keys=True,
        pos_enc_at_cross_attn_queries=False,
        cross_attention=RoPEAttention(
            rope_theta=10000.0, feat_sizes=(s, s), rope_k_repeat=True,
            embedding_dim=256, num_heads=1, downsample_rate=1, dropout=0.1,
            kv_in_dim=64,
        ),
    )
    memory_attention = RefMA(
        d_model=256, pos_enc_at_input=True, layer=ma_layer, num_layers=4
    )
    memory_encoder = RefME(
        out_dim=64,
        position_encoding=PositionEmbeddingSine(num_pos_feats=64, normalize=True),
        mask_downsampler=MaskDownSampler(kernel_size=3, stride=2, padding=1),
        fuser=Fuser(
            CXBlock(dim=256, kernel_size=7, padding=3,
                    layer_scale_init_value=1e-6, use_dwconv=True),
            num_layers=2,
        ),
        in_dim=256,
    )

    kwargs = dict(
        image_encoder=image_encoder,
        memory_attention=memory_attention,
        memory_encoder=memory_encoder,
        num_maskmem=cfg.num_maskmem,
        image_size=cfg.image_size,
        backbone_stride=16,
        sigmoid_scale_for_mem_enc=20.0,
        sigmoid_bias_for_mem_enc=-10.0,
        binarize_mask_from_pts_for_mem_enc=cfg.binarize_mask_from_pts_for_mem_enc,
        use_mask_input_as_output_without_sam=True,
        max_cond_frames_in_attn=cfg.max_cond_frames_in_attn,
        directly_add_no_mem_embed=True,
        use_high_res_features_in_sam=True,
        multimask_output_in_sam=True,
        multimask_min_pt_num=0,
        multimask_max_pt_num=1,
        multimask_output_for_tracking=True,
        use_multimask_token_for_obj_ptr=True,
        iou_prediction_use_sigmoid=True,
        memory_temporal_stride_for_eval=cfg.memory_temporal_stride_for_eval,
        use_obj_ptrs_in_encoder=True,
        max_obj_ptrs_in_encoder=cfg.max_obj_ptrs_in_encoder,
        add_tpos_enc_to_obj_ptrs=True,
        proj_tpos_enc_in_obj_ptrs=True,
        use_signed_tpos_enc_to_obj_ptrs=True,
        only_obj_ptrs_in_the_past_for_eval=True,
        pred_obj_scores=True,
        pred_obj_scores_mlp=True,
        fixed_no_obj_ptr=True,
        use_mlp_for_obj_ptr_proj=True,
        no_obj_embed_spatial=True,
        sam_mask_decoder_extra_args=dict(
            dynamic_multimask_via_stability=True,
            dynamic_multimask_stability_delta=0.05,
            dynamic_multimask_stability_thresh=0.98,
        ),
    )
    kwargs.update(extra_kwargs)
    model = (cls or SAM2Base)(**kwargs)
    model.eval()
    with torch.no_grad():
        for p in model.parameters():
            p.add_(torch.randn_like(p) * 0.02)
    return model
