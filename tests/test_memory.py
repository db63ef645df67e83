"""Parity of memory attention + memory encoder vs the torch reference."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from det_sam2_tpu.configs import MemoryAttentionConfig, MemoryEncoderConfig
from det_sam2_tpu.convert import convert_memory_attention, convert_memory_encoder
from det_sam2_tpu.modeling.memory_attention import MemoryAttention
from det_sam2_tpu.modeling.memory_encoder import MemoryEncoder

from torch_ref import load_reference, reference_available, torch_sd

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)


def _ref_memory_attention(num_layers=2, feat=8):
    load_reference()
    from sam2.modeling.memory_attention import (
        MemoryAttention as RefMA,
        MemoryAttentionLayer as RefLayer,
    )
    from sam2.modeling.sam.transformer import RoPEAttention

    torch.manual_seed(0)
    layer = RefLayer(
        activation="relu",
        dim_feedforward=128,
        dropout=0.1,
        pos_enc_at_attn=False,
        self_attention=RoPEAttention(
            rope_theta=10000.0,
            feat_sizes=(feat, feat),
            embedding_dim=64,
            num_heads=1,
            downsample_rate=1,
            dropout=0.1,
        ),
        d_model=64,
        pos_enc_at_cross_attn_keys=True,
        pos_enc_at_cross_attn_queries=False,
        cross_attention=RoPEAttention(
            rope_theta=10000.0,
            feat_sizes=(feat, feat),
            rope_k_repeat=True,
            embedding_dim=64,
            num_heads=1,
            downsample_rate=1,
            dropout=0.1,
            kv_in_dim=16,
        ),
    )
    mod = RefMA(d_model=64, pos_enc_at_input=True, layer=layer, num_layers=num_layers)
    mod.eval()
    with torch.no_grad():
        for p in mod.parameters():
            p.add_(torch.randn_like(p) * 0.02)
    return mod


MA_CFG = MemoryAttentionConfig(
    d_model=64,
    num_layers=2,
    dim_feedforward=128,
    num_heads=1,
    rope_feat_sizes=(8, 8),
    kv_in_dim=16,
)


def _run_pair(n_frames, n_ptr, pad_frames=0, pad_ptr=0):
    """Run reference (unpadded) and ours (optionally padded+masked)."""
    ref = _ref_memory_attention()
    params = convert_memory_attention(torch_sd(ref), num_layers=2, prefix="")
    mine = MemoryAttention(cfg=MA_CFG)

    nq = 64
    b = 2
    rng = np.random.default_rng(0)
    curr = rng.standard_normal((b, nq, 64)).astype(np.float32)
    curr_pos = rng.standard_normal((b, nq, 64)).astype(np.float32)
    nk = n_frames * nq + n_ptr
    memory = rng.standard_normal((b, nk, 16)).astype(np.float32)
    memory_pos = rng.standard_normal((b, nk, 16)).astype(np.float32)

    with torch.no_grad():
        ref_out = ref(
            curr=torch.from_numpy(curr.transpose(1, 0, 2)),
            memory=torch.from_numpy(memory.transpose(1, 0, 2)),
            curr_pos=torch.from_numpy(curr_pos.transpose(1, 0, 2)),
            memory_pos=torch.from_numpy(memory_pos.transpose(1, 0, 2)),
            num_obj_ptr_tokens=n_ptr,
        ).numpy().transpose(1, 0, 2)

    if pad_frames or pad_ptr:
        # padded layout: [spatial frames (real+pad), ptr tokens (real+pad)]
        spatial = memory[:, : n_frames * nq]
        ptrs = memory[:, n_frames * nq :]
        pad_sp = np.zeros((b, pad_frames * nq, 16), np.float32)
        pad_pt = np.zeros((b, pad_ptr, 16), np.float32)
        memory_p = np.concatenate([spatial, pad_sp, ptrs, pad_pt], axis=1)
        spatial_pos = memory_pos[:, : n_frames * nq]
        ptr_pos = memory_pos[:, n_frames * nq :]
        memory_pos_p = np.concatenate([spatial_pos, pad_sp, ptr_pos, pad_pt], axis=1)
        mask = np.concatenate(
            [
                np.ones((b, n_frames * nq), bool),
                np.zeros((b, pad_frames * nq), bool),
                np.ones((b, n_ptr), bool),
                np.zeros((b, pad_ptr), bool),
            ],
            axis=1,
        )
        got = mine.apply(
            {"params": params},
            jnp.asarray(curr),
            jnp.asarray(memory_p),
            curr_pos=jnp.asarray(curr_pos),
            memory_pos=jnp.asarray(memory_pos_p),
            num_obj_ptr_tokens=n_ptr + pad_ptr,
            num_mem_frames=n_frames + pad_frames,
            memory_mask=jnp.asarray(mask),
        )
    else:
        got = mine.apply(
            {"params": params},
            jnp.asarray(curr),
            jnp.asarray(memory),
            curr_pos=jnp.asarray(curr_pos),
            memory_pos=jnp.asarray(memory_pos),
            num_obj_ptr_tokens=n_ptr,
            num_mem_frames=n_frames,
        )
    return np.asarray(got), ref_out


@pytest.mark.parametrize("n_frames,n_ptr", [(2, 4), (1, 0), (3, 8)])
def test_memory_attention_parity(n_frames, n_ptr):
    got, want = _run_pair(n_frames, n_ptr)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_memory_attention_padded_equivalence():
    """Padded + masked memory must produce identical output to unpadded —
    this is the static-shape contract of the TPU memory bank."""
    got, want = _run_pair(2, 4, pad_frames=2, pad_ptr=4)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_memory_encoder_parity():
    load_reference()
    from sam2.modeling.memory_encoder import (
        CXBlock as RefCX,
        Fuser as RefFuser,
        MaskDownSampler as RefMDS,
        MemoryEncoder as RefME,
    )
    from sam2.modeling.position_encoding import PositionEmbeddingSine

    torch.manual_seed(0)
    ref = RefME(
        out_dim=16,
        mask_downsampler=RefMDS(
            embed_dim=64, kernel_size=3, stride=2, padding=1, total_stride=16
        ),
        fuser=RefFuser(
            RefCX(dim=64, kernel_size=7, padding=3, layer_scale_init_value=1e-6,
                  use_dwconv=True),
            num_layers=2,
        ),
        position_encoding=PositionEmbeddingSine(num_pos_feats=16, normalize=True),
        in_dim=64,
    ).eval()
    with torch.no_grad():
        for p in ref.parameters():
            p.add_(torch.randn_like(p) * 0.02)

    cfg = MemoryEncoderConfig(out_dim=16, in_dim=64, fuser_dim=64)
    params = convert_memory_encoder(sd=torch_sd(ref), num_ds_layers=4, prefix="")
    mine = MemoryEncoder(cfg=cfg)

    rng = np.random.default_rng(3)
    pix = rng.standard_normal((2, 64, 8, 8)).astype(np.float32)
    masks = rng.standard_normal((2, 1, 128, 128)).astype(np.float32)
    with torch.no_grad():
        out = ref(torch.from_numpy(pix), torch.from_numpy(masks))
    want = out["vision_features"].numpy()

    got = mine.apply(
        {"params": params},
        jnp.asarray(pix.transpose(0, 2, 3, 1)),
        jnp.asarray(masks.transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, rtol=1e-4, atol=1e-4
    )
