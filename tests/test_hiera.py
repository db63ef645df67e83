"""Numerical parity of the Hiera trunk + FPN neck vs the torch reference."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from det_sam2_tpu.configs import FpnNeckConfig, HieraConfig
from det_sam2_tpu.convert import convert_fpn_neck, convert_hiera
from det_sam2_tpu.modeling.hiera import Hiera
from det_sam2_tpu.modeling.image_encoder import FpnNeck

from torch_ref import load_reference, reference_available, torch_sd

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)

TINY = HieraConfig(
    embed_dim=16,
    num_heads=1,
    stages=(1, 1, 2, 1),
    global_att_blocks=(3,),
    window_pos_embed_bkg_spatial_size=(7, 7),
    window_spec=(8, 4, 14, 7),
)


def _ref_hiera(cfg: HieraConfig):
    load_reference()
    from sam2.modeling.backbones.hieradet import Hiera as RefHiera

    torch.manual_seed(0)
    mod = RefHiera(
        embed_dim=cfg.embed_dim,
        num_heads=cfg.num_heads,
        stages=tuple(cfg.stages),
        global_att_blocks=tuple(cfg.global_att_blocks),
        window_pos_embed_bkg_spatial_size=tuple(
            cfg.window_pos_embed_bkg_spatial_size
        ),
        window_spec=tuple(cfg.window_spec),
        q_pool=cfg.q_pool,
    )
    mod.eval()
    # non-trivial weights (default init leaves pos_embed zero)
    with torch.no_grad():
        for p in mod.parameters():
            p.add_(torch.randn_like(p) * 0.02)
    return mod


def test_hiera_matches_reference():
    ref = _ref_hiera(TINY)
    x = np.random.default_rng(0).standard_normal((1, 3, 128, 128)).astype(np.float32)
    with torch.no_grad():
        ref_outs = ref(torch.from_numpy(x))

    params = convert_hiera(torch_sd(ref), TINY)
    model = Hiera(cfg=TINY)
    got_outs = jax.jit(
        lambda p, v: model.apply({"params": p}, v)
    )(params, jnp.asarray(x.transpose(0, 2, 3, 1)))

    assert len(got_outs) == len(ref_outs) == 4
    for got, want in zip(got_outs, ref_outs):
        got = np.asarray(got).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, want.numpy(), rtol=1e-4, atol=1e-4)


def test_fpn_neck_matches_reference():
    load_reference()
    from sam2.modeling.backbones.image_encoder import FpnNeck as RefNeck
    from sam2.modeling.position_encoding import PositionEmbeddingSine

    torch.manual_seed(1)
    channels = list(reversed(TINY.channel_list))  # high-res first: 16,32,64,128
    ref = RefNeck(
        position_encoding=PositionEmbeddingSine(num_pos_feats=256, normalize=True),
        d_model=256,
        backbone_channel_list=list(TINY.channel_list),  # low-res first
        fpn_top_down_levels=[2, 3],
        fpn_interp_model="nearest",
    )
    ref.eval()

    rng = np.random.default_rng(1)
    sizes = [32, 16, 8, 4]
    xs = [
        rng.standard_normal((1, c, s, s)).astype(np.float32)
        for c, s in zip(channels, sizes)
    ]
    with torch.no_grad():
        ref_out, ref_pos = ref([torch.from_numpy(v) for v in xs])

    cfg = FpnNeckConfig(backbone_channel_list=tuple(TINY.channel_list))
    params = convert_fpn_neck(torch_sd(ref), num_levels=4, prefix="")
    neck = FpnNeck(cfg=cfg)
    got_out, got_pos = neck.apply(
        {"params": params}, [jnp.asarray(v.transpose(0, 2, 3, 1)) for v in xs]
    )

    for g, w in zip(got_out, ref_out):
        np.testing.assert_allclose(
            np.asarray(g).transpose(0, 3, 1, 2), w.numpy(), rtol=1e-4, atol=1e-4
        )
    for g, w in zip(got_pos, ref_pos):
        np.testing.assert_allclose(
            np.asarray(g).transpose(0, 3, 1, 2), w.numpy(), rtol=1e-4, atol=1e-4
        )


def test_patch_embed_modes_agree(monkeypatch):
    """The three PatchEmbed lowerings — canonical strided conv ("0"),
    width-only s2d ("1", default), two-axis s2d ("2") — must agree on
    both raw uint8 frames (fused ImageNet normalize) and pre-normalized
    float inputs. The mode constant is import-time; tests monkeypatch the
    module attribute and apply the module untraced."""
    import det_sam2_tpu.modeling.hiera as hiera_mod
    from det_sam2_tpu.modeling.hiera import PatchEmbed

    rng = np.random.default_rng(0)
    u8 = jnp.asarray(rng.integers(0, 255, (1, 32, 32, 3)).astype(np.uint8))
    mean = jnp.asarray(hiera_mod.IMAGENET_MEAN)
    std = jnp.asarray(hiera_mod.IMAGENET_STD)
    f32 = (u8.astype(jnp.float32) / 255.0 - mean) / std

    pe = PatchEmbed(embed_dim=48)
    params = pe.init(jax.random.PRNGKey(0), f32)

    outs = {}
    for mode in ("0", "1", "2"):
        monkeypatch.setattr(hiera_mod, "_PE_S2D_MODE", mode)
        outs[mode] = (
            np.asarray(pe.apply(params, u8), np.float32),
            np.asarray(pe.apply(params, f32), np.float32),
        )
    for mode in ("1", "2"):
        for i, (got, ref) in enumerate(zip(outs[mode], outs["0"])):
            np.testing.assert_allclose(
                got, ref, atol=2e-5, rtol=2e-5,
                err_msg=f"mode {mode} input {i}",
            )


def test_layernorm_large_mean_small_variance():
    """The one-pass variance must survive the |mean| >> std outlier regime
    pretrained transformers hit: the UNSHIFTED E[x^2]-E[x]^2 loses
    ~mean^2 * eps_fp32 absolute (measured 4e2 output error on this input);
    the shifted form (c = x[..., 0]) keeps both moment terms O(std^2) so
    the subtraction cannot cancel."""
    import numpy as np

    from det_sam2_tpu.modeling.layers import LayerNorm

    rng = np.random.default_rng(0)
    x = (1500.0 + 0.1 * rng.standard_normal((4, 32, 256))).astype(np.float32)
    ln = LayerNorm()
    params = ln.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = np.asarray(ln.apply(params, jnp.asarray(x)), np.float64)

    xf = x.astype(np.float64)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    ref = (xf - mean) / np.sqrt(var + 1e-6)
    np.testing.assert_allclose(out, ref, atol=1e-4)
