"""Parity of the Pallas multi-window attention kernel vs XLA sdpa.

The kernel packs G windows per grid cell with a block-diagonal mask
(ops/window_attention.py); these tests pin exactness per window in
interpret mode on the CPU mesh, over the shapes Hiera actually emits
(reference window specs: sam2/configs/sam2.1/*.yaml window_spec).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from det_sam2_tpu.ops.window_attention import (
    _pick_group,
    multi_window_attention,
    window_sdpa_reference,
)


@pytest.mark.parametrize(
    "b,nq,nk,h,d",
    [
        (12, 16, 16, 2, 24),   # ws=4 windows (grouped g=16 -> 12 here)
        (9, 64, 64, 2, 72),    # ws=8 windows, g=3 of 9
        (4, 256, 256, 8, 72),  # ws=16 windows, g=1
        (6, 16, 64, 4, 32),    # q-pooled block: Nq = Nk/4
        (7, 64, 64, 1, 16),    # prime window count -> g=1 fallback
    ],
)
def test_kernel_matches_sdpa(b, nq, nk, h, d):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, nq, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, nk, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, nk, h, d)), jnp.float32)
    out = multi_window_attention(q, k, v, interpret=True)
    ref = window_sdpa_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pick_group():
    assert _pick_group(576, 64) == 8    # target 512 tokens per cell
    assert _pick_group(576, 16) == 32
    assert _pick_group(9, 64) == 3
    assert _pick_group(9, 512) == 1
    assert _pick_group(7, 128) == 1     # prime, nothing divides
    assert _pick_group(1, 16) == 1


def test_packed_entry_matches_sdpa():
    """packed_window_attention consumes the fused qkv tensor directly."""
    from det_sam2_tpu.ops.window_attention import packed_window_attention

    rng = np.random.default_rng(2)
    b, n, h, d = 6, 64, 2, 24
    qkv = jnp.asarray(rng.standard_normal((b, n, 3 * h * d)), jnp.float32)
    q, k, v = [
        qkv.reshape(b, n, 3, h, d)[:, :, i] for i in range(3)
    ]
    out = packed_window_attention(qkv, h, interpret=True)
    ref = window_sdpa_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    # pooled-query form (q-stride blocks)
    qp = q[:, ::4]
    out_p = packed_window_attention(qkv, h, q_pooled=qp, interpret=True)
    ref_p = window_sdpa_reference(qp, k, v)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(ref_p),
                               rtol=2e-5, atol=2e-5)


def test_hiera_through_packed_kernel():
    """Full Hiera forward with the Pallas window path (interpret mode)
    matches the XLA sdpa path — covers window partition + q-pool wiring."""
    import functools

    from det_sam2_tpu.ops.window_attention import multi_window_attention

    from det_sam2_tpu.configs import HieraConfig
    from det_sam2_tpu.modeling.hiera import Hiera
    from det_sam2_tpu.modeling.layers import sdpa as _sdpa

    cfg = HieraConfig(
        embed_dim=32, num_heads=2, stages=(1, 2, 2, 1),
        global_att_blocks=(3,), window_spec=(4, 2, 4, 2),
        window_pos_embed_bkg_spatial_size=(2, 2), q_pool=3,
    )
    img = jnp.asarray(
        np.random.default_rng(3).standard_normal((1, 64, 64, 3)), jnp.float32
    )
    ref_mod = Hiera(cfg=cfg, attention_fn=_sdpa)
    params = ref_mod.init(__import__("jax").random.PRNGKey(0), img)
    ref = ref_mod.apply(params, img)
    ker_mod = Hiera(
        cfg=cfg, attention_fn=_sdpa,
        window_attention_fn=functools.partial(
            multi_window_attention, interpret=True
        ),
    )
    out = ker_mod.apply(params, img)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_bf16_path():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((8, 64, 2, 72)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((8, 64, 2, 72)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((8, 64, 2, 72)), jnp.bfloat16)
    out = multi_window_attention(q, k, v, interpret=True)
    ref = window_sdpa_reference(q, k, v)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )
