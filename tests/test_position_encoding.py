"""Parity of positional encodings against the torch reference."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from det_sam2_tpu.modeling.position_encoding import (
    apply_rope,
    axial_rope_cos_sin,
    get_1d_sine_pe,
    random_pe_grid,
    random_pe_points,
    sine_pos_embed_2d,
)

from torch_ref import load_reference, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)


def test_sine_pos_embed_2d_matches_reference():
    load_reference()
    from sam2.modeling.position_encoding import PositionEmbeddingSine

    for h, w, feats in [(64, 64, 256), (32, 32, 64), (13, 17, 128)]:
        mod = PositionEmbeddingSine(num_pos_feats=feats, normalize=True)
        ref = mod(torch.zeros(1, 3, h, w)).numpy()[0]  # [C, H, W]
        got = sine_pos_embed_2d(h, w, feats).transpose(2, 0, 1)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_get_1d_sine_pe_matches_reference():
    load_reference()
    from sam2.modeling.sam2_utils import get_1d_sine_pe as ref_pe

    pos = np.array([0.0, 1.5, -3.0, 7.0], dtype=np.float32)
    ref = ref_pe(torch.from_numpy(pos), dim=64).numpy()
    got = np.asarray(get_1d_sine_pe(jnp.asarray(pos), dim=64))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_random_pe_matches_reference():
    load_reference()
    from sam2.modeling.position_encoding import PositionEmbeddingRandom

    torch.manual_seed(0)
    mod = PositionEmbeddingRandom(num_pos_feats=128)
    gauss = jnp.asarray(mod.positional_encoding_gaussian_matrix.numpy())

    ref_grid = mod((32, 48)).numpy()  # [C, H, W]
    got_grid = np.asarray(random_pe_grid(32, 48, gauss)).transpose(2, 0, 1)
    np.testing.assert_allclose(got_grid, ref_grid, rtol=1e-4, atol=1e-4)

    coords = np.random.default_rng(0).uniform(0, 512, (2, 5, 2)).astype(np.float32)
    ref_pts = mod.forward_with_coords(torch.from_numpy(coords), (512, 512)).numpy()
    got_pts = np.asarray(random_pe_points(jnp.asarray(coords), (512, 512), gauss))
    np.testing.assert_allclose(got_pts, ref_pts, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("repeat_k", [1, 3])
def test_rope_matches_reference(repeat_k):
    load_reference()
    from sam2.modeling.position_encoding import apply_rotary_enc, compute_axial_cis

    head_dim, ex, ey = 64, 8, 8
    n = ex * ey
    rng = np.random.default_rng(0)
    q = rng.standard_normal((2, 2, n, head_dim), dtype=np.float32)
    k = rng.standard_normal((2, 2, n * repeat_k, head_dim), dtype=np.float32)

    freqs = compute_axial_cis(dim=head_dim, end_x=ex, end_y=ey)
    rq, rk = apply_rotary_enc(
        torch.from_numpy(q), torch.from_numpy(k), freqs, repeat_freqs_k=repeat_k > 1
    )

    cos, sin = axial_rope_cos_sin(head_dim, ex, ey)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)
    got_q = np.asarray(apply_rope(jnp.asarray(q), cos, sin))
    cos_k = jnp.tile(cos, (repeat_k, 1))
    sin_k = jnp.tile(sin, (repeat_k, 1))
    got_k = np.asarray(apply_rope(jnp.asarray(k), cos_k, sin_k))

    np.testing.assert_allclose(got_q, rq.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got_k, rk.numpy(), rtol=1e-4, atol=1e-5)
