"""Flash attention kernel vs the XLA sdpa reference (interpret mode on CPU)."""

import jax
import numpy as np
import pytest

import jax.numpy as jnp

from det_sam2_tpu.modeling.layers import sdpa
from det_sam2_tpu.ops.attention import flash_attention


def _rand(shape, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape, dtype=np.float32)
    )


@pytest.mark.parametrize(
    "b,h,nq,nk,d",
    [
        (1, 1, 256, 512, 64),
        (2, 2, 256, 1024, 64),
        (1, 1, 260, 700, 64),  # non-divisible -> internal padding
    ],
)
def test_flash_matches_sdpa(b, h, nq, nk, d):
    q = _rand((b, h, nq, d), 0)
    k = _rand((b, h, nk, d), 1)
    v = _rand((b, h, nk, d), 2)
    want = np.asarray(sdpa(q, k, v))
    got = np.asarray(
        flash_attention(q, k, v, block_q=128, block_k=128, min_flops=0)
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_flash_with_mask_and_tile_skip():
    b, h, nq, nk, d = 2, 1, 128, 1024, 64
    q = _rand((b, h, nq, d), 0)
    k = _rand((b, h, nk, d), 1)
    v = _rand((b, h, nk, d), 2)
    mask = np.zeros((b, nk), bool)
    mask[0, :256] = True  # row 0: only the first two 128-tiles valid
    mask[1, 100:400] = True  # row 1: straddles tiles
    bias = jnp.where(jnp.asarray(mask), 0.0, -1e30)[:, None, None, :]
    want = np.asarray(sdpa(q, k, v, bias=bias))
    got = np.asarray(
        flash_attention(q, k, v, bias=bias, block_q=128, block_k=128,
                        min_flops=0)
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_flash_fully_masked_rows_are_zero():
    b, h, nq, nk, d = 1, 1, 128, 256, 64
    q = _rand((b, h, nq, d), 0)
    k = _rand((b, h, nk, d), 1)
    v = _rand((b, h, nk, d), 2)
    bias = jnp.full((b, 1, 1, nk), -1e30)
    got = np.asarray(
        flash_attention(q, k, v, bias=bias, block_q=128, block_k=128,
                        min_flops=0)
    )
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, 0.0, atol=1e-6)


def test_small_problems_fall_back():
    q = _rand((1, 1, 8, 16), 0)
    out = flash_attention(q, q, q)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(sdpa(q, q, q)), atol=1e-6
    )


def _grad_pair(fn_flash, fn_ref, args):
    def loss_of(fn):
        def f(*a):
            out = fn(*a)
            w = jnp.arange(out.size, dtype=out.dtype).reshape(out.shape)
            return jnp.sum(out * jnp.sin(w * 0.01))

        return f

    g_flash = jax.grad(loss_of(fn_flash), argnums=(0, 1, 2))(*args)
    g_ref = jax.grad(loss_of(fn_ref), argnums=(0, 1, 2))(*args)
    return g_flash, g_ref


def test_flash_grad_matches_sdpa():
    b, h, nq, nk, d = 1, 2, 256, 384, 64
    q = _rand((b, h, nq, d), 0)
    k = _rand((b, h, nk, d), 1)
    v = _rand((b, h, nk, d), 2)

    def fl(q, k, v):
        return flash_attention(q, k, v, block_q=128, block_k=128, min_flops=0)

    g_flash, g_ref = _grad_pair(fl, sdpa, (q, k, v))
    for gf, gr, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), rtol=2e-4, atol=2e-4,
            err_msg=f"d{name}",
        )


def test_flash_grad_with_masked_tiles():
    """Backward must skip fully-masked KV tiles and produce zero grads for
    their keys/values, matching sdpa with the same bias."""
    b, h, nq, nk, d = 1, 1, 256, 512, 64
    q = _rand((b, h, nq, d), 3)
    k = _rand((b, h, nk, d), 4)
    v = _rand((b, h, nk, d), 5)
    mask = np.zeros((b, 1, 1, nk), np.float32)
    mask[..., 128:256] = -1e30  # one dead tile at block_k=128
    mask[..., 400:] = -1e30  # partial masking in a live tile
    bias = jnp.asarray(mask)

    def fl(q, k, v):
        return flash_attention(q, k, v, bias=bias, block_q=128, block_k=128,
                               min_flops=0)

    def ref(q, k, v):
        return sdpa(q, k, v, bias=bias)

    g_flash, g_ref = _grad_pair(fl, ref, (q, k, v))
    for gf, gr, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), rtol=2e-4, atol=2e-4,
            err_msg=f"d{name}",
        )
    # masked keys get exactly zero gradient
    np.testing.assert_allclose(np.asarray(g_flash[1])[..., 128:256, :], 0.0)
    np.testing.assert_allclose(np.asarray(g_flash[2])[..., 400:, :], 0.0)


def test_flash_dv_narrower_than_dq():
    """Low-rank value path: v width differs from q/k (memory tokens stay
    64-d through attention)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from det_sam2_tpu.modeling.layers import sdpa
    from det_sam2_tpu.ops.attention import flash_attention

    rng = np.random.default_rng(7)
    b, h, nq, nk, d, dv = 1, 1, 256, 384, 64, 32
    q = jnp.asarray(rng.standard_normal((b, h, nq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, nk, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, nk, dv)), jnp.float32)
    bias = np.zeros((b, 1, 1, nk), np.float32)
    bias[..., 300:] = -1e30
    bias = jnp.asarray(bias)

    out = flash_attention(q, k, v, bias=bias, min_flops=1)
    ref = sdpa(q, k, v, bias=bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    # gradients through the custom VJP with mismatched dv
    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, bias=bias, min_flops=1) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(sdpa(q, k, v, bias=bias) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4)


def test_block_fallback_prefers_large_blocks():
    """The memory cross-attention key length (7*S + ptr tokens: 16192 at
    768^2, 28736 at 1024^2) divides NONE of the candidate blocks; the
    fallback must still pick the LARGEST legal block, not 128 — a 128
    fallback cost 40% of streaming throughput in round 3 (hiera-L 55.6 ->
    41.7 FPS @768^2). Padding is legal: _flash_call pads to the block
    multiple and bias-masks the padded keys."""
    from det_sam2_tpu.ops.attention import _pick_block

    # divisible: no padding waste
    assert _pick_block(2304, 1024) == 768
    assert _pick_block(4096, 1024) == 1024
    # not divisible by any candidate: largest block <= cap, padded
    assert _pick_block(16192, 1024) == 1024
    assert _pick_block(28736, 1024) == 1024
    assert _pick_block(16192, 512) == 512
    # caps below 128 still return a legal block
    assert _pick_block(16192, 64) == 128
