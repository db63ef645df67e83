"""Fused LN+MLP+residual kernel: interpret-mode parity vs the unfused
module composition, gradient parity through the custom VJP, and the
module-level wiring (MultiScaleBlock tail uses it with an identical
parameter tree)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from det_sam2_tpu.ops.fused_mlp import _pure, fused_ln_mlp


def _args(r=192, d=144, h=None, dtype=jnp.float32, seed=0):
    h = h or 4 * d
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((r, d)), dtype)
    g = jnp.asarray(rng.standard_normal(d) * 0.1 + 1.0, jnp.float32)
    b = jnp.asarray(rng.standard_normal(d) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((d, h)) / np.sqrt(d), jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(h) * 0.01, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((h, d)) / np.sqrt(h), jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(d) * 0.01, jnp.float32)
    return x, g, b, w1, b1, w2, b2


@pytest.mark.parametrize("d", [144, 256])
@pytest.mark.parametrize("approximate", [False, True])
def test_kernel_matches_pure(d, approximate):
    x, g, b, w1, b1, w2, b2 = _args(d=d)
    got = fused_ln_mlp(
        x, g, b, w1, b1, w2, b2, approximate=approximate, interpret=True
    )
    want = _pure(
        x, g.reshape(1, -1), b.reshape(1, -1), w1, b1.reshape(1, -1),
        w2, b2.reshape(1, -1), 1e-6, approximate,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_kernel_row_remainder():
    # rows not a multiple of block_r (768^2 hiera stage-4 is 576 rows)
    x, g, b, w1, b1, w2, b2 = _args(r=576, d=160)
    got = fused_ln_mlp(x, g, b, w1, b1, w2, b2, block_r=256, interpret=True)
    want = _pure(
        x, g.reshape(1, -1), b.reshape(1, -1), w1, b1.reshape(1, -1),
        w2, b2.reshape(1, -1), 1e-6, False,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_kernel_hidden_blocking():
    # hiera-L stage-4 width: W1+W2 = 4*1152*4608 = 21 MB > the 8 MB VMEM
    # residency cap, so the interpret branch picks block_h=512 -> n_h=9
    # hidden steps — the only path that exercises the multi-step
    # accumulate/revisit logic in _kernel (i_h==0 init, i_h==n_h-1 finish)
    x, g, b, w1, b1, w2, b2 = _args(r=64, d=1152, h=4608)
    got = fused_ln_mlp(x, g, b, w1, b1, w2, b2, interpret=True)
    want = _pure(
        x, g.reshape(1, -1), b.reshape(1, -1), w1, b1.reshape(1, -1),
        w2, b2.reshape(1, -1), 1e-6, False,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_grad_matches_pure():
    x, g, b, w1, b1, w2, b2 = _args(r=64, d=144)

    def loss_fused(x, w1, w2):
        return jnp.sum(
            jnp.sin(fused_ln_mlp(x, g, b, w1, b1, w2, b2, interpret=True))
        )

    def loss_pure(x, w1, w2):
        return jnp.sum(jnp.sin(_pure(
            x, g.reshape(1, -1), b.reshape(1, -1), w1, b1.reshape(1, -1),
            w2, b2.reshape(1, -1), 1e-6, False,
        )))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w1, w2)
    gp = jax.grad(loss_pure, argnums=(0, 1, 2))(x, w1, w2)
    for a, e in zip(gf, gp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   atol=5e-5, rtol=5e-5)


def test_block_param_tree_unchanged():
    """The fused tail must keep norm2/mlp parameter names and shapes so
    convert.py checkpoint loading is untouched."""
    from det_sam2_tpu.modeling.hiera import MultiScaleBlock

    blk = MultiScaleBlock(
        dim=64, dim_out=64, num_heads=2, window_size=4, use_fused_mlp=True
    )
    x = jnp.zeros((1, 8, 8, 64))
    params = blk.init(jax.random.PRNGKey(0), x)["params"]
    assert set(params["norm2"]) == {"scale", "bias"}
    assert set(params["mlp"]) == {"layers_0", "layers_1"}
    assert params["mlp"]["layers_0"]["kernel"].shape == (64, 256)
    assert params["mlp"]["layers_1"]["kernel"].shape == (256, 64)
    out = blk.apply({"params": params}, x)
    assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()
