"""Parity of utils/resize.py against torch.nn.functional.interpolate."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from det_sam2_tpu.utils.resize import (
    resize_weights,
    resize_hw,
    torch_resize_hw,
    upsample2x_nearest_nhwc,
)


def _torch_resize(x_np, out_hw, mode, antialias=False):
    t = torch.from_numpy(x_np)
    kwargs = {}
    if mode != "nearest":
        kwargs["align_corners"] = False
        kwargs["antialias"] = antialias
    return F.interpolate(t, size=out_hw, mode=mode, **kwargs).numpy()


@pytest.mark.parametrize(
    "in_hw,out_hw,mode,antialias",
    [
        ((256, 256), (1024, 1024), "bilinear", False),  # mask upsample
        ((64, 64), (256, 256), "bilinear", False),
        ((7, 7), (64, 64), "bicubic", False),  # pos-embed interp
        ((14, 14), (64, 64), "bicubic", False),
        ((1024, 1024), (256, 256), "bilinear", True),  # antialiased mask down
        ((128, 128), (32, 32), "bilinear", True),
        ((256, 256), (270, 480), "bilinear", False),  # video-res output
    ],
)
def test_resize_matches_torch(in_hw, out_hw, mode, antialias):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, *in_hw), dtype=np.float32)
    ref = _torch_resize(x, out_hw, mode, antialias)
    got = np.asarray(
        torch_resize_hw(jnp.asarray(x), out_hw, mode=mode, antialias=antialias)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=2e-4)


def test_nearest_2x_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 8, 8, 5), dtype=np.float32)
    ref = (
        F.interpolate(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), scale_factor=2.0, mode="nearest"
        )
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    got = np.asarray(upsample2x_nearest_nhwc(jnp.asarray(x)))
    np.testing.assert_array_equal(got, ref)


def test_identity_resize():
    w = resize_weights(16, 16, "bilinear")
    np.testing.assert_array_equal(w, np.eye(16, dtype=np.float32))


def test_resize_hw_batched_axes():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 3, 16, 16), dtype=np.float32)
    wy = jnp.asarray(resize_weights(16, 8, "bilinear", True))
    wx = jnp.asarray(resize_weights(16, 8, "bilinear", True))
    got = np.asarray(resize_hw(jnp.asarray(x), wy, wx))
    ref = _torch_resize(x, (8, 8), "bilinear", True)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
