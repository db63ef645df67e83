"""Memory encoder: (pixel features, predicted mask) -> 64-d memory map.

Behavioral equivalent of /root/reference/sam2/modeling/memory_encoder.py
(MaskDownSampler :17, CXBlock :62, Fuser :120, MemoryEncoder :138) in NHWC.
The depthwise 7x7 ConvNeXt conv uses feature_group_count; LayerNorm2d is a
plain trailing-axis LayerNorm in NHWC.
"""

from __future__ import annotations

import math
import os

import flax.linen as nn
import jax
import jax.numpy as jnp

from det_sam2_tpu.configs import MemoryEncoderConfig
from det_sam2_tpu.modeling.layers import (
    ConvParams,
    LayerNorm,
    exact_gelu,
    s2d_split,
    s2d_stage,
)

# Read ONCE at import (baked into jit traces; see MaskDownSampler docstring).
_MDS_S2D = os.environ.get("DET_SAM2_MDS_S2D", "1") != "0"


class MaskDownSampler(nn.Module):
    """Stacked stride-s convs downsampling the mask by total_stride
    (memory_encoder.py:17-61).

    TPU fast path (default when H, W divide total_stride and the knobs are
    the sam2 defaults k=3, s=2): the whole chain runs in a space-to-depth
    layout at the FINAL resolution with a constant 256-wide channel axis —
    each stride-2 conv over 1/4/16/64 channels (3% lane utilization, ~12
    dispatch floors at 1024^2) becomes a dense 2x2x256x256 MXU conv whose
    weights are an exact rearrangement of the canonical taps; LayerNorm/GELU
    act on per-phase channel groups, bit-equal math. DET_SAM2_MDS_S2D=0
    (read ONCE at import — a post-compile toggle would be a silent no-op)
    forces the canonical per-resolution path."""

    cfg: MemoryEncoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B, H, W, 1]
        c = self.cfg
        num_layers = int(
            math.log2(c.mask_downsampler_total_stride)
            // math.log2(c.mask_downsampler_stride)
        )
        k, s, p = (
            c.mask_downsampler_kernel,
            c.mask_downsampler_stride,
            c.mask_downsampler_padding,
        )
        total = c.mask_downsampler_total_stride
        chans, convs = 1, []
        for i in range(num_layers):
            cin, chans = chans, chans * (s ** 2)
            convs.append(
                ConvParams((k, k, cin, chans), name=f"conv_{i}")()
            )
        out_kernel, out_bias = ConvParams(
            (1, 1, chans, c.in_dim), name="conv_out"
        )()
        lns = [LayerNorm(eps=1e-6, name=f"ln_{i}") for i in range(num_layers)]

        b, h, w, cin0 = x.shape
        fast = (
            (k, s, p) == (3, 2, 1)
            and cin0 == 1
            and h % total == 0
            and w % total == 0
            and _MDS_S2D
        )
        if fast:
            ho, wo = h // total, w // total
            x = s2d_split(x, total)
            for i, (kernel, bias) in enumerate(convs):
                m = total // (s ** (i + 1))
                co = kernel.shape[-1]
                x = s2d_stage(x, kernel, bias, m, self.dtype)
                # LN/GELU over each phase's co-group == per-position LN at
                # the stage's native resolution
                x = lns[i](x.reshape(b, ho, wo, m * m, co)).reshape(
                    b, ho, wo, m * m * co
                )
                x = exact_gelu(x)
        else:
            for i, (kernel, bias) in enumerate(convs):
                x = jax.lax.conv_general_dilated(
                    x.astype(self.dtype), kernel.astype(self.dtype),
                    window_strides=(s, s), padding=[(p, p), (p, p)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ) + bias.astype(self.dtype)
                x = lns[i](x)
                x = exact_gelu(x)
        return (
            x.astype(self.dtype)
            @ out_kernel.astype(self.dtype)[0, 0]
            + out_bias.astype(self.dtype)
        )


class CXBlock(nn.Module):
    """ConvNeXt block (memory_encoder.py:62-119), NHWC."""

    dim: int
    kernel: int = 7
    padding: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inp = x
        x = nn.Conv(
            self.dim,
            (self.kernel, self.kernel),
            padding=[(self.padding, self.padding)] * 2,
            feature_group_count=self.dim,
            dtype=self.dtype,
            name="dwconv",
        )(x)
        x = LayerNorm(eps=1e-6, name="norm")(x)
        x = nn.Dense(4 * self.dim, dtype=self.dtype, name="pwconv1")(x)
        x = exact_gelu(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(x)
        gamma = self.param("gamma", nn.initializers.constant(1e-6), (self.dim,))
        x = gamma.astype(x.dtype) * x
        return inp + x


class Fuser(nn.Module):
    """Stack of CXBlocks (memory_encoder.py:120-137)."""

    cfg: MemoryEncoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        for i in range(c.fuser_num_layers):
            x = CXBlock(
                dim=c.fuser_dim, kernel=c.cx_kernel, padding=c.cx_padding,
                dtype=self.dtype, name=f"layers_{i}",
            )(x)
        return x


class MemoryEncoder(nn.Module):
    """Fuse pixel features with the downsampled mask; project to mem_dim
    (memory_encoder.py:138-181). Returns NHWC features (pos enc is a
    host-side constant added by the caller)."""

    cfg: MemoryEncoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, pix_feat: jnp.ndarray, masks: jnp.ndarray,
        skip_mask_sigmoid: bool = False,
    ) -> jnp.ndarray:
        c = self.cfg
        if not skip_mask_sigmoid:
            masks = jax.nn.sigmoid(masks)
        masks = MaskDownSampler(cfg=c, dtype=self.dtype, name="mask_downsampler")(
            masks
        )
        x = nn.Conv(c.in_dim, (1, 1), dtype=self.dtype, name="pix_feat_proj")(
            pix_feat
        )
        x = x + masks
        x = Fuser(cfg=c, dtype=self.dtype, name="fuser")(x)
        if c.out_dim != c.in_dim:
            x = nn.Conv(c.out_dim, (1, 1), dtype=self.dtype, name="out_proj")(x)
        return x
