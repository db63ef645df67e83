"""FPN neck + image encoder wrapper.

Behavioral equivalent of /root/reference/sam2/modeling/backbones/
image_encoder.py (ImageEncoder :14, FpnNeck :47): 1x1 lateral convs to
d_model, nearest 2x top-down on configured levels, per-level sine position
encodings, and scalp-dropping of the lowest-resolution level.

TPU notes: the sine PEs are host-precomputed constants (position_encoding.
sine_pos_embed_2d); nearest 2x is an exact jnp.repeat; everything is NHWC.
"""

from __future__ import annotations

from typing import Callable, List, Tuple

import flax.linen as nn
import jax.numpy as jnp

from det_sam2_tpu.configs import FpnNeckConfig, HieraConfig
from det_sam2_tpu.modeling.hiera import Hiera
from det_sam2_tpu.modeling.layers import exact_gelu, sdpa
from det_sam2_tpu.modeling.position_encoding import sine_pos_embed_2d
from det_sam2_tpu.utils.resize import upsample2x_nearest_nhwc


class FpnNeck(nn.Module):
    """Lateral 1x1 convs + top-down pathway (image_encoder.py:47-134)."""

    cfg: FpnNeckConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, xs: List[jnp.ndarray]
    ) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
        """xs: trunk outputs, highest resolution FIRST (xs[0] = stride 4).

        Returns (features, positions), index-aligned with xs. The reference
        indexes convs[n - i] against xs[i] because its channel list is
        lowest-resolution-first; behavior here is identical.
        """
        c = self.cfg
        n = len(xs) - 1
        out: List[jnp.ndarray] = [None] * len(xs)
        pos: List[jnp.ndarray] = [None] * len(xs)
        top_down = set(c.fpn_top_down_levels)
        assert c.fuse_type in ("sum", "avg")

        prev = None
        for i in range(n, -1, -1):
            lateral = nn.Conv(
                c.d_model,
                kernel_size=(1, 1),
                dtype=self.dtype,
                name=f"convs_{n - i}",
            )(xs[i])
            if i in top_down and prev is not None:
                td = upsample2x_nearest_nhwc(prev.astype(jnp.float32))
                prev = lateral + td.astype(lateral.dtype)
                if c.fuse_type == "avg":
                    prev = prev / 2
            else:
                prev = lateral
            out[i] = prev
            pe = sine_pos_embed_2d(prev.shape[1], prev.shape[2], c.pos_num_feats)
            pos[i] = jnp.asarray(pe)[None].astype(prev.dtype)
        return out, pos


class ImageEncoder(nn.Module):
    """Trunk -> neck -> scalp (image_encoder.py:14-45)."""

    hiera_cfg: HieraConfig
    neck_cfg: FpnNeckConfig
    scalp: int = 1
    attention_fn: Callable = sdpa
    gelu: Callable = exact_gelu
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample: jnp.ndarray) -> dict:
        """sample: [B, H, W, 3] normalized image. Returns dict with
        'backbone_fpn' (NHWC features, highest res first) and
        'vision_pos_enc' (NHWC sine PEs)."""
        feats = Hiera(
            cfg=self.hiera_cfg,
            attention_fn=self.attention_fn,
            gelu=self.gelu,
            dtype=self.dtype,
            name="trunk",
        )(sample)
        features, pos = FpnNeck(cfg=self.neck_cfg, dtype=self.dtype, name="neck")(
            feats
        )
        if self.scalp > 0:
            features, pos = features[: -self.scalp], pos[: -self.scalp]
        return {
            "vision_features": features[-1],
            "vision_pos_enc": pos,
            "backbone_fpn": features,
        }
