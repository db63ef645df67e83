"""Prompt encoder: points/boxes/masks -> sparse & dense embeddings.

Behavioral equivalent of /root/reference/sam2/modeling/sam/prompt_encoder.py
(PromptEncoder :17, _embed_points :73, _embed_boxes :97). TPU re-design:
label-conditional embedding addition is a table gather (labels+1 indexes a
stacked [not_a_point; 4 point embeddings] table) instead of boolean masked
writes, so it jits with static shapes.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from det_sam2_tpu.modeling.layers import LayerNorm, exact_gelu
from det_sam2_tpu.modeling.position_encoding import (
    random_pe_grid,
    random_pe_points,
)


class PromptEncoder(nn.Module):
    embed_dim: int = 256
    image_embedding_size: Tuple[int, int] = (64, 64)
    input_image_size: Tuple[int, int] = (1024, 1024)
    mask_in_chans: int = 16
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.pe_gaussian = self.param(
            "pe_gaussian",
            nn.initializers.normal(stddev=1.0),
            (2, self.embed_dim // 2),
        )
        # rows: [not_a_point, neg(0), pos(1), box_tl(2), box_br(3)]
        self.not_a_point_embed = self.param(
            "not_a_point_embed", nn.initializers.normal(1.0), (1, self.embed_dim)
        )
        self.point_embeds = self.param(
            "point_embeds", nn.initializers.normal(1.0), (4, self.embed_dim)
        )
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0), (1, self.embed_dim)
        )
        ch = self.mask_in_chans
        self.mask_downscaling_conv0 = nn.Conv(
            ch // 4, (2, 2), strides=(2, 2), dtype=self.dtype,
            name="mask_downscaling_conv0",
        )
        self.mask_downscaling_ln0 = LayerNorm(eps=1e-6, name="mask_downscaling_ln0")
        self.mask_downscaling_conv1 = nn.Conv(
            ch, (2, 2), strides=(2, 2), dtype=self.dtype,
            name="mask_downscaling_conv1",
        )
        self.mask_downscaling_ln1 = LayerNorm(eps=1e-6, name="mask_downscaling_ln1")
        self.mask_downscaling_conv2 = nn.Conv(
            self.embed_dim, (1, 1), dtype=self.dtype, name="mask_downscaling_conv2",
        )

    @property
    def mask_input_hw(self) -> Tuple[int, int]:
        return (
            4 * self.image_embedding_size[0],
            4 * self.image_embedding_size[1],
        )

    def get_dense_pe(self) -> jnp.ndarray:
        """[H, W, C] positional grid for the mask decoder."""
        h, w = self.image_embedding_size
        return random_pe_grid(h, w, self.pe_gaussian)

    def embed_points(
        self, coords: jnp.ndarray, labels: jnp.ndarray, pad: bool
    ) -> jnp.ndarray:
        """coords [B, P, 2] px, labels [B, P] in {-1,0,1,2,3} -> [B, P(+1), C].

        Padding appends one (0,0)/-1 slot exactly like the reference (the
        pad token *participates* in decoder attention, so counts must match
        the reference for parity).
        """
        b = coords.shape[0]
        coords = coords + 0.5
        if pad:
            coords = jnp.concatenate(
                [coords, jnp.zeros((b, 1, 2), coords.dtype)], axis=1
            )
            labels = jnp.concatenate(
                [labels, -jnp.ones((b, 1), labels.dtype)], axis=1
            )
        pe = random_pe_points(coords, self.input_image_size, self.pe_gaussian)
        pe = jnp.where(labels[..., None] == -1, 0.0, pe)
        table = jnp.concatenate([self.not_a_point_embed, self.point_embeds], axis=0)
        pe = pe + jnp.take(table, labels.astype(jnp.int32) + 1, axis=0)
        return pe.astype(self.dtype)

    def embed_boxes(self, boxes: jnp.ndarray) -> jnp.ndarray:
        """boxes [B, 4] xyxy px -> [B, 2, C] corner embeddings."""
        coords = boxes.reshape(-1, 2, 2) + 0.5
        pe = random_pe_points(coords, self.input_image_size, self.pe_gaussian)
        pe = pe.at[:, 0, :].add(self.point_embeds[2])
        pe = pe.at[:, 1, :].add(self.point_embeds[3])
        return pe.astype(self.dtype)

    def embed_masks(self, masks: jnp.ndarray) -> jnp.ndarray:
        """masks [B, 4H, 4W, 1] -> dense embeddings [B, H, W, C]."""
        x = self.mask_downscaling_conv0(masks)
        x = exact_gelu(self.mask_downscaling_ln0(x))
        x = self.mask_downscaling_conv1(x)
        x = exact_gelu(self.mask_downscaling_ln1(x))
        return self.mask_downscaling_conv2(x)

    def no_mask_dense(self, batch: int) -> jnp.ndarray:
        h, w = self.image_embedding_size
        return jnp.broadcast_to(
            self.no_mask_embed.reshape(1, 1, 1, -1),
            (batch, h, w, self.embed_dim),
        ).astype(self.dtype)

    def __call__(
        self,
        points: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        boxes: Optional[jnp.ndarray] = None,
        masks: Optional[jnp.ndarray] = None,
        batch: int = 1,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (sparse [B, N, C], dense [B, H, W, C])."""
        if points is not None:
            batch = points[0].shape[0]
        elif boxes is not None:
            batch = boxes.shape[0]
        elif masks is not None:
            batch = masks.shape[0]

        sparse_parts = []
        if points is not None:
            coords, labels = points
            sparse_parts.append(self.embed_points(coords, labels, pad=boxes is None))
        if boxes is not None:
            sparse_parts.append(self.embed_boxes(boxes))
        if sparse_parts:
            sparse = jnp.concatenate(sparse_parts, axis=1)
        else:
            sparse = jnp.zeros((batch, 0, self.embed_dim), self.dtype)

        if masks is not None:
            dense = self.embed_masks(masks)
        else:
            dense = self.no_mask_dense(batch)
        return sparse, dense
