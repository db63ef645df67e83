"""Hiera hierarchical ViT trunk, TPU-native.

Behavioral equivalent of /root/reference/sam2/modeling/backbones/hieradet.py
(Hiera :172, MultiScaleBlock :86, MultiScaleAttention :40, do_pool :25) and
backbones/utils.py (window_partition :16, window_unpartition :42, PatchEmbed
:66), re-designed for JAX/XLA:

  * NHWC end to end (TPU conv layout); no permutes around convs/pools;
  * windowed attention stacks windows in the batch axis — static shapes,
    attended by XLA's batched sdpa (Pallas window kernels were tried in 3
    layouts and measured slower — see CLAUDE.md tried-and-rejected);
  * the bicubic interpolation of the background positional embedding is a
    precomputed dense-matrix resize (utils/resize.py), numerically matching
    torch's bicubic align_corners=False (a = -0.75);
  * all shapes static: padding for non-divisible windows is compiled in.
"""

from __future__ import annotations

import os
from typing import Callable, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from det_sam2_tpu.configs import HieraConfig
from det_sam2_tpu.modeling.layers import (
    ConvParams,
    IMAGENET_MEAN,
    IMAGENET_STD,
    LayerNorm,
    MLP,
    approx_gelu,
    drop_path,
    exact_gelu,
    s2d_split,
    s2d_stage,
    sdpa,
)
from det_sam2_tpu.ops import quant
from det_sam2_tpu.utils.resize import resize_nhwc, resize_weights

# Read ONCE at import (baked into jit traces; see PatchEmbed docstring).
# "0" canonical strided conv | "1" width-only s2d (default) | "2" two-axis
_PE_S2D_MODE = os.environ.get("DET_SAM2_PE_S2D", "1")


def window_partition(x: jnp.ndarray, ws: int) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """[B, H, W, C] -> [B*nW, ws, ws, C] with zero padding when needed."""
    b, h, w, c = x.shape
    pad_h = (ws - h % ws) % ws
    pad_w = (ws - w % ws) % ws
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // ws, ws, wp // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c)
    return x, (hp, wp)


def window_unpartition(
    windows: jnp.ndarray, ws: int, pad_hw: Tuple[int, int], hw: Tuple[int, int]
) -> jnp.ndarray:
    """Inverse of window_partition; crops padding."""
    hp, wp = pad_hw
    h, w = hw
    c = windows.shape[-1]
    b = windows.shape[0] // ((hp // ws) * (wp // ws))
    x = windows.reshape(b, hp // ws, wp // ws, ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
    if hp > h or wp > w:
        x = x[:, :h, :w, :]
    return x


def _max_pool_2x(x: jnp.ndarray) -> jnp.ndarray:
    """MaxPool2d(kernel=2, stride=2, ceil_mode=False) in NHWC."""
    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))


class PatchEmbed(nn.Module):
    """7x7 stride-4 conv patch embedding (backbones/utils.py:66).

    Fast path: the canonical strided conv on a 3-channel input costs
    ~1.3 ms/frame at 1024^2 on v5e (2% lane utilization + an im2col layout
    copy — profiled as the 2nd-largest op in the whole streaming step).
    When H, W divide the stride and the taps span two stride cells
    (p <= s, k-1-p < s — true for the 7/4/3 default), the conv runs in a
    WIDTH-only space-to-depth layout: [B, H, W/4, 4*3] is a pure reshape
    of the frame (the width phase and channel are already minor-
    contiguous, so it moves NO bytes — the full 2-axis s2d transpose
    interleaved 12-byte atoms and cost 0.76 ms/frame at 1024^2 in the
    round-5 trace), the width taps collapse to 2 cells, and the height
    taps stay REAL conv taps at stride 4: kernel [7, 2, 12, embed] with
    exactly rearranged weights. DET_SAM2_PE_S2D=0 (read ONCE at import —
    a post-compile toggle would be a silent no-op) forces the canonical
    conv; =2 forces the round-4 two-axis s2d_stage form (kept for A/Bs;
    both measured slower on v5e)."""

    embed_dim: int
    kernel: int = 7
    stride: int = 4
    padding: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # x: [B, H, W, 3] (float: pre-normalized;
        # uint8: RAW frames, ImageNet normalization fused in)
        k, s, p = self.kernel, self.stride, self.padding
        b, h, w, cin = x.shape
        fast = (
            h % s == 0 and w % s == 0 and p <= s and (k - 1 - p) < s
            and _PE_S2D_MODE != "0"
        )
        raw = x.dtype == jnp.uint8
        if not fast:
            if raw:
                x = (
                    x.astype(jnp.float32) / 255.0
                    - jnp.asarray(IMAGENET_MEAN)
                ) / jnp.asarray(IMAGENET_STD)
            return nn.Conv(
                self.embed_dim,
                kernel_size=(k, k),
                strides=(s, s),
                padding=[(p, p)] * 2,
                dtype=self.dtype,
                name="proj",
            )(x)
        kernel, bias = ConvParams((k, k, cin, self.embed_dim), name="proj")()
        mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
        std = jnp.asarray(IMAGENET_STD, jnp.float32)
        if _PE_S2D_MODE == "2":
            xs = s2d_split(x, s)  # 2-axis split: a 12-byte-atom transpose
            if raw:
                # normalization is per-channel affine -> apply AFTER the
                # split (padding with zeros happens after normalize in the
                # reference, and s2d_stage's cell padding does too: exact)
                a = jnp.tile(1.0 / (255.0 * std), s * s).astype(self.dtype)
                bb = jnp.tile(-mean / std, s * s).astype(self.dtype)
                xs = xs.astype(self.dtype) * a + bb
            return s2d_stage(xs, kernel, bias, 1, self.dtype, s=s, p=p)
        # width-only s2d: [B, H, W/s, s*cin] is a PURE RESHAPE of the frame
        # (width phase px and channel c are already minor-contiguous); the
        # width taps collapse to 2 cells (pad left 1, none right) and the
        # height taps stay real stride-s conv taps. The kernel placement:
        # col = s*wo + dx - p lands in cell wq = wo + dwq - 1 with phase
        # px = dx - p + s*(1 - dwq), so dx < p -> (dwq=0, px=dx+s-p) and
        # dx >= p -> (dwq=1, px=dx-p); exact for p <= s, k-1-p < s.
        xs = x.reshape(b, h, w // s, s * cin)
        if raw:
            a = jnp.tile(1.0 / (255.0 * std), s).astype(self.dtype)
            bb = jnp.tile(-mean / std, s).astype(self.dtype)
            xs = xs.astype(self.dtype) * a + bb
        else:
            xs = xs.astype(self.dtype)
        r2 = np.zeros((k, 2, s), np.float32)
        for dx in range(k):
            dwq = 0 if dx < p else 1
            r2[dx, dwq, dx - p + s * (1 - dwq)] = 1.0
        w2 = jnp.einsum(
            "xwp,yxcf->ywpcf", jnp.asarray(r2), kernel.astype(jnp.float32)
        ).reshape(k, 2, s * cin, self.embed_dim)
        out = jax.lax.conv_general_dilated(
            xs, w2.astype(self.dtype),
            window_strides=(s, 1), padding=((p, p), (1, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out + bias.astype(self.dtype)


class QKVProj(nn.Module):
    """qkv projection with PARAM-side slicing.

    Same parameter tree as Dense(3 * dim_out, name="qkv") — kernel
    [Cin, 3*dim_out], bias [3*dim_out] — but the kernel is sliced into
    three matmuls so q/k/v are produced as separate outputs. Slicing the
    activation instead (one [N, 3C] matmul then three strided slices)
    costs three extra passes over the 3x-wide tensor and blocks XLA from
    fusing each output's head transpose into its matmul epilogue; on v5e
    this form is ~10% faster for the whole hiera-L encoder."""

    dim_out: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    quant: bool = False  # int8 weights + per-token int8 activations

    @nn.compact
    def __call__(self, x):  # [B, N, Cin] -> 3 x [B, N, heads, D]
        cin = x.shape[-1]
        b_, n_ = x.shape[0], x.shape[1]
        if self.quant:
            w_q = self.param(
                "kernel_q", quant.init_int8_zeros, (cin, 3 * self.dim_out)
            )
            w_s = self.param(
                "kernel_scale", nn.initializers.ones, (1, 3 * self.dim_out)
            )
            bias = self.param(
                "bias", nn.initializers.zeros, (3 * self.dim_out,)
            )
            k3 = w_q.reshape(cin, 3, self.dim_out)
            s3 = w_s.reshape(3, self.dim_out)
            b3 = bias.astype(self.dtype).reshape(3, self.dim_out)
            x_q, s_row = quant.quantize_rows(x)  # quantize once, use 3x
            return [
                (
                    quant.int8_matmul_prequant(
                        x_q, s_row, k3[:, i], s3[i], self.dtype
                    )
                    + b3[i]
                ).reshape(b_, n_, self.num_heads, -1)
                for i in range(3)
            ]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (cin, 3 * self.dim_out),
        )
        bias = self.param("bias", nn.initializers.zeros, (3 * self.dim_out,))
        k3 = kernel.astype(self.dtype).reshape(cin, 3, self.dim_out)
        b3 = bias.astype(self.dtype).reshape(3, self.dim_out)
        return [
            (x @ k3[:, i] + b3[i]).reshape(b_, n_, self.num_heads, -1)
            for i in range(3)
        ]


class OutProj(nn.Module):
    """Attention output projection fused with the head merge.

    Same parameter tree as Dense(dim_out, name="proj") — kernel
    [heads*D, dim_out], bias [dim_out] — but contracts the [B, heads, N,
    D] attention output directly (einsum over (heads, D)), so the
    [B, heads, N, D] -> [B, N, heads*D] transpose copy disappears into
    the matmul's operand layout."""

    dim_out: int
    dtype: jnp.dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, o):  # o: [B, heads, N, D] -> [B, N, dim_out]
        b, h, n, d = o.shape
        if self.quant:
            w_q = self.param(
                "kernel_q", quant.init_int8_zeros, (h * d, self.dim_out)
            )
            w_s = self.param(
                "kernel_scale", nn.initializers.ones, (1, self.dim_out)
            )
            bias = self.param("bias", nn.initializers.zeros, (self.dim_out,))
            # per-token rows span (heads, D): quantize over both axes so
            # the int8 einsum contracts the same pair the fp path does
            o_q, s_row = quant.quantize_rows(o, axes=(1, 3))
            k3 = w_q.reshape(h, d, self.dim_out)
            y = jnp.einsum(
                "bhnd,hdc->bnc", o_q, k3,
                preferred_element_type=jnp.int32,
            )
            y = (
                y.astype(jnp.float32)
                * s_row.reshape(b, n, 1)  # [b,1,n,1] -> per-(b,n) rescale
                * w_s.reshape(-1)
            )
            return y.astype(self.dtype) + bias.astype(self.dtype)
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (h * d, self.dim_out)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.dim_out,))
        k3 = kernel.astype(self.dtype).reshape(h, d, self.dim_out)
        return jnp.einsum("bhnd,hdc->bnc", o, k3) + bias.astype(self.dtype)


class MultiScaleAttention(nn.Module):
    """Windowed/global attention with optional 2x query pooling
    (hieradet.py:40-84)."""

    dim_out: int
    num_heads: int
    q_pool: bool = False
    attention_fn: Callable = sdpa
    dtype: jnp.dtype = jnp.float32
    quant_qkv: bool = False
    quant_out: bool = False
    # static dispatch: global-attention blocks must use attention_fn (the
    # flash kernel) regardless of batch size — inferring window-vs-global
    # from `b > 1` sent BATCHED encodes (set_image_batch / AMG crops) down
    # the windowed einsum path, materializing [B, heads, N, N] fp32 logits
    # (hiera-L @1024 stage-3: ~4 GB per global block at B=8)
    is_global: bool = False

    @nn.compact
    def __call__(self, x):  # [B, H, W, C] (windows stacked in B) or [B, N, C]
        flat = x.ndim == 3  # resident-window mode feeds flattened windows
        if flat:
            b, n, _ = x.shape
            h = w = None
        else:
            b, h, w, _ = x.shape
            n = h * w
        q, k, v = QKVProj(
            dim_out=self.dim_out,
            num_heads=self.num_heads,
            dtype=self.dtype,
            quant=self.quant_qkv,
            name="qkv",
        )(x.reshape(b, n, -1))
        oh, ow = h, w
        if self.q_pool:
            q = q.reshape(b, h, w, -1)
            q = _max_pool_2x(q)
            oh, ow = q.shape[1], q.shape[2]
            q = q.reshape(b, oh * ow, self.num_heads, -1)

        # a windowed block with b == 1 (window == whole grid) is
        # mathematically global; keep routing it to the flash path
        use_global = self.is_global or b == 1
        if not use_global:
            # windowed: einsums on the [B, N, heads, D] layout — no
            # explicit q/k/v transposes; XLA folds layout into the dots
            # (same ops as modeling.layers.sdpa: fp32 logits + softmax)
            d = q.shape[-1]
            scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))
            s = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k,
                preferred_element_type=jnp.float32,
            ) * scale
            p = jax.nn.softmax(s, axis=-1)
            o = jnp.einsum(
                "bhqk,bkhd->bhqd", p.astype(v.dtype), v,
                preferred_element_type=jnp.float32,
            ).astype(v.dtype)
        else:
            # global block: [B, N, heads, D] -> [B, heads, N, D] for the
            # flash kernel (VMEM-resident softmax over 2304^2 scores)
            q = q.transpose(0, 2, 1, 3)
            k = k.transpose(0, 2, 1, 3)
            v = v.transpose(0, 2, 1, 3)
            o = self.attention_fn(q, k, v)
        o = OutProj(
            dim_out=self.dim_out, dtype=self.dtype, quant=self.quant_out,
            name="proj",
        )(o)
        if flat:
            return o  # [B, N, dim_out]
        return o.reshape(b, oh, ow, -1)


class MultiScaleBlock(nn.Module):
    """Hiera block: windowed attention (+ optional q-pool downsample) + MLP
    (hieradet.py:86-170)."""

    dim: int
    dim_out: int
    num_heads: int
    window_size: int  # 0 = global attention
    q_stride: Optional[Tuple[int, int]] = None
    mlp_ratio: float = 4.0
    attention_fn: Callable = sdpa
    gelu: Callable = exact_gelu
    dtype: jnp.dtype = jnp.float32
    # resident-window mode: input is ALREADY partitioned ([B*nW, ws, ws, C])
    # and stays partitioned — valid only for windowed blocks with no
    # q-pool and no dim change (norm/attn/mlp are all window-local, so the
    # values are identical; the per-block partition/unpartition relayout
    # copies disappear). The caller (Hiera) partitions once per run of
    # such blocks: ~20% of the 1024^2 hiera-L encoder was relayout copies.
    pre_windowed: bool = False
    # int8 trunk dense layers to quantize (ops/quant.py): any of "qkv",
    # "attn_out", "mlp", "proj" (the dim-change shortcut projection).
    # Empty = full-precision block.
    quant_kinds: Tuple[str, ...] = ()
    # stochastic-depth rate for BOTH residual branches (reference
    # hieradet.py:122,165-167); non-zero only when Hiera sees a 'dropout'
    # rng, so inference paths never call make_rng
    drop_path_prob: float = 0.0

    def _drop_path(self, y):
        if self.drop_path_prob <= 0.0:
            return y
        return drop_path(
            y, self.drop_path_prob, deterministic=False,
            rng=self.make_rng("dropout"),
        )

    def _mlp_tail(self, x):
        """x + mlp(ln2(x)). Deliberately plain XLA: a Pallas fused
        LN+MLP+residual kernel was tried (even with VMEM-resident weights)
        and measured slower than XLA's own fusion/overlap on v5e — see
        CLAUDE.md tried-and-rejected for the numbers."""
        hidden = int(self.dim_out * self.mlp_ratio)
        y = LayerNorm(eps=1e-6, name="norm2")(x)
        y = MLP(
            hidden_dim=hidden,
            output_dim=self.dim_out,
            num_layers=2,
            activation=self.gelu,
            dtype=self.dtype,
            quant="mlp" in self.quant_kinds,
            name="mlp",
        )(y)
        return x + self._drop_path(y)

    @nn.compact
    def __call__(self, x):  # [B, H, W, C] (or windows when pre_windowed)
        if self.pre_windowed:
            assert (
                self.window_size > 0
                and self.q_stride is None
                and self.dim == self.dim_out
            )
            shortcut = x
            x = LayerNorm(eps=1e-6, name="norm1")(x)
            x = MultiScaleAttention(
                dim_out=self.dim_out,
                num_heads=self.num_heads,
                q_pool=False,
                attention_fn=self.attention_fn,
                dtype=self.dtype,
                quant_qkv="qkv" in self.quant_kinds,
                quant_out="attn_out" in self.quant_kinds,
                is_global=False,
                name="attn",
            )(x)
            x = shortcut + self._drop_path(x)
            return self._mlp_tail(x)

        shortcut = x
        x = LayerNorm(eps=1e-6, name="norm1")(x)

        if self.dim != self.dim_out:
            if "proj" in self.quant_kinds:
                proj = quant.QuantDense(
                    self.dim_out, dtype=self.dtype, name="proj"
                )(x)
            else:
                proj = nn.Dense(self.dim_out, dtype=self.dtype, name="proj")(x)
            shortcut = _max_pool_2x(proj) if self.q_stride else proj

        ws = self.window_size
        if ws > 0:
            h, w = x.shape[1], x.shape[2]
            x, pad_hw = window_partition(x, ws)

        x = MultiScaleAttention(
            dim_out=self.dim_out,
            num_heads=self.num_heads,
            q_pool=self.q_stride is not None,
            attention_fn=self.attention_fn,
            dtype=self.dtype,
            quant_qkv="qkv" in self.quant_kinds,
            quant_out="attn_out" in self.quant_kinds,
            is_global=self.window_size == 0,
            name="attn",
        )(x)

        if self.q_stride:
            ws = self.window_size // self.q_stride[0]
            h, w = shortcut.shape[1], shortcut.shape[2]
            pad_h = (ws - h % ws) % ws if ws > 0 else 0
            pad_w = (ws - w % ws) % ws if ws > 0 else 0
            pad_hw = (h + pad_h, w + pad_w)

        if self.window_size > 0:
            x = window_unpartition(x, ws, pad_hw, (h, w))

        x = shortcut + self._drop_path(x)
        return self._mlp_tail(x)


class Hiera(nn.Module):
    """4-stage hierarchical trunk; returns per-stage NHWC feature maps
    (hieradet.py:172-316). Highest resolution first."""

    cfg: HieraConfig
    attention_fn: Callable = sdpa
    gelu: Callable = exact_gelu
    dtype: jnp.dtype = jnp.float32
    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        c = self.cfg
        x = PatchEmbed(
            embed_dim=c.embed_dim,
            kernel=c.patch_kernel,
            stride=c.patch_stride,
            padding=c.patch_padding,
            dtype=self.dtype,
            name="patch_embed",
        )(x)
        h, w = x.shape[1], x.shape[2]

        # Windowed background positional embedding (hieradet.py:253-263):
        # a coarse [bkg_h, bkg_w] grid bicubically resized to (h, w), plus a
        # tiled per-window embedding.
        bkg_h, bkg_w = c.window_pos_embed_bkg_spatial_size
        ws0 = c.window_spec[0]
        pos_embed = self.param(
            "pos_embed", nn.initializers.zeros, (1, bkg_h, bkg_w, c.embed_dim)
        )
        pos_embed_window = self.param(
            "pos_embed_window", nn.initializers.zeros, (1, ws0, ws0, c.embed_dim)
        )
        if h % ws0 or w % ws0:
            raise ValueError(
                f"Hiera input must give a post-patch-embed grid divisible by "
                f"window_spec[0]={ws0}; got {h}x{w} (input "
                f"{h * c.patch_stride}x{w * c.patch_stride})."
            )
        wy = jnp.asarray(resize_weights(bkg_h, h, "bicubic"))
        wx = jnp.asarray(resize_weights(bkg_w, w, "bicubic"))
        pe = resize_nhwc(pos_embed, wy, wx)
        pe = pe + jnp.tile(pos_embed_window, (1, h // ws0, w // ws0, 1))
        x = x + pe.astype(x.dtype)

        stage_ends = c.stage_ends
        q_pool_blocks = set(c.q_pool_blocks)
        global_blocks = set(c.global_att_blocks or ())

        # stochastic depth (reference hieradet.py:232: linspace over depth,
        # applied to both residual branches). Active only when a 'dropout'
        # rng is supplied (training) — inference stays deterministic.
        dp_active = c.drop_path_rate > 0.0 and self.has_rng("dropout")
        if c.depth > 1:
            dpr = [c.drop_path_rate * i / (c.depth - 1) for i in range(c.depth)]
        else:
            dpr = [0.0]

        quant_kinds: Tuple[str, ...] = ()
        if c.quantize_int8:
            quant_kinds = tuple(
                k
                for k in ("qkv", "attn_out", "mlp", "proj")
                if k not in c.quant_skip
            )

        outputs: List[jnp.ndarray] = []
        embed_dim, num_heads, cur_stage = c.embed_dim, c.num_heads, 1
        # resident-window bookkeeping: keep x partitioned across runs of
        # consecutive same-window blocks; unpartition only for global /
        # q-pool / dim-change blocks and stage outputs
        in_win = False
        win_meta: Optional[Tuple[int, Tuple[int, int], Tuple[int, int]]] = None
        cur_h, cur_w = h, w  # spatial dims of the residual stream

        def unpart(xw):
            ws_, pad_hw_, hw_ = win_meta
            xw = xw.reshape(xw.shape[0], ws_, ws_, xw.shape[-1])
            return window_unpartition(xw, ws_, pad_hw_, hw_)

        for i in range(c.depth):
            dim_out = embed_dim
            window_size = c.window_spec[cur_stage - 1]
            if i in global_blocks:
                window_size = 0
            if i - 1 in stage_ends:
                dim_out = int(embed_dim * c.dim_mul)
                num_heads = int(num_heads * c.head_mul)
                cur_stage += 1
            simple = (
                window_size > 0
                and dim_out == embed_dim
                and i not in q_pool_blocks
                # resident mode only when windows tile exactly — otherwise
                # norm/MLP would run on the zero padding (e.g. hiera-S
                # stage 3: 48 % 14 != 0 pads 48->56, +36% tokens)
                and cur_h % window_size == 0
                and cur_w % window_size == 0
                # stochastic depth masks per SAMPLE; the flattened-window
                # layout puts B*nW in the batch axis, so disable resident
                # mode while drop-path is live (training only)
                and not dp_active
            )
            if simple:
                if not in_win:
                    hw = (x.shape[1], x.shape[2])
                    x, pad_hw = window_partition(x, window_size)
                    # flatten window tokens: blocks run on [B*nW, ws^2, C]
                    x = x.reshape(x.shape[0], -1, x.shape[-1])
                    win_meta = (window_size, pad_hw, hw)
                    in_win = True
            elif in_win:
                x = unpart(x)
                in_win = False
            x = MultiScaleBlock(
                dim=embed_dim,
                dim_out=dim_out,
                num_heads=num_heads,
                window_size=window_size,
                q_stride=c.q_stride if i in q_pool_blocks else None,
                mlp_ratio=c.mlp_ratio,
                attention_fn=self.attention_fn,
                gelu=self.gelu,
                dtype=self.dtype,
                pre_windowed=simple,
                quant_kinds=quant_kinds,
                drop_path_prob=dpr[i] if dp_active else 0.0,
                name=f"blocks_{i}",
            )(x)
            embed_dim = dim_out
            if i in q_pool_blocks:
                cur_h //= 2  # max_pool 2x2 stride 2, VALID (floor)
                cur_w //= 2
            if i in stage_ends:
                if in_win:
                    x = unpart(x)
                    in_win = False
                outputs.append(x)
        return outputs
