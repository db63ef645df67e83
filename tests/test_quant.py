"""W8A8 int8 trunk quantization (ops/quant.py): kernel numerics, the
params-tree conversion, and end-to-end encode fidelity vs the fp trunk.

TPU-native addition with no reference counterpart (the reference serves
fp16/bf16 only, det_sam2_inference/det_sam2_RT.py:102)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from det_sam2_tpu.configs import tiny_test_config
from det_sam2_tpu.ops.quant import (
    int8_matmul,
    quantize_trunk,
    quantize_weight,
)


def _rel_err(got, want):
    got = np.asarray(got, np.float64)
    want = np.asarray(want, np.float64)
    return np.linalg.norm(got - want) / max(np.linalg.norm(want), 1e-12)


def test_int8_matmul_close_to_fp():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((64, 96)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((96, 128)) * 0.05, jnp.float32)
    w_q, w_s = quantize_weight(w)
    got = int8_matmul(x, w_q, w_s, jnp.float32)
    want = x @ w
    # per-token + per-channel symmetric int8: ~0.5-1% relative error
    assert _rel_err(got, want) < 0.02


def test_int8_matmul_outlier_channels():
    """Per-output-channel scales keep an outlier column from poisoning
    the rest (the reason the scale axis is the OUTPUT channel)."""
    rng = np.random.default_rng(1)
    w = rng.standard_normal((64, 32)).astype(np.float32) * 0.02
    w[:, 7] *= 100.0  # one hot channel
    x = jnp.asarray(rng.standard_normal((16, 64)), jnp.float32)
    w_q, w_s = quantize_weight(jnp.asarray(w))
    got = np.asarray(int8_matmul(x, w_q, w_s, jnp.float32))
    want = np.asarray(x @ jnp.asarray(w))
    for c in range(32):
        assert _rel_err(got[:, c], want[:, c]) < 0.03, c


def test_quantize_weight_roundtrip_shapes():
    w = jnp.ones((48, 80))
    w_q, s = quantize_weight(w)
    assert w_q.shape == (48, 80) and w_q.dtype == jnp.int8
    assert s.shape == (1, 80) and s.dtype == jnp.float32
    # ones quantize exactly
    back = np.asarray(w_q, np.float32) * np.asarray(s)
    np.testing.assert_allclose(back, np.asarray(w), rtol=1e-6)


@pytest.fixture(scope="module")
def engines():
    from det_sam2_tpu.track import SAM2Engine

    cfg = tiny_test_config()
    fp = SAM2Engine(cfg, seed=0)
    qcfg = dataclasses.replace(
        cfg, hiera=dataclasses.replace(cfg.hiera, quantize_int8=True)
    )
    # default scope: dim-change shortcut proj stays fp (quant_skip default;
    # the sensitivity sweep measured it as the dominant fidelity cost)
    qparams = quantize_trunk(fp.params, skip=qcfg.hiera.quant_skip)
    q = SAM2Engine(qcfg, params=qparams)
    return fp, q


def test_quantize_trunk_tree(engines):
    fp, q = engines
    trunk = q.params["image_encoder"]["trunk"]
    blk = trunk["blocks_0"]["attn"]["qkv"]
    assert "kernel_q" in blk and "kernel_scale" in blk and "bias" in blk
    assert "kernel" not in blk
    assert np.asarray(blk["kernel_q"]).dtype == np.int8
    # non-trunk subtrees untouched
    fp_leaves = jax.tree_util.tree_leaves(fp.params["sam_mask_decoder"])
    q_leaves = jax.tree_util.tree_leaves(q.params["sam_mask_decoder"])
    assert len(fp_leaves) == len(q_leaves)
    np.testing.assert_array_equal(
        np.asarray(fp_leaves[0]), np.asarray(q_leaves[0])
    )
    assert "kernel" in trunk["patch_embed"]["proj"]  # conv stays fp
    # dim-change shortcut projections stay fp under the default scope
    for name, blk in trunk.items():
        if name.startswith("blocks_") and "proj" in blk:
            assert "kernel" in blk["proj"] and "kernel_q" not in blk["proj"]


def test_quantized_encode_fidelity(engines):
    """encode_image through the int8 trunk must stay close to fp: the
    serving opt-in is only usable if masks are preserved downstream."""
    fp, q = engines
    rng = np.random.default_rng(2)
    img = jnp.asarray(
        rng.integers(0, 255, (1, 128, 128, 3)).astype(np.float32)
    )
    f_fp = fp.encode_image(img)
    f_q = q.encode_image(img)
    for a, b in zip(f_fp, f_q):
        err = _rel_err(b, a)
        assert err < 0.12, err
        # directional agreement (feature maps drive attention + heads)
        ca = np.asarray(a, np.float64).ravel()
        cb = np.asarray(b, np.float64).ravel()
        cos = (ca @ cb) / (np.linalg.norm(ca) * np.linalg.norm(cb))
        assert cos > 0.99, cos


def test_quantized_mask_agreement(engines):
    """Box-prompted masks from the int8 engine agree with fp masks
    (IoU of thresholded logits)."""
    from det_sam2_tpu.state import init_bank

    fp, q = engines
    rng = np.random.default_rng(3)
    img = jnp.asarray(
        (rng.standard_normal((1, 128, 128, 3)) * 40 + 90).clip(0, 255),
        jnp.float32,
    )
    boxes = jnp.asarray([[[20.0, 25.0], [90.0, 100.0]]], jnp.float32)
    labels = jnp.asarray([[2, 3]], jnp.int32)
    outs = []
    for eng in (fp, q):
        bank = init_bank(eng.cfg, num_objects=1, attend_cond_tiles=1)
        feats = eng.encode_image(img)
        out = eng.prompt_step(
            feats, bank, 0, 100, boxes, labels, is_init=True
        )
        outs.append(np.asarray(out["pred_masks"]))
    m_fp, m_q = (o > 0 for o in outs)
    inter = np.logical_and(m_fp, m_q).sum()
    union = np.logical_or(m_fp, m_q).sum()
    if union > 0:
        # repo-standard fidelity bar: with the shortcut proj kept fp
        # (quant_skip default) the scoped int8 trunk preserves masks
        assert inter / union > 0.99, inter / union


def test_build_quantized_video_predictor():
    """build_sam2_video_predictor(quantize_int8=True) converts the trunk
    and flips the config in one step (the serving entry point)."""
    from det_sam2_tpu.build import build_sam2_video_predictor

    vp = build_sam2_video_predictor(
        tiny_test_config(), quantize_int8=True, dtype=jnp.float32
    )
    assert vp.engine.cfg.hiera.quantize_int8
    blk = vp.engine.params["image_encoder"]["trunk"]["blocks_0"]["attn"][
        "qkv"
    ]
    assert "kernel_q" in blk and "kernel" not in blk
