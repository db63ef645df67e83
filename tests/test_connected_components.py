"""CC kernel parity: host C++ union-find and device JAX propagation vs
cv2.connectedComponentsWithStats (golden), plus hole-fill semantics."""

import numpy as np
import pytest

import jax.numpy as jnp

from det_sam2_tpu.ops.connected_components import (
    _get_lib,
    connected_components_jax,
    fill_holes_and_sprinkles_np,
    fill_holes_in_mask_scores_jax,
    fill_holes_in_mask_scores_np,
    get_connected_components_np,
)

cv2 = pytest.importorskip("cv2")


def _golden(mask):
    cnt, lab, stats, _ = cv2.connectedComponentsWithStats(
        mask.astype(np.uint8), 8
    )
    sizes = stats[:, cv2.CC_STAT_AREA].copy()
    sizes[0] = 0
    return lab, sizes[lab]


def _random_masks(n=4, h=64, w=64, p=0.4, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.uniform(size=(n, h, w)) < p).astype(np.uint8)


def _canon(labels):
    """Canonicalize labels by first-occurrence order for comparison."""
    out = np.zeros_like(labels)
    mapping = {}
    nxt = 1
    flat_in = labels.reshape(-1)
    flat_out = out.reshape(-1)
    for i, v in enumerate(flat_in):
        if v == 0:
            continue
        if v not in mapping:
            mapping[v] = nxt
            nxt += 1
        flat_out[i] = mapping[v]
    return out


def test_host_cc_builds():
    assert _get_lib() is not None, "C++ CC kernel failed to build"


def test_host_cc_matches_cv2():
    masks = _random_masks()
    labels, areas = get_connected_components_np(masks)
    for i in range(len(masks)):
        glab, gareas = _golden(masks[i])
        np.testing.assert_array_equal(_canon(labels[i]), _canon(glab))
        np.testing.assert_array_equal(areas[i], gareas)


def test_jax_cc_matches_cv2():
    masks = _random_masks(n=2, h=48, w=40, seed=1)
    labels, areas = connected_components_jax(jnp.asarray(masks))
    labels, areas = np.asarray(labels), np.asarray(areas)
    for i in range(len(masks)):
        glab, gareas = _golden(masks[i])
        np.testing.assert_array_equal(_canon(labels[i]), _canon(glab))
        np.testing.assert_array_equal(areas[i], gareas)


def test_fill_holes_host_and_device_agree():
    rng = np.random.default_rng(2)
    logits = rng.standard_normal((2, 1, 48, 48)).astype(np.float32) * 4
    # carve a big foreground blob with small holes
    logits[:, :, 10:40, 10:40] = 5.0
    logits[0, 0, 20:22, 20:22] = -1.0  # 4-px hole -> filled (area<=8)
    logits[1, 0, 25:29, 25:29] = -1.0  # 16-px hole -> kept
    host = fill_holes_in_mask_scores_np(logits, 8)
    dev = np.asarray(
        fill_holes_in_mask_scores_jax(jnp.asarray(logits), 8.0)
    )
    np.testing.assert_allclose(host, dev, atol=1e-6)
    assert (host[0, 0, 20:22, 20:22] == 0.1).all()
    assert (host[1, 0, 25:29, 25:29] == -1.0).all()


def test_fill_sprinkles():
    logits = np.full((1, 32, 32), -5.0, np.float32)
    logits[0, 4:20, 4:20] = 5.0  # big object
    logits[0, 28:30, 28:30] = 5.0  # 4-px sprinkle
    out = fill_holes_and_sprinkles_np(logits, 0.0, 0.0, 8.0)
    assert (out[0, 28:30, 28:30] < 0).all()
    assert (out[0, 4:20, 4:20] > 0).all()


def test_fill_holes_device_adversarial_vs_host():
    """Bounded-rounds small-component detection must be EXACT: random
    speckle, thin snakes longer than max_area (fragmentation bait), and
    components exactly at the area boundary."""
    from det_sam2_tpu.ops.connected_components import small_components_jax

    rng = np.random.default_rng(7)
    masks = (rng.uniform(size=(3, 56, 48)) > 0.55).astype(np.float32)
    # a long 1-px snake (area 40 >> 8): must NOT be flagged anywhere
    masks[0] = 0.0
    for i in range(40):
        masks[0, 8 + (i % 2), 4 + i // 2] = 1.0  # zigzag ~ diameter 20
    # boundary cases: area exactly 8 (flag) and 9 (no flag)
    masks[1, :2, :] = 0.0
    masks[1, 0, 0:8] = 1.0
    masks[1, 1, 20:29] = 0.0
    masks[1, 0, 20:29] = 1.0

    got = np.asarray(small_components_jax(jnp.asarray(masks), 8.0))
    labels, areas = get_connected_components_np(masks)
    want = (labels > 0) & (areas <= 8)
    np.testing.assert_array_equal(got, want)


def test_small_components_stencil_matches_hist():
    """The bounded-displacement stencil path (mode="stencil") must be
    bit-identical to the histogram path and to host CC across densities
    (sparse speckle -> near-solid). Modes are selected via the explicit
    argument — the env override is import-time-only by design."""
    from det_sam2_tpu.ops.connected_components import small_components_jax

    rng = np.random.default_rng(3)
    for p in (0.05, 0.35, 0.6, 0.9):
        m = rng.random((2, 48, 64)) < p
        for area in (8.0, 20.0):  # a=8 (stencil default), a=20 (hist)
            ref = np.asarray(
                small_components_jax(jnp.asarray(m), area, mode="bf16")
            )
            got = np.asarray(
                small_components_jax(jnp.asarray(m), area, mode="stencil")
            )
            np.testing.assert_array_equal(got, ref)
            auto = np.asarray(small_components_jax(jnp.asarray(m), area))
            np.testing.assert_array_equal(auto, ref)
            labels, areas = get_connected_components_np(m)
            np.testing.assert_array_equal(
                got, (labels > 0) & (areas <= area)
            )
