"""Ablation profile of the fused stream step (hiera-L 1024^2, 2 obj).

profile_scan_gap2 localized the hiera-L 1024 budget: stream_step 31.3 ms
(fill=0) vs encode_image ~21.7 standalone -> ~9.6 ms of track-side work,
of which only ~6.4 is the three big pieces (mem-attn / heads / mem-enc)
measured standalone. This script builds the SAME fused step up one piece
at a time — each variant is ONE jit ending in scalar sums (no output
layout materialization) — so the deltas attribute in-fusion cost:

  v0  encode only
  v1  + select_memory + _assemble_memory (no attention)
  v2  + memory attention (attend_memory)
  v3  + SAM heads
  v4  + memory encode
  v5  + bank write (carry returned, like the real step)

Whole-pipeline deltas only (CLAUDE.md: sub-ms standalone timings lie).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax")

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from det_sam2_tpu.configs import sam2_1_hiera_l, with_image_size
from det_sam2_tpu.state import init_bank, select_memory, write_noncond
from det_sam2_tpu.track import (
    SAM2Engine,
    _assemble_memory,
    _broadcast_feats,
    _conditioned_features,
    normalize_image,
    use_multimask,
)

NUM_OBJECTS = 2
REPS = 30


def tsum(*xs):
    return sum(jnp.sum(x.astype(jnp.float32)) for x in xs)


def main():
    cfg = with_image_size(sam2_1_hiera_l(), 1024)
    engine = SAM2Engine(cfg, dtype=jnp.bfloat16)
    model = engine.model
    bank = init_bank(cfg, num_objects=NUM_OBJECTS, dtype=jnp.bfloat16,
                     attend_cond_tiles=1)
    rng = np.random.default_rng(0)
    size = cfg.image_size
    img = jnp.asarray(rng.standard_normal((1, size, size, 3)), jnp.float32)
    feats0 = engine.encode_image(img)
    boxes = jnp.asarray(
        [[[100.0, 120.0], [300.0, 400.0]], [[400.0, 200.0], [700.0, 600.0]]],
        jnp.float32)
    labels = jnp.asarray([[2, 3], [2, 3]], jnp.int32)
    out = engine.prompt_step(feats0, bank, 0, 10_000, boxes, labels,
                             is_init=True)
    bank = engine.encode_cond_memory(
        feats0, bank, 0, out["pred_masks"], out["object_score_logits"],
        out["obj_ptr"], is_mask_from_pts=True)
    frame = jax.device_put(jnp.asarray(
        (rng.standard_normal((size, size, 3)) * 40 + 80).clip(0, 255),
        jnp.uint8))
    float(jnp.sum(frame[:2, :2, 0].astype(jnp.float32)))

    def make(level: int):
        def body(m, img_, bank_, frame_idx, num_frames):
            feats = m.forward_image(normalize_image(img_)[None])
            if level == 0:
                return tsum(*feats)
            o = bank_.num_objects
            s0, s1, feat = _broadcast_feats(feats, o)
            if level == 6:  # select only (gathers, no pack/concat)
                sel = select_memory(cfg, bank_, frame_idx, num_frames, False)
                return (tsum(feat, s0, s1, sel["spatial_mem"], sel["ptrs"])
                        + jnp.sum(sel["spatial_valid"]))
            if level == 1:
                sel = select_memory(cfg, bank_, frame_idx, num_frames, False)
                memory, memory_pos, valid, lay = _assemble_memory(
                    m, cfg, sel)
                return tsum(feat, s0, s1, memory, memory_pos) + jnp.sum(valid)
            pix = _conditioned_features(
                m, cfg, feat, bank_, frame_idx, num_frames, False,
                is_init=False)
            if level == 2:
                return tsum(pix, s0, s1)
            multimask = use_multimask(cfg, is_init=False, num_pts=0)
            (_, _, ious, low_res, high_res, obj_ptr, obj_logits) = (
                m.forward_sam_heads(
                    pix, high_res_features=[s0, s1],
                    multimask_output=multimask))
            if level == 3:
                return tsum(low_res, high_res, obj_ptr, obj_logits, ious)
            maskmem = m.encode_memory(
                feat, high_res, obj_logits, binarize=False,
                apply_non_overlap=cfg.non_overlap_masks_for_mem_enc)
            if level == 4:
                return tsum(maskmem, low_res, obj_ptr)
            smem = maskmem.reshape(o, -1, cfg.mem_dim)
            new_bank = write_noncond(
                bank_, frame_idx, smem, obj_ptr,
                obj_valid=jnp.ones((o,), bool))
            return new_bank, tsum(low_res, obj_ptr, obj_logits)

        return jax.jit(nn.apply(body, model))

    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", type=str, default="0,6,1,2,3,4,5")
    args = ap.parse_args()

    prev = None
    for level in [int(v) for v in args.levels.split(",")]:
        fn = make(level)
        r = fn({"params": engine.params}, frame, bank, np.int32(1),
               np.int32(10_000))
        s = r[1] if level == 5 else r
        float(s)
        t0 = time.perf_counter()
        for i in range(REPS):
            r = fn({"params": engine.params}, frame, bank, np.int32(2 + i),
                   np.int32(10_000))
            s = r[1] if level == 5 else r
        float(s)
        ms = 1000.0 * (time.perf_counter() - t0) / REPS
        delta = "" if prev is None else f"  (+{ms - prev:.2f})"
        print(f"v{level}: {ms:.2f} ms{delta}", flush=True)
        prev = ms


if __name__ == "__main__":
    main()
