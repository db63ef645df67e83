"""Per-layer-kind int8 sensitivity sweep (CPU, tiny config).

Quantizes the trunk with each layer kind individually kept fp
(HieraConfig.quant_skip + quantize_trunk(skip=...)) and reports trunk
cosine + box-mask IoU vs the fp engine, to decide which kinds must stay
full-precision for the serving mode to meet the repo's 0.99 fidelity bar.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses
import json

import jax.numpy as jnp
import numpy as np

from det_sam2_tpu.configs import tiny_test_config, sam2_1_hiera_s, with_image_size
from det_sam2_tpu.ops.quant import quantize_trunk
from det_sam2_tpu.state import init_bank
from det_sam2_tpu.track import SAM2Engine


def fidelity(fp, cfg, skip):
    qcfg = dataclasses.replace(
        cfg,
        hiera=dataclasses.replace(
            cfg.hiera, quantize_int8=True, quant_skip=tuple(skip)
        ),
    )
    q = SAM2Engine(qcfg, params=quantize_trunk(fp.params, skip=tuple(skip)))
    size = cfg.image_size
    rng = np.random.default_rng(3)
    img = jnp.asarray(
        (rng.standard_normal((1, size, size, 3)) * 40 + 90).clip(0, 255),
        jnp.float32,
    )
    f_fp, f_q = fp.encode_image(img), q.encode_image(img)
    cosines = []
    for a, b in zip(f_fp, f_q):
        ca = np.asarray(a, np.float64).ravel()
        cb = np.asarray(b, np.float64).ravel()
        cosines.append(float((ca @ cb) / (np.linalg.norm(ca) * np.linalg.norm(cb))))
    sc = size / 128.0
    boxes = jnp.asarray([[[20.0 * sc, 25.0 * sc], [90.0 * sc, 100.0 * sc]]],
                        jnp.float32)
    labels = jnp.asarray([[2, 3]], jnp.int32)
    ms = []
    for eng in (fp, q):
        bank = init_bank(eng.cfg, num_objects=1, attend_cond_tiles=1)
        out = eng.prompt_step(
            eng.encode_image(img), bank, 0, 100, boxes, labels, is_init=True
        )
        ms.append(np.asarray(out["pred_masks"]) > 0)
    inter = np.logical_and(*ms).sum()
    union = np.logical_or(*ms).sum()
    iou = float(inter / union) if union else 1.0
    return {"skip": list(skip), "min_cos": round(min(cosines), 5),
            "iou": round(iou, 5)}


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "tiny"
    if which == "tiny":
        cfg = tiny_test_config()
    else:  # hiera-S at 512 — slower but closer to production scale
        cfg = with_image_size(sam2_1_hiera_s(), 512)
    fp = SAM2Engine(cfg, seed=0)
    for skip in (
        (),  # full quant (current default)
        ("proj",),
        ("attn_out",),
        ("qkv",),
        ("mlp",),
        ("proj", "attn_out"),
        ("proj", "qkv"),
        ("qkv", "attn_out", "mlp", "proj"),  # sanity: nothing quantized
    ):
        print(json.dumps(fidelity(fp, cfg, skip)), flush=True)


if __name__ == "__main__":
    main()
