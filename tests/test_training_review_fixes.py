"""Regressions for the round-3 training-stack review fixes: persistent
loader rngs (epochs must differ), case-insensitive frame matching, SA-V
annotation caching + fps divisibility guard, EvalSampler object-count cap,
padded-row loss gating, and make_optimizer's group-args guard."""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from det_sam2_tpu.training.dataset import (
    EvalSampler,
    JSONRawDataset,
    MixedDataLoader,
    PNGRawDataset,
    RandomUniformSampler,
    SyntheticRawDataset,
    VOSDataLoader,
)
from det_sam2_tpu.training.loss_fns import (
    CORE_LOSS_KEY,
    DEFAULT_WEIGHTS,
    MultiStepMultiMasksAndIous,
)


# ---------------------------------------------------------------------------
# persistent rngs: successive batches() calls are successive epochs
# ---------------------------------------------------------------------------


def test_vos_loader_epochs_differ():
    ds = SyntheticRawDataset(num_videos=8, num_frames=8, hw=(48, 48), seed=0)
    loader = VOSDataLoader(
        ds, sampler=RandomUniformSampler(num_frames=2, max_num_objects=1),
        image_size=32, batch_size=1, hflip_prob=0.5, color_jitter_prob=0.5,
        seed=11,
    )
    (img1, _), = list(loader.batches(1))
    (img2, _), = list(loader.batches(1))
    assert not np.array_equal(img1, img2), (
        "two epochs replayed identical data: loader rng was re-seeded"
    )


def test_mixed_loader_epochs_differ():
    class _Stub:
        """Yields an incrementing counter so replay is detectable."""

        def __init__(self):
            self.n = 0

        def batches(self, num_batches):
            for _ in range(num_batches):
                self.n += 1
                yield self.n

    a, b = _Stub(), _Stub()
    mixed = MixedDataLoader([a, b], weights=[1.0, 1.0], seed=3)
    first = list(mixed.batches(4))
    second = list(mixed.batches(4))
    # sub-loaders advance (no value ever repeats per stub), and the
    # mixture choice rng advances across calls
    assert a.n + b.n == 8
    assert first != second


# ---------------------------------------------------------------------------
# frame matching + SA-V annotation handling
# ---------------------------------------------------------------------------


def _save_frame(path, seed=0, hw=(16, 20)):
    from PIL import Image

    rng = np.random.default_rng(seed)
    Image.fromarray(rng.integers(0, 255, (*hw, 3), np.uint8)).save(path)


def test_png_loader_matches_uppercase_extensions(tmp_path):
    img_root = tmp_path / "JPEGImages"
    gt_root = tmp_path / "Annotations"
    (img_root / "v").mkdir(parents=True)
    (gt_root / "v").mkdir(parents=True)
    _save_frame(img_root / "v" / "00000.JPG")  # uppercase ext
    ds = PNGRawDataset(str(img_root), str(gt_root))
    names = ds.frame_names("v")
    assert names == ["00000"]
    clip = ds.load_frames("v", names)  # silently skipping would misalign
    assert len(clip.frames) == 1 and clip.frames[0].shape == (16, 20, 3)
    with pytest.raises(KeyError):
        ds.load_frames("v", ["99999"])


def _sav_video(tmp_path, fps):
    img_root = tmp_path / "JPEGImages"
    gt_root = tmp_path / "Annotations"
    (img_root / "v").mkdir(parents=True)
    (gt_root / "v").mkdir(parents=True)
    _save_frame(img_root / "v" / "00000.jpg")
    m = np.zeros((16, 20), bool)
    m[2:9, 3:11] = True
    # simple uncompressed COCO RLE (column-major runs)
    flat = np.asarray(m, order="F").reshape(-1, order="F")
    counts, run, cur = [], 0, False
    for v in flat:
        if bool(v) == cur:
            run += 1
        else:
            counts.append(run)
            run, cur = 1, not cur
    counts.append(run)
    seg = {"size": [16, 20], "counts": counts}
    with open(gt_root / "v" / "v_manual.json", "w") as f:
        json.dump({"masklet": [[seg]], "fps": fps}, f)
    return str(img_root), str(gt_root)


def test_json_dataset_fps_divisibility_guard(tmp_path):
    img_root, gt_root = _sav_video(tmp_path, fps=7)
    ds = JSONRawDataset(img_root, gt_root, frames_fps=24)
    with pytest.raises(ValueError, match="must divide"):
        ds.frame_names("v")


def test_json_dataset_annotation_cache(tmp_path):
    img_root, gt_root = _sav_video(tmp_path, fps=24)
    ds = JSONRawDataset(img_root, gt_root, frames_fps=24)
    a1 = ds._load_annots("v")
    os.remove(os.path.join(gt_root, "v", "v_manual.json"))
    a2 = ds._load_annots("v")  # served from cache, not re-parsed
    assert a1[0] is a2[0] and a1[1] == a2[1]


def test_eval_sampler_pads_to_real_object_count():
    ds = SyntheticRawDataset(num_videos=2, num_frames=4, hw=(48, 48), seed=1)
    loader = VOSDataLoader(
        ds, sampler=EvalSampler(), image_size=32, batch_size=1,
        hflip_prob=0, color_jitter_prob=0,
    )
    imgs, masks = next(loader.batches(1))
    # EvalSampler.max_num_objects is 10**9; masks must pad only to the
    # clip's real object count, not allocate a 10**9 axis
    assert imgs.shape[:2] == (4, 1)
    assert masks.ndim in (4, 5)
    if masks.ndim == 5:
        assert masks.shape[2] <= 8


# ---------------------------------------------------------------------------
# padded-row loss gating
# ---------------------------------------------------------------------------


def test_loss_ignores_padded_object_rows():
    rng = np.random.default_rng(0)
    T, M, H, W = 2, 3, 16, 16
    gt_row = (rng.random((T, 1, H, W)) > 0.6).astype(np.float32)
    gt_row[0] = (rng.random((1, H, W)) > 0.5).astype(np.float32)  # visible @0

    def outs_for(n_rows, seed):
        r = np.random.default_rng(seed)
        outs = []
        for _ in range(T):
            outs.append(
                {
                    "multistep_pred_multimasks_high_res": [
                        jnp.asarray(r.standard_normal((n_rows, M, H, W)))
                    ],
                    "multistep_pred_ious": [
                        jnp.asarray(r.random((n_rows, M)), jnp.float32)
                    ],
                    "multistep_object_score_logits": [
                        jnp.asarray(r.standard_normal((n_rows, 1)))
                    ],
                }
            )
        return outs

    loss_fn = MultiStepMultiMasksAndIous(
        DEFAULT_WEIGHTS, supervise_all_iou=True, iou_use_l1_loss=True,
        pred_obj_scores=True,
    )
    outs1 = outs_for(1, seed=7)
    base = float(loss_fn(outs1, jnp.asarray(gt_row))[CORE_LOSS_KEY])

    # add a padded all-empty row with ARBITRARY predictions: loss unchanged
    outs2 = outs_for(2, seed=99)
    for o1, o2 in zip(outs1, outs2):
        for key in o1:
            o2[key] = [
                jnp.concatenate([a, b[1:2]], axis=0)
                for a, b in zip(o1[key], o2[key])
            ]
    gt2 = np.concatenate([gt_row, np.zeros_like(gt_row)], axis=1)
    padded = float(loss_fn(outs2, jnp.asarray(gt2))[CORE_LOSS_KEY])
    np.testing.assert_allclose(padded, base, rtol=1e-5)


# ---------------------------------------------------------------------------
# make_optimizer group-args guard
# ---------------------------------------------------------------------------


def test_make_optimizer_rejects_silent_group_drop():
    from det_sam2_tpu.training.train_step import OptimConf, make_optimizer

    with pytest.raises(ValueError, match="per-leaf groups"):
        make_optimizer(OptimConf(layer_decay=0.9))
    with pytest.raises(ValueError, match="per-leaf groups"):
        make_optimizer(OptimConf(base_lr=5e-6, vision_lr=3e-6))
    # plain config still fine without params/cfg
    tx = make_optimizer(OptimConf())
    assert tx is not None
