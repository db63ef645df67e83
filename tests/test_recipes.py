"""MOSE finetune recipe parity vs the reference training YAML's resolved
values, the MultiplePNG (SA-V layout) segment loader, and the per-frame
(non-consistent) ColorJitter mode."""

import os
import re

import numpy as np
import pytest

MOSE_YAML = (
    "/root/reference/sam2/configs/sam2.1_training/"
    "sam2.1_hiera_b+_MOSE_finetune.yaml"
)


def _resolve(node, root):
    """Resolve ${a.b} interpolations + the reference's times/divide
    resolvers (training/utils/train_utils.py:52-63) in a parsed YAML."""
    if isinstance(node, dict):
        return {k: _resolve(v, root) for k, v in node.items()}
    if isinstance(node, list):
        return [_resolve(v, root) for v in node]
    if isinstance(node, str):
        m = re.fullmatch(r"\$\{([a-z]+):(.+),(.+)\}", node)
        if m:
            op, a, b = m.groups()
            a, b = _resolve(a.strip(), root), _resolve(b.strip(), root)
            a = float(a) if isinstance(a, str) else a
            b = float(b) if isinstance(b, str) else b
            return a * b if op == "times" else a / b
        m = re.fullmatch(r"\$\{([\w.]+)\}", node)
        if m:
            cur = root
            for part in m.group(1).split("."):
                cur = cur[part]
            return _resolve(cur, root)
        m = re.fullmatch(r"\$\{([\w.]+)\}", node)
        return node
    return node


@pytest.fixture(scope="module")
def yaml_doc():
    import yaml

    if not os.path.isfile(MOSE_YAML):
        pytest.skip("reference training yaml not mounted")
    with open(MOSE_YAML) as f:
        doc = yaml.safe_load(f)
    return _resolve(doc, doc)


def test_mose_recipe_matches_yaml(yaml_doc):
    from det_sam2_tpu.training.recipes import mose_finetune_recipe

    r = mose_finetune_recipe(total_steps=1000)
    scratch = yaml_doc["scratch"]
    assert r.model.image_size == scratch["resolution"]
    assert r.batch_size == scratch["train_batch_size"]
    assert r.num_frames == scratch["num_frames"]
    assert r.max_num_objects == scratch["max_num_objects"]
    assert r.optim.base_lr == float(scratch["base_lr"])
    assert r.optim.vision_lr == float(scratch["vision_lr"])
    assert r.num_epochs == int(yaml_doc["trainer"]["max_epochs"])
    assert r.dataset_multiplier == yaml_doc["dataset"]["multiplier"]

    model = yaml_doc["trainer"]["model"]
    assert r.model.hiera.embed_dim == model["image_encoder"]["trunk"]["embed_dim"]
    assert r.model.hiera.num_heads == model["image_encoder"]["trunk"]["num_heads"]
    assert r.model.hiera.drop_path_rate == float(
        model["image_encoder"]["trunk"]["drop_path_rate"]
    )
    # prompt-simulation knobs (:181-193)
    assert r.sample.prob_to_use_pt_input == model["prob_to_use_pt_input_for_train"]
    assert r.sample.prob_to_use_box_input == model["prob_to_use_box_input_for_train"]
    assert r.sample.prob_to_sample_from_gt == model["prob_to_sample_from_gt_for_train"]
    assert r.sample.num_frames_to_correct == model["num_frames_to_correct_for_train"]
    assert r.sample.rand_frames_to_correct == model["rand_frames_to_correct_for_train"]
    assert r.sample.num_init_cond_frames == model["num_init_cond_frames_for_train"]
    assert r.sample.rand_init_cond_frames == model["rand_init_cond_frames_for_train"]
    assert r.sample.num_correction_pt_per_frame == model["num_correction_pt_per_frame"]

    optim = yaml_doc["trainer"]["optim"]
    assert r.optim.grad_clip_norm == optim["gradient_clip"]["max_norm"]
    assert r.optim.layer_decay == optim["param_group_modifiers"][0]["layer_decay_value"]
    lr_opts = optim["options"]["lr"]
    assert r.optim.base_lr == float(lr_opts[0]["scheduler"]["start_value"])
    assert r.optim.base_lr * r.optim.cosine_end_ratio == pytest.approx(
        float(lr_opts[0]["scheduler"]["end_value"])
    )
    assert r.optim.vision_lr == float(lr_opts[1]["scheduler"]["start_value"])
    wd_opts = optim["options"]["weight_decay"]
    assert r.optim.weight_decay == wd_opts[0]["scheduler"]["value"]

    loss = yaml_doc["trainer"]["loss"]["all"]
    for k, v in loss["weight_dict"].items():
        assert r.loss.weight_dict[k] == float(v)
    assert r.loss.supervise_all_iou == loss["supervise_all_iou"]
    assert r.loss.iou_use_l1_loss == loss["iou_use_l1_loss"]
    assert r.loss.focal_gamma_obj_score == float(loss["focal_gamma_obj_score"])
    assert r.loss.focal_alpha_obj_score == float(loss["focal_alpha_obj_score"])

    # transforms (:26-51): affine degrees/shear, jitter strengths,
    # grayscale p, per-frame second jitter
    tfs = yaml_doc["vos"]["train_transforms"][0]["transforms"]
    by_target = {}
    for t in tfs:
        by_target.setdefault(t["_target_"].split(".")[-1], []).append(t)
    aff = by_target["RandomAffine"][0]
    assert (aff["degrees"], aff["shear"]) == (25, 20)
    jit_consistent, jit_frame = by_target["ColorJitter"]
    assert jit_consistent["consistent_transform"] is True
    assert jit_frame["consistent_transform"] is False
    assert r.loader_kwargs["color_jitter_strengths"] == (
        jit_consistent["brightness"], jit_consistent["contrast"],
        jit_consistent["saturation"],
    )
    assert r.loader_kwargs["per_frame_jitter_strengths"] == (
        jit_frame["brightness"], jit_frame["contrast"],
        jit_frame["saturation"],
    )
    assert r.loader_kwargs["grayscale_prob"] == by_target["RandomGrayscale"][0]["p"]
    assert r.loader_kwargs["image_size"] == scratch["resolution"]


def _write_png(path, arr):
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path)


@pytest.fixture()
def multipng_root(tmp_path):
    """SA-V layout: JPEGImages/<video>/<frame>.jpg +
    Annotations/<video>/<obj_id>/<frame:05d>.png; object 1's mask is
    missing on frame 2 (=> empty mask, reference :195-198)."""
    h, w = 32, 48
    img_root = tmp_path / "JPEGImages"
    gt_root = tmp_path / "Annotations"
    rng = np.random.default_rng(0)
    for t in range(4):
        frame = rng.integers(0, 255, (h, w, 3), np.uint8)
        _write_png(str(img_root / "vid0" / f"{t:05d}.jpg"), frame)
        m0 = np.zeros((h, w), np.uint8)
        m0[4 + t : 12 + t, 6 : 20] = 255
        _write_png(str(gt_root / "vid0" / "0" / f"{t:05d}.png"), m0)
        if t != 2:  # object folder "1" misses frame 2
            m1 = np.zeros((h, w), np.uint8)
            m1[16 : 28, 24 + t : 40 + t] = 255
            _write_png(str(gt_root / "vid0" / "1" / f"{t:05d}.png"), m1)
    return str(img_root), str(gt_root)


def test_multiple_png_raw_dataset(multipng_root):
    from det_sam2_tpu.training.dataset import MultiplePNGRawDataset

    img_root, gt_root = multipng_root
    ds = MultiplePNGRawDataset(img_root, gt_root)
    assert ds.videos == ["vid0"]
    names = ds.frame_names("vid0")
    assert names == [f"{t:05d}" for t in range(4)]
    clip = ds.load_frames("vid0", names)
    # folder ids 0/1 -> object ids 1/2 (bg offset, reference :171,:218)
    assert sorted(clip.masks[0].keys()) == [1, 2]
    assert clip.masks[0][1].sum() > 0 and clip.masks[0][2].sum() > 0
    # the missing PNG frame: object 2 absent -> empty GT downstream
    assert sorted(clip.masks[2].keys()) == [1]
    # masks move with t
    assert not np.array_equal(clip.masks[0][1], clip.masks[1][1])


def test_multiple_png_single_object_mode(multipng_root):
    from det_sam2_tpu.training.dataset import MultiplePNGRawDataset

    img_root, gt_root = multipng_root
    ds = MultiplePNGRawDataset(
        img_root, os.path.join(gt_root, "{video}", "1"),
        single_object_mode=True,
    )
    # single-object mode: gt root is one object's dir; id from folder name
    ds._mask_root = lambda video: os.path.join(gt_root, video, "1")
    clip = ds.load_frames("vid0", ds.frame_names("vid0"))
    assert sorted(clip.masks[0].keys()) == [2]


def test_multiple_png_through_loader(multipng_root):
    from det_sam2_tpu.training.dataset import (
        MultiplePNGRawDataset,
        RandomUniformSampler,
        VOSDataLoader,
    )

    img_root, gt_root = multipng_root
    loader = VOSDataLoader(
        MultiplePNGRawDataset(img_root, gt_root),
        sampler=RandomUniformSampler(num_frames=3, max_num_objects=2),
        image_size=64,
        batch_size=2,
        per_frame_jitter_strengths=(0.1, 0.05, 0.05),
        seed=3,
    )
    (imgs, masks), = loader.batches(1)
    assert imgs.shape == (3, 2, 64, 64, 3)
    assert masks.shape == (3, 2, 2, 64, 64)
    assert masks.max() == 1.0


def test_color_jitter_consistency_modes():
    from det_sam2_tpu.training.dataset import VideoClip, color_jitter_clip
    import random

    frames = [np.full((8, 8, 3), 120, np.uint8) for _ in range(4)]
    clip = VideoClip(frames, [{} for _ in frames])

    out_c = color_jitter_clip(
        clip, random.Random(0), brightness=0.4, contrast=0.0,
        saturation=0.0, consistent=True,
    )
    # consistent: identical factors -> identical frames
    for f in out_c.frames[1:]:
        np.testing.assert_array_equal(out_c.frames[0], f)

    out_f = color_jitter_clip(
        clip, random.Random(0), brightness=0.4, contrast=0.0,
        saturation=0.0, consistent=False,
    )
    # per-frame: factors re-drawn -> frames differ
    diffs = [
        not np.array_equal(out_f.frames[0], f) for f in out_f.frames[1:]
    ]
    assert any(diffs)
