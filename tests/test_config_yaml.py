"""Reference Hydra-YAML ingestion: the 4 sam2.1 ship YAMLs (+ the
video-predictor overrides of build_sam.py:121-136) must resolve to exactly
our dataclass presets; the sam2.0 YAMLs must parse with SAM2Base
constructor defaults filling the missing flags; ++model overrides must
compose; and build_sam2_video_predictor must accept a YAML path
end-to-end."""

import dataclasses
import os

import pytest

from det_sam2_tpu.config_yaml import (
    load_reference_yaml,
    video_predictor_overrides,
)
from det_sam2_tpu.configs import (
    MODEL_CONFIGS,
    sam2_1_hiera_l,
)

REF_CFG_DIR = "/root/reference/sam2/configs"

SHIPS = [
    ("sam2.1/sam2.1_hiera_t.yaml", "hiera_t"),
    ("sam2.1/sam2.1_hiera_s.yaml", "hiera_s"),
    ("sam2.1/sam2.1_hiera_b+.yaml", "hiera_b+"),
    ("sam2.1/sam2.1_hiera_l.yaml", "hiera_l"),
]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_CFG_DIR), reason="reference configs not mounted"
)


@pytest.mark.parametrize("rel,preset", SHIPS)
def test_sam21_yaml_matches_preset(rel, preset):
    cfg = load_reference_yaml(
        os.path.join(REF_CFG_DIR, rel), video_predictor_overrides()
    )
    want = MODEL_CONFIGS[preset]()
    assert cfg == want, (
        f"{rel} resolved differently from the {preset} preset:\n"
        + "\n".join(
            f"  {f.name}: yaml={getattr(cfg, f.name)!r} "
            f"preset={getattr(want, f.name)!r}"
            for f in dataclasses.fields(want)
            if getattr(cfg, f.name) != getattr(want, f.name)
        )
    )


def test_sam21_yaml_without_video_overrides():
    """A bare build_sam2-style load keeps the SAM2Base defaults the video
    predictor would otherwise override (binarize False, fill_hole_area 0)
    and no dynamic-multimask injection beyond the YAML itself."""
    cfg = load_reference_yaml(
        os.path.join(REF_CFG_DIR, "sam2.1/sam2.1_hiera_l.yaml")
    )
    assert not cfg.binarize_mask_from_pts_for_mem_enc
    assert cfg.fill_hole_area == 0
    assert not cfg.dynamic_multimask_via_stability


def test_sam20_yaml_parses_with_base_defaults():
    """sam2.0 YAMLs omit the 2.1 flags; missing keys must take the
    reference SAM2Base constructor defaults, not our 2.1 presets."""
    cfg = load_reference_yaml(
        os.path.join(REF_CFG_DIR, "sam2/sam2_hiera_l.yaml")
    )
    assert cfg.hiera.embed_dim == 144 and cfg.hiera.stages == (2, 6, 36, 4)
    # flags absent from the 2.0 YAML -> SAM2Base defaults
    assert not cfg.no_obj_embed_spatial
    assert not cfg.use_signed_tpos_enc_to_obj_ptrs
    assert not cfg.proj_tpos_enc_in_obj_ptrs


def test_overrides_compose():
    cfg = load_reference_yaml(
        os.path.join(REF_CFG_DIR, "sam2.1/sam2.1_hiera_s.yaml"),
        ["++model.image_size=512", "++model.num_maskmem=5",
         "++model.fill_hole_area=4"],
    )
    assert cfg.image_size == 512
    assert cfg.num_maskmem == 5
    assert cfg.fill_hole_area == 4
    # the RoPE grid tracks the overridden image size
    assert cfg.memory_attention.rope_feat_sizes == (32, 32)


def test_unknown_key_raises(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("model:\n  _target_: x\n  image_size: 512\n  bogus: 1\n")
    with pytest.raises(ValueError, match="bogus"):
        load_reference_yaml(str(p))


def test_build_from_yaml_end_to_end():
    """build_sam2_video_predictor accepts a reference YAML path and the
    result is identical to building from the preset name."""
    from det_sam2_tpu.build import build_sam2_video_predictor

    pred = build_sam2_video_predictor(
        os.path.join(REF_CFG_DIR, "sam2.1/sam2.1_hiera_t.yaml"),
        image_size=128,
    )
    ref = build_sam2_video_predictor("hiera_t", image_size=128)
    assert pred.engine.cfg == ref.engine.cfg
