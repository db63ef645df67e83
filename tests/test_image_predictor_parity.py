"""SAM2ImagePredictor parity vs the reference predictor on shared weights.

Covers the prompt-encoding surface the round-3 fixes touched: batched Bx4
box prompts, box+points pairing, normalize_coords=False ([0,1] inputs),
and plain point prompts (reference sam2_image_predictor.py predict
:236-305 / _predict :333-460)."""

import numpy as np
import pytest
import torch

from det_sam2_tpu.configs import tiny_test_config
from det_sam2_tpu.convert import convert_sam2_base
from det_sam2_tpu.image_predictor import SAM2ImagePredictor
from det_sam2_tpu.track import SAM2Engine

from test_amg_parity import _blob_image, _stub_torchvision
from torch_ref import build_reference_sam2, reference_available, torch_sd

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)

CFG = tiny_test_config()


@pytest.fixture(scope="module")
def predictors():
    from tests.torch_ref import load_reference

    load_reference()
    _stub_torchvision()
    from sam2.sam2_image_predictor import SAM2ImagePredictor as RefPredictor

    ref_model = build_reference_sam2(CFG)
    params = convert_sam2_base(torch_sd(ref_model), CFG)
    ref = RefPredictor(ref_model)
    s = CFG.image_size
    ref._bb_feat_sizes = [
        (s // 4, s // 4), (s // 8, s // 8), (s // 16, s // 16)
    ]
    mine = SAM2ImagePredictor(SAM2Engine(CFG, params=params))
    img = _blob_image()
    ref.set_image(img)
    mine.set_image(img)
    return ref, mine


def _cmp(ref_out, my_out, atol=2e-2):
    ref_masks, ref_ious, ref_low = ref_out
    my_masks, my_ious, my_low = my_out
    ref_masks = np.asarray(ref_masks)
    assert np.asarray(my_masks).shape == ref_masks.shape
    # logits agree to float tolerance; IoU head is tighter
    np.testing.assert_allclose(
        np.asarray(my_masks), ref_masks, atol=atol, rtol=0
    )
    np.testing.assert_allclose(
        np.asarray(my_ious), np.asarray(ref_ious), atol=1e-3
    )


def test_batched_boxes_match_reference(predictors):
    ref, mine = predictors
    boxes = np.asarray(
        [[10, 12, 44, 40], [20, 55, 50, 85], [64, 20, 100, 48]], np.float32
    )
    ref_out = ref.predict(box=boxes, multimask_output=False,
                          return_logits=True)
    my_out = mine.predict(box=boxes, multimask_output=False,
                          return_logits=True)
    _cmp(ref_out, my_out)


def test_box_plus_point_matches_reference(predictors):
    ref, mine = predictors
    box = np.asarray([10, 12, 44, 40], np.float32)
    pts = np.asarray([[25.0, 25.0]], np.float32)
    lbl = np.asarray([1], np.int32)
    ref_out = ref.predict(point_coords=pts, point_labels=lbl, box=box,
                          multimask_output=True, return_logits=True)
    my_out = mine.predict(point_coords=pts, point_labels=lbl, box=box,
                          multimask_output=True, return_logits=True)
    _cmp(ref_out, my_out)


def test_normalized_coords_false_matches_reference(predictors):
    ref, mine = predictors
    h, w = _blob_image().shape[:2]
    unit = np.asarray([[25.0 / w, 25.0 / h]], np.float32)
    lbl = np.asarray([1], np.int32)
    ref_out = ref.predict(point_coords=unit, point_labels=lbl,
                          multimask_output=False, return_logits=True,
                          normalize_coords=False)
    my_out = mine.predict(point_coords=unit, point_labels=lbl,
                          multimask_output=False, return_logits=True,
                          normalize_coords=False)
    _cmp(ref_out, my_out)
