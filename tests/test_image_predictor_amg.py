"""Image predictor + AMG: utils parity vs reference amg.py, API mechanics."""

import numpy as np
import pytest
import torch

from det_sam2_tpu.configs import tiny_test_config
from det_sam2_tpu.image_predictor import SAM2ImagePredictor
from det_sam2_tpu.automatic_mask_generator import SAM2AutomaticMaskGenerator
from det_sam2_tpu.track import SAM2Engine
from det_sam2_tpu.utils import amg as amg_np

from torch_ref import load_reference, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)


def test_amg_utils_parity():
    load_reference()
    from sam2.utils import amg as ref_amg

    rng = np.random.default_rng(0)
    masks = (rng.uniform(size=(3, 24, 31)) > 0.6).astype(np.float32) * 8 - 4

    got = amg_np.calculate_stability_score(masks, 0.0, 1.0)
    want = ref_amg.calculate_stability_score(
        torch.from_numpy(masks), 0.0, 1.0
    ).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)

    np.testing.assert_allclose(
        amg_np.build_point_grid(7), ref_amg.build_point_grid(7), atol=1e-7
    )

    got_boxes, got_layers = amg_np.generate_crop_boxes((480, 640), 2, 0.34)
    want_boxes, want_layers = ref_amg.generate_crop_boxes((480, 640), 2, 0.34)
    assert got_boxes == want_boxes and got_layers == want_layers

    binary = masks > 0
    got_rles = amg_np.mask_to_rle(binary)
    want_rles = ref_amg.mask_to_rle_pytorch(torch.from_numpy(binary))
    assert got_rles == want_rles
    for rle in got_rles:
        np.testing.assert_array_equal(
            amg_np.rle_to_mask(rle), ref_amg.rle_to_mask(rle)
        )

    got_box = amg_np.batched_mask_to_box(binary)
    want_box = ref_amg.batched_mask_to_box(torch.from_numpy(binary)).numpy()
    np.testing.assert_array_equal(got_box, want_box)


def test_nms_greedy():
    boxes = np.asarray(
        [[0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30]], np.float32
    )
    scores = np.asarray([0.9, 0.8, 0.7], np.float32)
    keep = amg_np.nms(boxes, scores, 0.5)
    assert keep.tolist() == [0, 2]


@pytest.fixture(scope="module")
def image_predictor():
    return SAM2ImagePredictor(SAM2Engine(tiny_test_config()))


@pytest.mark.slow
def test_image_predictor_api(image_predictor):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (96, 120, 3), np.uint8)
    image_predictor.set_image(img)

    masks, ious, low_res = image_predictor.predict(
        point_coords=np.asarray([[40.0, 50.0]]),
        point_labels=np.asarray([1]),
        multimask_output=True,
    )
    assert masks.shape == (3, 96, 120) and masks.dtype == bool
    assert ious.shape == (3,)
    assert low_res.shape[0] == 3

    # box + point combined; single-mask output with dynamic stability
    masks1, ious1, _ = image_predictor.predict(
        box=np.asarray([10.0, 10.0, 60.0, 70.0]),
        point_coords=np.asarray([[30.0, 30.0]]),
        point_labels=np.asarray([1]),
        multimask_output=False,
    )
    assert masks1.shape == (1, 96, 120)

    # batch predict row 0 == single predict with the same prompt
    coords = np.asarray([[[40.0, 50.0]], [[80.0, 20.0]]], np.float32)
    labels = np.ones((2, 1), np.int32)
    bmasks, bious, _ = image_predictor.predict_batch(coords, labels)
    s_masks, s_ious, _ = image_predictor.predict(
        point_coords=np.asarray([[40.0, 50.0]]),
        point_labels=np.asarray([1]),
    )
    np.testing.assert_array_equal(bmasks[0], s_masks)
    np.testing.assert_allclose(bious[0], s_ious, atol=1e-5)


def test_low_res_hole_filling(image_predictor):
    """Hole/sprinkle cleanup runs on the LOW-RES masks with areas in
    low-res pixels (reference sam2/utils/transforms.py:84-120): a small
    hole fills, a hole above the threshold does not — even though its
    full-res footprint is far larger than the threshold."""
    import copy

    pred = copy.copy(image_predictor)
    pred.max_hole_area = 4.0
    pred.max_sprinkle_area = 0.0
    pred._orig_hw = (128, 128)  # 4x the 32x32 low-res grid

    low = np.full((1, 32, 32), 5.0, np.float32)
    low[0, 4:6, 4:6] = -5.0  # 4-px hole: exactly at the threshold -> fill
    low[0, 12:15, 12:15] = -5.0  # 9-px hole: above threshold -> keep
    masks = pred._postprocess(low, return_logits=False)
    assert masks.shape == (1, 128, 128)
    assert masks[0, 18, 18], "4-low-res-px hole must be filled"
    # 9 low-res px = 144 full-res px; filling at full resolution with
    # threshold 4 would also keep it, but a full-res fill interpreting the
    # 4-px threshold would wrongly FILL the small hole's 64-px footprint
    # only if run at low res — the big hole must survive either way
    assert not masks[0, 52, 52], "9-low-res-px hole must be kept"


@pytest.mark.slow
def test_predict_batch_applies_hole_filling(image_predictor):
    """The same-image predict_batch path (AMG hot path) must apply the
    same cleanup as predict() (the reference postprocesses every
    _predict)."""
    import copy

    pred = copy.copy(image_predictor)
    pred.max_hole_area = 16.0
    pred.max_sprinkle_area = 16.0
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (96, 120, 3), np.uint8)
    pred.set_image(img)
    s_masks, _, _ = pred.predict(
        point_coords=np.asarray([[40.0, 50.0]]),
        point_labels=np.asarray([1]),
    )
    b_masks, _, _ = pred.predict_batch(
        np.asarray([[[40.0, 50.0]]], np.float32), np.ones((1, 1), np.int32)
    )
    np.testing.assert_array_equal(b_masks[0], s_masks)


@pytest.mark.slow
def test_amg_generates_records(image_predictor):
    rng = np.random.default_rng(1)
    img = np.full((64, 64, 3), 40, np.uint8)
    img[20:44, 20:44] = (220, 60, 60)
    amg = SAM2AutomaticMaskGenerator(
        image_predictor,
        points_per_side=4,
        points_per_batch=16,
        pred_iou_thresh=0.0,
        stability_score_thresh=0.0,
        min_mask_region_area=0,
    )
    records = amg.generate(img)
    assert len(records) > 0
    rec = records[0]
    for key in ("segmentation", "area", "bbox", "predicted_iou",
                "point_coords", "stability_score", "crop_box"):
        assert key in rec
    assert rec["segmentation"].shape == (64, 64)


@pytest.mark.slow
def test_set_image_batch_parity(image_predictor):
    """Batched encode must reproduce per-image encode results (reference
    sam2_image_predictor.py:131-240 set_image_batch/predict_batch)."""
    rng = np.random.default_rng(3)
    imgs = [
        rng.integers(0, 255, (96, 120, 3), np.uint8),
        rng.integers(0, 255, (80, 100, 3), np.uint8),
    ]
    pts = [np.asarray([[40.0, 50.0]]), np.asarray([[30.0, 30.0]])]
    lbl = [np.asarray([1]), np.asarray([1])]

    image_predictor.set_image_batch(imgs)
    # single-image predict() without pinning an image must fail loudly,
    # not crash deep in coordinate transforms
    with pytest.raises(RuntimeError, match="select_batch_image"):
        image_predictor.predict(point_coords=pts[0], point_labels=lbl[0])
    bmasks, bious, blow = image_predictor.predict_batch(
        pts, lbl, multimask_output=True
    )
    assert len(bmasks) == 2
    assert bmasks[0].shape == (3, 96, 120)
    assert bmasks[1].shape == (3, 80, 100)

    for i in range(2):
        image_predictor.set_image(imgs[i])
        masks, ious, low = image_predictor.predict(
            point_coords=pts[i], point_labels=lbl[i], multimask_output=True
        )
        np.testing.assert_array_equal(bmasks[i], masks)
        np.testing.assert_allclose(bious[i], ious, atol=1e-4)

    # chunked encode (max_chunk below the batch size, the HBM-bounding
    # path AMG's 21-crop fan-out takes) must reproduce the same features
    image_predictor.set_image_batch(imgs, max_chunk=1)
    cmasks, cious, _ = image_predictor.predict_batch(
        pts, lbl, multimask_output=True
    )
    for i in range(2):
        np.testing.assert_array_equal(cmasks[i], bmasks[i])


@pytest.mark.slow
def test_amg_multi_crop_batched_encode(image_predictor):
    """crop_n_layers=1 runs >1 crops through one batched encode; records
    still come out with crop_box bookkeeping intact."""
    rng = np.random.default_rng(4)
    img = np.full((72, 96, 3), 30, np.uint8)
    img[10:30, 12:40] = (220, 60, 60)
    img[40:64, 50:90] = (60, 220, 60)
    amg = SAM2AutomaticMaskGenerator(
        image_predictor,
        points_per_side=4,
        points_per_batch=16,
        pred_iou_thresh=0.0,
        stability_score_thresh=0.0,
        min_mask_region_area=0,
        crop_n_layers=1,
    )
    records = amg.generate(img)
    assert len(records) > 0
    crop_boxes = {tuple(r["crop_box"]) for r in records}
    assert len(crop_boxes) >= 1
    for rec in records:
        assert rec["segmentation"].shape == (72, 96)
