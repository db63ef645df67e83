"""AMG parity vs the reference SAM2AutomaticMaskGenerator on the tiny
config (torchvision.ops.boxes stubbed with an exact torch NMS)."""

import sys
import types

import numpy as np
import pytest
import torch

from det_sam2_tpu.automatic_mask_generator import SAM2AutomaticMaskGenerator
from det_sam2_tpu.configs import tiny_test_config
from det_sam2_tpu.convert import convert_sam2_base
from det_sam2_tpu.image_predictor import SAM2ImagePredictor
from det_sam2_tpu.track import SAM2Engine

from torch_ref import build_reference_sam2, load_reference, reference_available, torch_sd

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)

CFG = tiny_test_config()


def _stub_torchvision():
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    ops = types.ModuleType("torchvision.ops")
    boxes_mod = types.ModuleType("torchvision.ops.boxes")

    def box_area(boxes):
        return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])

    def nms(boxes, scores, iou_threshold):
        order = torch.argsort(scores, descending=True)
        keep = []
        while order.numel() > 0:
            i = order[0]
            keep.append(i.item())
            if order.numel() == 1:
                break
            rest = order[1:]
            xx0 = torch.maximum(boxes[i, 0], boxes[rest, 0])
            yy0 = torch.maximum(boxes[i, 1], boxes[rest, 1])
            xx1 = torch.minimum(boxes[i, 2], boxes[rest, 2])
            yy1 = torch.minimum(boxes[i, 3], boxes[rest, 3])
            inter = (xx1 - xx0).clamp(min=0) * (yy1 - yy0).clamp(min=0)
            iou = inter / (
                box_area(boxes[i : i + 1]) + box_area(boxes[rest]) - inter
            )
            order = rest[iou <= iou_threshold]
        return torch.tensor(keep, dtype=torch.long)

    def batched_nms(boxes, scores, idxs, iou_threshold):
        if boxes.numel() == 0:
            return torch.empty((0,), dtype=torch.long)
        offset = idxs.to(boxes) * (boxes.max() + 1)
        return nms(boxes + offset[:, None], scores, iou_threshold)

    boxes_mod.box_area = box_area
    boxes_mod.nms = nms
    boxes_mod.batched_nms = batched_nms
    ops.boxes = boxes_mod
    tv.ops = ops

    # minimal transforms used by sam2/utils/transforms.py (exact math)
    tfm = types.ModuleType("torchvision.transforms")

    class ToTensor:
        def __call__(self, x):
            t = torch.from_numpy(np.asarray(x)).permute(2, 0, 1).float()
            return t / 255.0

    class Resize(torch.nn.Module):
        def __init__(self, size):
            super().__init__()
            self.size = size

        def forward(self, x):
            return torch.nn.functional.interpolate(
                x[None] if x.ndim == 3 else x,
                size=tuple(self.size), mode="bilinear", align_corners=False,
                antialias=True,
            ).squeeze(0)

    class Normalize(torch.nn.Module):
        def __init__(self, mean, std):
            super().__init__()
            self.register_buffer("m", torch.tensor(mean).view(-1, 1, 1))
            self.register_buffer("s", torch.tensor(std).view(-1, 1, 1))

        def forward(self, x):
            return (x - self.m) / self.s

    tfm.ToTensor = ToTensor
    tfm.Resize = Resize
    tfm.Normalize = Normalize
    tv.transforms = tfm
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = ops
    sys.modules["torchvision.ops.boxes"] = boxes_mod
    sys.modules["torchvision.transforms"] = tfm
    # the reference wraps its transforms in torch.jit.script; the stub
    # modules are not scriptable, and scripting is irrelevant to numerics
    torch.jit.script = lambda m, *a, **k: m


def _blob_image(seed=0):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 40, (96, 112, 3), np.uint8)
    img[12:40, 10:44] = (220, 40, 40)
    img[55:85, 20:50] = (40, 220, 60)
    img[20:48, 64:100] = (60, 60, 230)
    return img


def _iou(a, b):
    inter = np.logical_and(a, b).sum()
    return inter / max(np.logical_or(a, b).sum(), 1)


@pytest.fixture(scope="module", params=[False, True], ids=["plain", "m2m"])
def generators(request):
    load_reference()
    _stub_torchvision()
    from sam2.automatic_mask_generator import (
        SAM2AutomaticMaskGenerator as RefAMG,
    )

    ref_model = build_reference_sam2(CFG)
    params = convert_sam2_base(torch_sd(ref_model), CFG)
    engine = SAM2Engine(CFG, params=params)

    # random-weight masks are arbitrary; thresholds that keep a healthy
    # number of masks through the NMS/crop/dedup machinery
    kw = dict(
        points_per_side=8,
        points_per_batch=32,
        pred_iou_thresh=0.0,
        stability_score_thresh=0.0,
        crop_n_layers=1,
        crop_n_points_downscale_factor=2,
        min_mask_region_area=4,
        use_m2m=request.param,
    )
    ref_gen = RefAMG(ref_model, **kw)
    # the reference image predictor hardcodes 1024^2 feature-map sizes
    # (sam2_image_predictor.py:62-66); fix them for the tiny config
    s = CFG.image_size
    ref_gen.predictor._bb_feat_sizes = [
        (s // 4, s // 4), (s // 8, s // 8), (s // 16, s // 16)
    ]
    my_gen = SAM2AutomaticMaskGenerator(SAM2ImagePredictor(engine), **kw)
    # the mounted reference's connected-components CUDA ext is unavailable,
    # so ITS predictor-level hole/sprinkle fill silently no-ops (its
    # postprocess_masks catches the error and warns); disable ours for an
    # apples-to-apples comparison (generate() applies it scoped now). The
    # fill semantics themselves are covered by
    # test_image_predictor_amg.py::test_low_res_hole_filling.
    my_gen.predictor_fill_area = 0.0
    return ref_gen, my_gen


@pytest.mark.slow
def test_amg_matches_reference(generators):
    ref_gen, my_gen = generators
    img = _blob_image()
    with torch.no_grad():
        ref_out = ref_gen.generate(img)
    my_out = my_gen.generate(img)

    assert len(my_out) == len(ref_out), (
        f"kept {len(my_out)} masks vs reference {len(ref_out)}"
    )
    # match records by IoU (order can differ after NMS ties)
    used = set()
    for r in ref_out:
        best, best_iou = None, 0.0
        for j, m in enumerate(my_out):
            if j in used:
                continue
            iou = _iou(m["segmentation"], r["segmentation"])
            if iou > best_iou:
                best, best_iou = j, iou
        # random-weight logits hover near the 0 threshold, so upsampled
        # boundary pixels flip on float noise; 0.95 mask IoU with exact
        # kept-count + tight iou/stability agreement pins the pipeline
        assert best is not None and best_iou > 0.95, (
            f"unmatched reference mask (best IoU {best_iou})"
        )
        used.add(best)
        np.testing.assert_allclose(
            my_out[best]["predicted_iou"], r["predicted_iou"],
            rtol=5e-3, atol=5e-3,
        )
        np.testing.assert_allclose(
            my_out[best]["stability_score"], r["stability_score"],
            rtol=5e-3, atol=5e-3,
        )
