"""Parity of prompt encoder + mask decoder (incl. two-way transformer)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from det_sam2_tpu.convert import convert_mask_decoder, convert_prompt_encoder
from det_sam2_tpu.modeling.mask_decoder import MaskDecoder
from det_sam2_tpu.modeling.prompt_encoder import PromptEncoder

from torch_ref import load_reference, reference_available, torch_sd

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)


def _ref_prompt_encoder():
    load_reference()
    from sam2.modeling.sam.prompt_encoder import PromptEncoder as RefPE

    torch.manual_seed(0)
    mod = RefPE(
        embed_dim=256,
        image_embedding_size=(16, 16),
        input_image_size=(256, 256),
        mask_in_chans=16,
    ).eval()
    return mod


@pytest.fixture(scope="module")
def prompt_pair():
    ref = _ref_prompt_encoder()
    params = convert_prompt_encoder(torch_sd(ref), prefix="")
    mine = PromptEncoder(
        embed_dim=256, image_embedding_size=(16, 16), input_image_size=(256, 256)
    )
    return ref, mine, params


def test_prompt_encoder_points(prompt_pair):
    ref, mine, params = prompt_pair
    rng = np.random.default_rng(0)
    coords = rng.uniform(0, 256, (2, 3, 2)).astype(np.float32)
    labels = np.array([[1, 0, -1], [2, 3, 1]], dtype=np.int32)

    with torch.no_grad():
        sp_ref, dn_ref = ref(
            points=(torch.from_numpy(coords), torch.from_numpy(labels)),
            boxes=None,
            masks=None,
        )
    sp, dn = mine.apply(
        {"params": params},
        points=(jnp.asarray(coords), jnp.asarray(labels)),
    )
    np.testing.assert_allclose(np.asarray(sp), sp_ref.detach().numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(dn).transpose(0, 3, 1, 2), dn_ref.detach().numpy(), rtol=1e-4, atol=1e-5
    )


def test_prompt_encoder_boxes_and_masks(prompt_pair):
    ref, mine, params = prompt_pair
    rng = np.random.default_rng(1)
    boxes = np.array([[10.0, 20.0, 100.0, 200.0]], dtype=np.float32)
    masks = rng.standard_normal((1, 1, 64, 64)).astype(np.float32)

    with torch.no_grad():
        sp_ref, dn_ref = ref(
            points=None, boxes=torch.from_numpy(boxes), masks=torch.from_numpy(masks)
        )
    sp, dn = mine.apply(
        {"params": params},
        boxes=jnp.asarray(boxes),
        masks=jnp.asarray(masks.transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(np.asarray(sp), sp_ref.detach().numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(dn).transpose(0, 3, 1, 2), dn_ref.detach().numpy(), rtol=1e-4, atol=1e-4
    )


def test_prompt_encoder_dense_pe(prompt_pair):
    ref, mine, params = prompt_pair
    ref_pe = ref.get_dense_pe().detach().numpy()[0]  # [C, H, W]
    got = mine.apply({"params": params}, method=PromptEncoder.get_dense_pe)
    np.testing.assert_allclose(
        np.asarray(got).transpose(2, 0, 1), ref_pe, rtol=1e-4, atol=1e-5
    )


def _ref_mask_decoder(**kw):
    load_reference()
    from sam2.modeling.sam.mask_decoder import MaskDecoder as RefMD
    from sam2.modeling.sam.transformer import TwoWayTransformer as RefTWT

    torch.manual_seed(0)
    mod = RefMD(
        transformer_dim=256,
        transformer=RefTWT(depth=2, embedding_dim=256, mlp_dim=2048, num_heads=8),
        num_multimask_outputs=3,
        iou_head_depth=3,
        iou_head_hidden_dim=256,
        **kw,
    ).eval()
    with torch.no_grad():
        for p in mod.parameters():
            p.add_(torch.randn_like(p) * 0.02)
    return mod


@pytest.mark.parametrize("multimask", [True, False])
def test_mask_decoder_parity(multimask):
    ref = _ref_mask_decoder(
        use_high_res_features=True,
        iou_prediction_use_sigmoid=True,
        pred_obj_scores=True,
        pred_obj_scores_mlp=True,
        use_multimask_token_for_obj_ptr=True,
        dynamic_multimask_via_stability=True,
        dynamic_multimask_stability_delta=0.05,
        dynamic_multimask_stability_thresh=0.98,
    )
    mine = MaskDecoder(
        transformer_dim=256,
        use_high_res_features=True,
        iou_prediction_use_sigmoid=True,
        pred_obj_scores=True,
        pred_obj_scores_mlp=True,
        use_multimask_token_for_obj_ptr=True,
        dynamic_multimask_via_stability=True,
    )
    params = convert_mask_decoder(torch_sd(ref), prefix="")

    rng = np.random.default_rng(2)
    b, h, w = 2, 8, 8
    img = rng.standard_normal((b, 256, h, w)).astype(np.float32)
    pe = rng.standard_normal((1, 256, h, w)).astype(np.float32)
    sparse = rng.standard_normal((b, 3, 256)).astype(np.float32)
    dense = rng.standard_normal((b, 256, h, w)).astype(np.float32)
    s0 = rng.standard_normal((b, 32, 4 * h, 4 * w)).astype(np.float32)
    s1 = rng.standard_normal((b, 64, 2 * h, 2 * w)).astype(np.float32)

    with torch.no_grad():
        m_ref, iou_ref, tok_ref, obj_ref = ref(
            image_embeddings=torch.from_numpy(img),
            image_pe=torch.from_numpy(pe),
            sparse_prompt_embeddings=torch.from_numpy(sparse),
            dense_prompt_embeddings=torch.from_numpy(dense),
            multimask_output=multimask,
            repeat_image=False,
            high_res_features=[torch.from_numpy(s0), torch.from_numpy(s1)],
        )

    fwd = jax.jit(
        lambda p, *a: mine.apply({"params": p}, *a, multimask_output=multimask),
        static_argnames=(),
    )
    m, iou, tok, obj = mine.apply(
        {"params": params},
        jnp.asarray(img.transpose(0, 2, 3, 1)),
        jnp.asarray(pe[0].transpose(1, 2, 0)),
        jnp.asarray(sparse),
        jnp.asarray(dense.transpose(0, 2, 3, 1)),
        multimask,
        [jnp.asarray(s0.transpose(0, 2, 3, 1)), jnp.asarray(s1.transpose(0, 2, 3, 1))],
    )
    np.testing.assert_allclose(np.asarray(m), m_ref.numpy(), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(iou), iou_ref.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(tok), tok_ref.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(obj), obj_ref.numpy(), rtol=1e-3, atol=1e-4)
