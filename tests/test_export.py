"""Round-trip checkpoint export: torch -> convert -> export == torch.

The exporter (det_sam2_tpu/export.py) must invert convert.py bit-exactly so
a model trained in this framework deploys on the reference torch runtime
(sam2/build_sam.py:166-178 strict load)."""

import numpy as np
import pytest

from det_sam2_tpu.configs import tiny_test_config
from det_sam2_tpu.convert import convert_sam2_base
from det_sam2_tpu.export import (
    export_sam2_base,
    save_torch_checkpoint,
    to_torch_state_dict,
)

from tests.torch_ref import (
    build_reference_sam2,
    reference_available,
    torch_sd,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference not mounted"
)


def test_export_round_trip_bit_exact():
    cfg = tiny_test_config()
    ref = build_reference_sam2(cfg)
    sd = torch_sd(ref)
    params = convert_sam2_base(sd, cfg)
    exported = export_sam2_base(params)

    for k, v in exported.items():
        assert k in sd, f"exported key {k} not in reference state_dict"
        np.testing.assert_array_equal(
            v, sd[k].numpy(), err_msg=f"mismatch at {k}"
        )

    missing = sorted(set(sd) - set(exported))
    assert not missing, f"reference keys not exported: {missing[:10]}"


def test_export_loads_into_reference_model(tmp_path):
    import torch

    cfg = tiny_test_config()
    ref = build_reference_sam2(cfg)
    params = convert_sam2_base(torch_sd(ref), cfg)

    res = ref.load_state_dict(to_torch_state_dict(params), strict=True)
    assert not res.missing_keys and not res.unexpected_keys

    path = str(tmp_path / "exported.pt")
    save_torch_checkpoint(params, path)
    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    assert "model" in ckpt
    res = ref.load_state_dict(ckpt["model"], strict=True)
    assert not res.missing_keys and not res.unexpected_keys
