"""Checkpoint key filtering, partial loads, frozen-param machinery, and the
multi-host launch helpers (single-process path on the 8-device CPU mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from det_sam2_tpu.training.checkpoint_utils import (
    check_parameter_frozen,
    exclude_params_matching_unix_pattern,
    filter_params_matching_unix_pattern,
    freeze_wrapper,
    load_state_dict_into_params,
    param_names,
    params_to_state_dict,
    unix_pattern_to_parameter_names,
)


def _params():
    return {
        "image_encoder": {
            "trunk": {
                "blocks_0": {"kernel": jnp.ones((2, 2)), "bias": jnp.zeros(2)},
                "pos_embed": jnp.ones((1, 4)),
            },
            "neck": {"kernel": jnp.full((3,), 2.0)},
        },
        "mask_decoder": {"kernel": jnp.full((2,), 3.0)},
    }


def test_pattern_selection():
    p = _params()
    names = param_names(p)
    assert "image_encoder.trunk.blocks_0.kernel" in names
    got = unix_pattern_to_parameter_names(["*pos_embed*"], names)
    assert got == {"image_encoder.trunk.pos_embed"}

    kept = filter_params_matching_unix_pattern(["image_encoder.*"], p)
    assert kept["mask_decoder"]["kernel"] is None
    assert kept["image_encoder"]["neck"]["kernel"] is not None

    dropped = exclude_params_matching_unix_pattern(["*bias*"], p)
    assert dropped["image_encoder"]["trunk"]["blocks_0"]["bias"] is None
    assert dropped["image_encoder"]["trunk"]["blocks_0"]["kernel"] is not None


def test_partial_load_with_patterns_and_strictness():
    p = _params()
    sd = params_to_state_dict(p)
    # modify, then load back only the trunk
    sd = {k: v * 10 for k, v in sd.items()}
    merged = load_state_dict_into_params(
        sd, p, strict=True, include_patterns=["image_encoder.trunk.*"],
        ignore_missing_keys=["*"],
    )
    np.testing.assert_allclose(
        np.asarray(merged["image_encoder"]["trunk"]["pos_embed"]), 10.0
    )
    np.testing.assert_allclose(np.asarray(merged["mask_decoder"]["kernel"]), 3.0)

    # strict missing keys raise
    with pytest.raises(KeyError, match="Missing"):
        load_state_dict_into_params(
            {k: v for k, v in sd.items() if "neck" not in k}, p, strict=True
        )
    # unexpected keys raise even non-strict, unless ignored
    with pytest.raises(KeyError, match="Unexpected"):
        load_state_dict_into_params({**sd, "bogus.key": np.ones(1)}, p,
                                    strict=False, ignore_missing_keys=["*"])
    load_state_dict_into_params(
        {**sd, "bogus.key": np.ones(1)}, p, strict=False,
        ignore_missing_keys=["*"], ignore_unexpected_keys=["bogus.*"],
    )


def test_freeze_wrapper_zeroes_updates():
    import optax

    p = _params()
    opt = freeze_wrapper(optax.sgd(0.1), p, ["image_encoder.trunk.*"])
    state = opt.init(p)
    grads = jax.tree_util.tree_map(jnp.ones_like, p)
    updates, _ = opt.update(grads, state, p)
    np.testing.assert_allclose(
        np.asarray(updates["image_encoder"]["trunk"]["blocks_0"]["kernel"]), 0.0
    )
    assert float(np.abs(np.asarray(updates["mask_decoder"]["kernel"])).sum()) > 0


def test_check_parameter_frozen_guard():
    store = {"p": _params()}

    with check_parameter_frozen(lambda: store["p"], ["mask_decoder.*"]):
        pass  # no change: ok

    with pytest.raises(ValueError, match="frozen parameters"):
        with check_parameter_frozen(lambda: store["p"], ["mask_decoder.*"]):
            store["p"] = jax.tree_util.tree_map(lambda x: x + 1, store["p"])


def test_launch_single_process_helpers():
    from det_sam2_tpu.training.launch import (
        DistributedDataLoader,
        host_local_batch_to_global,
        init_distributed,
        make_global_mesh,
    )

    pid, pcount = init_distributed()
    assert pid == 0 and pcount == 1
    mesh = make_global_mesh()
    assert mesh.devices.size == len(jax.devices())

    images = np.ones((2, 8, 4, 4, 3), np.float32)
    gt = np.zeros((2, 8, 4, 4), np.float32)
    g_images, g_gt = host_local_batch_to_global(mesh, (images, gt), axis=1)
    assert g_images.shape == images.shape
    assert not g_images.sharding.is_fully_replicated

    class _Loader:
        def batches(self, n):
            for _ in range(n):
                yield images, gt

    dl = DistributedDataLoader(_Loader(), mesh)
    batches = list(dl.batches(2))
    assert len(batches) == 2
    assert batches[0][0].shape == images.shape
