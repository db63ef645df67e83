"""Checkpoint key filtering + frozen-parameter machinery.

Behavioral equivalent of /root/reference/training/utils/checkpoint_utils.py
(:120-189 CkptInclude/ExcludeKernel + with_check_parameter_frozen, :300-361
check_load_state_dict_errors / load_state_dict_into_model) for flax param
pytrees: unix-pattern selection over dotted key paths, partial-checkpoint
loading with strict/ignore semantics, and optax-level freezing (the jax
analogue of requires_grad=False) with an update-guard context manager.
"""

from __future__ import annotations

import contextlib
import fnmatch
from typing import Dict, List, Optional, Sequence

import jax
import numpy as np


def param_names(params) -> List[str]:
    """Dotted key paths of every leaf ('image_encoder.trunk.blocks_0...')."""
    names = []

    def visit(path, _):
        names.append(
            ".".join(
                p.key if hasattr(p, "key") else str(p) for p in path
            )
        )

    jax.tree_util.tree_map_with_path(visit, params)
    return names


def unix_pattern_to_parameter_names(
    patterns: Sequence[str], names: Sequence[str]
) -> set:
    """(reference checkpoint_utils.py:63-78)"""
    out = set()
    for pat in patterns:
        out |= set(fnmatch.filter(names, pat))
    return out


def filter_params_matching_unix_pattern(patterns: Sequence[str], params):
    """Keep only leaves whose dotted path matches a pattern; other leaves
    become None (reference :81-100 returns a sub-state_dict)."""
    keep = unix_pattern_to_parameter_names(patterns, param_names(params))

    def leaf(path, x):
        name = ".".join(p.key if hasattr(p, "key") else str(p) for p in path)
        return x if name in keep else None

    return jax.tree_util.tree_map_with_path(leaf, params)


def exclude_params_matching_unix_pattern(patterns: Sequence[str], params):
    """CkptExcludeKernel (:162-186): drop matching leaves (set to None)."""
    drop = unix_pattern_to_parameter_names(patterns, param_names(params))

    def leaf(path, x):
        name = ".".join(p.key if hasattr(p, "key") else str(p) for p in path)
        return None if name in drop else x

    return jax.tree_util.tree_map_with_path(leaf, params)


def check_load_state_dict_errors(
    missing_keys: Sequence[str],
    unexpected_keys: Sequence[str],
    strict: bool = True,
    ignore_missing_keys: Optional[Sequence[str]] = None,
    ignore_unexpected_keys: Optional[Sequence[str]] = None,
) -> None:
    """(reference :300-330)"""
    missing = list(missing_keys)
    unexpected = list(unexpected_keys)
    if ignore_missing_keys:
        ignored = unix_pattern_to_parameter_names(ignore_missing_keys, missing)
        missing = [k for k in missing if k not in ignored]
    if ignore_unexpected_keys:
        ignored = unix_pattern_to_parameter_names(
            ignore_unexpected_keys, unexpected
        )
        unexpected = [k for k in unexpected if k not in ignored]
    if unexpected or (strict and missing):
        raise KeyError(
            "State key mismatch."
            + (f" Unexpected keys: {sorted(unexpected)}." if unexpected else "")
            + (f" Missing keys: {sorted(missing)}." if missing else "")
        )


def load_state_dict_into_params(
    loaded: Dict,
    params,
    strict: bool = True,
    ignore_missing_keys: Optional[Sequence[str]] = None,
    ignore_unexpected_keys: Optional[Sequence[str]] = None,
    include_patterns: Optional[Sequence[str]] = None,
    exclude_patterns: Optional[Sequence[str]] = None,
):
    """Merge a (possibly partial) flat {dotted_name: array} dict into a
    param pytree (reference load_state_dict_into_model :333-361 +
    include/exclude kernels). Returns the merged pytree."""
    names = set(param_names(params))
    flat = dict(loaded)
    if include_patterns:
        keep = unix_pattern_to_parameter_names(include_patterns, flat.keys())
        flat = {k: v for k, v in flat.items() if k in keep}
    if exclude_patterns:
        drop = unix_pattern_to_parameter_names(exclude_patterns, flat.keys())
        flat = {k: v for k, v in flat.items() if k not in drop}

    unexpected = [k for k in flat if k not in names]
    missing = [k for k in names if k not in flat]
    check_load_state_dict_errors(
        missing, unexpected, strict=strict,
        ignore_missing_keys=ignore_missing_keys,
        ignore_unexpected_keys=ignore_unexpected_keys,
    )

    def leaf(path, x):
        name = ".".join(p.key if hasattr(p, "key") else str(p) for p in path)
        if name in flat:
            v = np.asarray(flat[name])
            assert v.shape == x.shape, (
                f"{name}: checkpoint shape {v.shape} != param shape {x.shape}"
            )
            return jax.numpy.asarray(v, dtype=x.dtype)
        return x

    return jax.tree_util.tree_map_with_path(leaf, params)


def params_to_state_dict(params) -> Dict[str, np.ndarray]:
    """Inverse: pytree -> flat {dotted_name: np.ndarray}."""
    out = {}

    def visit(path, x):
        name = ".".join(p.key if hasattr(p, "key") else str(p) for p in path)
        out[name] = np.asarray(x)

    jax.tree_util.tree_map_with_path(visit, params)
    return out


def freeze_mask(params, patterns: Sequence[str]):
    """Bool pytree: True where the param matches a freeze pattern. Use with
    `freeze_wrapper` (jax analogue of requires_grad=False, reference
    SAM2Train freeze_image_encoder + optimizer param filtering)."""
    frozen = unix_pattern_to_parameter_names(patterns, param_names(params))

    def leaf(path, _):
        name = ".".join(p.key if hasattr(p, "key") else str(p) for p in path)
        return name in frozen

    return jax.tree_util.tree_map_with_path(leaf, params)


def freeze_wrapper(optimizer, params, patterns: Sequence[str]):
    """Wrap an optax transformation so updates for frozen params are zero."""
    import optax

    mask = freeze_mask(params, patterns)

    def zero_frozen(updates, state, params_=None):
        return jax.tree_util.tree_map(
            lambda u, m: jax.numpy.zeros_like(u) if m else u, updates, mask
        ), state

    return optax.chain(
        optimizer,
        optax.GradientTransformation(lambda p: optax.EmptyState(), zero_frozen),
    )


def _summary(tree) -> np.ndarray:
    vals = [
        float(np.sum(np.asarray(leaf, np.float64)))
        for leaf in jax.tree_util.tree_leaves(tree)
        if leaf is not None
    ]
    return np.asarray(vals)


@contextlib.contextmanager
def check_parameter_frozen(get_params, patterns: Sequence[str],
                           disabled: bool = False):
    """Raise if params matching the patterns changed inside the context
    (reference with_check_parameter_frozen :120-160). `get_params` is a
    zero-arg callable returning the current param pytree (params are
    immutable in jax, so a getter is needed to observe the rebind)."""
    if not patterns or disabled:
        yield
        return
    before = _summary(filter_params_matching_unix_pattern(patterns, get_params()))
    yield
    after = _summary(filter_params_matching_unix_pattern(patterns, get_params()))
    if not np.allclose(before, after, atol=1e-6):
        raise ValueError(
            "frozen parameters were updated inside the guarded region "
            f"(patterns: {list(patterns)})"
        )
