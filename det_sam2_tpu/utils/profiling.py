"""Observability helpers: device memory, state-size accounting, profiler.

TPU-native equivalents of the reference's ad-hoc instrumentation
(nvidia-smi polling det_sam2_RT.py:110-124, recursive tensor-size accounting
:126-166, psutil CPU memory :169-174, CUDA MemMeter
training/utils/train_utils.py:185-222). Constant memory is the product's
core claim, so the "print state size" utility is first-class here.
"""

from __future__ import annotations

import contextlib
from typing import Dict, Optional

import jax
import numpy as np


def device_memory_stats(device=None) -> Dict[str, float]:
    """Bytes in use on the device (GiB); falls back to summing live arrays
    when the backend exposes no allocator stats (e.g. tunneled devices)."""
    device = device or jax.local_devices()[0]
    stats = device.memory_stats() or {}
    if "bytes_in_use" in stats:
        return {
            "bytes_in_use_gib": stats["bytes_in_use"] / 2**30,
            "peak_bytes_gib": stats.get("peak_bytes_in_use", 0) / 2**30,
        }
    total = sum(
        x.nbytes for x in jax.live_arrays() if device in x.devices()
    )
    return {"bytes_in_use_gib": total / 2**30, "peak_bytes_gib": float("nan")}


def host_memory_stats() -> Dict[str, float]:
    try:
        import psutil

        mem = psutil.Process().memory_info()
        return {"rss_gib": mem.rss / 2**30}
    except ImportError:  # pragma: no cover
        return {}


def pytree_nbytes(tree) -> int:
    """Total bytes of all array leaves (the recursive size accounting of
    det_sam2_RT.py:126-166)."""
    total = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "nbytes"):
            total += leaf.nbytes
        elif isinstance(leaf, np.ndarray):
            total += leaf.nbytes
    return total


def session_size_report(session) -> Dict[str, float]:
    """Break down an InferenceSession's memory (MiB)."""
    report = {
        "bank_device_mib": (
            pytree_nbytes(session.bank) / 2**20 if session.bank is not None
            else 0.0
        ),
        "frames_host_mib": sum(
            f.nbytes for f in session.frames.values()
        ) / 2**20,
        "frames_device_mib": pytree_nbytes(
            list(getattr(session, "frames_dev", {}).values())
        ) / 2**20,
        "num_frames_dev_held": len(getattr(session, "frames_dev", {})),
        "cond_outputs_mib": pytree_nbytes(list(session.cond_outputs.values()))
        / 2**20,
        "noncond_outputs_mib": pytree_nbytes(
            list(session.noncond_outputs.values())
        ) / 2**20,
        "num_frames_held": len(session.frames),
        "num_cond_outputs": len(session.cond_outputs),
        "num_noncond_outputs": len(session.noncond_outputs),
    }
    return report


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
