"""Multi-chip inference: shard the object axis of the memory bank.

The reference is strictly single-device at inference (SURVEY.md section
2.8). Here the per-object batch dimension of the tracking step is
embarrassingly parallel — every object row attends its own memory — so
placing the MemoryBank with the object axis sharded over a mesh makes jit
partition the whole step across chips with no collectives on the hot path
(the per-frame image features are replicated; XLA broadcasts them once).

Usage:
    mesh = make_mesh(axis_names=("objects",))
    bank = shard_bank(mesh, init_bank(cfg, num_objects=8), "objects")
    bank, out = engine.track_step(feats, bank, t, n)   # runs sharded
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from det_sam2_tpu.state import MemoryBank


def bank_shardings(mesh: Mesh, bank: MemoryBank, axis_name: str = "objects"):
    """NamedShardings for a MemoryBank: slot-major arrays shard their
    OBJECT axis (axis 1); index/pin vectors replicate."""
    o = bank.num_objects

    def leaf_sharding(x):
        if hasattr(x, "ndim") and x.ndim >= 2 and x.shape[1] == o:
            return NamedSharding(mesh, P(None, axis_name))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(leaf_sharding, bank)


def shard_bank(mesh: Mesh, bank: MemoryBank, axis_name: str = "objects"
               ) -> MemoryBank:
    """device_put the bank with the object axis sharded over the mesh.
    The object count must be divisible by the mesh axis size (the
    power-of-two slot bucketing of the video predictor guarantees this
    when the axis size is a power of two)."""
    size = mesh.shape[axis_name]
    assert bank.num_objects % size == 0, (
        f"object axis {bank.num_objects} not divisible by mesh axis {size}"
    )
    if bank.mem_k is not None:
        # the bank-indirect Pallas kernel is not GSPMD-partitionable;
        # dropping the derived caches falls back to the (identical-result)
        # gather path, which partitions cleanly over the object axis
        bank = bank.replace(mem_k=None, mem_v=None)
    shardings = bank_shardings(mesh, bank, axis_name)
    return jax.tree_util.tree_map(jax.device_put, bank, shardings)
