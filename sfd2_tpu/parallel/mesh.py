"""Device-mesh construction and sharding helpers.

Capability parity: the reference's NCCL DDP stack (``train.py:67-122`` —
process-group init, SyncBatchNorm, DistributedSampler) re-expressed the
TPU-native way: one ``jax.sharding.Mesh`` + NamedSharding annotations and
a single pjit'ed global-batch program. Under pjit, BatchNorm statistics
are computed over the *global* batch automatically (XLA inserts the
cross-replica reductions), which subsumes SyncBatchNorm; gradient
all-reduce falls out of the sharded-batch `grad` the same way — no
explicit collectives or rendezvous code.

Axes:
  data  — batch / keyframe data parallelism (extraction, training)
  model — reserved for sharding the descriptor bank / BA point blocks
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: int | None = None,
    axis_names: Sequence[str] = ("data",),
    shape: Sequence[int] | None = None,
) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    mesh_devices = np.array(devices).reshape(shape)
    return Mesh(mesh_devices, axis_names)


def shard_batch(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for [B, ...] arrays: batch split over `axis`."""
    return NamedSharding(mesh, P(axis))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_batch(mesh: Mesh, tree, axis: str = "data"):
    """Device-put a pytree of [B, ...] numpy arrays with batch sharding."""
    sharding = shard_batch(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def put_replicated(mesh: Mesh, tree):
    sharding = replicate(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
