"""Sharded descriptor matching over a device mesh.

Capability parity / north-star scaling (SURVEY §7.1 + §2.4 parallelism
table): "DB descriptor bank sharded across chips for matching (each chip
matches the query against its shard, all_gather top candidates)". Two
programs:

* `query_vs_sharded_bank` — ONE query vs a bank of D candidate DB frames
  whose leading axis is sharded over the mesh: the query is replicated,
  every device runs the vmapped mutual-NN GEMM against its local shard
  only (no K×K traffic between devices), and the per-frame match arrays
  are re-assembled by the output sharding (an all-gather over ICI). This
  is the localization engine's HOT LOOP #1 distributed.

* `make_sharded_pair_matcher` — DB-DB pair matching (hloc
  match_features): the pair batch axis is sharded; each device matches
  its pairs locally. Pure pjit — pairs are independent, XLA partitions
  the batched GEMM with zero collectives.

Both are bit-identical to their single-device equivalents (mesh tests in
``tests/test_sharded_match.py``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sfd2_tpu.ops.matching import (
    mutual_nn_match,
    mutual_nn_match_with_labels,
)

try:  # jax>=0.4.35 moved shard_map out of experimental
    from jax.experimental.shard_map import shard_map
except ImportError:  # pragma: no cover
    from jax.sharding import shard_map


@functools.lru_cache(maxsize=None)
def _query_bank_fn(mesh: Mesh, axis: str, with_labels: bool):
    if with_labels:
        in_specs = (P(), P(axis), P(), P(axis), P(), P(axis))
        out_specs = (P(axis), P(axis))

        def local(q, bk, qv, bv, ql, bl):
            return jax.vmap(
                lambda b, v, l: mutual_nn_match_with_labels(q, b, ql, l, qv, v)
            )(bk, bv, bl)

    else:
        in_specs = (P(), P(axis), P(), P(axis))
        out_specs = (P(axis), P(axis))

        def local(q, bk, qv, bv):
            return jax.vmap(lambda b, v: mutual_nn_match(q, b, qv, v))(bk, bv)

    return jax.jit(
        shard_map(local, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    )


def query_vs_sharded_bank(
    mesh: Mesh,
    q_desc: jax.Array,  # [K, C] replicated query descriptors
    bank_desc: jax.Array,  # [D, K, C] DB bank, D sharded over `axis`
    q_valid: jax.Array,  # [K]
    bank_valid: jax.Array,  # [D, K]
    q_labels: jax.Array | None = None,  # [K] (label-aware NNML)
    bank_labels: jax.Array | None = None,  # [D, K]
    axis: str = "data",
):
    """Match one query against D DB frames sharded across the mesh.

    D must be divisible by the mesh axis size (pad with all-invalid
    frames). Returns (matches [D, K] int32 −1-sentinel, scores [D, K]).
    """
    n = mesh.shape[axis]
    if bank_desc.shape[0] % n:
        raise ValueError(
            f"bank D={bank_desc.shape[0]} not divisible by mesh axis {n}"
        )
    with_labels = q_labels is not None and bank_labels is not None
    fn = _query_bank_fn(mesh, axis, with_labels)
    rep = NamedSharding(mesh, P())
    shd = NamedSharding(mesh, P(axis))
    args = [
        jax.device_put(q_desc, rep),
        jax.device_put(bank_desc, shd),
        jax.device_put(q_valid, rep),
        jax.device_put(bank_valid, shd),
    ]
    if with_labels:
        args += [jax.device_put(q_labels, rep), jax.device_put(bank_labels, shd)]
    return fn(*args)


def make_sharded_pair_matcher(mesh: Mesh, mode: str = "nnm", ratio: float = 0.9,
                              axis: str = "data"):
    """Batched pair matcher with the pair axis sharded over the mesh.

    Returns a callable (d0 [B,K,C], d1, v0, v1[, l0, l1]) → (matches,
    scores); B must be divisible by the mesh axis size.
    """
    from sfd2_tpu.ops.matching import batch_matcher

    fn = batch_matcher(mode, ratio)
    shd = NamedSharding(mesh, P(axis))

    def run(*arrays):
        n = mesh.shape[axis]
        if arrays[0].shape[0] % n:
            raise ValueError(
                f"pair batch {arrays[0].shape[0]} not divisible by mesh axis {n}"
            )
        placed = [jax.device_put(jnp.asarray(a), shd) for a in arrays]
        return fn(*placed)

    return run
