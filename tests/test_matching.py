import numpy as np
import jax.numpy as jnp
import torch

from sfd2_tpu.ops.matching import (
    mutual_nn_match,
    mutual_nn_ratio_match,
    one_way_match,
    mutual_nn_match_with_labels,
    mutual_nn_match_batch,
)


def unit_descs(rng, n, c=32):
    d = rng.normal(size=(n, c)).astype(np.float32)
    return d / np.linalg.norm(d, axis=1, keepdims=True)


def torch_mutual_nn(d1, d2):
    """Reference semantics of it_loc/matcher.py:122 (dense matches0)."""
    sim = torch.from_numpy(d1) @ torch.from_numpy(d2).t()
    nn12 = torch.max(sim, dim=1)[1]
    nn21 = torch.max(sim, dim=0)[1]
    ids1 = torch.arange(0, sim.shape[0])
    mask = ids1 == nn21[nn12]
    all_matches = np.full(d1.shape[0], -1, dtype=int)
    all_matches[ids1[mask].numpy()] = nn12[mask].numpy()
    return all_matches


def torch_mutual_nn_ratio(d1, d2, ratio=0.9):
    sim = torch.from_numpy(d1) @ torch.from_numpy(d2).t()
    nns_sim, nns = torch.topk(sim, 2, dim=1)
    dist = torch.sqrt(torch.clamp(2 - 2 * nns_sim, min=0))
    ratios12 = dist[:, 0] / (dist[:, 1] + 1e-8)
    nn12 = nns[:, 0]
    nns_sim, nns = torch.topk(sim.t(), 2, dim=1)
    dist = torch.sqrt(torch.clamp(2 - 2 * nns_sim, min=0))
    ratios21 = dist[:, 0] / (dist[:, 1] + 1e-8)
    nn21 = nns[:, 0]
    ids1 = torch.arange(0, sim.shape[0])
    mask = (ids1 == nn21[nn12]) & (ratios12 <= ratio) & (ratios21[nn12] <= ratio)
    all_matches = np.full(d1.shape[0], -1, dtype=int)
    all_matches[ids1[mask].numpy()] = nn12[mask].numpy()
    return all_matches


def test_mutual_nn_matches_reference(rng):
    d1 = unit_descs(rng, 100)
    d2 = unit_descs(rng, 120)
    ours, scores = mutual_nn_match(jnp.array(d1), jnp.array(d2))
    np.testing.assert_array_equal(np.array(ours), torch_mutual_nn(d1, d2))
    sim = d1 @ d2.T
    np.testing.assert_allclose(np.array(scores), sim.max(axis=1), atol=1e-5)


def test_mutual_nn_ratio_matches_reference(rng):
    d1 = unit_descs(rng, 80, 8)
    d2 = unit_descs(rng, 90, 8)
    ours, _ = mutual_nn_ratio_match(jnp.array(d1), jnp.array(d2), 0.97)
    np.testing.assert_array_equal(np.array(ours), torch_mutual_nn_ratio(d1, d2, 0.97))


def test_masked_padding_rows_never_match(rng):
    d1 = unit_descs(rng, 50)
    d2 = unit_descs(rng, 60)
    v1 = np.ones(50, bool)
    v1[30:] = False
    v2 = np.ones(60, bool)
    v2[40:] = False
    m, _ = mutual_nn_match(jnp.array(d1), jnp.array(d2), jnp.array(v1), jnp.array(v2))
    m = np.array(m)
    assert np.all(m[30:] == -1)
    assert np.all(m[m >= 0] < 40)
    # Masked result over padded arrays == unmasked result over true arrays.
    m_true = torch_mutual_nn(d1[:30], d2[:40])
    np.testing.assert_array_equal(m[:30], m_true)


def test_one_way_match(rng):
    d1 = unit_descs(rng, 20)
    d2 = unit_descs(rng, 30)
    m, s = one_way_match(jnp.array(d1), jnp.array(d2))
    sim = d1 @ d2.T
    np.testing.assert_array_equal(np.array(m), sim.argmax(axis=1))


def test_label_aware_match_blocks_cross_label(rng):
    # Two identical descriptor sets with different labels must not match.
    d = unit_descs(rng, 10)
    l1 = np.full(10, 1, np.int32)
    l2 = np.full(10, 2, np.int32)
    m, _ = mutual_nn_match_with_labels(jnp.array(d), jnp.array(d), jnp.array(l1), jnp.array(l2))
    assert np.all(np.array(m) == -1)
    # Same labels: perfect identity matching.
    m, _ = mutual_nn_match_with_labels(jnp.array(d), jnp.array(d), jnp.array(l1), jnp.array(l1))
    np.testing.assert_array_equal(np.array(m), np.arange(10))
    # Unlabeled (0) side is always admissible.
    m, _ = mutual_nn_match_with_labels(
        jnp.array(d), jnp.array(d), jnp.array(np.zeros(10, np.int32)), jnp.array(l2)
    )
    np.testing.assert_array_equal(np.array(m), np.arange(10))


def test_batched_matching(rng):
    b = 4
    d1 = np.stack([unit_descs(rng, 64) for _ in range(b)])
    d2 = np.stack([unit_descs(rng, 64) for _ in range(b)])
    m, s = mutual_nn_match_batch(jnp.array(d1), jnp.array(d2))
    for i in range(b):
        np.testing.assert_array_equal(np.array(m[i]), torch_mutual_nn(d1[i], d2[i]))


def test_matching_sharded_db_bank(rng):
    """DB descriptor banks sharded across the mesh (SURVEY §7.1: 'DB
    descriptor bank sharded across chips for matching'): one query
    replicated, candidate banks split over the data axis — results match
    the unsharded program exactly."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sfd2_tpu.parallel.mesh import make_mesh

    n_banks, k, c = 16, 128, 32
    q = unit_descs(rng, k, c)
    banks = np.stack([unit_descs(rng, k, c) for _ in range(n_banks)])
    qb = np.broadcast_to(q, (n_banks, k, c))
    v = np.ones((n_banks, k), bool)

    m_ref, s_ref = mutual_nn_match_batch(
        jnp.array(qb), jnp.array(banks), jnp.array(v), jnp.array(v)
    )

    mesh = make_mesh(8, ("data",))
    with mesh:
        shard = NamedSharding(mesh, P("data"))
        m_sh, s_sh = mutual_nn_match_batch(
            jax.device_put(jnp.array(qb), shard),
            jax.device_put(jnp.array(banks), shard),
            jax.device_put(jnp.array(v), shard),
            jax.device_put(jnp.array(v), shard),
        )
    np.testing.assert_array_equal(np.array(m_sh), np.array(m_ref))
    np.testing.assert_allclose(np.array(s_sh), np.array(s_ref), atol=1e-5)
