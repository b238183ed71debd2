"""Sort-join rank/membership (ops/sortops.rank_join) vs binary search.

The sort-join replaces the gather-based binary search in every postsolid
bulk kernel (debloom probes, adjacency, unitig candidates, membership);
contract equality with SortedKmerSet.rank is the safety net for the
byte-identity conformance suite built on those kernels.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gatb_core_tpu.ops.sortops import rank_join, rank_limbs


def _mk_table(rng, n, w, cap=None):
    vals = rng.integers(0, 2**32 - 2, size=(n * 2, w)).astype(np.uint32)
    vals = np.unique(vals, axis=0)[:n]
    n = len(vals)
    cap = cap or n
    table = np.full((cap, w), 0xFFFFFFFF, np.uint32)
    table[:n] = vals
    return table, n


@pytest.mark.parametrize("w", [1, 2, 4])
def test_rank_join_matches_binsearch(w):
    rng = np.random.default_rng(42 + w)
    table, n = _mk_table(rng, 1000, w, cap=1024)
    # queries: half present, half random misses, some duplicates
    hits = table[rng.integers(0, n, 300)]
    misses = rng.integers(0, 2**32 - 2, size=(300, w)).astype(np.uint32)
    dups = np.repeat(table[rng.integers(0, n, 10)], 3, axis=0)
    queries = np.concatenate([hits, misses, dups])
    rng.shuffle(queries)

    r_j, f_j = rank_join(jnp.asarray(table), jnp.asarray(queries), n)
    r_b, f_b = rank_limbs(jnp.asarray(table), jnp.asarray(queries), n,
                          method="binsearch")
    np.testing.assert_array_equal(np.asarray(f_j), np.asarray(f_b))
    np.testing.assert_array_equal(np.asarray(r_j), np.asarray(r_b))


def test_rank_join_padding_and_sentinel_queries():
    rng = np.random.default_rng(7)
    table, n = _mk_table(rng, 50, 2, cap=128)
    queries = np.concatenate([
        table[:5],
        np.full((3, 2), 0xFFFFFFFF, np.uint32),   # sentinel: never found
        rng.integers(0, 2**32 - 2, size=(5, 2)).astype(np.uint32),
    ])
    r, f = rank_join(jnp.asarray(table), jnp.asarray(queries), n)
    r, f = np.asarray(r), np.asarray(f)
    assert f[:5].all() and (r[:5] == np.arange(5)).all()
    assert not f[5:8].any() and (r[5:8] == -1).all()


def test_rank_join_empty_table():
    queries = np.arange(20, dtype=np.uint32).reshape(10, 2)
    table = np.full((4, 2), 0xFFFFFFFF, np.uint32)
    r, f = rank_join(jnp.asarray(table), jnp.asarray(queries), 0)
    assert not np.asarray(f).any()
    assert (np.asarray(r) == -1).all()


def test_rank_limbs_auto_dispatch_equal():
    rng = np.random.default_rng(3)
    table, n = _mk_table(rng, 5000, 2)
    queries = np.concatenate([table[rng.integers(0, n, 4000)],
                              rng.integers(0, 2**32 - 2, (4000, 2))
                              .astype(np.uint32)])
    r_a, f_a = rank_limbs(jnp.asarray(table), jnp.asarray(queries), n)
    r_b, f_b = rank_limbs(jnp.asarray(table), jnp.asarray(queries), n,
                          method="binsearch")
    np.testing.assert_array_equal(np.asarray(r_a), np.asarray(r_b))
    np.testing.assert_array_equal(np.asarray(f_a), np.asarray(f_b))
