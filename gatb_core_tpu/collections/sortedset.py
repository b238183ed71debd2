"""Sorted-kmer-set membership and rank: the exact-membership container.

Plays two reference roles at once:
  - ContainerSet (tools/collections/impl/ContainerSet.hpp:51): sorted-vector
    membership via binary search (used for the cFP set);
  - the MPHF index (kmer/impl/MPHFAlgorithm.cpp + BooPHF): for a *static
    sorted* set, rank-in-table is a minimal perfect hash 'getCode' — every
    per-node array (abundance, node state, adjacency) is indexed by it.

Implemented as a vectorized device binary search over big-endian uint32
limb keys (lex order == integer order), O(log N) gathers per query batch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops.kmer_ops import lex_lt

I32 = jnp.int32
U32 = jnp.uint32


@functools.partial(jax.jit, static_argnames=("n_table",))
def _searchsorted_limbs(table: jnp.ndarray, queries: jnp.ndarray,
                        n_table: int) -> jnp.ndarray:
    """Lower-bound index of each query row in the sorted limb table.

    table: (C, W) sorted ascending with possible 0xFFFFFFFF padding rows
    beyond n_table; queries: (Q, W). Returns (Q,) int32 in [0, n_table].
    """
    q = queries.shape[0]
    lo = jnp.zeros((q,), I32)
    hi = jnp.full((q,), n_table, I32)
    steps = max(1, n_table.bit_length())

    def body(_, state):
        lo, hi = state
        mid = (lo + hi) >> 1
        row = table[mid]  # (Q, W) gather
        lt = lex_lt(row, queries)  # table[mid] < query
        lo = jnp.where(lt, mid + 1, lo)
        hi = jnp.where(lt, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, steps, body, (lo, hi))
    return lo


class SortedKmerSet:
    """Device-resident sorted kmer set with rank/membership queries."""

    def __init__(self, limbs: jnp.ndarray, n: int):
        self.limbs = jnp.asarray(limbs)
        self.n = int(n)

    @property
    def width(self) -> int:
        return self.limbs.shape[1]

    def rank(self, queries: jnp.ndarray) -> jnp.ndarray:
        """(Q, W) -> (Q,) int32: index in table if present, else -1.

        The index is the MPHF code of the kmer (stable, dense in [0, n)).
        Bulk batches go through the sort-join (ops/sortops.rank_limbs);
        small batches keep the binary search.
        """
        if self.n == 0:
            return jnp.full((queries.shape[0],), -1, I32)
        from ..ops.sortops import rank_limbs

        rank, _ = rank_limbs(self.limbs, queries, self.n)
        return rank

    def contains(self, queries: jnp.ndarray) -> jnp.ndarray:
        return self.rank(queries) >= 0
