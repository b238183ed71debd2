"""Debloom: critical false positive (cFP) set construction.

Port of gatb-core DebloomAlgorithm (kmer/impl/DebloomAlgorithm.cpp) /
DebloomMinimizerAlgorithm: the de Bruijn graph membership oracle is
(Bloom AND not cFP), where cFP = the Bloom's false positives among the
1-neighborhood of solid kmers — exactly the queries graph traversal can
make. Phases (DebloomAlgorithm.cpp:270-600):

  1. probe all 8 neighbor extensions of every solid kmer against the Bloom
  2. subtract the true-solid kmers
  3. persist the remainder as a sorted set (DebloomKind 'original'
     ContainerSet; the reference's 'cascading' variant is an alternative
     *encoding* of the same set)

On TPU phases 1-2 are one batched kernel sweep: candidate generation +
Bloom gather + sorted-set rank, then a host-side unique.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..collections.bloom import BloomFilter, build_bloom, \
    debloom_nbits_per_kmer, optimal_params
from ..collections.sortedset import SortedKmerSet, _searchsorted_limbs
from ..ops.neighbor_ops import neighbor_candidates


@dataclass
class DebloomResult:
    bloom: BloomFilter
    cfp: np.ndarray           # (C, W) sorted critical false positives
    nb_cfp: int
    info: dict


def build_debloom(solid_limbs: np.ndarray, k: int,
                  bloom_nbits: float | None = None,
                  cascading: bool = False, user_seed: int = 0,
                  chunk: int = 1 << 15) -> DebloomResult:
    """Build Bloom + cFP over the solid set (BloomAlgorithm +
    DebloomAlgorithm equivalents)."""
    n = len(solid_limbs)
    w = solid_limbs.shape[1] if n else 1
    if bloom_nbits is None:
        # NBITS_PER_KMER formula (DebloomAlgorithm.cpp:628-650)
        bloom_nbits = debloom_nbits_per_kmer(k, cascading)
    table = jnp.asarray(solid_limbs)
    bloom = build_bloom(table, nbits_per_kmer=bloom_nbits,
                        nb_items=max(n, 1), user_seed=user_seed)

    cfp_parts = []
    csize = min(chunk, max(n, 1))
    kernel = _debloom_kernel(k, n, csize, bloom.size_bits, bloom.n_hash,
                             user_seed)
    for i in range(0, n, csize):
        part = solid_limbs[i:i + csize]
        npart = len(part)
        if npart < csize:
            part = np.concatenate(
                [part, np.zeros((csize - npart, w), np.uint32)])
        hits, cands = kernel(jnp.asarray(part), table, bloom.words)
        hits = np.asarray(hits).reshape(csize, 8)[:npart]
        cands = np.asarray(cands).reshape(csize, 8, w)[:npart]
        sel = hits.reshape(-1)
        if sel.any():
            cfp_parts.append(cands.reshape(-1, w)[sel])

    if cfp_parts:
        allc = np.concatenate(cfp_parts, axis=0)
        cfp = np.unique(allc, axis=0)
    else:
        cfp = np.zeros((0, w), np.uint32)

    info = {
        "bloom_size_bits": bloom.size_bits,
        "bloom_nb_hash": bloom.n_hash,
        "nbits_per_kmer": bloom_nbits,
        "nb_cfp": int(len(cfp)),
    }
    return DebloomResult(bloom, cfp, len(cfp), info)


def _debloom_kernel(k: int, n_table: int, chunk: int, size_bits: int,
                    n_hash: int, seed: int):
    from ..collections.bloom import _bloom_contains

    @jax.jit
    def kernel(nodes, table, bloom_words):
        cands = neighbor_candidates(nodes, k)        # (C, 8, W)
        c, _, w = cands.shape
        flat = cands.reshape(c * 8, w)
        in_bloom = _bloom_contains(bloom_words, flat, size_bits, n_hash,
                                   seed)
        if n_table:
            pos = _searchsorted_limbs(table, flat, n_table)
            safe = jnp.minimum(pos, max(n_table - 1, 0))
            solid = jnp.all(table[safe] == flat, axis=-1) & (pos < n_table)
        else:
            solid = jnp.zeros((c * 8,), bool)
        return in_bloom & ~solid, cands

    return kernel


class BloomCfpContainer:
    """Graph membership oracle: bloom(x) and not cfp(x)
    (ContainerNode equivalent, debruijn/impl/ContainerNode.hpp:60-90).

    Exact for every query in the 1-neighborhood of solid kmers — the
    closure traversal operates in."""

    def __init__(self, debloom: DebloomResult):
        self.bloom = debloom.bloom
        self.cfp = SortedKmerSet(jnp.asarray(debloom.cfp), len(debloom.cfp))

    def contains(self, queries) -> np.ndarray:
        q = jnp.asarray(np.atleast_2d(queries))
        hit = self.bloom.contains(q)
        in_cfp = self.cfp.contains(q)
        return np.asarray(hit & ~in_cfp)
