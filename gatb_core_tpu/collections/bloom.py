"""Bloom filters as device bit tensors with batched probe kernels.

TPU-native equivalent of gatb-core's IBloom family (tools/collections/impl/
Bloom.hpp:113-1290). The reference's synchronized/cache-coherent variants
exist to manage CPU atomics and cache lines; on TPU the build is a scatter
of idempotent True writes and the query is a vectorized gather — so one
implementation covers Bloom/BloomSynchronized/BloomCacheCoherent use cases.

Hash family: bit-exact port of the reference's seeded hash1 chain
(Bloom.hpp:81-92 seed generation, NativeInt64.hpp:175-188 hash64,
LargeInt.hpp:738-749 per-64-bit-chunk XOR) so filter sizes/false-positive
behavior match the reference's for the same parameters.

Sizing formulas (BloomAlgorithm.cpp:161-163):
  size = nb_items * nbits_per_kmer, n_hash = max(1, floor(0.7 * nbits))
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.u64 import U64, hash64, u64_mod_u32, u64_xor

NSEEDSBLOOM = 10
_RBASE = [
    0xAAAAAAAA55555555, 0x33333333CCCCCCCC, 0x6666666699999999,
    0xB5B5B5B54B4B4B4B, 0xAA55AA5555335533, 0x33CC33CCCC66CC66,
    0x6699669999B599B5, 0xB54BB54B4BAA4BAA, 0xAA33AA3355CC55CC,
    0x33663366CC99CC99,
]


def bloom_seeds(user_seed: int = 0) -> list[int]:
    """Seed table generation, bit-exact (Bloom.hpp:81-92)."""
    seeds = list(_RBASE)
    for i in range(NSEEDSBLOOM):
        seeds[i] = (seeds[i] * seeds[(i + 3) % NSEEDSBLOOM] + user_seed) \
            & 0xFFFFFFFFFFFFFFFF
    return seeds


def optimal_params(nb_items: int, nbits_per_kmer: float) -> tuple[int, int]:
    """(size_bits, n_hash) via the reference formulas (BloomAlgorithm.cpp:161)."""
    size = max(64, int(nb_items * nbits_per_kmer))
    n_hash = max(1, int(0.7 * nbits_per_kmer))
    return size, min(n_hash, NSEEDSBLOOM)


def _chunk_hash(limbs: jnp.ndarray, seed: int) -> U64:
    """XOR of hash64 over the 64-bit chunks of each kmer
    (LargeInt.hpp:738-749). limbs: (N, W32) big-endian uint32."""
    n, w32 = limbs.shape
    seed_u = U64.from_int(seed, like=limbs[:, 0])
    acc = None
    # little-endian 64-bit words from big-endian u32 limbs
    padded = limbs if w32 % 2 == 0 else jnp.concatenate(
        [jnp.zeros((n, 1), jnp.uint32), limbs], axis=1)
    nw = padded.shape[1] // 2
    for j in range(nw):
        hi = padded[:, 2 * j]
        lo = padded[:, 2 * j + 1]
        h = hash64(U64(hi, lo), seed_u)
        acc = h if acc is None else u64_xor(acc, h)
    return acc


class BloomFilter(NamedTuple):
    """Packed bloom bit array (device) + parameters."""

    words: jnp.ndarray      # (ceil(size/32),) uint32 packed bits
    size_bits: int
    n_hash: int
    user_seed: int

    def contains(self, limbs: jnp.ndarray) -> jnp.ndarray:
        """Batched membership probe: (N, W32) -> (N,) bool."""
        return _bloom_contains(self.words, limbs, self.size_bits,
                               self.n_hash, self.user_seed)

    def to_numpy(self) -> np.ndarray:
        return np.asarray(self.words)


@functools.partial(jax.jit, static_argnames=("size_bits", "n_hash", "seed"))
def _bloom_positions(limbs, size_bits: int, n_hash: int, seed: int):
    seeds = bloom_seeds(seed)
    pos = []
    for i in range(n_hash):
        h = _chunk_hash(limbs, seeds[i])
        pos.append(u64_mod_u32(h, size_bits))
    return jnp.stack(pos, axis=-1)  # (N, n_hash) uint32


@functools.partial(jax.jit, static_argnames=("size_bits", "n_hash", "seed"))
def _bloom_build(limbs, valid, size_bits: int, n_hash: int, seed: int):
    pos = _bloom_positions(limbs, size_bits, n_hash, seed)  # (N, H)
    pos = jnp.where(valid[:, None], pos, jnp.uint32(size_bits))
    bits = jnp.zeros((size_bits,), jnp.bool_)
    bits = bits.at[pos.reshape(-1)].set(True, mode="drop")
    # pack bool bits -> uint32 words
    n_words = (size_bits + 31) // 32
    padded = jnp.zeros((n_words * 32,), jnp.bool_).at[:size_bits].set(bits)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    words = jnp.sum(padded.reshape(n_words, 32).astype(jnp.uint32)
                    * weights[None, :], axis=1, dtype=jnp.uint32)
    return words


@functools.partial(jax.jit, static_argnames=("size_bits", "n_hash", "seed"))
def _bloom_contains(words, limbs, size_bits: int, n_hash: int, seed: int):
    pos = _bloom_positions(limbs, size_bits, n_hash, seed)  # (N, H)
    w = words[pos >> 5]
    bit = (w >> (pos & 31)) & 1
    return jnp.all(bit == 1, axis=-1)


def build_bloom(limbs: jnp.ndarray, valid: jnp.ndarray | None = None, *,
                nbits_per_kmer: float = 12.0, nb_items: int | None = None,
                user_seed: int = 0) -> BloomFilter:
    """Build a bloom over a set of kmers (BloomAlgorithm equivalent,
    kmer/impl/BloomAlgorithm.cpp:155-203)."""
    if valid is None:
        valid = jnp.ones((limbs.shape[0],), jnp.bool_)
    if nb_items is None:
        nb_items = int(jnp.sum(valid))
    size_bits, n_hash = optimal_params(nb_items, nbits_per_kmer)
    words = _bloom_build(limbs, valid, size_bits, n_hash, user_seed)
    return BloomFilter(words, size_bits, n_hash, user_seed)


# NBITS_PER_KMER formula used by debloom (DebloomAlgorithm.cpp:628-650)
def debloom_nbits_per_kmer(kmer_size: int, cascading: bool) -> float:
    import math

    if not cascading:
        return math.log(16 * kmer_size * (math.log(2) ** 2)) / (math.log(2) ** 2)
    # per-k rvalues table for cascading (DebloomAlgorithm.cpp rvalues)
    rvalues = {16: 6, 32: 9, 64: 12, 96: 14, 128: 16}
    for span in sorted(rvalues):
        if kmer_size < span:
            return rvalues[span]
    return 16
