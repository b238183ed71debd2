"""Collections tests: bloom (no false negatives, reference formulas),
abundance discretization, storage word conversions, sorted-set rank."""

import numpy as np
import jax.numpy as jnp

from gatb_core_tpu.collections.bloom import (
    build_bloom, bloom_seeds, optimal_params, debloom_nbits_per_kmer,
)
from gatb_core_tpu.collections.abundance import (
    discretize, dediscretize, discretization_breaks, MAX_ABUNDANCE_DISCRETE,
)
from gatb_core_tpu.collections.sortedset import SortedKmerSet
from gatb_core_tpu.storage.hdf5 import limbs_to_words64, words64_to_limbs
from gatb_core_tpu.ops.kmer_ops import py_to_limbs, kmers_to_py


def test_bloom_seed_table():
    seeds = bloom_seeds(0)
    assert len(seeds) == 10
    # deterministic: first seed = rbase[0]*rbase[3] mod 2^64
    assert seeds[0] == (0xAAAAAAAA55555555 * 0xB5B5B5B54B4B4B4B) % (1 << 64)


def test_bloom_no_false_negatives():
    rng = np.random.default_rng(0)
    k = 31
    vals = [int(x) for x in
            rng.integers(0, 1 << 62, size=500, dtype=np.uint64)]
    limbs = jnp.asarray(py_to_limbs(vals, k))
    bloom = build_bloom(limbs, nbits_per_kmer=12.0)
    assert bool(bloom.contains(limbs).all())
    # false positive rate should be low at 12 bits/kmer
    other = [int(x) for x in
             rng.integers(0, 1 << 62, size=2000, dtype=np.uint64)]
    other_limbs = jnp.asarray(py_to_limbs(other, k))
    fp = int(bloom.contains(other_limbs).sum())
    assert fp < 50  # expect ~= 2000 * 0.0004 at 12 bits, 8 hashes


def test_bloom_params():
    size, n_hash = optimal_params(1000, 12.0)
    assert size == 12000
    assert n_hash == 8  # floor(0.7*12)
    assert 5 < debloom_nbits_per_kmer(31, cascading=False) < 12
    # cascading uses the reference's per-k rvalues[k][1] table
    # (DebloomAlgorithm.pri:27), rounded through float32
    assert debloom_nbits_per_kmer(31, cascading=True) == \
        float(np.float32(6.03437))
    assert debloom_nbits_per_kmer(63, cascading=True) == \
        float(np.float32(6.38975))


def test_abundance_discretization_table():
    b = discretization_breaks()
    assert len(b) == 257  # resize(257) in MapMPHF.hpp
    assert b[0] == 0 and b[1] == 1 and b[70] == 70
    assert b[71] == 72  # step 2 region
    assert MAX_ABUNDANCE_DISCRETE == 50000
    # exact below 70
    a = np.arange(0, 70)
    assert (dediscretize(discretize(a)) == a).all()
    # <=5% error overall
    a = np.array([100, 999, 12345, 49999])
    rel = np.abs(dediscretize(discretize(a)) - a) / a
    assert (rel <= 0.05).all()
    # above-precision clamps
    assert dediscretize(discretize(np.array([123456])))[0] == 50000


def test_words64_roundtrip():
    rng = np.random.default_rng(1)
    for k in (15, 31, 32, 63, 127):
        w32 = (2 * k + 31) // 32
        vals = [int.from_bytes(rng.bytes(8 * ((2 * k + 63) // 64)), "little")
                & ((1 << (2 * k)) - 1) for _ in range(20)]
        limbs = py_to_limbs(vals, k)
        words = limbs_to_words64(limbs)
        back = words64_to_limbs(words, w32)
        assert (back == limbs).all(), k
        # words are little-endian: low word == value mod 2^64
        assert int(words[0, 0]) == vals[0] % (1 << 64)


def test_sorted_set_rank():
    rng = np.random.default_rng(2)
    k = 31
    vals = sorted({int(x) for x in
                   rng.integers(0, 1 << 62, size=300, dtype=np.uint64)})
    limbs = py_to_limbs(vals, k)
    s = SortedKmerSet(jnp.asarray(limbs), len(vals))
    r = np.asarray(s.rank(jnp.asarray(limbs)))
    assert (r == np.arange(len(vals))).all()
    # absent queries
    absent = py_to_limbs([v + 1 for v in vals[:50] if v + 1 not in set(vals)],
                         k)
    assert (np.asarray(s.rank(jnp.asarray(absent))) == -1).all()


def test_boophf_rank_matches_sorted_rank():
    from gatb_core_tpu.collections.boophf import BooPHF

    rng = np.random.default_rng(3)
    for k, n in ((31, 500), (63, 200), (127, 64)):
        top = 1 << (2 * k)
        vals = sorted({int.from_bytes(rng.bytes(16), "little") % top
                       for _ in range(n)})
        limbs = py_to_limbs(vals, k)
        mph = BooPHF.build(jnp.asarray(limbs), len(vals))
        r = np.asarray(mph.rank(jnp.asarray(limbs)))
        assert (r == np.arange(len(vals))).all(), (k, r)


def test_boophf_empty_and_tiny():
    from gatb_core_tpu.collections.boophf import BooPHF

    limbs = py_to_limbs([5], 31)
    mph = BooPHF.build(jnp.asarray(limbs), 1)
    assert int(mph.rank(jnp.asarray(limbs))[0]) == 0
    empty = BooPHF.build(jnp.zeros((0, 2), np.uint32), 0)
    assert np.asarray(empty.rank(jnp.asarray(limbs))).tolist() == [-1]
