"""Debloom tests (mirrors reference TestDebloom: cFP set exactness)."""

import numpy as np
import pytest

from gatb_core_tpu.bank.fasta import BankStrings
from gatb_core_tpu.debruijn.graph import Graph
from gatb_core_tpu.kmer.debloom import build_debloom, BloomCfpContainer
from gatb_core_tpu.ops.neighbor_ops import neighbor_candidates
from gatb_core_tpu.ops.kmer_ops import kmers_to_py

import jax.numpy as jnp


def _graph(k=21, seed=0, n=300):
    rng = np.random.default_rng(seed)
    genome = "".join(rng.choice(list("ACGT"), size=n))
    reads = [genome[i:i + 60] for i in range(0, n - 60, 13)] * 2
    return Graph.create(BankStrings(*reads), kmer_size=k, abundance_min=1,
                        batch_reads=32, batch_len=128,
                        build_branching=False)


def test_cfp_exactness():
    """(bloom and not cfp) must equal exact membership on the whole
    1-neighborhood of the solid set — the debloom guarantee."""
    k = 21
    graph = _graph(k)
    res = build_debloom(graph.solid_limbs, k)
    container = BloomCfpContainer(res)

    cands = np.asarray(neighbor_candidates(
        jnp.asarray(graph.solid_limbs), k)).reshape(-1,
                                                    graph.solid_limbs.shape[1])
    got = container.contains(cands)
    exact = graph.contains(cands)
    assert (got == exact).all()

    # every solid kmer itself must be contained
    assert container.contains(graph.solid_limbs).all()


def test_cfp_members_are_bloom_fp():
    k = 21
    graph = _graph(k, seed=1)
    res = build_debloom(graph.solid_limbs, k)
    if res.nb_cfp:
        # all cFP elements hit the bloom but are not solid
        hits = np.asarray(res.bloom.contains(jnp.asarray(res.cfp)))
        assert hits.all()
        assert not graph.contains(res.cfp).any()
    # cfp sorted unique
    if res.nb_cfp > 1:
        vals = kmers_to_py(res.cfp)
        assert vals == sorted(set(vals))


def test_bloom_sizing_formulas():
    # reference arithmetic is float32 (BloomAlgorithm.cpp:159-165: NBITS is
    # a C float; size = (u_int64_t)(n * NBITS) multiplies in float32)
    import math
    import numpy as np

    k = 31
    graph = _graph(k, seed=2)
    res = build_debloom(graph.solid_limbs, k, cascading=False)
    exp_nbits = float(np.float32(
        math.log(16 * k * math.log(2) ** 2) / math.log(2) ** 2))
    assert res.info["nbits_per_kmer"] == exp_nbits
    assert res.info["bloom_size_bits"] == int(
        np.float32(graph.nb_nodes) * np.float32(exp_nbits))
    # cascading: per-k rvalues table (DebloomAlgorithm.pri:27)
    res2 = build_debloom(graph.solid_limbs, k, cascading=True)
    assert res2.info["nbits_per_kmer"] == float(np.float32(6.03437))
