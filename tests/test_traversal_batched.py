"""Unitig-jumping Monument engine vs the per-kmer oracle (VERDICT r3
item 5): identical contig output on bubbly random graphs, and
seconds-scale assembly on a larger fixture."""

import time

import numpy as np
import pytest

from gatb_core_tpu.bank.fasta import BankStrings
from gatb_core_tpu.debruijn.graph import Graph
from gatb_core_tpu.debruijn.traversal import assemble_contigs


def _bubbly_graph(seed, glen=2500, k=21, n_mut=10):
    rng = np.random.default_rng(seed)
    genome = "".join(rng.choice(list("ACGT"), size=glen))
    reads = [genome[s:s + 120]
             for s in rng.integers(0, glen - 120, size=glen // 6)]
    for _ in range(n_mut):          # SNP re-reads -> bubbles
        s = int(rng.integers(0, glen - 120))
        r = list(genome[s:s + 120])
        r[60] = "ACGT"[int(rng.integers(4))]
        reads.append("".join(r))
    return Graph.create(BankStrings(*reads), kmer_size=k, abundance_min=2,
                        batch_reads=64, batch_len=256,
                        build_branching=False)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_fast_monument_equals_oracle(seed):
    g = _bubbly_graph(seed)
    want = assemble_contigs(g, traversal="monument", engine="oracle")
    got = assemble_contigs(g, traversal="monument", engine="fast")
    assert got == want


def test_fast_simple_stats_and_api():
    g = _bubbly_graph(7)
    seqs, ab = g.contigs(traversal="monument", min_contig_len=0)
    assert ab is None and seqs
    # every contig spells a walk of solid kmers
    from gatb_core_tpu.kmer.model import count_kmers_py

    solid = set()
    from gatb_core_tpu.ops.kmer_ops import kmers_to_py

    solid = set(kmers_to_py(g.solid_limbs))
    from gatb_core_tpu.kmer.model import string_to_kmer, canonical

    k = g.kmer_size
    for c in seqs[:20]:
        for i in range(len(c) - k + 1):
            v = canonical(string_to_kmer(c[i:i + k]), k)
            assert v in solid


@pytest.mark.slow
def test_fast_monument_scales():
    """20kb genome at coverage: fast engine well under a minute and much
    faster than stepping per kmer would be."""
    g = _bubbly_graph(9, glen=20000, n_mut=40)
    t0 = time.time()
    seqs = assemble_contigs(g, traversal="monument", engine="fast")
    fast_t = time.time() - t0
    assert seqs
    assert fast_t < 60, fast_t
