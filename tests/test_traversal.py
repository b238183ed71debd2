"""Traversal tests (mirrors reference TestDebruijn traversal checks):
simple-path vs monument on bubbles, needleman-wunsch identity."""

import numpy as np
import pytest

from gatb_core_tpu.bank.fasta import BankStrings
from gatb_core_tpu.debruijn.graph import Graph
from gatb_core_tpu.debruijn.traversal import (
    assemble_contigs, needleman_wunsch_identity, NodeGraphView,
    SimplePathsTraversal, MonumentTraversal, Terminator,
)


def _rand(rng, n):
    return "".join(rng.choice(list("ACGT"), size=n))


def canon(s):
    comp = str.maketrans("ACGT", "TGCA")
    return min(s, s.translate(comp)[::-1])


def test_nw_identity():
    assert needleman_wunsch_identity("ACGT", "ACGT") == 1.0
    assert needleman_wunsch_identity("ACGT", "ACCT") == 0.75
    assert needleman_wunsch_identity("AAAA", "TTTT") == 0.0
    # single indel in 10bp: 9/10
    assert abs(needleman_wunsch_identity("ACGTACGTAC",
                                         "ACGTCGTAC") - 0.9) < 1e-6


def test_simple_path_contig():
    """A clean linear genome assembles into one contig equal to it."""
    k = 15
    rng = np.random.default_rng(1)
    genome = _rand(rng, 200)
    reads = [genome[i:i + 50] for i in range(0, 160, 7)]
    graph = Graph.create(BankStrings(*reads), kmer_size=k, abundance_min=1,
                         batch_reads=32, batch_len=128,
                         build_branching=False)
    contigs = assemble_contigs(graph, traversal="simple")
    assert len(contigs) == 1
    assert canon(contigs[0]) == canon(genome)


def test_monument_crosses_snp_bubble():
    """Genome with one SNP bubble: monument produces a single contig,
    simple-paths fragments into three."""
    k = 15
    rng = np.random.default_rng(2)
    left = _rand(rng, 60)
    right = _rand(rng, 60)
    mid = _rand(rng, 9)
    alt = ("A" if mid[4] != "A" else "C")
    mid2 = mid[:4] + alt + mid[5:]
    hap1 = left + mid + right
    hap2 = left + mid2 + right
    reads = []
    for h in (hap1, hap1, hap2):  # hap1 more abundant
        reads += [h[i:i + 45] for i in range(0, len(h) - 44, 6)]
        reads.append(h[-45:])  # cover the tail
    graph = Graph.create(BankStrings(*reads), kmer_size=k, abundance_min=1,
                         batch_reads=64, batch_len=128,
                         build_branching=False)

    simple = assemble_contigs(graph, traversal="simple")
    monument = assemble_contigs(graph, traversal="monument")
    # monument should fuse the bubble into fewer, longer contigs
    assert max(len(c) for c in monument) > max(len(c) for c in simple)
    longest = max(monument, key=len)
    # the longest contig spans the whole genome length (one haplotype)
    assert len(longest) == len(hap1)
    assert canon(longest) in (canon(hap1), canon(hap2))
    # and with abundance-based consensus choice it picks hap1
    assert canon(longest) == canon(hap1)


def test_traversal_marks_prevent_duplicates():
    k = 15
    rng = np.random.default_rng(3)
    genome = _rand(rng, 150)
    reads = [genome[i:i + 50] for i in range(0, 100, 5)] * 2
    graph = Graph.create(BankStrings(*reads), kmer_size=k, abundance_min=1,
                         batch_reads=32, batch_len=128,
                         build_branching=False)
    contigs = assemble_contigs(graph, traversal="monument")
    # no two contigs may share a kmer (marking prevents re-traversal)
    from gatb_core_tpu.kmer.model import count_kmers_py
    seen = set()
    for c in contigs:
        ks = set(count_kmers_py([c], k))
        assert not (ks & seen)
        seen |= ks


def test_contigs_batched_equals_traversal():
    """Graph.contigs (batched, per-unitig) equals the per-node
    SimplePathsTraversal contig loop on a branching motif: same maximal
    simple-path sequences (canonical), same count."""
    import numpy as np

    from gatb_core_tpu.bank.fasta import BankStrings
    from gatb_core_tpu.debruijn.graph import Graph
    from gatb_core_tpu.debruijn.traversal import (
        NodeGraphView, SimplePathsTraversal, Terminator, NUCLEOTIDES)

    rng = np.random.default_rng(17)
    a = "".join(rng.choice(list("ACGT"), size=60))
    b = "".join(rng.choice(list("ACGT"), size=45))
    c = "".join(rng.choice(list("ACGT"), size=45))
    k = 15
    # fork: a -> {b, c} (branching at a's tail)
    seqs = [a + b, a + c]
    g = Graph.create(BankStrings(*seqs), kmer_size=k, abundance_min=1,
                     build_branching=False, mphf_kind="none",
                     debloom_kind="none", repartition=False)

    contigs, _ = g.contigs(min_contig_len=k)
    comp = str.maketrans("ACGT", "TGCA")

    def canon(s):
        return min(s, s[::-1].translate(comp))

    batched = sorted(canon(s) for s in contigs)

    # per-node traversal loop (the reference's assembly pattern):
    # start at every unmarked node, extend both ways, mark as we go
    view = NodeGraphView(g)
    term = Terminator(view)
    walked = []
    for idx in range(g.nb_nodes):
        if term.is_marked(2 * idx) or term.is_marked(2 * idx + 1):
            continue
        term.mark(2 * idx)
        trav = SimplePathsTraversal(view, term)
        fwd, _ = trav.traverse(2 * idx)
        rev, _ = trav.traverse(2 * idx + 1)
        start = view.node_string(2 * idx)
        right = "".join(NUCLEOTIDES[nt] for nt in fwd)
        left = "".join(NUCLEOTIDES[nt] for nt in rev)
        comp_l = left[::-1].translate(comp)
        walked.append(canon(comp_l + start + right))
    assert sorted(set(walked)) == batched
