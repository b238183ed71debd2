"""Simplification decisions vs the reference's own TestSimplifications
motifs (test/unit/src/debruijn/TestSimplifications.cpp:184-355): the exact
node counts the reference asserts after Graph::simplify on its crafted
X / tip / bubble / EC graphs, plus the unitig-traversal output strings.
"""

import pytest

pytestmark = pytest.mark.slow

from gatb_core_tpu.bank.fasta import BankStrings
from gatb_core_tpu.debruijn.graph import Graph

PART1 = ("CATCGATGCGAGACGCCTGTCGCGGGGAATTGTGGGGCGGACCACGCTCTGGCTAACGAGCTACC"
         "GTTTCCTTTAACCTGCCAGACGGTGACCAGGGCCGTTCGGCGTTGCATCGAGCGGTGTCGCTAGC"
         "GCAATGCGCAAGATTTTGACATTTACAAGGCAACATTGCAGCGTCCGATGGTCCGGTGGCCTCCA"
         "GATAGTGTCCAGTCGCTCTAACTGTATGGAGACCATAGGCATTTACCTTATTCTCATCGCCACGC"
         "CCCAAGATCTTTAGGACCCAGCATTCCTTTAACCACTAACATAACGCGTGTCATCTAGTTCAACA"
         "ACC")
PART2 = ("TGTCATCTAGTTCAACAACCGTTATGCCGTCCGACTCTTGCGCTCGGATGTCCGCAATGGGTTAT"
         "CCCTATGTTCCGGTAATCTCTCATCTACTAAGCGCCCTAAAGGTCGTATGGTTGGAGGGCGGTTA"
         "CACACCCTTAAGTACCGAACGATAGAGCACCCGTCTAGGAGGGCGTGCAGGGTCTCCCGCTAGCT"
         "AATGGTCACGGCCTCTCTGGGAAAGCTGAACAACGGATGATACCCATACTGCCACTCCAGTACCT"
         "GGGCCGCGTGTTGTACGCTGTGTATCTTGAGAGCGTTTCCAGCAGATAGAACAGGATCACATGTA"
         "CATG")
TIP = "TGTCATCTAGTTCAACAACCAAAAAAA"
BUB_HI = "TGTCATCTAGTTCAACAACCAAAATAACGACTCTTGCGCTCGGATGT"
BUB_LO = "TGTCATCTAGTTCAACAACCAAAAAAACGACTCTTGCGCTCGGATGT"
BUB_TAIL = ("CGACTCTTGCGCTCGGATGTCCGCAATGGGTTATCCCTATGTTCCGGTAATCTCTCATCT"
            "ACTAAGCGCCCTAAAGGTCGTATGGTTGGAGGGCGGTTACACACCCTTAAGTACCGAACG"
            "ATAGAGCACCCGTCTAGGAGGGCGTGCAGGGTCTCCCGCTAGCTAATGGTCACGGCCTCT"
            "CTGGGAAAGCTGAACAACGGATGATACCCATACTGCCACTCCAGTACCTGGGCCGCGTGT"
            "TGTACGCTGTGTATCTTGAGAGCGTTTCCAGCAGATAGAACAGGATCACATGTACAAA")
EC_CONTIG = ("GGTGAACAGCACATCTTTTCGTCCTGAGGCCATATTAATTCTACTCAGATTGTCTGTAA"
             "CCGGAGCTTCGGGCGTATTTTTGCGTAAGACACTGCCTAAAGGGAACATATGTGTCCAG"
             "AATAGGGTTCAACGGTGTATGAGCAAACTAGTTCAACAACCAAAAAAATTGTGTGCAAG"
             "CTACTTCTAGACCTTATTAAGTGCCCAGGAATTCCTAGGAAGGCGCGCAGCTCAAGCAA"
             "TCATACATGGCGGAATGCCTGTCCACCGGGGGTTCTACTGTACCACAGTGGCCTGGATA"
             "GCTAAGCAGGTCCTGGATTGGCATGTCATCCGGAGTGATAGGCACTGCTCACGACCAGC"
             "TTGCGGACAAACGGGGTGCCCGCGCCTGCGTCCGGTAGACGAGCGATGGATTTAGACCG"
             "TTCACTGAACCCTCTAATAGGACCTCTTGCCCATCCGAGGCTTAAGC")


def _build(seqs, k):
    return Graph.create(BankStrings(*seqs), kmer_size=k, abundance_min=1,
                        build_branching=False, mphf_kind="none",
                        debloom_kind="none", repartition=False)


def _live(g):
    return int((~(g.node_state & 1).astype(bool)).sum())


def _traverse_unitig(g, start_seq: str) -> str:
    """TRAVERSAL_UNITIG from the first kmer of start_seq, DIR_OUTCOMING
    (TestSimplifications debruijn_traversal, :157-180)."""
    from gatb_core_tpu.debruijn.traversal import (
        NodeGraphView, Terminator, SimplePathsTraversal, NUCLEOTIDES)

    k = g.kmer_size
    start = start_seq[:k]
    view = NodeGraphView(g)
    node = g.build_node(start)
    idx = int(g.node_index(node)[0])
    # orientation: forward oid is the one whose string equals the kmer
    oid = 2 * idx if view.node_string(2 * idx) == start else 2 * idx + 1
    term = Terminator(view)
    term.mark(oid)
    trav = SimplePathsTraversal(view, term)
    path, _ = trav.traverse(oid)
    return start + "".join(NUCLEOTIDES[nt] for nt in path)


def test_simpl_x_motif():
    # classical X for k=5: everything but the 2 hub nodes is removed
    seqs = ["AAAAA", "CCCCAAG", "AAACAAG", "CAAGA", "AAGAAGC", "AAGACCC"]
    g = _build(seqs, 5)
    assert g.nb_nodes == 14
    g.simplify()
    assert _live(g) == 2


def test_simpl_tip_motif():
    seqs = [PART1, TIP, PART2]
    g = _build(seqs, 21)
    assert g.nb_nodes == 624
    g.simplify()
    assert _live(g) == 617
    assert _traverse_unitig(g, PART1) == PART1 + PART2[20:]


def test_simpl_bubble_motif():
    seqs = [PART1, BUB_HI, BUB_HI, BUB_HI, BUB_LO, BUB_TAIL]
    g = _build(seqs, 21)
    assert g.nb_nodes == 634
    g.simplify()
    assert _live(g) == 613
    expected = PART1 + BUB_HI[20:] + BUB_TAIL[20:]
    assert _traverse_unitig(g, PART1) == expected


def test_simpl_ec_motif():
    seqs = [PART1, PART2, TIP, EC_CONTIG] + [PART1] * 4 + [PART2] * 4 \
        + [EC_CONTIG] * 4
    g = _build(seqs, 21)
    assert g.nb_nodes == 1063
    g.simplify()
    assert _live(g) == 1057
    assert _traverse_unitig(g, PART1) == PART1 + PART2[20:]
    assert _traverse_unitig(g, EC_CONTIG) == EC_CONTIG
