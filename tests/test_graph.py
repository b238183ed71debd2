"""De Bruijn graph tests vs brute force (mirrors reference TestDebruijn:
node/edge semantics, neighbors vs brute force, MPHF index, branching)."""

import numpy as np
import pytest

from gatb_core_tpu.bank.fasta import BankStrings
from gatb_core_tpu.debruijn.graph import Graph
from gatb_core_tpu.kmer.model import (
    ModelCanonical, canonical, revcomp, string_to_kmer, kmer_to_string,
    count_kmers_py,
)
from gatb_core_tpu.ops.kmer_ops import kmers_to_py, py_to_limbs


def brute_force_graph(seqs, k, amin=1):
    """Python ground truth: solid set + adjacency."""
    solid = set(count_kmers_py(seqs, k, abundance_min=amin))
    mask = (1 << (2 * k)) - 1

    def neighbors(v):
        # v canonical; f = v, r = revcomp
        f, r = v, revcomp(v, k)
        out, inn = [], []
        for nt in range(4):
            cand = canonical(((f << 2) | nt) & mask, k)
            if cand in solid:
                out.append((nt, cand))
            cand = canonical((f >> 2) | (nt << (2 * (k - 1))), k)
            if cand in solid:
                inn.append((nt, cand))
        return out, inn

    return solid, neighbors


@pytest.mark.parametrize("k", [
    11, pytest.param(21, marks=pytest.mark.slow), 31, 63])
def test_graph_matches_brute_force(k):
    rng = np.random.default_rng(k)
    genome = "".join(rng.choice(list("ACGT"), size=300))
    # overlapping reads covering the genome twice
    seqs = [genome[i:i + 2 * k + 10] for i in range(0, 300 - 2 * k - 9, k)]
    seqs = seqs * 2
    graph = Graph.create(BankStrings(*seqs), kmer_size=k, abundance_min=1,
                         batch_reads=16, batch_len=max(128, 3 * k),
                         build_branching=False)
    solid, nbrs = brute_force_graph(seqs, k)
    assert graph.nb_nodes == len(solid)

    table_vals = kmers_to_py(graph.solid_limbs)
    assert set(table_vals) == solid
    assert table_vals == sorted(table_vals)

    # membership: all solid present, mutated kmers mostly absent
    present = graph.contains(graph.solid_limbs)
    assert present.all()

    # neighbors vs brute force on every node
    masks = graph.adjacency_masks(graph.solid_limbs)
    outd = graph.out_degree(graph.solid_limbs)
    ind = graph.in_degree(graph.solid_limbs)
    for i, v in enumerate(table_vals):
        out, inn = nbrs(v)
        assert outd[i] == len(out), kmer_to_string(v, k)
        assert ind[i] == len(inn)
        for nt, _ in out:
            assert masks[i] & (1 << nt)
        for nt, _ in inn:
            assert masks[i] & (1 << (4 + nt))

    # node_index is a dense MPHF over the table
    idx = graph.node_index(graph.solid_limbs)
    assert (idx == np.arange(graph.nb_nodes)).all()

    # absent kmer
    absent = py_to_limbs([0], k)  # AAAA... unlikely in random genome
    if 0 not in solid and canonical(0, k) == 0:
        assert not graph.contains(absent)[0]
        assert graph.node_index(absent)[0] == -1


def test_branching_and_checksum():
    k = 15
    # construct a fork: two reads sharing a prefix
    core = "ACGGTCATCAATGCCGTAAGGCTA"
    seqs = [core + "TTTTGCAGCTT", core + "GAAACTGGCAT"]
    graph = Graph.create(BankStrings(*seqs), kmer_size=k, abundance_min=1,
                         batch_reads=4, batch_len=64)
    bn = graph.branching_nodes()
    solid, nbrs = brute_force_graph(seqs, k)
    exp_branching = []
    for v in sorted(solid):
        out, inn = nbrs(v)
        if len(out) != 1 or len(inn) != 1:
            exp_branching.append(v)
    assert kmers_to_py(bn) == exp_branching
    # checksum = sum of values mod 2^64, hex
    exp_cs = f"{sum(exp_branching) % (1 << 64):x}"
    assert graph.checksum_branching() == exp_cs


def test_abundance_query():
    k = 15
    seqs = ["ACGGTCATCAATGCCGTAAGG"] * 5
    graph = Graph.create(BankStrings(*seqs), kmer_size=k, abundance_min=1,
                         batch_reads=8, batch_len=64)
    ab = graph.query_abundance(graph.solid_limbs)
    assert (ab == 5).all()  # 5 <= 70 so discretization is exact


def test_node_state_and_delete():
    k = 15
    seqs = ["ACGGTCATCAATGCCGTAAGG"]
    graph = Graph.create(BankStrings(*seqs), kmer_size=k, abundance_min=1,
                         batch_reads=4, batch_len=64)
    node = graph.solid_limbs[0]
    assert not graph.is_node_deleted(node)[0]
    graph.delete_node(node)
    assert graph.is_node_deleted(node)[0]
    graph.set_node_state(graph.solid_limbs[1], 1)
    assert graph.query_node_state(graph.solid_limbs[1])[0] == 1
    assert graph.query_node_state(graph.solid_limbs[2])[0] == 0


def test_build_node_roundtrip():
    k = 21
    seq = "ACGGTCATCAATGCCGTAAGGCA"
    graph = Graph.create(BankStrings(seq), kmer_size=k, abundance_min=1,
                         batch_reads=4, batch_len=64)
    node = graph.build_node(seq[:k])
    assert graph.contains(node)[0]
    s = graph.node_to_string(node)
    v = string_to_kmer(seq[:k])
    assert s == kmer_to_string(canonical(v, k), k)


def test_storage_roundtrip(tmp_path):
    k = 15
    seqs = ["ACGGTCATCAATGCCGTAAGGCTAGCTT", "TTACGGACGGTCATCAATGCCGTAAGG"]
    out = str(tmp_path / "graph.h5")
    g1 = Graph.create(BankStrings(*seqs), kmer_size=k, abundance_min=1,
                      output=out, batch_reads=4, batch_len=64)
    g1.storage.close()
    g2 = Graph.load(out)
    assert g2.kmer_size == k
    assert (g2.solid_limbs == g1.solid_limbs).all()
    assert (g2.solid_counts == g1.solid_counts).all()
    assert kmers_to_py(g2.branching_nodes()) == kmers_to_py(
        g1.branching_nodes())
    g2.storage.close()


def test_graph_mphf_node_index_matches_sorted_rank():
    import jax.numpy as jnp
    from gatb_core_tpu.debruijn.graph import Graph

    seqs = ["ACTGACTGAGCTACGATCAGCTACGATCAC" * 3,
            "TTGCAGCATCAGCATCGACTACGACTATTA" * 3]
    g = Graph.create(BankStrings(*seqs), kmer_size=21, abundance_min=1,
                     build_branching=False)
    nodes = g.solid_limbs
    base = g.node_index(nodes)
    absent = nodes.copy()
    absent[:, -1] ^= 1  # flip low bit -> mostly absent keys
    base_abs = g.node_index(absent)
    g.build_mphf()
    import numpy as np
    assert (g.node_index(nodes) == base).all()
    assert (g.node_index(absent) == base_abs).all()
