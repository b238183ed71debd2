"""Unitig construction tests vs a brute-force Python compactor
(mirrors reference TestBcalm: compaction correctness)."""

import numpy as np
import pytest

from gatb_core_tpu.bank.fasta import BankStrings
from gatb_core_tpu.debruijn.graph import Graph
from gatb_core_tpu.debruijn.unitigs import build_unitigs
from gatb_core_tpu.kmer.model import (
    canonical, revcomp, count_kmers_py, kmer_to_string,
)


def brute_unitigs(seqs, k, amin=1):
    """Ground-truth unitig compaction with the BCALM edge rule."""
    counts = count_kmers_py(seqs, k, abundance_min=amin)
    solid = sorted(counts)
    rank = {v: i for i, v in enumerate(solid)}
    mask = (1 << (2 * k)) - 1

    def val(i, o):
        return solid[i] if o == 0 else revcomp(solid[i], k)

    def out_edges(i, o):
        v = val(i, o)
        out = []
        for nt in range(4):
            ext = ((v << 2) | nt) & mask
            c = canonical(ext, k)
            if c in rank:
                j = rank[c]
                o2 = 0 if c == ext else 1
                out.append((j, o2))
        return out

    def succ(i, o):
        out = out_edges(i, o)
        if len(out) != 1:
            return None
        j, o2 = out[0]
        # true in-degree of (j, o2) == out-degree of (j, 1-o2)
        if len(out_edges(j, 1 - o2)) != 1:
            return None
        if (j, o2) == (i, o) or (j, o2) == (i, 1 - o):
            return None
        return (j, o2)

    def pred(i, o):
        # pred(v) = twin(succ(twin(v))); verify succ(pred(v)) == v
        s = succ(i, 1 - o)
        if s is None:
            return None
        j, o2 = s
        if succ(j, 1 - o2) != (i, o):
            return None
        return (j, 1 - o2)

    def oid(n):
        return 2 * n[0] + n[1]

    visited = set()
    unitigs = []  # (sequence, [kmer ranks])
    # linear chains
    for i in range(len(solid)):
        for o in (0, 1):
            if pred(i, o) is not None or (i, o) in visited:
                continue
            chain = [(i, o)]
            visited.add((i, o))
            cur = (i, o)
            while True:
                s = succ(*cur)
                if s is None or s in visited:
                    break
                chain.append(s)
                visited.add(s)
                cur = s
            unitigs.append(chain)
    # cycles: remaining nodes
    for i in range(len(solid)):
        for o in (0, 1):
            if (i, o) in visited:
                continue
            # walk the cycle, collect, cut at min oid
            cyc = [(i, o)]
            visited.add((i, o))
            cur = succ(i, o)
            while cur != (i, o):
                cyc.append(cur)
                visited.add(cur)
                cur = succ(*cur)
            m = min(range(len(cyc)), key=lambda t: oid(cyc[t]))
            unitigs.append(cyc[m:] + cyc[:m])

    # dedup twins: keep chain whose head oid <= twin-chain head oid
    out = []
    for chain in unitigs:
        head = oid(chain[0])
        tail = chain[-1]
        # twin chain head: for cycles (succ of tail is head) it's twin(head)
        s = succ(*tail)
        if s == chain[0] and len(chain) > 1:
            twin_head = head ^ 1
        elif len(chain) == 1 and s == chain[0]:
            twin_head = head ^ 1
        else:
            twin_head = oid(tail) ^ 1
        if head > twin_head:
            continue
        seq = kmer_to_string(val(*chain[0]), k)
        for (j, o2) in chain[1:]:
            seq += "ACTG"[val(j, o2) & 3]
        mean = np.mean([counts[solid[j]] for j, _ in chain])
        out.append((seq, float(mean)))
    return out


def canon_seq(s):
    comp = {"A": "T", "T": "A", "C": "G", "G": "C"}
    rc = "".join(comp[c] for c in reversed(s))
    return min(s, rc)


@pytest.mark.parametrize("k", [
    11, pytest.param(15, marks=pytest.mark.slow),
    pytest.param(21, marks=pytest.mark.slow), 31])
def test_unitigs_match_brute_force(k):
    rng = np.random.default_rng(k + 1)
    genome = "".join(rng.choice(list("ACGT"), size=400))
    seqs = [genome[i:i + 2 * k + 20] for i in range(0, 380 - 2 * k, k // 2)]
    # add a branch to create junctions
    seqs.append(genome[50:50 + k] + "".join(rng.choice(list("ACGT"),
                                                       size=30)))
    graph = Graph.create(BankStrings(*seqs), kmer_size=k, abundance_min=1,
                         batch_reads=16, batch_len=max(128, 3 * k),
                         build_branching=False)
    adj = graph.precompute_adjacency()
    us = build_unitigs(graph.solid_limbs, graph.solid_counts, adj, k)

    exp = brute_unitigs(seqs, k)
    got = sorted((canon_seq(s), round(float(a), 5))
                 for s, a in zip(us.sequences, us.mean_abundance))
    expected = sorted((canon_seq(s), round(a, 5)) for s, a in exp)
    assert got == expected

    # every solid kmer belongs to exactly one unitig
    assert (us.node_unitig >= 0).all()
    # total kmers across unitigs == nb nodes
    assert int(us.kmer_counts.sum()) == graph.nb_nodes
    # sequence lengths == kmers + k - 1
    for s, c in zip(us.sequences, us.kmer_counts):
        assert len(s) == c + k - 1


def test_unitigs_circular():
    """A perfectly circular genome -> one cyclic unitig."""
    k = 11
    rng = np.random.default_rng(0)
    core = "".join(rng.choice(list("ACGT"), size=60))
    circ = core + core[:k - 1]  # wrap
    graph = Graph.create(BankStrings(circ), kmer_size=k, abundance_min=1,
                         batch_reads=4, batch_len=128,
                         build_branching=False)
    adj = graph.precompute_adjacency()
    us = build_unitigs(graph.solid_limbs, graph.solid_counts, adj, k)
    exp = brute_unitigs([circ], k)
    got = sorted(canon_seq(s) for s in us.sequences)
    assert got == sorted(canon_seq(s) for s, _ in exp)


def test_unitigs_single_kmer():
    k = 15
    seq = "ACGGTCATCAATGCC"  # exactly one kmer
    graph = Graph.create(BankStrings(seq), kmer_size=k, abundance_min=1,
                         batch_reads=4, batch_len=64, build_branching=False)
    adj = graph.precompute_adjacency()
    us = build_unitigs(graph.solid_limbs, graph.solid_counts, adj, k)
    assert us.nb_unitigs == 1
    assert canon_seq(us.sequences[0]) == canon_seq(seq)


def test_unitig_graph_api_and_gfa(tmp_path):
    """GraphUnitigs-style query API + GFA round trip."""
    import numpy as np
    from gatb_core_tpu.debruijn.graph_unitigs import (
        build_unitig_graph, UnitigGraph,
    )

    k = 11
    rng = np.random.default_rng(12)
    genome = "".join(rng.choice(list("ACGT"), size=200))
    stem = genome[:80]
    b1 = stem[-(k - 1):] + ("A" if genome[80] != "A" else "C") + genome[100:140]
    seqs = [genome[:120], b1]
    graph = Graph.create(BankStrings(*seqs), kmer_size=k, abundance_min=1,
                         batch_reads=8, batch_len=256, build_branching=False)
    adj = graph.precompute_adjacency()
    ug = build_unitig_graph(graph.solid_limbs, graph.solid_counts, adj, k)
    assert ug.nb_unitigs >= 3

    # query API
    assert ug.unitig_mean_abundance(0) >= 1.0
    chain = ug.simple_path_longest(0)
    assert chain[0] == 0
    seq = ug.path_sequence(chain)
    assert len(seq) >= len(ug.sequences[0])

    # GFA round trip
    gfa = str(tmp_path / "u.gfa")
    ug.write_gfa(gfa)
    ug2 = UnitigGraph.load_gfa(gfa, k)
    assert ug2.nb_unitigs == ug.nb_unitigs
    assert sorted(ug2.sequences) == sorted(ug.sequences)
    assert sum(len(ug2.out_links(i)) for i in range(2 * ug2.nb_unitigs)) == \
        sum(len(ug.out_links(i)) for i in range(2 * ug.nb_unitigs))
