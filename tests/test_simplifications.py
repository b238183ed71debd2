"""Simplification tests on crafted graphs (mirrors reference
TestSimplifications: tip/bulge/EC removal on constructed motifs)."""

import numpy as np
import pytest

from gatb_core_tpu.bank.fasta import BankStrings
from gatb_core_tpu.debruijn.graph import Graph
from gatb_core_tpu.debruijn.graph_unitigs import build_unitig_graph
from gatb_core_tpu.debruijn.simplifications import Simplifications


def _rand(rng, n):
    return "".join(rng.choice(list("ACGT"), size=n))


def _graph(seqs, k, amin=1):
    return Graph.create(BankStrings(*seqs), kmer_size=k, abundance_min=amin,
                        batch_reads=32, batch_len=256, build_branching=False)


def _live_count(graph):
    return int((~(graph.node_state & 1).astype(bool)).sum())


def test_unitig_graph_links():
    """Y-fork: 3 unitigs meeting at a junction; links must connect them."""
    k = 11
    rng = np.random.default_rng(5)
    stem = _rand(rng, 40)
    b1 = stem[-(k - 1):] + "A" + _rand(rng, 20)
    b2 = stem[-(k - 1):] + "C" + _rand(rng, 20)
    # ensure first chars differ so branches diverge
    graph = _graph([stem, b1, b2], k)
    adj = graph.precompute_adjacency()
    ug = build_unitig_graph(graph.solid_limbs, graph.solid_counts, adj, k)
    assert ug.nb_unitigs == 3
    deg = ug.out_degree_oriented()
    # the stem must link to both branches at one end
    degs = sorted(deg.tolist())
    assert sum(deg) == 4  # 2 fork links x 2 orientations
    total_kmers = int(ug.kmer_counts.sum())
    assert total_kmers == graph.nb_nodes


def test_remove_short_tip():
    """Main path + short dead-end branch -> tip removed topologically."""
    k = 11
    rng = np.random.default_rng(6)
    main = _rand(rng, 120)
    # tip branches off mid-main, shorter than 2.5k = 27
    tip = main[40:40 + k - 1] + "T" + _rand(rng, 5)
    if main[40 + k - 1] == "T":
        tip = main[40:40 + k - 1] + "G" + _rand(rng, 5)
    graph = _graph([main, main, tip], k)
    before = graph.nb_nodes
    simp = Simplifications(graph)
    removed = simp.remove_tips()
    assert removed >= 1
    after = _live_count(graph)
    assert after < before
    # main path kmers survive: rebuild unitigs over live nodes
    live = ~(graph.node_state & 1).astype(bool)
    from gatb_core_tpu.kmer.model import count_kmers_py
    main_kmers = set(count_kmers_py([main], k))
    from gatb_core_tpu.ops.kmer_ops import kmers_to_py
    live_vals = set(kmers_to_py(graph.solid_limbs[live]))
    assert main_kmers <= live_vals


def test_long_tip_not_removed_topologically():
    """A dead-end branch longer than 10k stays (no RCTC either since
    coverage is uniform)."""
    k = 11
    rng = np.random.default_rng(7)
    main = _rand(rng, 150)
    long_branch = main[40:40 + k - 1] + "T" + _rand(rng, 12 * k)
    if main[40 + k - 1] == "T":
        long_branch = main[40:40 + k - 1] + "G" + _rand(rng, 12 * k)
    graph = _graph([main, long_branch], k)
    before = graph.nb_nodes
    simp = Simplifications(graph)
    simp.remove_tips()
    # the long branch must survive (it's not a tip)
    live = _live_count(graph)
    assert before - live <= 2  # at most trivial dead-end stubs removed


def test_remove_bulge():
    """Two parallel paths between the same endpoints; the low-coverage one
    is removed as a bulge."""
    k = 11
    rng = np.random.default_rng(8)
    left = _rand(rng, 40)
    right = _rand(rng, 40)
    mid_hi = _rand(rng, 30)
    mid_lo = _rand(rng, 30)
    path_hi = left + mid_hi + right
    path_lo = left + mid_lo + right
    seqs = [path_hi] * 10 + [path_lo]  # strong coverage imbalance
    graph = _graph(seqs, k)
    simp = Simplifications(graph)
    removed = simp.remove_bulges()
    assert removed >= 1
    # high-coverage path survives
    from gatb_core_tpu.kmer.model import count_kmers_py
    from gatb_core_tpu.ops.kmer_ops import kmers_to_py
    live = ~(graph.node_state & 1).astype(bool)
    live_vals = set(kmers_to_py(graph.solid_limbs[live]))
    hi_kmers = set(count_kmers_py([path_hi], k))
    assert hi_kmers <= live_vals


def test_remove_erroneous_connection():
    """A weak link connecting two strong paths is removed as an EC."""
    k = 11
    rng = np.random.default_rng(9)
    a = _rand(rng, 80)
    b = _rand(rng, 80)
    # weak bridge from mid-a to mid-b
    bridge = a[60:60 + k - 1] + _rand(rng, 12) + b[10:10 + k - 1]
    seqs = [a] * 12 + [b] * 12 + [bridge]
    graph = _graph(seqs, k)
    simp = Simplifications(graph)
    removed = simp.remove_erroneous_connections()
    assert removed >= 1


def test_simplify_full():
    """Full orchestration runs to quiescence and reduces the graph."""
    k = 11
    rng = np.random.default_rng(10)
    genome = _rand(rng, 300)
    reads = [genome[i:i + 60] for i in range(0, 240, 10)] * 3
    # add noise tips
    for i in range(5):
        p = int(rng.integers(0, 200))
        reads.append(genome[p:p + k - 1] + _rand(rng, 8))
    graph = _graph(reads, k)
    before = graph.nb_nodes
    stats = Simplifications(graph).simplify()
    assert stats.tips_removed >= 1
    assert _live_count(graph) < before


def test_hmcp_batch_matches_recursion():
    """The lockstep batch walker (`_hmcp_batch`) must agree with the
    per-candidate recursive oracle (`_hmcp_unitigs`) on every candidate
    it does NOT flag for fallback — on messy random graphs with real
    bulges (mutated re-reads create alternative paths)."""
    rng = np.random.default_rng(42)
    k = 11
    total = fallbacks = 0
    for trial in range(6):
        n = 300 + 100 * trial
        genome = _rand(rng, n)
        reads = [genome, genome]
        # mutated copies -> bulges / alternative paths
        for _ in range(6):
            g = list(genome)
            for _ in range(3):
                pos = rng.integers(k, n - k)
                g[pos] = "ACGT"[rng.integers(4)]
            reads.append("".join(g))
        graph = _graph(reads, k)
        simp = Simplifications(graph)
        live = ~(graph.node_state & 1).astype(bool)
        us, ug = simp._compact(graph.solid_limbs[live],
                               graph.solid_counts[live])
        deg = np.asarray(ug.out_degree_oriented(), np.int64)
        nk = np.asarray(ug.kmer_counts, np.int64)
        lens = np.asarray(ug.unitig_lengths(), np.int64)
        link_t = np.asarray(ug.link_targets, np.int64)
        link_o = np.asarray(ug.link_offsets, np.int64)
        max_bulge = max(int(k * simp.BULGE_LEN_KMULT),
                        k + simp.BULGE_LEN_KADD)
        backtrack = k + simp.BULGE_ALTPATH_KADD

        # candidate generation identical to remove_bulges
        cand = []
        for a in np.nonzero(deg >= 2)[0]:
            for t in link_t[link_o[a]:link_o[a + 1]]:
                a, t = int(a), int(t)
                ui = t >> 1
                if t == (a ^ 1) or not (nk[ui] > 1 and
                                        lens[ui] <= max_bulge):
                    continue
                if deg[t] == 0:
                    continue
                f0 = int(link_t[link_o[t]])
                if not deg[f0 ^ 1] > 1:
                    continue
                pl = int(nk[ui]) - 1
                cand.append((a, f0, t, max(int(pl * 1.1), pl + 3)))
        if not cand:
            continue
        arr = np.asarray(cand, np.int64)
        alt, need_fb = simp._hmcp_batch(ug, arr[:, 0], arr[:, 1],
                                        arr[:, 2], arr[:, 3], backtrack)
        total += len(cand)
        fallbacks += int(need_fb.sum())
        for i, (a, f0, t, ml) in enumerate(cand):
            if need_fb[i]:
                continue
            want = simp._hmcp_unitigs(ug, a, f0, avoid=t, maxlen=ml,
                                      backtrack_limit=backtrack)
            got = None if np.isnan(alt[i]) else alt[i]
            assert (want is None) == (got is None), (trial, i, want, got)
            if want is not None:
                assert got == pytest.approx(want), (trial, i)
    assert total > 50          # the fixtures actually exercised the walker
    assert fallbacks < total   # and the batch path handled most of them
