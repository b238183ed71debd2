"""Graph simplification: tips, bulges, erroneous connections (ECs).

Port of gatb-core Simplifications (debruijn/impl/Simplifications.cpp),
whose constants are SPAdes-derived and reproduced exactly
(Simplifications.cpp:93-105):

  tips:   topological length <= 2.5*k; RCTC length <= 10*k, cutoff 2
  bulges: max length max(3k, k+100); backtracking k+50; alt-cov mult 1.1
  ECs:    max length 9*k; RCTC cutoff 4
  cutoffEvents = max(nbNodes/10000, 1)   (Simplifications.cpp:85)

The reference walks kmer nodes one simple-path at a time under a thread
dispatcher; here each pass is a vectorized decision over *unitigs* (a
simple path IS a unitig), deletions are a mask, and the graph is
recompacted between passes — the NodesDeleter + iterative-pass structure
of the reference (Simplifications.cpp:112-215) expressed as whole-graph
array passes.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .graph_unitigs import UnitigGraph, build_unitig_graph
from .unitigs import build_unitigs


@dataclass
class SimplifyStats:
    tips_removed: int = 0
    bulges_removed: int = 0
    ec_removed: int = 0
    passes: int = 0


class Simplifications:
    """Iterative tip/bulge/EC removal over the unitig graph."""

    # SPAdes-like constants (Simplifications.cpp:93-105)
    TIP_LEN_TOPO_KMULT = 2.5
    TIP_LEN_RCTC_KMULT = 10.0
    TIP_RCTC_CUTOFF = 2.0
    BULGE_LEN_KMULT = 3.0
    BULGE_LEN_KADD = 100
    BULGE_ALTPATH_KADD = 50
    BULGE_ALTPATH_COVMULT = 1.1
    EC_LEN_KMULT = 9.0
    EC_RCTC_CUTOFF = 4.0

    def __init__(self, graph, verbose: int = 0):
        """graph: debruijn.graph.Graph (node-centric, provides the solid
        set + adjacency + deletion mask)."""
        self.graph = graph
        self.k = graph.kmer_size
        self.verbose = verbose
        self.stats = SimplifyStats()
        # per-op pass counters + removal report strings (the reference's
        # _nbTipRemovalPasses/... members and tipRemoval/bubbleRemoval/
        # ECRemoval "n + n + ..." strings, Simplifications.cpp:112-215)
        self.nb_tip_passes = 0
        self.nb_bulge_passes = 0
        self.nb_ec_passes = 0
        self.tip_removal = ""
        self.bubble_removal = ""
        self.ec_removal = ""

    # ------------------------------------------------------------------
    def _live(self):
        deleted = (self.graph.node_state & 1).astype(bool)
        return ~deleted

    def _delete_unitigs(self, ug: UnitigGraph, which: np.ndarray,
                        us_node_unitig: np.ndarray) -> None:
        """Mark all kmers of the selected unitigs deleted in the base graph."""
        sel = which[us_node_unitig]
        self.graph.node_state[self._live_index[sel]] |= 1
        self._compact_cache = None  # live set changed

    # ------------------------------------------------------------------
    def remove_tips(self) -> int:
        """One tip-removal pass (removeTips, Simplifications.cpp:408-610)."""
        k = self.k
        live = self._live()
        if not live.any():
            return 0
        limbs = self.graph.solid_limbs[live]
        counts = self.graph.solid_counts[live]
        us, ug = self._compact(limbs, counts)

        deg = ug.out_degree_oriented()
        u = ug.nb_unitigs
        deg_f = deg[0::2]   # links out of forward end (tail side)
        deg_r = deg[1::2]   # links out of reverse end (head side)
        lens = np.asarray(ug.unitig_lengths())

        max_topo = int(k * self.TIP_LEN_TOPO_KMULT)
        max_rctc = int(k * self.TIP_LEN_RCTC_KMULT)

        # tip = unitig with exactly one dead end, and the other end connected
        one_dead = (deg_f == 0) ^ (deg_r == 0)
        short_topo = lens <= max_topo
        short_rctc = lens <= max_rctc
        cand = one_dead & (short_topo | short_rctc)

        is_tip = cand & short_topo
        # RCTC test for the rest — vectorized over the candidate array;
        # the path abundance is the reference's simplePathMeanAbundance,
        # i.e. the nk/(nk-1)-inflated chain mean (GraphUnitigs.cpp:1507)
        rctc_cand = np.nonzero(cand & ~short_topo & short_rctc)[0]
        if len(rctc_cand):
            chain = self._chain_abundance(ug)
            ends = np.where(deg_f[rctc_cand] > 0, 2 * rctc_cand,
                            2 * rctc_cand + 1)
            ok = self._satisfy_rctc_batch(
                ug, ends, chain[rctc_cand], self.TIP_RCTC_CUTOFF)
            is_tip[rctc_cand[ok]] = True

        n_removed = int(is_tip.sum())
        # the count the reference's pass loops SEE: its simplePathDelete
        # marks a multi-kmer path's start unitig twice (the start node
        # plus unitigLastNode from the nodesList), so every multi-kmer
        # deletion reports containedAlreadyDeleted and only SINGLE-kMER
        # tips increment nbTipsRemoved (GraphUnitigs.cpp:1612-1628;
        # Simplifications.cpp:578-589)
        nk = np.asarray(ug.kmer_counts)
        self._visible_tips = int((is_tip & (nk == 1)).sum())
        if n_removed:
            self._delete_unitigs(ug, is_tip, us.node_unitig)
        self.stats.tips_removed += n_removed
        self.nb_tip_passes += 1
        return n_removed

    def _compact(self, limbs, counts):
        # one recompaction per live-set change (the round-1 version rebuilt
        # adjacency + unitigs once per remove_* call — 3x per mixed round)
        cache = getattr(self, "_compact_cache", None)
        if cache is not None and cache[0] == len(limbs):
            self._live_index = np.nonzero(self._live())[0]
            return cache[1], cache[2]
        us, ug = self._compact_uncached(limbs, counts)
        self._compact_cache = (len(limbs), us, ug)
        return us, ug

    def _compact_uncached(self, limbs, counts):
        """Recompact the live subset into a unitig graph.

        r4 redesign (the simplify profile showed 500 of 504 s inside
        recompaction device sweeps): the candidate ranks/flips of EVERY
        node are swept ONCE over the full solid table; each recompaction
        then derives the live-subset adjacency + ranks by remapping that
        sweep through the live-index permutation — pure numpy, zero
        device dispatches. Exact: the live table preserves sorted order,
        so live-rank = old2new[full-rank], and a candidate is present
        iff it was present in the full table AND its row is live."""
        from .graph_unitigs import link_unitigs

        n = len(limbs)
        mesh = getattr(self.graph, "mesh", None)
        self._live_index = np.nonzero(self._live())[0]
        if n == 0:
            us = build_unitigs(limbs, counts, np.zeros(0, np.uint8), self.k)
            return us, link_unitigs(limbs, us, self.k)
        if getattr(self, "_full_ranks", None) is None:
            self._full_sweep(mesh)
        live_idx = self._live_index
        live = self._live()
        N = self.graph.nb_nodes
        old2new = np.full(N, -1, np.int64)
        old2new[live_idx] = np.arange(n)
        fr = self._full_ranks[live_idx]          # (n, 8) full-table ranks
        safe = np.clip(fr, 0, max(N - 1, 0))
        ok = (fr >= 0) & live[safe]
        ranks = np.where(ok, old2new[safe], -1).astype(np.int32)
        flips = self._full_flips[live_idx]
        bits = (ranks >= 0).astype(np.uint8)
        adj = np.zeros(n, np.uint8)
        for slot in range(8):
            adj |= bits[:, slot] << np.uint8(slot)
        us = build_unitigs(limbs, counts, adj, self.k,
                           precomputed=(ranks, flips), mesh=mesh,
                           lazy_sequences=True)
        ug = link_unitigs(limbs, us, self.k, precomputed=(ranks, flips))
        return us, ug

    def _full_sweep(self, mesh) -> None:
        """One candidate-ranks/flips sweep over the FULL solid table
        (deleted rows included — liveness is applied at remap time)."""
        import jax.numpy as jnp

        from .unitigs import _cand_ranks_flips
        from ..ops.sortops import pad_rows_pow2, sweep_chunk

        table_np = self.graph.solid_limbs
        N = len(table_np)
        if mesh is not None:
            from ..parallel.postsolid import distributed_cand_ranks

            self._full_ranks, self._full_flips = distributed_cand_ranks(
                mesh, table_np, self.k)
            return
        ranks = np.zeros((N, 8), np.int32)
        flips = np.zeros((N, 8), np.int8)
        ptab, _ = pad_rows_pow2(table_np)
        jtab = jnp.asarray(ptab)
        csize = min(sweep_chunk(N), len(ptab))
        for i in range(0, N, csize):
            part = table_np[i:i + csize]
            npart = len(part)
            if npart < csize:
                part = np.concatenate(
                    [part, np.zeros((csize - npart, table_np.shape[1]),
                                    np.uint32)])
            r, fl = _cand_ranks_flips(jnp.asarray(part), jtab,
                                      jnp.int32(N), self.k)
            ranks[i:i + npart] = np.asarray(r)[:npart]
            flips[i:i + npart] = np.asarray(fl)[:npart]
        self._full_ranks = ranks
        self._full_flips = flips

    def _chain_abundance(self, ug: UnitigGraph) -> np.ndarray:
        """(U,) simplePathMeanAbundance of each unitig entered at an
        extremity, on a maximal unitig graph (GraphUnitigs.cpp:1507-1521):
        the traversal's coverage sums mean*(nk) (the first kmer cannot be
        excluded) but seqLength counts nk-1 extensions, so multi-kmer
        unitigs report mean * nk/(nk-1); single-kmer unitigs hit the
        isLast&&isFirst special case and report the plain mean."""
        nk = np.asarray(ug.kmer_counts, np.float64)
        ab = np.asarray(ug.mean_abundance, np.float64)
        return np.where(nk > 1, ab * nk / np.maximum(nk - 1.0, 1.0), ab)

    def _satisfy_rctc_batch(self, ug: UnitigGraph, ends: np.ndarray,
                            path_abundance: np.ndarray,
                            cutoff: float) -> np.ndarray:
        """Vectorized satisfyRCTC over an array of oriented path ends
        (satisfyRCTC, Simplifications.cpp:325-372; the per-branching-node
        mean is getMeanAbundanceOfNeighbors, :216-247), evaluated for all
        queries at once via CSR expansions. Reference-exact semantics:

        - branching nodes = the entry extremities reached by out_links(e)
        - each branching entry f (into unitig v) contributes the mean of:
            * v's own simple-path chain INTO v (the within-unitig edge at
              the entry extremity; only exists when nk_v > 1), valued at
              the inflated chain mean (`_chain_abundance`)
            * each external edge AT that extremity: the backward links
              out_links(f^1) — and, for single-kmer v (whose two
              extremities coincide), also the forward links out_links(f)
              — each valued at the target's chain mean, skipping the
              edge back to the path itself (.to == nodeToExclude ⇔
              target == e^1)
        - a branching node with ZERO contributions divides by zero in the
          reference (nan propagates through the outer mean) -> the whole
          query is False
        - RCTC satisfied iff mean over branching nodes
          > cutoff * path_abundance (the caller passes the inflated
          chain mean of the path, matching simplePathMeanAbundance)."""
        q = len(ends)
        if q == 0:
            return np.zeros(0, bool)
        deg = np.diff(ug.link_offsets)
        nk = np.asarray(ug.kmer_counts)
        chain = self._chain_abundance(ug)
        excl = ends ^ 1                      # (Q,) the edge back to the path

        # level 1: branching entries f = out_links(end) for each query
        bcnt = deg[ends]                          # (Q,)
        nb_b = int(bcnt.sum())
        ok = np.zeros(q, bool)
        if nb_b == 0:
            return ok
        qidx = np.repeat(np.arange(q), bcnt)      # (B,) owner query
        within = np.arange(nb_b) - np.repeat(
            np.cumsum(bcnt) - bcnt, bcnt)
        bflat = ug.link_targets[
            np.repeat(ug.link_offsets[ends], bcnt) + within]  # (B,)

        multi = nk[bflat >> 1] > 1                # (B,) has a within edge
        sums = np.where(multi, chain[bflat >> 1], 0.0)
        cnts = multi.astype(np.int64)

        # level 2: external edges at the entry extremity — backward links
        # always; forward links too when the unitig is single-kmer
        single_idx = np.nonzero(~multi)[0]
        src = np.concatenate([bflat ^ 1, bflat[single_idx]])
        parent = np.concatenate([np.arange(nb_b), single_idx])
        ncnt = deg[src]
        nb_t = int(ncnt.sum())
        if nb_t:
            within2 = np.arange(nb_t) - np.repeat(
                np.cumsum(ncnt) - ncnt, ncnt)
            tflat = ug.link_targets[
                np.repeat(ug.link_offsets[src], ncnt) + within2]
            tparent = np.repeat(parent, ncnt)     # (T,) owner f-entry
            keep = tflat != excl[qidx[tparent]]
            sums = sums + np.bincount(tparent[keep],
                                      weights=chain[tflat[keep] >> 1],
                                      minlength=nb_b)
            cnts = cnts + np.bincount(tparent[keep], minlength=nb_b)

        # nan semantics: any zero-contribution branching node sinks the
        # whole query (0/0 -> nan -> nan mean -> comparison false)
        has_zero = np.bincount(qidx[cnts == 0], minlength=q) > 0
        mean_b = sums / np.maximum(cnts, 1)       # (B,) per-branching mean
        total = np.bincount(qidx, weights=mean_b, minlength=q)
        mean_neighbors = total / bcnt             # bcnt > 0 on this path
        return (~has_zero) & (mean_neighbors > cutoff * path_abundance)

    # ------------------------------------------------------------------
    def remove_erroneous_connections(self) -> int:
        """One EC pass (removeErroneousConnections,
        Simplifications.cpp:1639-1850): short unitig connected on both
        sides, with low relative coverage (RCTC cutoff 4)."""
        k = self.k
        live = self._live()
        if not live.any():
            return 0
        limbs = self.graph.solid_limbs[live]
        counts = self.graph.solid_counts[live]
        us, ug = self._compact(limbs, counts)

        deg = np.asarray(ug.out_degree_oriented())
        nk = np.asarray(ug.kmer_counts)
        lens = np.asarray(ug.unitig_lengths())
        chain = self._chain_abundance(ug)
        max_ec = int(k * self.EC_LEN_KMULT)
        U = ug.nb_unitigs
        is_ec = np.zeros(U, bool)

        def first_link(p):
            """out_links(p)[0] per oriented id (the reference's
            outneighbors[0]; neighbor order is implementation-defined
            there — ours is the lexsorted link order)."""
            return np.asarray(ug.link_targets)[
                np.asarray(ug.link_offsets)[p]]

        # evaluate each orientation p of each unitig (the reference
        # examines the path from a preceding branching node in each
        # direction): pathLen = nk-1 must be > 0 (single-kmer paths are
        # skipped — "we don't support edge removal"), k + pathLen <= 9k,
        # a behind-node with out-branching toward the path, and the
        # doubly-connected end check on the FIRST out-neighbor
        for flip in (0, 1):
            p_all = 2 * np.arange(U) + flip
            u_all = np.arange(U)
            base = (nk > 1) & (lens <= max_ec) & (deg[p_all] > 0) \
                & (deg[p_all ^ 1] > 0)
            cidx = np.nonzero(base)[0]
            if not len(cidx):
                continue
            p = p_all[cidx]

            # candidacy from behind: some e in out_links(p^1) with
            # out-branching back toward the path (|out_links(e^1)| >= 2)
            # and a non-dead other side (within edge when multi-kmer,
            # else >= 1 external link) — Simplifications.cpp:1697-1704
            bdeg = deg[p ^ 1]
            nb_e = int(bdeg.sum())
            qidx = np.repeat(np.arange(len(p)), bdeg)
            within = np.arange(nb_e) - np.repeat(
                np.cumsum(bdeg) - bdeg, bdeg)
            e = np.asarray(ug.link_targets)[
                np.repeat(np.asarray(ug.link_offsets)[p ^ 1], bdeg)
                + within]
            qual = (deg[e ^ 1] >= 2) & ((nk[e >> 1] > 1) | (deg[e] >= 1))
            behind_ok = np.bincount(qidx[qual], minlength=len(p)) > 0

            # doubly-connected end (Simplifications.cpp:1777-1780): the
            # FIRST out-neighbor's entry extremity has > 1 incoming links
            # and >= 1 outgoing (within edge counts when multi-kmer)
            f0 = first_link(p)
            dc = (deg[f0 ^ 1] > 1) & ((nk[f0 >> 1] > 1) | (deg[f0] >= 1))

            sel = behind_ok & dc
            sidx = np.nonzero(sel)[0]
            if not len(sidx):
                continue
            ps = p[sidx]
            ab = chain[ps >> 1]
            # RCTC in EITHER direction removes the EC
            # (Simplifications.cpp:1790-1793, the |= of both calls)
            ok = self._satisfy_rctc_batch(ug, ps, ab, self.EC_RCTC_CUTOFF)
            ok |= self._satisfy_rctc_batch(ug, ps ^ 1, ab,
                                           self.EC_RCTC_CUTOFF)
            is_ec[u_all[cidx[sidx[ok]]]] = True

        n_removed = int(is_ec.sum())
        if n_removed:
            self._delete_unitigs(ug, is_ec, us.node_unitig)
        self.stats.ec_removed += n_removed
        self.nb_ec_passes += 1
        return n_removed

    # ------------------------------------------------------------------
    def remove_bulges(self) -> int:
        """One bulge pass (removeBulges, Simplifications.cpp:1301-1630):
        a short unitig whose endpoints are also connected by an
        alternative, better-covered path."""
        k = self.k
        live = self._live()
        if not live.any():
            return 0
        limbs = self.graph.solid_limbs[live]
        counts = self.graph.solid_counts[live]
        us, ug = self._compact(limbs, counts)

        deg = np.asarray(ug.out_degree_oriented())
        nk = np.asarray(ug.kmer_counts)
        lens = np.asarray(ug.unitig_lengths(), np.int64)
        chain = self._chain_abundance(ug)
        link_t = np.asarray(ug.link_targets)
        link_o = np.asarray(ug.link_offsets)
        max_bulge = max(int(k * self.BULGE_LEN_KMULT),
                        k + self.BULGE_LEN_KADD)
        backtrack = k + self.BULGE_ALTPATH_KADD

        # The reference iterates BRANCHING NODES and, per (node,
        # direction), walks that node's neighbor paths in order, deleting
        # AT MOST ONE — it breaks out of the neighbor loop after the
        # first deletion ("quite important to break here: don't try to
        # remove the other neighbor", Simplifications.cpp:1552). We
        # mirror that structure: each oriented extremity `a` with >= 2
        # out-links plays (node, dir); its links are the neighbor paths
        # (our lexsorted link order stands in for the reference's
        # implementation-defined neighbor order). Deletions are batched
        # (nodesDeleter flush-at-end), so marks don't affect decisions
        # within the pass — which also means evaluating ALL (node, dir,
        # neighbor) candidates at once is decision-equivalent: we run the
        # whole candidate set through the lockstep batch walker
        # (`_hmcp_batch`), fall back to the per-candidate recursion only
        # where backtracking would occur, and then apply the
        # one-deletion-per-(node,dir) rule by keeping the FIRST accepted
        # neighbor of each `a` in link order.
        is_bulge = np.zeros(ug.nb_unitigs, bool)
        a_all = np.nonzero(deg >= 2)[0].astype(np.int64)
        acnt = deg[a_all].astype(np.int64)
        if acnt.sum():
            c_a = np.repeat(a_all, acnt)      # (C,) the branching node
            within = np.arange(int(acnt.sum())) - np.repeat(
                np.cumsum(acnt) - acnt, acnt)
            c_t = link_t[np.repeat(link_o[a_all], acnt) + within].astype(
                np.int64)                     # (C,) neighbor path entry
            ui = c_t >> 1
            keep = (c_t != (c_a ^ 1)) & (nk[ui] > 1) \
                & (lens[ui] <= max_bulge) & (deg[c_t] > 0)
            c_a, c_t, ui = c_a[keep], c_t[keep], ui[keep]
            c_f0 = link_t[link_o[c_t]].astype(np.int64)  # outneighbors[0]
            keep = deg[c_f0 ^ 1] > 1          # isDoublyConnected
            c_a, c_t, ui, c_f0 = c_a[keep], c_t[keep], ui[keep], c_f0[keep]
        else:
            c_a = c_t = ui = c_f0 = np.zeros(0, np.int64)

        if len(c_a):
            path_len = nk[ui].astype(np.int64) - 1
            maxlens = np.maximum((path_len * 1.1).astype(np.int64),
                                 path_len + 3)            # SPAdes
            alt, need_fb = self._hmcp_batch(ug, c_a, c_f0, c_t, maxlens,
                                            backtrack)
            for i in np.nonzero(need_fb)[0]:
                got = self._hmcp_unitigs(
                    ug, int(c_a[i]), int(c_f0[i]), avoid=int(c_t[i]),
                    maxlen=int(maxlens[i]), backtrack_limit=backtrack)
                alt[i] = np.nan if got is None else got
            # accept: bulge chain coverage <= alt coverage * 1.1
            # (Simplifications.cpp:1521-1525; both sides are
            # simplePathMeanAbundance, i.e. inflated chain means)
            with np.errstate(invalid="ignore"):
                accept = ~np.isnan(alt) & (
                    chain[ui] <= alt * self.BULGE_ALTPATH_COVMULT)
            # one deletion per (node, dir): first accepted link of each a
            first = np.unique(c_a[accept], return_index=True)[1]
            is_bulge[ui[np.nonzero(accept)[0][first]]] = True

        n_removed = int(is_bulge.sum())
        if n_removed:
            self._delete_unitigs(ug, is_bulge, us.node_unitig)
        self.stats.bulges_removed += n_removed
        self.nb_bulge_passes += 1
        return n_removed

    def _hmcp_unitigs(self, ug: UnitigGraph, start: int, target: int,
                      avoid: int, maxlen: int, backtrack_limit: int):
        """Most-covered alternative path search, unitig flavor — the port
        of heuristic_most_covered_path_unitigs (Simplifications.cpp:
        1034-1230): greedy descent in decreasing simple-path (inflated
        chain) abundance, loop abort per call, depth budget in
        extensions, the nbCalls backtracking limit (HMCP_MAX_DEPTH), and
        the length-weighted chain mean (unitigs_chain2abundance,
        :665-680; single-kmer unitigs contribute nothing, the
        pathLen > 0 guard at :1098).

        `start` is the oriented id whose out_links are the branching
        node's expansions (the reference's startNode, a last node —
        pathLen 0, straight to expansion); `target` the oriented entry
        to reach (endNode); `avoid` the bulge path's entry, skipped only
        at the top expansion (avoidFirstNode). Returns the mean coverage
        of the found path, or None (loops track unitig ids, a hair
        coarser than the reference's extremity-node set)."""
        chain = self._chain_abundance(ug)
        nk = np.asarray(ug.kmer_counts)
        deg = np.diff(ug.link_offsets)
        state = {"calls": 0, "aborted": False}

        def wmean(lens_, covs_):
            total = sum(lens_)
            if total == 0:
                return None  # 0/0 -> nan in the reference: never accepted
            return sum(l * c for l, c in zip(lens_, covs_)) / total

        # visited tracks EXTREMITY identities as oriented ids (entry
        # extremity of oriented t <-> id t; its exit <-> t ^ 1) — the
        # same granularity as the reference's set<NodeGU> traversedNodes

        def expand(cur, depth, extra, visited, lens_, covs_, avoid_first):
            """Neighbor ordering + recursion at a branching/dead end
            (Simplifications.cpp:1155-1227)."""
            cand = []
            for t in ug.out_links(cur):
                t = int(t)
                if avoid_first is not None and t == avoid_first:
                    continue
                if t in visited:
                    return None              # HMCP_LOOP aborts this call
                cand.append(t)
            # the reference orders by abundance TRUNCATED TO INT
            # (vector<pair<int, Edge>>, Simplifications.cpp:1160-1190),
            # ties then fall to EdgeGU::operator< on ITS unitig ids —
            # unknowable here; ours break ties on the oriented id
            cand.sort(key=lambda t: (-int(chain[t >> 1]), t))
            for t in cand:
                got = rec(t, depth - extra, visited | {t}, lens_, covs_)
                if backtrack_limit > 0 and \
                        state["calls"] >= backtrack_limit:
                    # HMCP_MAX_DEPTH: checked BEFORE the found-end check
                    # (Simplifications.cpp:1216-1226) — a path found while
                    # blowing the budget is DISCARDED by the reference
                    state["aborted"] = True
                    return None
                if state["aborted"] or got is not None:
                    return got
            return None

        def rec(entry, depth, visited, lens_, covs_):
            """One level: `entry` was just entered at its head extremity
            (the reference's recursive call on edge.to)."""
            if depth < -1:
                return None                  # HMCP_DIDNT_FIND_END
            if entry == target:
                return wmean(lens_, covs_)   # current_node == endNode
            extra = 1
            cur = entry
            while True:
                tl = int(nk[cur >> 1]) - 1
                if tl > 0:                   # traverse own simple path
                    lens_ = lens_ + [tl]
                    # unitigs_abundances is vector<int> in the reference
                    # (Simplifications.hpp:107): the chain mean is
                    # TRUNCATED to int before entering chain2abundance
                    covs_ = covs_ + [float(int(chain[cur >> 1]))]
                    state["calls"] += tl + 1
                    extra += tl + 1
                    if (cur ^ 1) == target:  # processNode(lastNode)
                        return wmean(lens_, covs_)
                    if (cur ^ 1) in visited:
                        return None          # HMCP_LOOP
                    visited = visited | {cur ^ 1}
                if deg[cur] != 1:
                    break                    # dead end or out-branching
                nxt = int(ug.out_links(cur)[0])
                if deg[nxt ^ 1] <= 1:        # self-linked kmer oddity
                    return None              # (GraphUnitigs loop guard)
                state["calls"] += 1
                extra += 1
                if nxt == target:            # processNode(next)
                    return wmean(lens_, covs_)
                if nxt in visited:
                    return None              # HMCP_LOOP
                visited = visited | {nxt}
                cur = nxt
            return expand(cur, depth, extra, visited, lens_, covs_, None)

        # top level: start is a LAST node (pathLen 0) at a branching
        # extremity — straight to the avoidFirstNode-aware expansion
        if start == target:
            return None                      # empty chain -> nan
        return expand(start, maxlen, 1, {start}, [], [], avoid)

    def _hmcp_batch(self, ug: UnitigGraph, starts, targets, avoids,
                    maxlens, backtrack_limit: int):
        """Lockstep batch evaluation of `_hmcp_unitigs` over C candidates
        (the vectorization of Simplifications.cpp:1034-1230 demanded by
        VERDICT r3 item 4). Emulates the GREEDY FIRST-DESCENT of the
        recursion for all candidates at once in numpy; the result is
        decision-exact because of three invariants of the recursive
        search:

        1. success on the first descent (no failed subtree anywhere) is
           exactly what the recursion returns — it returns the first
           non-None result in sorted-candidate order;
        2. once ``calls >= backtrack_limit``, the final answer is None no
           matter what: every rec() return passes through an unwind-time
           budget check (Simplifications.cpp:1216-1226) and calls never
           shrinks;
        3. a first-descent failure while NO untried sibling exists
           anywhere on the stack (``pending`` False) is a global failure.

        Only a first-descent failure with pending alternatives and an
        unspent budget needs the real backtracking recursion: those
        candidates are flagged in the returned ``need_fallback`` mask
        (a few per mille in practice). Returns (alt_cov float64 with nan
        for None, need_fallback bool)."""
        C = len(starts)
        chain_i = self._chain_abundance(ug).astype(np.int64)  # truncated
        nk = np.asarray(ug.kmer_counts, np.int64)
        deg = np.diff(ug.link_offsets).astype(np.int64)
        # pad: the EXPAND block gathers a fixed 4-wide link window
        # (DNA out-degree <= 4); sentinel -1 rows are masked by `valid`
        link_t = np.concatenate([np.asarray(ug.link_targets, np.int64),
                                 np.full(4, -1, np.int64)])
        link_o = np.asarray(ug.link_offsets, np.int64)
        twoU = np.int64(2 * ug.nb_unitigs + 2)

        REC, CHAIN, EXPAND = 0, 1, 2
        iter_max = max(4 * max(backtrack_limit, 1), 256)
        maxv = iter_max + 2

        res = np.full(C, np.nan)
        need_fb = np.zeros(C, bool)
        # state
        cur = starts.astype(np.int64).copy()
        depth = maxlens.astype(np.int64).copy()
        extra = np.ones(C, np.int64)
        calls = np.zeros(C, np.int64)
        wsum = np.zeros(C)
        wtot = np.zeros(C, np.int64)
        pending = np.zeros(C, bool)
        mode = np.full(C, EXPAND, np.int64)   # top level: straight to expand
        first_expand = np.ones(C, bool)       # avoidFirstNode applies once
        vis = np.full((C, maxv), -1, np.int64)
        vis[:, 0] = cur
        vlen = np.ones(C, np.int64)
        active = starts != targets            # start==target -> nan

        def fail(idx):
            # definitive None unless backtracking could have rescued it:
            # pending siblings AND budget unspent
            fb = pending[idx] & ~budget_blown(idx)
            need_fb[idx[fb]] = True
            active[idx] = False

        def succeed(idx):
            ok = wtot[idx] > 0
            blown = budget_blown(idx)
            good = ok & ~blown
            res[idx[good]] = wsum[idx[good]] / wtot[idx[good]]
            # success with 0 total length -> nan (never accepted); with
            # blown budget -> unwind aborts it (invariant 2)
            fb = ~ok & pending[idx] & ~blown  # wmean None == failure
            need_fb[idx[fb]] = True
            active[idx] = False

        def budget_blown(idx):
            if backtrack_limit <= 0:
                return np.zeros(len(idx), bool)
            return calls[idx] >= backtrack_limit

        def visited_has(idx, x):
            return (vis[idx] == x[:, None]).any(axis=1)

        def visit(idx, x):
            over = vlen[idx] >= maxv
            if over.any():                    # visited overflow: fall back
                need_fb[idx[over]] = True
                active[idx[over]] = False
                idx, x = idx[~over], x[~over]
            vis[idx, vlen[idx]] = x
            vlen[idx] += 1

        for _ in range(iter_max):
            if not active.any():
                break
            # ---- REC entry: depth check + target check ----------------
            idx = np.nonzero(active & (mode == REC))[0]
            if len(idx):
                bad = depth[idx] < -1
                fail(idx[bad])                # HMCP_DIDNT_FIND_END
                idx = idx[~bad]
                hit = cur[idx] == targets[idx]
                succeed(idx[hit])
                idx = idx[~hit]
                extra[idx] = 1
                mode[idx] = CHAIN

            # ---- CHAIN: process cur's unitig, then follow deg==1 ------
            idx = np.nonzero(active & (mode == CHAIN))[0]
            if len(idx):
                tl = nk[cur[idx] >> 1] - 1
                multi = tl > 0
                m_i = idx[multi]
                if len(m_i):
                    tli = tl[multi]
                    wsum[m_i] += tli * chain_i[cur[m_i] >> 1].astype(float)
                    wtot[m_i] += tli
                    calls[m_i] += tli + 1
                    extra[m_i] += tli + 1
                    rev = cur[m_i] ^ 1
                    hit = rev == targets[m_i]
                    succeed(m_i[hit])
                    m_i, rev = m_i[~hit], rev[~hit]
                    loop = visited_has(m_i, rev)
                    fail(m_i[loop])           # HMCP_LOOP
                    m_i, rev = m_i[~loop], rev[~loop]
                    visit(m_i, rev)
                idx = idx[active[idx]]
                branch = deg[cur[idx]] != 1
                mode[idx[branch]] = EXPAND
                s_i = idx[~branch]            # single out-link: step
                if len(s_i):
                    nxt = link_t[link_o[cur[s_i]]]
                    dead = deg[nxt ^ 1] <= 1  # self-linked kmer oddity
                    fail(s_i[dead])
                    s_i, nxt = s_i[~dead], nxt[~dead]
                    calls[s_i] += 1
                    extra[s_i] += 1
                    hit = nxt == targets[s_i]
                    succeed(s_i[hit])
                    s_i, nxt = s_i[~hit], nxt[~hit]
                    loop = visited_has(s_i, nxt)
                    fail(s_i[loop])
                    s_i, nxt = s_i[~loop], nxt[~loop]
                    visit(s_i, nxt)
                    cur[s_i] = nxt            # stay in CHAIN

            # ---- EXPAND: sorted-candidate descent (first child) -------
            idx = np.nonzero(active & (mode == EXPAND))[0]
            if len(idx):
                d = deg[cur[idx]]             # <= 4 (DNA out-degree)
                cand = link_t[link_o[cur[idx]][:, None]
                              + np.arange(4)[None, :]]   # (n, 4)
                valid = np.arange(4)[None, :] < d[:, None]
                skip = first_expand[idx][:, None] & (
                    cand == avoids[idx][:, None])
                valid &= ~skip
                # any (non-avoid) candidate already visited aborts the
                # whole expansion (HMCP_LOOP at Simplifications.cpp:1164)
                seen = (cand[:, :, None] == vis[idx][:, None, :]).any(2)
                loop = (valid & seen).any(1)
                fail(idx[loop])
                live = active[idx]
                idx, cand, valid = idx[live], cand[live], valid[live]
                none = ~valid.any(1)
                fail(idx[none])               # no candidates: dead end
                live = active[idx]
                idx, cand, valid = idx[live], cand[live], valid[live]
                if len(idx):
                    # ascending by (-int(chain), t): the reference's
                    # candidate order (Simplifications.cpp:1160-1190)
                    key = chain_i[cand >> 1] * -twoU + cand
                    key = np.where(valid, key, np.iinfo(np.int64).max)
                    j0 = np.argmin(key, axis=1)
                    t0 = cand[np.arange(len(idx)), j0]
                    pending[idx] |= valid.sum(1) > 1
                    depth[idx] -= extra[idx]
                    visit(idx, t0)
                    live = active[idx]
                    idx, t0 = idx[live], t0[live]
                    cur[idx] = t0
                    first_expand[idx] = False
                    mode[idx] = REC

        # anything still walking after iter_max steps: punt to recursion
        still = np.nonzero(active)[0]
        need_fb[still] = True
        return res, need_fb

    # ------------------------------------------------------------------
    def simplify(self, do_tips: bool = True, do_bulges: bool = True,
                 do_ec: bool = True) -> SimplifyStats:
        """Full orchestration — the reference's exact pass schedule
        (Simplifications::simplify, Simplifications.cpp:111-215):
        tip rounds to quiescence, ONE bulge round, ONE EC round (bulge
        removal gets much faster after EC), then bulge rounds, EC
        rounds, then mixed rounds — with the reference's per-stage loop
        conditions and the `n + n + ...` removal report strings.

        The loop counters replicate what the reference's passes actually
        SEE, not the true removal counts: GraphUnitigs::simplePathDelete
        double-marks every multi-kmer path (GraphUnitigs.cpp:1612-1628),
        so nbTipsRemoved counts only single-kmer tips and
        nbBulgesRemoved/nbECRemoved are always 0 (every bulge/EC path
        has pathLen > 0) — making the bulge and EC loops run exactly 3
        passes each. cutoffEvents divides the reference's node count,
        which for GraphUnitigs is the number of unitig EXTREMITIES."""
        live = self._live()
        _, ug0 = self._compact(self.graph.solid_limbs[live],
                               self.graph.solid_counts[live])
        nk0 = np.asarray(ug0.kmer_counts)
        nb_extremities = int(2 * ug0.nb_unitigs - (nk0 == 1).sum())
        cutoff_events = max(nb_extremities // 10000, 1)

        def join(s, n):
            return (s + " + " if s else s) + str(n)

        tips = bubbles = ec = 0   # reference-visible counters
        if do_tips:
            while True:
                prev = tips
                self.remove_tips()
                tips = self._visible_tips
                self.stats.passes += 1
                self.tip_removal = join(self.tip_removal, tips)
                if not (((prev == 0 and tips > 0)
                         or (self.nb_tip_passes <= 2
                             or tips >= cutoff_events))
                        and self.nb_tip_passes < 20):
                    break

        # one bulge round then one EC round before looping each
        if do_bulges:
            self.remove_bulges()
            self.stats.passes += 1
            self.bubble_removal = join(self.bubble_removal, 0)
        if do_ec:
            self.remove_erroneous_connections()
            self.stats.passes += 1
            self.ec_removal = join(self.ec_removal, 0)

        if do_bulges:
            while True:  # visible count 0: runs until nb passes > 2
                self.remove_bulges()
                self.stats.passes += 1
                self.bubble_removal = join(self.bubble_removal, 0)
                if not (self.nb_bulge_passes <= 2
                        and self.nb_bulge_passes < 20):
                    break

        if do_ec:
            while True:
                self.remove_erroneous_connections()
                self.stats.passes += 1
                self.ec_removal = join(self.ec_removal, 0)
                if not (self.nb_ec_passes <= 2
                        and self.nb_ec_passes < 20):
                    break

        # final mixed rounds (Simplifications.cpp:186-214): with the
        # visible bulge/EC counters pinned to 0, the loop continues only
        # while a pass removes >= cutoffEvents single-kmer tips
        if do_tips and do_bulges and do_ec:
            while True:
                self.remove_tips()
                tips = self._visible_tips
                self.remove_bulges()
                self.remove_erroneous_connections()
                self.stats.passes += 3
                self.tip_removal = join(self.tip_removal, tips)
                self.bubble_removal = join(self.bubble_removal, 0)
                self.ec_removal = join(self.ec_removal, 0)
                if not (tips >= cutoff_events
                        and self.nb_tip_passes < 30):
                    break
        return self.stats
