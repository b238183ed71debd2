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
        # RCTC test for the rest — vectorized over the candidate array
        rctc_cand = np.nonzero(cand & ~short_topo & short_rctc)[0]
        if len(rctc_cand):
            ends = np.where(deg_f[rctc_cand] > 0, 2 * rctc_cand,
                            2 * rctc_cand + 1)
            ok = self._satisfy_rctc_batch(
                ug, ends, ug.mean_abundance[rctc_cand].astype(np.float64),
                self.TIP_RCTC_CUTOFF)
            is_tip[rctc_cand[ok]] = True

        n_removed = int(is_tip.sum())
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
        from .graph import _adjacency_kernel
        from .graph_unitigs import link_unitigs
        import jax.numpy as jnp

        n = len(limbs)
        adj = np.zeros(n, np.uint8)
        if n:
            csize = min(1 << 15, n)
            table = jnp.asarray(limbs)
            for i in range(0, n, csize):
                part = limbs[i:i + csize]
                npart = len(part)
                if npart < csize:
                    part = np.concatenate(
                        [part, np.zeros((csize - npart, limbs.shape[1]),
                                        np.uint32)])
                adj[i:i + npart] = np.asarray(_adjacency_kernel(
                    jnp.asarray(part), table, self.k, n))[:npart]
        us = build_unitigs(limbs, counts, adj, self.k)
        ug = link_unitigs(limbs, us, self.k)
        self._live_index = np.nonzero(self._live())[0]
        return us, ug

    def _satisfy_rctc_batch(self, ug: UnitigGraph, ends: np.ndarray,
                            path_abundance: np.ndarray,
                            cutoff: float) -> np.ndarray:
        """Vectorized satisfyRCTC over an array of oriented ends
        (satisfyRCTC, Simplifications.cpp:320-371; the neighbor-mean is
        getMeanAbundanceOfNeighbors, :216-260). Same semantics as the
        scalar `_satisfy_rctc` but evaluated for all queries at once via
        CSR expansions — no per-candidate Python recursion."""
        q = len(ends)
        if q == 0:
            return np.zeros(0, bool)
        deg = np.diff(ug.link_offsets)
        ab = np.asarray(ug.mean_abundance, np.float64)
        path_u = ends >> 1                       # (Q,) unitig to exclude

        # level 1: branching nodes b = out_links(end) for each query
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

        # level 2: neighbors of each b over both orientations (b, b^1)
        src = np.concatenate([bflat, bflat ^ 1])  # (2B,)
        parent = np.concatenate([np.arange(nb_b), np.arange(nb_b)])
        ncnt = deg[src]
        nb_t = int(ncnt.sum())
        if nb_t:
            within2 = np.arange(nb_t) - np.repeat(
                np.cumsum(ncnt) - ncnt, ncnt)
            tflat = ug.link_targets[
                np.repeat(ug.link_offsets[src], ncnt) + within2]
            tparent = np.repeat(parent, ncnt)     # (T,) owner b-entry
            keep = (tflat >> 1) != path_u[qidx[tparent]]
            sums = np.bincount(tparent[keep],
                               weights=ab[tflat[keep] >> 1],
                               minlength=nb_b)
            cnts = np.bincount(tparent[keep], minlength=nb_b)
        else:
            sums = np.zeros(nb_b)
            cnts = np.zeros(nb_b, np.int64)
        # b's own abundance always contributes (scalar: nb.append(ab[b]))
        sums += ab[bflat >> 1]
        cnts = cnts + 1
        mean_b = sums / cnts                      # (B,) per-branching mean

        total = np.bincount(qidx, weights=mean_b, minlength=q)
        mean_neighbors = np.divide(
            total, bcnt, out=np.zeros(q), where=bcnt > 0)
        ok = (bcnt > 0) & (mean_neighbors > cutoff * path_abundance)
        return ok

    def _satisfy_rctc(self, ug: UnitigGraph, oriented_end: int,
                      path_abundance: float, cutoff: float) -> bool:
        """RCTC: mean coverage of the neighbors-of-branching-nodes
        > cutoff * path abundance (satisfyRCTC, Simplifications.cpp:320-371)."""
        branching = ug.out_links(oriented_end)
        if len(branching) == 0:
            return False
        total = 0.0
        for b in branching:
            # mean abundance of b's *other* neighbors (both directions),
            # excluding the path unitig itself
            nb = []
            for s in (b, b ^ 1):
                for t in ug.out_links(s):
                    if (t >> 1) != (oriented_end >> 1):
                        nb.append(ug.mean_abundance[t >> 1])
            nb.append(ug.mean_abundance[b >> 1])
            total += float(np.mean(nb)) if nb else 0.0
        mean_neighbors = total / len(branching)
        return mean_neighbors > cutoff * path_abundance

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

        deg = ug.out_degree_oriented()
        deg_f = deg[0::2]
        deg_r = deg[1::2]
        lens = np.asarray(ug.unitig_lengths())
        max_ec = int(k * self.EC_LEN_KMULT)

        cand = (deg_f >= 1) & (deg_r >= 1) & (lens <= max_ec)
        is_ec = np.zeros(ug.nb_unitigs, bool)
        cidx = np.nonzero(cand)[0]
        if len(cidx):
            # both oriented ends must satisfy RCTC — one batched eval
            ab = ug.mean_abundance[cidx].astype(np.float64)
            ok_f = self._satisfy_rctc_batch(ug, 2 * cidx, ab,
                                            self.EC_RCTC_CUTOFF)
            ok_r = self._satisfy_rctc_batch(ug, 2 * cidx + 1, ab,
                                            self.EC_RCTC_CUTOFF)
            is_ec[cidx[ok_f & ok_r]] = True

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

        deg = ug.out_degree_oriented()
        lens = np.asarray(ug.unitig_lengths(), np.int64)
        max_bulge = max(int(k * self.BULGE_LEN_KMULT),
                        k + self.BULGE_LEN_KADD)
        backtrack = k + self.BULGE_ALTPATH_KADD

        # candidate bulge: short (> k bases, <= maxBulgeLength) unitig,
        # single in/out links; the reference additionally checks the end
        # node is doubly connected (indegree > 1) — implied here by the
        # alternative path reaching the same target
        cand = (lens > k) & (lens <= max_bulge) \
            & (deg[0::2] == 1) & (deg[1::2] == 1)
        is_bulge = np.zeros(ug.nb_unitigs, bool)
        for ui in np.nonzero(cand)[0]:
            # endpoints: pred (via reverse end) and succ (via forward end)
            succ = ug.out_links(2 * ui)[0]
            pred_rev = ug.out_links(2 * ui + 1)[0]
            start = pred_rev ^ 1   # oriented unitig that enters ui forward
            target = succ
            # SPAdes maxlen: max(1.1*pathLen, pathLen+3) extensions
            # (removeBulges, Simplifications.cpp:1474)
            path_len = int(lens[ui]) - k  # nb extensions of the bulge path
            maxlen = max(int(path_len * 1.1), path_len + 3)
            alt_cov = self._hmcp_unitigs(ug, start, target, avoid=ui,
                                         maxlen=maxlen,
                                         backtrack_limit=backtrack)
            # accept: bulge coverage <= alt coverage * 1.1
            # (Simplifications.cpp:1525)
            if alt_cov is not None and \
                    float(ug.mean_abundance[ui]) \
                    <= alt_cov * self.BULGE_ALTPATH_COVMULT:
                is_bulge[ui] = True

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
        1034-1230): greedy descent in decreasing simple-path abundance
        with bounded backtracking (nbCalls, a base budget), loop abort,
        depth budget in extensions, and the length-weighted chain mean
        (unitigs_chain2abundance, :665-680; single-kmer unitigs contribute
        nothing, mirroring the pathLen > 0 guard at :1098).
        Returns the mean coverage of the found path, or None."""
        k = self.k
        state = {"calls": 0, "failed": False}

        ulens = np.asarray(ug.unitig_lengths())

        def ulen(t):  # nb extensions of unitig t's simple path
            return int(ulens[t >> 1]) - k

        def rec(node, budget, visited, lens_, covs_):
            if budget < -1 or state["failed"]:
                return None
            nbrs = sorted(ug.out_links(node),
                          key=lambda t: -float(ug.mean_abundance[t >> 1]))
            for t in nbrs:
                if (t >> 1) == avoid and node == start:
                    continue
                if t == target:
                    total = sum(lens_)
                    if total == 0:
                        return None  # NaN mean in the reference: rejected
                    return sum(l * c for l, c in zip(lens_, covs_)) / total
                if (t >> 1) in visited:  # loop: abort the whole search
                    state["failed"] = True
                    return None
                tl = ulen(t)
                state["calls"] += tl + 1
                nl = lens_ + [tl] if tl > 0 else lens_
                nc = covs_ + [float(ug.mean_abundance[t >> 1])] \
                    if tl > 0 else covs_
                got = rec(t, budget - (tl + 1), visited | {t >> 1}, nl, nc)
                if state["calls"] >= backtrack_limit:  # HMCP_MAX_DEPTH
                    state["failed"] = True
                    return got
                if got is not None or state["failed"]:
                    return got
            return None

        return rec(start, maxlen, {start >> 1}, [], [])

    # ------------------------------------------------------------------
    def simplify(self, do_tips: bool = True, do_bulges: bool = True,
                 do_ec: bool = True) -> SimplifyStats:
        """Full orchestration — the reference's exact pass schedule
        (Simplifications::simplify, Simplifications.cpp:111-215):
        tip rounds to quiescence, ONE bulge round, ONE EC round (bulge
        removal gets much faster after EC), then bulge rounds, EC
        rounds, then mixed rounds — with the reference's per-stage loop
        conditions and the `n + n + ...` removal report strings."""
        nb_nodes = self.graph.nb_nodes
        cutoff_events = max(nb_nodes // 10000, 1)

        def join(s, n):
            return (s + " + " if s else s) + str(n)

        tips = bubbles = ec = 0
        if do_tips:
            while True:
                prev, tips = tips, self.remove_tips()
                self.stats.passes += 1
                self.tip_removal = join(self.tip_removal, tips)
                if not (((prev == 0 and tips > 0)
                         or (self.nb_tip_passes <= 2
                             or tips >= cutoff_events))
                        and self.nb_tip_passes < 20):
                    break

        # one bulge round then one EC round before looping each
        if do_bulges:
            bubbles = self.remove_bulges()
            self.stats.passes += 1
            self.bubble_removal = join(self.bubble_removal, bubbles)
        if do_ec:
            ec = self.remove_erroneous_connections()
            self.stats.passes += 1
            self.ec_removal = join(self.ec_removal, ec)

        if do_bulges:
            while True:
                prev, bubbles = bubbles, self.remove_bulges()
                self.stats.passes += 1
                self.bubble_removal = join(self.bubble_removal, bubbles)
                if not (((prev == 0 and bubbles > 0)
                         or (self.nb_bulge_passes <= 2
                             or bubbles >= cutoff_events))
                        and self.nb_bulge_passes < 20):
                    break

        if do_ec:
            while True:
                prev, ec = ec, self.remove_erroneous_connections()
                self.stats.passes += 1
                self.ec_removal = join(self.ec_removal, ec)
                if not (((prev == 0 and ec > 0)
                         or (self.nb_ec_passes <= 2
                             or ec >= cutoff_events))
                        and self.nb_ec_passes < 20):
                    break

        # final mixed rounds (Simplifications.cpp:186-214)
        if do_tips and do_bulges and do_ec:
            ec = 0
            while True:
                tips = self.remove_tips()
                bubbles = self.remove_bulges()
                prev_ec, ec = ec, self.remove_erroneous_connections()
                self.stats.passes += 3
                self.tip_removal = join(self.tip_removal, tips)
                self.bubble_removal = join(self.bubble_removal, bubbles)
                self.ec_removal = join(self.ec_removal, ec)
                if not (((prev_ec == 0 and ec > 0)
                         or (ec >= cutoff_events or tips >= cutoff_events
                             or bubbles >= cutoff_events))
                        and self.nb_tip_passes < 30):
                    break
        return self.stats
