"""Pallas TPU kernel: in-VMEM bitonic sort of (hi, lo) uint32 key pairs.

XLA's `lax.sort` on TPU round-trips HBM between comparator stages; for
per-batch counting sorts (~0.5M rows, 4MB) the whole array fits in VMEM,
so this kernel runs the full bitonic network on-chip: all 190 stages for
2^19 rows touch only VMEM.

Layout: the flat index i = r * 128 + c maps to sublane r, lane c.
A bitonic stage with partner distance j uses:
  - j < 128: lane-dimension exchange via pltpu.roll(axis=1) by +-j
    (within a 128-lane group, i^j == i+-j without wrap)
  - j >= 128: sublane-dimension exchange via pltpu.roll(axis=0) by
    +-(j/128)
Direction bits come from broadcasted iotas over (rows, lanes).

Keys ascend; callers encode invalid rows as all-ones sentinels
(ops/sortops.py convention). Rows must be a power of two.

STATUS (round 1): algorithmically verified (interpret mode matches
np.sort for all tested sizes) but NOT yet wired into production — the
Mosaic compile of the unrolled roll-heavy network is pathologically slow
through this environment's remote-compile service (>9 min for 105
stages). Round-2 plan: restructure as a grid of small-tile sorts plus
XLA elementwise inter-tile bitonic-merge stages (each inter-tile stage
is a cheap fused compare-exchange, not a sort), which keeps every Mosaic
program tiny.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _lex_lt(ah, al, bh, bl):
    return (ah < bh) | ((ah == bh) & (al < bl))


def _bitonic_kernel(hi_ref, lo_ref, out_hi_ref, out_lo_ref, *, n: int):
    rows = n // LANES
    hi = hi_ref[:]
    lo = lo_ref[:]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    idx = row_ids * LANES + col_ids

    K = 2
    while K <= n:
        j = K // 2
        while j >= 1:
            if j < LANES:
                # negative shifts unsupported: -j == LANES - j cyclically
                down_hi = pltpu.roll(hi, LANES - j, 1)
                down_lo = pltpu.roll(lo, LANES - j, 1)
                up_hi = pltpu.roll(hi, j, 1)
                up_lo = pltpu.roll(lo, j, 1)
            else:
                s = j // LANES
                down_hi = pltpu.roll(hi, rows - s, 0)
                down_lo = pltpu.roll(lo, rows - s, 0)
                up_hi = pltpu.roll(hi, s, 0)
                up_lo = pltpu.roll(lo, s, 0)
            low_half = (idx & j) == 0  # partner is at i + j
            p_hi = jnp.where(low_half, down_hi, up_hi)
            p_lo = jnp.where(low_half, down_lo, up_lo)

            lt = _lex_lt(hi, lo, p_hi, p_lo)
            eq = (hi == p_hi) & (lo == p_lo)
            # self <= partner from the low side keeps min there
            take_min = low_half ^ ((idx & K) != 0)
            # keep = (want min and self<=partner) or (want max and
            # self>=partner); ties keep self. Pure logical ops — Mosaic
            # rejects select_n between booleans (i8->i1 truncation).
            self_is_min = lt | eq
            keep = (take_min & self_is_min) | (~take_min & ~lt)
            hi = jnp.where(keep, hi, p_hi)
            lo = jnp.where(keep, lo, p_lo)
            j //= 2
        K *= 2

    out_hi_ref[:] = hi
    out_lo_ref[:] = lo


# ---------------------------------------------------------------------------
# Round-2 production kernel: tiled bitonic sort with ROLLED stage loops.
#
# The round-1 kernel above unrolls every compare-exchange stage into the
# Mosaic program (O(log^2 n) stages -> pathological remote compiles). This
# version keeps the Mosaic program tiny: ONE stage body inside
# fori_loop/while_loop with *dynamic* roll shifts (pltpu.roll accepts traced
# shift amounts), gridded over VMEM-sized tiles. Inter-tile merge stages run
# as cheap fused XLA compare-exchanges (elementwise min/max over reshaped
# views) — a bitonic MERGE per level, not a sort.
#
# Supports any number of uint32 limb planes (big-endian lex order ==
# LargeInt integer order, ops/kmer_ops.py docstring).
# ---------------------------------------------------------------------------


def _lex_lt_limbs(a, b):
    """a < b lexicographically over tuples of same-shape uint32 arrays."""
    lt = jnp.zeros(a[0].shape, bool)
    eq = jnp.ones(a[0].shape, bool)
    for aj, bj in zip(a, b):
        lt = lt | (eq & (aj < bj))
        eq = eq & (aj == bj)
    return lt, eq


def _stage_exchange(j, big_k, limbs, idx, rows):
    """One bitonic compare-exchange stage over (rows, LANES) planes.

    j: traced partner distance; big_k: traced direction period (0 => all
    comparisons ascending, the merge case); idx: flat element index grid.
    """
    is_lane = j < LANES
    jl = jnp.where(is_lane, j, 0)
    jr = jnp.where(is_lane, 0, j // LANES)
    dn_l = jnp.where(is_lane, (LANES - jl) % LANES, 0)
    dn_r = jnp.where(is_lane, 0, (rows - jr) % rows)

    def both(x, lane_s, row_s):
        x = pltpu.roll(x, lane_s, 1)
        return pltpu.roll(x, row_s, 0)

    down = tuple(both(x, dn_l, dn_r) for x in limbs)   # value at i + j
    up = tuple(both(x, jl, jr) for x in limbs)         # value at i - j
    low_half = (idx & j) == 0
    partner = tuple(jnp.where(low_half, d, u) for d, u in zip(down, up))
    lt, eq = _lex_lt_limbs(limbs, partner)
    take_min = low_half ^ ((idx & big_k) != 0)
    self_is_min = lt | eq
    keep = (take_min & self_is_min) | (~take_min & ~lt)
    return tuple(jnp.where(keep, x, p) for x, p in zip(limbs, partner))


def _tile_index_grid(rows):
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    return row_ids * LANES + col_ids


def _tile_sort_kernel(*refs, w: int, rows: int):
    """Full bitonic sort of one (rows, 128) tile of w uint32 limb planes.

    Stage loops are rolled: log2(n) outer fori_loop iterations, each with a
    while_loop halving j; every roll shift is a traced scalar, so the Mosaic
    program contains exactly one compare-exchange stage.
    """
    in_refs, out_refs = refs[:w], refs[w:]
    n = rows * LANES
    limbs = tuple(r[:] for r in in_refs)
    idx = _tile_index_grid(rows)
    log_n = n.bit_length() - 1

    def outer(a, limbs):
        big_k = jnp.int32(1) << a

        def cond(st):
            return st[0] >= 1

        def body(st):
            j, lm = st
            return j // 2, _stage_exchange(j, big_k, lm, idx, rows)

        _, limbs = jax.lax.while_loop(cond, body, (big_k // 2, limbs))
        return limbs

    limbs = jax.lax.fori_loop(1, log_n + 1, outer, limbs)
    for r, x in zip(out_refs, limbs):
        r[:] = x


def _tile_merge_kernel(*refs, w: int, rows: int):
    """Intra-tile tail of a bitonic merge level: stages j = tile/2 .. 1,
    uniform ascending direction (big_k = 0). Because j < tile and tiles are
    power-of-two aligned, every compare partner is inside the same tile, so
    all log2(tile) stages of a merge level below the tile size fuse into one
    VMEM-resident Mosaic sweep (instead of log2(tile) HBM round trips)."""
    in_refs, out_refs = refs[:w], refs[w:]
    limbs = tuple(r[:] for r in in_refs)
    idx = _tile_index_grid(rows)

    def cond(st):
        return st[0] >= 1

    def body(st):
        j, lm = st
        return j // 2, _stage_exchange(j, jnp.int32(0), lm, idx, rows)

    _, limbs = jax.lax.while_loop(
        cond, body, (jnp.int32(rows * LANES // 2), limbs))
    for r, x in zip(out_refs, limbs):
        r[:] = x


def _merge_sorted_runs(limbs, run: int, stop_j: int = 1,
                       style: str | None = None):
    """Bitonic merge level stages in XLA: pairs of adjacent ascending runs
    of length ``run`` -> compare-exchange stages j = run, run/2, ...,
    stop_j. With stop_j == 1 this completes the merge (ascending runs of
    2*run); with stop_j > 1 the remaining j < stop_j stages are left for
    the fused Pallas intra-tile sweep. Pure elementwise ops, no sort.

    Two equivalent stage formulations (same network, same values):

    - 'reshape' (CPU default): the (pairs, blocks, 2, j) strided view —
      fastest under XLA:CPU fusion, but on TPU the tiny trailing dims
      get padded to (8, 128) tiles, which blew a 1.09 GB stress-scale
      merge up to a 36 GB HLO-temp requirement (r5 OOM).
    - 'roll2d' (TPU default): planes viewed as (n/128, 128) — a stage's
      XOR partner (i+j for bit-j-clear lanes, i-j for bit-j-set) comes
      from one forward and one backward jnp.roll along the row axis
      (j >= 128) or the lane axis (j < 128); the lanes that would wrap
      across block boundaries are exactly the lanes using the other
      roll. Both dims stay tile-sized, so no layout padding.
    """
    n = limbs[0].shape[0]
    pairs = n // (2 * run)
    if style is None:
        style = "roll2d" if jax.default_backend() != "cpu" \
            and n % 128 == 0 else "reshape"
    # second run of each pair reversed -> bitonic sequence of length 2*run
    xs = []
    for x in limbs:
        v = x.reshape(pairs, 2, run)
        xs.append(jnp.concatenate([v[:, 0], v[:, 1, ::-1]], axis=1))
    stop_j = max(stop_j, 1)
    if style == "roll2d":
        L = 128
        rows = n // L
        x2 = [x.reshape(rows, L) for x in xs]
        row_idx = jax.lax.broadcasted_iota(jnp.uint32, (rows, 1), 0)
        lane_idx = jax.lax.broadcasted_iota(jnp.uint32, (1, L), 1)
        j = run
        while j >= stop_j:
            if j >= L:
                r = j // L
                is_lo = (row_idx & jnp.uint32(r)) == 0
                partner = tuple(jnp.where(is_lo,
                                          jnp.roll(x, -r, axis=0),
                                          jnp.roll(x, r, axis=0))
                                for x in x2)
            else:
                is_lo = (lane_idx & jnp.uint32(j)) == 0
                partner = tuple(jnp.where(is_lo,
                                          jnp.roll(x, -j, axis=1),
                                          jnp.roll(x, j, axis=1))
                                for x in x2)
            lt, _ = _lex_lt_limbs(tuple(x2), partner)
            # lo lane keeps min, hi lane keeps max: keep own value iff
            # (lo and a<p) or (hi and not a<p)
            keep = is_lo == lt
            x2 = [jnp.where(keep, a, p) for a, p in zip(x2, partner)]
            j //= 2
        return tuple(x.reshape(n) for x in x2)
    j = run
    while j >= stop_j:
        ys = [x.reshape(pairs, (2 * run) // (2 * j), 2, j) for x in xs]
        a = tuple(y[:, :, 0] for y in ys)
        b = tuple(y[:, :, 1] for y in ys)
        lt, _ = _lex_lt_limbs(a, b)
        xs = []
        for aj, bj in zip(a, b):
            lo = jnp.where(lt, aj, bj)
            hi = jnp.where(lt, bj, aj)
            xs.append(jnp.stack([lo, hi], axis=2).reshape(pairs, 2 * run))
        j //= 2
    return tuple(x.reshape(n) for x in xs)


def _pallas_tile_sweep(flat, kernel_body, w: int, rows: int, n_tiles: int,
                       interpret: bool):
    """Run a per-tile Mosaic kernel over all tiles of flat (N,) planes."""
    shaped = [x.reshape(n_tiles * rows, LANES) for x in flat]
    out = pl.pallas_call(
        functools.partial(kernel_body, w=w, rows=rows),
        grid=(n_tiles,),
        out_shape=tuple(jax.ShapeDtypeStruct((n_tiles * rows, LANES),
                                             jnp.uint32) for _ in range(w)),
        in_specs=[pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM) for _ in range(w)],
        out_specs=tuple(pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM)
                        for _ in range(w)),
        interpret=interpret,
    )(*shaped)
    if not isinstance(out, tuple):
        out = (out,)
    n = flat[0].shape[0]
    return tuple(x.reshape(n) for x in out)


@functools.partial(jax.jit, static_argnames=("tile_log2", "interpret",
                                              "fuse_merge"))
def sort_u32_limbs(limbs, tile_log2: int = 17, interpret: bool = False,
                   fuse_merge: bool = True):
    """Sort flat (N,) uint32 limb planes ascending by their big-endian lex
    order (== integer order of the concatenated value).

    N must be a power of two and a multiple of 128. Tiles of 2^tile_log2
    elements are fully sorted in VMEM by one small Mosaic program; each
    remaining inter-tile merge level runs its j >= tile cross-tile stages
    as fused XLA compare-exchanges and its ~tile_log2 intra-tile stages as
    ONE Pallas VMEM sweep (fuse_merge=True), cutting the level's HBM round
    trips from log2(2*run) to (log2(run) - tile_log2 + ~2). Invalid rows
    must be encoded as all-ones sentinels by the caller (sortops.py
    convention).
    """
    limbs = tuple(limbs)
    w = len(limbs)
    n = limbs[0].shape[0]
    if n & (n - 1):
        raise ValueError("sort_u32_limbs: size must be a power of two")
    tile = min(1 << tile_log2, n)
    if tile < LANES:
        raise ValueError("tile must be >= 128")
    rows = tile // LANES
    n_tiles = n // tile
    flat = _pallas_tile_sweep(limbs, _tile_sort_kernel, w, rows, n_tiles,
                              interpret)
    run = tile
    while run < n:
        if fuse_merge:
            # cross-tile stages j = run .. tile in XLA, then one fused
            # VMEM sweep for the tile_log2 intra-tile stages
            flat = _merge_sorted_runs(flat, run, stop_j=tile)
            flat = _pallas_tile_sweep(flat, _tile_merge_kernel, w, rows,
                                      n_tiles, interpret)
        else:
            flat = _merge_sorted_runs(flat, run)
        run *= 2
    return flat


@functools.partial(jax.jit, static_argnames=("interpret",))
def bitonic_sort_u64(hi: jnp.ndarray, lo: jnp.ndarray,
                     interpret: bool = False):
    """Sort flat (N,) uint32 (hi, lo) pairs ascending. N must be a
    power of two and a multiple of 128."""
    n = hi.shape[0]
    if n & (n - 1):
        raise ValueError("bitonic_sort_u64: size must be a power of two")
    rows = n // LANES
    hi2 = hi.reshape(rows, LANES)
    lo2 = lo.reshape(rows, LANES)
    out_hi, out_lo = pl.pallas_call(
        functools.partial(_bitonic_kernel, n=n),
        out_shape=(jax.ShapeDtypeStruct((rows, LANES), jnp.uint32),
                   jax.ShapeDtypeStruct((rows, LANES), jnp.uint32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(hi2, lo2)
    return out_hi.reshape(n), out_lo.reshape(n)
