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
