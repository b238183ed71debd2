"""[NEGATIVE RESULT kept as an experiment record; not part of the package.]

Columnsort (Leighton 1985): a global sort built from batched
minor-axis sorts + regular permutations — the TPU-native large-array
sort.

XLA's `lax.sort` of a flat N-row array is a bitonic network with
O(log^2 N) compare-exchange passes; measured 94.3 ms for 23.6M (hi, lo)
keys on v5e (BASELINE.md round 3). Batched minor-axis sorts of the SAME
total data run ~an order of magnitude cheaper per element (the whole
row network stays VMEM-resident). Columnsort composes a total sort out
of exactly 4 such batched sorts plus 2 transposes and a half-column
shift (concat/slice), with the classic correctness condition
r >= 2*(s-1)^2 for an (r x s) matrix.

Layout here: planes are flat (N,) uint32 limb arrays (big-endian lex
order == integer order); the matrix lives as (s, r) with each ROW a
column of the conceptual (r x s) matrix, so "sort each column" is ONE
`lax.sort(..., dimension=1)`. The final sorted sequence is the
column-major order of the matrix == plain row-major flattening of the
(s, r) array — no final transpose.

KEYS-ONLY contract: every plane is a key (num_keys == len(planes)).
The shift step's -inf/+inf fillers are all-zeros / all-ones key rows;
with payload planes a filler could tie with a real row and swap
payloads, so payload-carrying sorts must keep using lax.sort.

Replaces the role of the reference's per-partition radix+std::sort
(PartitionsCommand.cpp:1474-1505) at the whole-superbatch scale.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

U32 = jnp.uint32

# minimum size where the 4-pass structure beats one lax.sort (measured:
# batched sorts win big at >= 2^22; below that lax.sort's constant is fine)
MIN_COLSORT_ROWS = 1 << 22
_S = 128  # column count: r = N/s must satisfy r >= 2*(s-1)^2


def colsort_shape(n: int, s: int | None = None):
    """(r, s, n_padded) for an n-row columnsort, r a multiple of s.

    Returns None when the r >= 2*(s-1)^2 condition cannot hold (too
    small) — the caller falls back to lax.sort.
    """
    if s is None:
        s = _S  # read at call time (tests shrink it to force the path)
    r = s * (-(-n // (s * s)))  # ceil to a multiple of s*s overall
    if r < 2 * (s - 1) * (s - 1):
        return None
    return r, s, r * s


def columnsort_planes(planes, s: int | None = None):
    """Sort flat (N,) uint32 key planes ascending (lex over the tuple).

    All planes are keys. N is padded internally to r*s with all-ones
    sentinel rows (they sort to the tail); output planes keep the padded
    length — callers slice [:N] or rely on sentinel semantics.
    """
    if s is None:
        s = _S
    planes = tuple(planes)
    n = planes[0].shape[0]
    shape = colsort_shape(n, s)
    if shape is None:
        return jax.lax.sort(planes, num_keys=len(planes))
    r, s, n_pad = shape
    nk = len(planes)
    if n_pad != n:
        pad = n_pad - n
        planes = tuple(jnp.concatenate(
            [p, jnp.full((pad,), U32(0xFFFFFFFF))]) for p in planes)

    def sort_rows(ps):
        out = jax.lax.sort(ps, dimension=1, num_keys=nk)
        return tuple(out) if isinstance(out, (tuple, list)) else (out,)

    # step 1: sort columns
    a = sort_rows(tuple(p.reshape(s, r) for p in planes))
    # step 2: "transpose": column-major sequence dealt row-major into r x s
    a = tuple(x.reshape(r, s).T for x in a)
    # step 3
    a = sort_rows(a)
    # step 4: untranspose (inverse of step 2)
    a = tuple(x.T.reshape(s, r) for x in a)
    # step 5
    a = sort_rows(a)
    # step 6: shift columns down by r/2 (half-column of -inf in front,
    # +inf behind, on the column-major sequence), re-split into s+1 cols
    half = r // 2
    shifted = []
    for x in a:
        fl = x.reshape(n_pad)
        fl = jnp.concatenate([jnp.zeros((half,), U32), fl,
                              jnp.full((half,), U32(0xFFFFFFFF))])
        shifted.append(fl.reshape(s + 1, r))
    # step 7
    b = sort_rows(tuple(shifted))
    # step 8: unshift — the sorted sequence is the column-major order
    out = tuple(x.reshape((s + 1) * r)[half:half + n_pad] for x in b)
    return out
