"""Device-side k-mer extraction: rolling canonical k-mers + minimizers.

K-mers are represented as arrays of uint32 *limbs* in big-endian limb order
(most-significant limb first), ``W = ceil(2k/32)`` limbs per k-mer. With that
layout, lexicographic comparison over the limb axis equals integer comparison
of the underlying 2k-bit value, which is exactly gatb-core's LargeInt order
(LargeInt.hpp operator<) — so multi-key sorts reproduce reference sort order
for every k, with no 64-bit ALU needed on TPU.

Semantics matched bit-for-bit with gatb-core:
  - rolling forward update  v = ((v << 2) + c) & mask     (Model.hpp:824)
  - rolling revcomp update  r = (r >> 2) + rc(c)<<2(k-1)  (Model.hpp:936-944)
  - canonical = min(fwd, rev) as integers                 (Model.hpp:218-295)
  - k-mer valid iff its k nucleotides are all valid       (Model.hpp:725-770)
  - minimizer = min over m-mer windows of LUT(mmer) where
    LUT(x) = canon(x) if allowed else 4^m-1               (Model.hpp:1040-1065)
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .bitpack import mmer_allowed, revcomp_u32

U32 = jnp.uint32


def nb_limbs(k: int) -> int:
    """Number of uint32 limbs for a k-mer (ceil(2k/32))."""
    return (2 * k + 31) // 32


def top_mask(k: int) -> int:
    bits = (2 * k) % 32
    return 0xFFFFFFFF if bits == 0 else (1 << bits) - 1


def lex_lt(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Lexicographic a < b over the last (limb) axis. Big-endian limbs."""
    w = a.shape[-1]
    lt = jnp.zeros(a.shape[:-1], dtype=bool)
    eq = jnp.ones(a.shape[:-1], dtype=bool)
    for j in range(w):
        aj, bj = a[..., j], b[..., j]
        lt = lt | (eq & (aj < bj))
        eq = eq & (aj == bj)
    return lt


def lex_eq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == b, axis=-1)


def _shl2_add(limbs: jnp.ndarray, c: jnp.ndarray, k: int) -> jnp.ndarray:
    """(v << 2 | c) & kmer_mask over big-endian uint32 limbs.

    limbs: (..., W) uint32; c: (...) uint32 with values 0..3.
    """
    w = limbs.shape[-1]
    parts = []
    for j in range(w):
        hi = limbs[..., j] << 2
        lo = limbs[..., j + 1] >> 30 if j + 1 < w else c.astype(U32)
        parts.append(hi | lo)
    out = jnp.stack(parts, axis=-1)
    mask0 = U32(top_mask(k))
    out = out.at[..., 0].set(out[..., 0] & mask0)
    return out


def _shr2_insert(limbs: jnp.ndarray, rc: jnp.ndarray, k: int) -> jnp.ndarray:
    """(r >> 2) | rc << (2k-2) over big-endian uint32 limbs."""
    w = limbs.shape[-1]
    parts = []
    for j in range(w):
        lo = limbs[..., j] >> 2
        hi = limbs[..., j - 1] << 30 if j > 0 else jnp.zeros_like(lo)
        parts.append(hi | lo)
    out = jnp.stack(parts, axis=-1)
    bitpos = 2 * k - 2
    jins = w - 1 - bitpos // 32
    off = bitpos % 32
    out = out.at[..., jins].set(out[..., jins] | (rc.astype(U32) << off))
    return out


class KmerBatch(NamedTuple):
    """Extracted canonical k-mers for a padded batch of reads.

    kmers: (B, P, W) uint32 canonical k-mer limbs (garbage where invalid)
    valid: (B, P) bool — True iff all k bases of the window are ACGT and the
           window lies inside the read (P = L - k + 1 window positions)
    minimizer: (B, P) uint32 — LUT-mapped minimizer value of each k-mer
           (4^m - 1 when every m-mer of the window is banned)
    """

    kmers: jnp.ndarray
    valid: jnp.ndarray
    minimizer: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("k", "m"))
def extract_kmers(codes: jnp.ndarray, valid: jnp.ndarray, lengths: jnp.ndarray,
                  k: int, m: int = 10) -> KmerBatch:
    """Extract canonical k-mers + minimizers from a padded code batch.

    codes:   (B, L) uint8/int 2-bit codes (padding may be any value)
    valid:   (B, L) bool per-character validity (padding must be False)
    lengths: (B,) int32 true read lengths
    """
    B, L = codes.shape
    if L < k:
        raise ValueError(f"padded length {L} < k={k}")
    w = nb_limbs(k)
    codes = codes.astype(U32)
    P = L - k + 1

    # --- rolling fwd/rev scan over sequence positions ------------------
    def step(carry, c):
        fwd, rev = carry
        fwd = _shl2_add(fwd, c, k)
        rev = _shr2_insert(rev, c ^ U32(2), k)
        return (fwd, rev), (fwd, rev)

    # Derive the zero init from the input so it inherits any shard_map
    # varying-manual-axes (vma) tag; a literal zeros() carry fails to
    # typecheck against the varying scan outputs inside shard_map.
    zero = jnp.zeros((B, w), U32) + (codes[:, 0:1] & U32(0))
    init = (zero, zero)
    _, (fwds, revs) = jax.lax.scan(step, init, jnp.moveaxis(codes, 1, 0))
    # fwds: (L, B, W) — window ending at position t corresponds to kmer t-k+1
    fwds = jnp.moveaxis(fwds[k - 1:], 0, 1)  # (B, P, W)
    revs = jnp.moveaxis(revs[k - 1:], 0, 1)

    canon = jnp.where(lex_lt(fwds, revs)[..., None], fwds, revs)

    # --- validity: all k chars valid and window inside read ------------
    inval = (~valid).astype(jnp.int32)
    cum = jnp.cumsum(inval, axis=1)
    cum = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), cum], axis=1)
    window_bad = cum[:, k:] - cum[:, :P]
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, P), 1)
    inside = pos + k <= lengths[:, None]
    kvalid = (window_bad == 0) & inside

    # --- minimizers ----------------------------------------------------
    minim = _minimizers(codes, k, m)  # (B, P)

    return KmerBatch(canon, kvalid, minim)


def _minimizers(codes: jnp.ndarray, k: int, m: int) -> jnp.ndarray:
    """Per-kmer minimizer values (windowed min of LUT-mapped m-mers)."""
    B, L = codes.shape
    P = L - k + 1
    nmm = L - m + 1
    # m-mer value at each position: polynomial of m consecutive codes.
    mm = jnp.zeros((B, nmm), U32)
    for i in range(m):
        mm = (mm << 2) | codes[:, i:i + nmm].astype(U32)
    # LUT semantics (Model.hpp:1040-1065): canonicalize then ban.
    rc = revcomp_u32(mm, m)
    canon = jnp.minimum(mm, rc)
    mask_m = U32((1 << (2 * m)) - 1)
    lutv = jnp.where(mmer_allowed(canon, m), canon, mask_m)
    # windowed min over the k-m+1 m-mers of each k-mer window
    nwin = k - m + 1
    out = lutv[:, 0:P]
    for i in range(1, nwin):
        out = jnp.minimum(out, lutv[:, i:i + P])
    return out


def kmers_to_py(limbs) -> list[int]:
    """Convert (N, W) uint32 limb array to Python ints (host/debug)."""
    import numpy as np

    limbs = np.asarray(limbs, dtype=np.uint64)
    n, w = limbs.shape
    out = np.zeros(n, dtype=object)
    for j in range(w):
        out = (out * (1 << 32)) + limbs[:, j]
    return list(out)


def py_to_limbs(values, k: int):
    """Convert iterable of Python ints to (N, W) uint32 limb array."""
    import numpy as np

    w = nb_limbs(k)
    vals = list(values)
    out = np.zeros((len(vals), w), dtype=np.uint32)
    for i, v in enumerate(vals):
        for j in range(w - 1, -1, -1):
            out[i, j] = v & 0xFFFFFFFF
            v >>= 32
    return out
