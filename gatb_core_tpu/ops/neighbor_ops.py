"""Neighbor-candidate ops: batched de Bruijn adjacency for limb kmers.

Reference semantics (debruijn/impl/Graph.cpp getItems_visitor:1168-1390):
for a node with forward strand value f (and revcomp r), the 8 neighbor
candidates are
    out(nt):  canonical( ((f<<2)|nt) & mask ,  (r>>2) | rc(nt)<<2(k-1) )
    in(nt):   canonical( (f>>2) | nt<<2(k-1) , ((r<<2)|rc(nt)) & mask  )
membership of each candidate in the graph gives the 8-bit adjacency mask
(4 out bits then 4 in bits, like precomputeAdjacency, Graph.cpp:3508-3610).

All ops vectorized over (N, W) uint32 big-endian limb arrays.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .kmer_ops import lex_lt, nb_limbs, top_mask

U32 = jnp.uint32


def revcomp_limbs(limbs: jnp.ndarray, k: int) -> jnp.ndarray:
    """Reverse complement of (N, W) big-endian uint32 limb kmers."""
    w = limbs.shape[-1]
    # 1) reverse 2-bit fields within each limb + complement
    x = limbs
    x = ((x >> 2) & U32(0x33333333)) | ((x & U32(0x33333333)) << 2)
    x = ((x >> 4) & U32(0x0F0F0F0F)) | ((x & U32(0x0F0F0F0F)) << 4)
    x = ((x >> 8) & U32(0x00FF00FF)) | ((x & U32(0x00FF00FF)) << 8)
    x = (x >> 16) | (x << 16)
    x = x ^ U32(0xAAAAAAAA)
    # 2) reverse limb order: the 32W-bit word is now the pair-reversed
    #    complement, i.e. rc << (32W - 2k)
    x = x[..., ::-1]
    # 3) shift right by the slack (static, < 32)
    s = 32 * w - 2 * k
    if s:
        parts = []
        for j in range(w):
            lo = x[..., j] >> s
            hi = x[..., j - 1] << (32 - s) if j > 0 else jnp.zeros_like(lo)
            parts.append(hi | lo)
        x = jnp.stack(parts, axis=-1)
    return x


def shl2_or(limbs: jnp.ndarray, c: jnp.ndarray, k: int) -> jnp.ndarray:
    """((v << 2) | c) & mask for (N, W) limbs, c: (N,) codes."""
    w = limbs.shape[-1]
    parts = []
    for j in range(w):
        hi = limbs[..., j] << 2
        lo = limbs[..., j + 1] >> 30 if j + 1 < w else c.astype(U32)
        parts.append(hi | lo)
    out = jnp.stack(parts, axis=-1)
    return out.at[..., 0].set(out[..., 0] & U32(top_mask(k)))


def shr2_or_top(limbs: jnp.ndarray, c: jnp.ndarray, k: int) -> jnp.ndarray:
    """(v >> 2) | c << 2(k-1) for (N, W) limbs."""
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
    return out.at[..., jins].set(out[..., jins] | (c.astype(U32) << off))


def canonical_limbs(fwd: jnp.ndarray, rev: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(lex_lt(fwd, rev)[..., None], fwd, rev)


@functools.partial(jax.jit, static_argnames=("k",))
def neighbor_candidates(nodes: jnp.ndarray, k: int) -> jnp.ndarray:
    """All 8 canonical neighbor candidates of each node.

    nodes: (N, W) canonical kmer limbs.
    Returns (N, 8, W): [:, 0:4] out-neighbors by nt, [:, 4:8] in-neighbors.
    """
    n, w = nodes.shape
    f = nodes
    r = revcomp_limbs(nodes, k)
    cands = []
    for nt in range(4):
        c = jnp.full((n,), nt, U32)
        rc = c ^ U32(2)
        out_f = shl2_or(f, c, k)
        out_r = shr2_or_top(r, rc, k)
        cands.append(canonical_limbs(out_f, out_r))
    for nt in range(4):
        c = jnp.full((n,), nt, U32)
        rc = c ^ U32(2)
        in_f = shr2_or_top(f, c, k)
        in_r = shl2_or(r, rc, k)
        cands.append(canonical_limbs(in_f, in_r))
    return jnp.stack(cands, axis=1)


def extend_right(nodes_fwd: jnp.ndarray, nt: jnp.ndarray, k: int,
                 nodes_rev: jnp.ndarray | None = None):
    """(fwd, rev) of the right-extension of a strand-oriented kmer."""
    if nodes_rev is None:
        nodes_rev = revcomp_limbs(nodes_fwd, k)
    f = shl2_or(nodes_fwd, nt, k)
    r = shr2_or_top(nodes_rev, nt ^ U32(2), k)
    return f, r
