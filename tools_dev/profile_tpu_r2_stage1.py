"""Stage-level TPU timing for the counting pipeline (not a test).

Times, best-of-3 with salt-chained inputs (tunnel caches identical
(program, input) executions):
  A. dataset upload (host->device)
  B. extraction only
  C. extraction + pallas sort
  D. extraction + pallas sort + reduce   (the bench program)
  E. extraction + lax.sort + reduce      (XLA sort baseline)
  F. pallas sort alone on random planes
"""

import os
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))

import numpy as np
import jax
import jax.numpy as jnp

from bench import make_dataset
from gatb_core_tpu.ops.kmer_ops import extract_kmers, nb_limbs
from gatb_core_tpu.ops.sortops import (count_planes, count_sorted_planes,
                                       _next_pow2, _pallas_tile_log2)
from gatb_core_tpu.ops.pallas_sort import sort_u32_limbs

K = 31
B = 4096
reads = make_dataset()
n_batches = reads.shape[0] // B
reads = reads[:n_batches * B]
read_len = reads.shape[1]
w = nb_limbs(K)
P = read_len - K + 1
n_rows = n_batches * B * P
cap = _next_pow2(n_rows)
print(f"rows={n_rows} cap={cap} w={w}")

jvalid = jnp.ones((B, read_len), bool)
jlengths = jnp.full((B,), read_len, jnp.int32)


def extract_all(all_codes, salt):
    all_codes = (all_codes + salt) & 3

    def ext(codes):
        kb = extract_kmers(codes, jvalid, jlengths, K, with_minimizers=False)
        return (tuple(kb.kmers[..., j].reshape(-1) for j in range(w)),
                kb.valid.reshape(-1))

    planes, val = jax.lax.map(ext, all_codes)
    flat = tuple(p.reshape(-1) for p in planes)
    fv = val.reshape(-1)
    pad = cap - n_rows
    if pad:
        flat = tuple(jnp.concatenate(
            [p, jnp.full((pad,), jnp.uint32(0xFFFFFFFF))]) for p in flat)
        fv = jnp.concatenate([fv, jnp.zeros((pad,), bool)])
    return flat, fv


@jax.jit
def prog_extract(all_codes, salt):
    flat, fv = extract_all(all_codes, salt)
    return tuple(jnp.sum(p) for p in flat) + (jnp.sum(fv),)


@jax.jit
def prog_sort(all_codes, salt):
    flat, fv = extract_all(all_codes, salt)
    enc = tuple(jnp.where(fv, p, jnp.uint32(0xFFFFFFFF)) for p in flat)
    out = sort_u32_limbs(enc, tile_log2=_pallas_tile_log2(cap, w))
    return tuple(jnp.sum(p) for p in out)


@jax.jit
def prog_full(all_codes, salt):
    flat, fv = extract_all(all_codes, salt)
    out_p, counts, n, ov = count_planes(flat, fv, spare_bits=True,
                                        cap_out=1 << 21)
    return (n, jnp.sum(counts), ov) + tuple(jnp.sum(p) for p in out_p)


@jax.jit
def prog_full_laxsort(all_codes, salt):
    flat, fv = extract_all(all_codes, salt)
    out_p, counts, n, ov = count_planes(flat, fv, spare_bits=True,
                                        cap_out=1 << 21, use_pallas=False)
    return (n, jnp.sum(counts), ov) + tuple(jnp.sum(p) for p in out_p)


@jax.jit
def prog_sort_only(planes, salt):
    enc = tuple((p + salt).astype(jnp.uint32) for p in planes)
    out = sort_u32_limbs(enc, tile_log2=_pallas_tile_log2(cap, w))
    return tuple(jnp.sum(p) for p in out)


def timeit(name, fn, *args, trials=3):
    # warmup/compile
    t0 = time.time()
    out = fn(*args, jnp.uint8(0))
    _ = [np.asarray(x) for x in out]
    t_compile = time.time() - t0
    best = None
    for t in range(trials):
        t0 = time.time()
        out = fn(*args, jnp.uint8(t + 1))
        _ = [np.asarray(x) for x in out]
        el = time.time() - t0
        best = el if best is None else min(best, el)
    print(f"{name}: best={best*1000:.1f} ms (warmup {t_compile:.1f}s)  "
          f"-> {n_batches * B / best:,.0f} reads/s", flush=True)
    return best


t0 = time.time()
dataset = jnp.asarray(reads.reshape(n_batches, B, read_len))
np.asarray(jnp.sum(dataset))  # force upload
print(f"A upload+sum: {time.time()-t0:.2f}s", flush=True)

rng = np.random.default_rng(0)
rnd = tuple(jnp.asarray(rng.integers(0, 1 << 32, cap, dtype=np.uint32))
            for _ in range(w))

timeit("B extract", prog_extract, dataset)
timeit("F sort_only", prog_sort_only, rnd)
timeit("C extract+sort", prog_sort, dataset)
timeit("D full(pallas)", prog_full, dataset)
timeit("E full(lax.sort)", prog_full_laxsort, dataset)
