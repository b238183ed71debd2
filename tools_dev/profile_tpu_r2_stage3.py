"""TPU profiling round 3: the composed bench program vs its parts,
with the binsearch reduce."""

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
                                       _binsearch_i32, _next_pow2)

K = 31
B = 4096
reads = make_dataset()
n_batches = reads.shape[0] // B
reads = reads[:n_batches * B]
read_len = reads.shape[1]
w = nb_limbs(K)
P = read_len - K + 1
n_rows = n_batches * B * P
CAP = _next_pow2(n_rows)
CAP_OUT = 1 << 21

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
    pad = CAP - n_rows
    if pad:
        flat = tuple(jnp.concatenate(
            [p, jnp.full((pad,), jnp.uint32(0xFFFFFFFF))]) for p in flat)
        fv = jnp.concatenate([fv, jnp.zeros((pad,), bool)])
    return flat, fv


@jax.jit
def prog_ext_sort(all_codes, salt):
    flat, fv = extract_all(all_codes, salt)
    enc = tuple(jnp.where(fv, p, jnp.uint32(0xFFFFFFFF)) for p in flat)
    out = jax.lax.sort(enc, num_keys=w)
    return tuple(jnp.sum(p) for p in out)


@jax.jit
def prog_full(all_codes, salt):
    flat, fv = extract_all(all_codes, salt)
    out_p, counts, n, ov = count_planes(flat, fv, spare_bits=True,
                                        cap_out=CAP_OUT, use_pallas=False)
    return (n, jnp.sum(counts), ov) + tuple(jnp.sum(p) for p in out_p)


rng = np.random.default_rng(0)
base = np.sort(rng.integers(0, 1 << 20, CAP).astype(np.uint64) * 37)
shi = jnp.asarray((base >> 32).astype(np.uint32))
slo = jnp.asarray((base & 0xFFFFFFFF).astype(np.uint32))


@jax.jit
def prog_reduce_binsearch(h, l, salt):
    planes = (h + 0 * salt, l)
    inv = jnp.zeros((CAP,), bool)
    out_p, counts, n, ov = count_sorted_planes(planes, inv, cap_out=CAP_OUT)
    return n, jnp.sum(counts), jnp.sum(out_p[0]), jnp.sum(out_p[1])


@jax.jit
def prog_binsearch_only(h, l, salt):
    neq = (h[1:] != h[:-1]) | (l[1:] != l[:-1])
    starts = jnp.concatenate([jnp.ones((1,), bool), neq])
    sid = jnp.cumsum(starts.astype(jnp.int32)) + salt.astype(jnp.int32) * 0
    rid = sid - 1
    targets = jax.lax.broadcasted_iota(jnp.int32, (CAP_OUT + 1,), 0)
    sp = _binsearch_i32(rid, targets)
    return jnp.sum(sp), sp[-1]


def timeit(name, fn, *args, trials=3):
    t0 = time.time()
    out = fn(*args, jnp.uint8(0))
    _ = [np.asarray(x) for x in (out if isinstance(out, tuple) else (out,))]
    t_compile = time.time() - t0
    best = None
    for t in range(trials):
        t0 = time.time()
        out = fn(*args, jnp.uint8(t + 1))
        _ = [np.asarray(x)
             for x in (out if isinstance(out, tuple) else (out,))]
        el = time.time() - t0
        best = el if best is None else min(best, el)
    print(f"{name}: best={best*1000:.1f} ms (warmup {t_compile:.1f}s)",
          flush=True)


dataset = jnp.asarray(reads.reshape(n_batches, B, read_len))
np.asarray(jnp.sum(dataset))

timeit("ext+encode+laxsort", prog_ext_sort, dataset)
timeit("reduce_binsearch", prog_reduce_binsearch, shi, slo)
timeit("binsearch_only", prog_binsearch_only, shi, slo)
timeit("full_bench_program", prog_full, dataset)
