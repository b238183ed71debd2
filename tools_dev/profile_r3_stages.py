"""TPU profiling round 3: per-stage costs of the bench pipeline with
in-jit fori_loop repetition (REPS chained by data-dependent salts), so
the ~110-150ms tunnel round trip is amortized out of every number.

Stages:
  ext        extraction only (lax.map over 16k-read chunks)
  sort2      pure lax.sort of 2 uint32 planes, exact bench size
  sort2_p2   same at the padded power-of-two size (2^25)
  ext_sort   extraction + sort (checks fusion overlap)
  runstats   sorted planes -> run stats + cumw + END-ROW checksum
             (reduce WITHOUT the compaction sort)
  full_cur   current production pipeline (count_planes w/ compaction)
Run: python tools_dev/profile_r3_stages.py [stage ...]
"""

import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import make_dataset
from gatb_core_tpu.ops.kmer_ops import extract_kmers, nb_limbs
from gatb_core_tpu.ops.sortops import (count_planes, _run_stats, _cumw,
                                       _next_pow2, U32, I32)

K = 31
B = 16384
REPS = int(os.environ.get("GATB_PROF_REPS", 6))
reads = make_dataset(n_reads=int(os.environ.get("GATB_PROF_READS", 200_000)))
B = min(B, reads.shape[0])
n_batches = reads.shape[0] // B
reads = reads[:n_batches * B]
read_len = reads.shape[1]
w = nb_limbs(K)
P = read_len - K + 1
N_ROWS = n_batches * B * P          # 23,592,960 even
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
    return tuple(p.reshape(-1) for p in planes), val.reshape(-1)


def repeat(fn):
    """fn(salt) -> (chk_u32, *extras). Chains REPS runs on the salt."""

    def run(x0):
        def body(i, carry):
            salt, acc = carry
            out = fn(salt)
            chk = out[0]
            return ((chk & jnp.uint32(3)).astype(jnp.uint8),
                    acc + chk + jnp.uint32(i))

        salt, acc = jax.lax.fori_loop(0, REPS, body,
                                      (x0, jnp.uint32(0)))
        return acc

    return jax.jit(run)


def timed(name, prog, *args):
    t0 = time.time()
    for attempt in range(3):   # tunnel compiles flake transiently
        try:
            r = np.asarray(prog(jnp.uint8(0), *args))
            break
        except Exception as e:
            print(f"{name}: attempt {attempt} failed: {e}", flush=True)
            if attempt == 2:
                return
            time.sleep(20)
    t_warm = time.time() - t0
    best = None
    for t in range(2):
        t0 = time.time()
        r = np.asarray(prog(jnp.uint8(t + 1), *args))
        el = time.time() - t0
        best = el if best is None else min(best, el)
    print(f"{name}: {best / REPS * 1000:.1f} ms/rep "
          f"(raw {best * 1000:.0f} ms / {REPS} reps, warm {t_warm:.0f}s, "
          f"chk {int(r)})", flush=True)


dataset = jnp.asarray(reads.reshape(n_batches, B, read_len))
np.asarray(jnp.sum(dataset))

# random sorted planes standing in for the post-sort stream (distinct
# ratio ~ bench: ~1M distinct out of N_ROWS rows)
rng = np.random.default_rng(0)
vals = np.sort(rng.integers(0, 1_000_000, N_ROWS).astype(np.uint64)
               * 0x9E3779B97F4A7C15 % (1 << 62))
SHI = jnp.asarray((vals >> 32).astype(np.uint32))
SLO = jnp.asarray((vals & 0xFFFFFFFF).astype(np.uint32))


def stage_ext():
    def fn(salt):
        planes, val = extract_all(dataset, salt)
        chk = jnp.sum(jnp.where(val, planes[0], U32(0)), dtype=U32)
        return (chk,)

    timed("ext", repeat(fn))


def _sort2(n):
    pad = n - N_ROWS

    def fn(salt):
        h = SHI + salt.astype(U32)   # still ~sorted; fine, sort is oblivious
        l = SLO ^ (salt.astype(U32) * U32(0x9E3779B9))
        if pad:
            h = jnp.concatenate([h, jnp.full((pad,), U32(0xFFFFFFFF))])
            l = jnp.concatenate([l, jnp.full((pad,), U32(0xFFFFFFFF))])
        out = jax.lax.sort((h, l), num_keys=2)
        return (out[0][n // 2] + out[1][n // 3],)

    timed(f"sort2_n{n}", repeat(fn))


def stage_sort2():
    _sort2(N_ROWS)


def stage_sort2_p2():
    _sort2(_next_pow2(N_ROWS))


def stage_ext_sort():
    def fn(salt):
        planes, val = extract_all(dataset, salt)
        enc = tuple(jnp.where(val, p, U32(0xFFFFFFFF)) for p in planes)
        out = jax.lax.sort(enc, num_keys=w)
        return (out[0][N_ROWS // 2] + out[1][N_ROWS // 3],)

    timed("ext_sort", repeat(fn))


def stage_runstats():
    def fn(salt):
        # uniform add keeps sortedness (SHI < 2^30, salt < 256) while
        # making every rep's data depend on the carry (no loop hoisting)
        h = SHI + salt.astype(U32)
        l = SLO
        inv = jnp.zeros((N_ROWS,), bool)
        starts, rid, n, is_end = _run_stats((h, l), inv)
        cwe = _cumw(inv, jnp.ones((N_ROWS,), I32))
        # order+count sensitive checksum over END rows in place
        wgt = rid.astype(U32) * U32(2654435761) + cwe.astype(U32)
        chk = jnp.sum(jnp.where(is_end, (h ^ l) * wgt, U32(0)), dtype=U32)
        return (chk + salt.astype(U32), n)

    timed("runstats", repeat(fn))


def stage_full_cur():
    def fn(salt):
        planes, val = extract_all(dataset, salt)
        out_p, counts, n, ov = count_planes(planes, val, spare_bits=True,
                                            cap_out=CAP_OUT)
        idx = jax.lax.broadcasted_iota(U32, (CAP_OUT,), 0)
        wgt = idx * U32(2654435761) + counts.astype(U32)
        chk = jnp.sum(out_p[0] * wgt, dtype=U32)
        return (chk, n)

    timed("full_cur", repeat(fn))


ALL = ["ext", "sort2", "sort2_p2", "ext_sort", "runstats", "full_cur"]
names = sys.argv[1:] or ALL
print(f"device={jax.devices()[0]}, N_ROWS={N_ROWS}, REPS={REPS}", flush=True)
for nm in names:
    globals()["stage_" + nm]()
