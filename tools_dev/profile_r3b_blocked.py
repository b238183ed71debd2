"""TPU profiling round 3b: plane scaling of lax.sort, batched minor-axis
sort cost (the blocked compaction's level 1), and the full pipeline with
the blocked compaction. Protocol: in-jit fori_loop REPS with salt
chaining (see profile_r3_stages.py).
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
from gatb_core_tpu.ops.sortops import count_planes, U32, I32

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
N_ROWS = n_batches * B * P

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
    """fn(salt, *ops) -> (chk, ...). Operand arrays ride as explicit jit
    args — closure-captured 94MB constants get serialized INTO the remote
    compile request body (HTTP 413 above ~2 planes)."""

    def run(x0, *ops):
        def body(i, carry):
            salt, acc = carry
            out = fn(salt, *ops)
            chk = out[0]
            return ((chk & jnp.uint32(3)).astype(jnp.uint8),
                    acc + chk + jnp.uint32(i))

        _, acc = jax.lax.fori_loop(0, REPS, body, (x0, jnp.uint32(0)))
        return acc

    return jax.jit(run)


def timed(name, prog, *args):
    t0 = time.time()
    for attempt in range(3):
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
          f"(raw {best * 1000:.0f} ms, warm {t_warm:.0f}s, chk {int(r)})",
          flush=True)


dataset = jnp.asarray(reads.reshape(n_batches, B, read_len))
np.asarray(jnp.sum(dataset))

rng = np.random.default_rng(0)
RAND = [jnp.asarray(rng.integers(0, 1 << 32, N_ROWS, dtype=np.uint64)
                    .astype(np.uint32)) for _ in range(3)]


def _sortp(n_planes):
    def fn(salt, *ops):
        planes = tuple(ops[j] + salt.astype(U32) * U32(j + 1)
                       for j in range(n_planes))
        out = jax.lax.sort(planes, num_keys=n_planes)
        return (out[0][N_ROWS // 2] + out[-1][N_ROWS // 3],)

    timed(f"sort{n_planes}", repeat(fn), *RAND[:n_planes])


def stage_sort1():
    _sortp(1)


def stage_sort3():
    _sortp(3)


def _bsort(block, n_planes, n_keys=1):
    nb = N_ROWS // block

    def fn(salt, *ops):
        planes = tuple(ops[j][:nb * block].reshape(nb, block)
                       + salt.astype(U32) * U32(j + 1)
                       for j in range(n_planes))
        out = jax.lax.sort(planes, dimension=1, num_keys=n_keys)
        return (out[0][nb // 2, block // 2] + out[-1][nb // 3, 7],)

    timed(f"bsort_s{block}_p{n_planes}", repeat(fn), *RAND[:n_planes])


def stage_bsort4096():
    _bsort(4096, 3)


def stage_bsort1024():
    _bsort(1024, 3)


def stage_bsort512():
    _bsort(512, 3)


def stage_bsort4096k2():
    _bsort(4096, 2, n_keys=2)


def stage_bsort131072():
    _bsort(131072, 2, n_keys=2)


def stage_bsort16384():
    _bsort(16384, 2, n_keys=2)


def stage_transpose():
    r, s = 131072, 180

    def fn(salt, h, l):
        a = (h[:r * s] + salt.astype(U32)).reshape(s, r)
        b = (l[:r * s] ^ salt.astype(U32)).reshape(s, r)
        at = a.T.reshape(-1)
        bt = b.T.reshape(-1)
        # position-weighted sums so the permutation can't be elided
        idx = jax.lax.broadcasted_iota(U32, (r * s,), 0)
        w_ = idx * U32(2654435761)
        return (jnp.sum(at * w_, dtype=U32) ^ jnp.sum(bt * w_, dtype=U32),)

    timed("transpose_2p", repeat(fn), RAND[0], RAND[1])


def _full_blocked(cap_out):
    def fn(salt):
        planes, val = extract_all(dataset, salt)
        out_p, counts, n, ov = count_planes(planes, val, spare_bits=True,
                                            cap_out=cap_out, blocked=True)
        idx = jax.lax.broadcasted_iota(U32, (cap_out,), 0)
        wgt = idx * U32(2654435761) + counts.astype(U32)
        chk = jnp.sum(out_p[0] * wgt, dtype=U32)
        return (chk, n, ov)

    timed(f"full_blocked_c{cap_out}", repeat(fn))


def stage_full_blocked20():
    _full_blocked(1 << 20)


def stage_full_blocked21():
    _full_blocked(1 << 21)


ALL = ["sort1", "sort3", "bsort4096", "bsort1024", "bsort512",
       "full_blocked20", "full_blocked21"]
names = sys.argv[1:] or ALL
print(f"device={jax.devices()[0]}, N_ROWS={N_ROWS}, REPS={REPS}", flush=True)
for nm in names:
    globals()["stage_" + nm]()
