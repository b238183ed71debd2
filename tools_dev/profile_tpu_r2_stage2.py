"""TPU profiling round 2: decompose the sort and the reduce."""

import os
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))

import numpy as np
import jax
import jax.numpy as jnp

from gatb_core_tpu.ops.pallas_sort import (
    sort_u32_limbs, _pallas_tile_sweep, _tile_sort_kernel, _tile_merge_kernel,
    _merge_sorted_runs, LANES)

CAP = 1 << 25
W = 2
TILE_LOG2 = 17
TILE = 1 << TILE_LOG2

rng = np.random.default_rng(0)
# presorted planes with ~30x duplication for reduce tests
base = np.sort(rng.integers(0, 1 << 20, CAP).astype(np.uint64) * 37)
hi = jnp.asarray((base >> 32).astype(np.uint32))
lo = jnp.asarray((base & 0xFFFFFFFF).astype(np.uint32))
rnd = tuple(jnp.asarray(rng.integers(0, 1 << 32, CAP, dtype=np.uint32))
            for _ in range(W))


def timeit(name, fn, *args, trials=3):
    t0 = time.time()
    out = fn(*args, jnp.uint32(0))
    _ = [np.asarray(x) for x in (out if isinstance(out, tuple) else (out,))]
    t_compile = time.time() - t0
    best = None
    for t in range(trials):
        t0 = time.time()
        out = fn(*args, jnp.uint32(t + 1))
        _ = [np.asarray(x)
             for x in (out if isinstance(out, tuple) else (out,))]
        el = time.time() - t0
        best = el if best is None else min(best, el)
    print(f"{name}: best={best*1000:.1f} ms (warmup {t_compile:.1f}s)",
          flush=True)
    return best


@jax.jit
def p_tilesort_only(planes0, planes1, salt):
    a, b = planes0 + salt, planes1 ^ salt
    out = _pallas_tile_sweep((a, b), _tile_sort_kernel, W, TILE // LANES,
                             CAP // TILE, False)
    return tuple(jnp.sum(x) for x in out)


@jax.jit
def p_merge_sweep_only(planes0, planes1, salt):
    a, b = planes0 + salt, planes1 ^ salt
    out = _pallas_tile_sweep((a, b), _tile_merge_kernel, W, TILE // LANES,
                             CAP // TILE, False)
    return tuple(jnp.sum(x) for x in out)


@jax.jit
def p_xla_stages_only(planes0, planes1, salt):
    a, b = planes0 + salt, planes1 ^ salt
    flat = (a, b)
    run = TILE
    while run < CAP:
        flat = _merge_sorted_runs(flat, run, stop_j=TILE)
        run *= 2
    return tuple(jnp.sum(x) for x in flat)


@jax.jit
def p_laxsort_only(planes0, planes1, salt):
    a, b = planes0 + salt, planes1 ^ salt
    out = jax.lax.sort((a, b), num_keys=2)
    return tuple(jnp.sum(x) for x in out)


@jax.jit
def p_reduce_only(h, l, salt):
    from gatb_core_tpu.ops.sortops import count_sorted_planes

    planes = (h + 0 * salt, l)
    inv = jnp.zeros((CAP,), bool)
    out_p, counts, n, ov = count_sorted_planes(planes, inv,
                                               cap_out=1 << 21)
    return n + salt.astype(jnp.int32), jnp.sum(counts), \
        jnp.sum(out_p[0]), jnp.sum(out_p[1])


@jax.jit
def p_cumsums_only(h, l, salt):
    neq = (h[1:] != h[:-1]) | (l[1:] != l[:-1])
    starts = jnp.concatenate([jnp.ones((1,), bool), neq])
    sid = jnp.cumsum(starts.astype(jnp.int32)) + salt.astype(jnp.int32)
    cumw = jnp.cumsum(jnp.ones((CAP,), jnp.int32))
    return sid[-1], cumw[-1]


@jax.jit
def p_searchsorted_only(h, l, salt):
    neq = (h[1:] != h[:-1]) | (l[1:] != l[:-1])
    starts = jnp.concatenate([jnp.ones((1,), bool), neq])
    sid = jnp.cumsum(starts.astype(jnp.int32)) + salt.astype(jnp.int32) * 0
    rid = sid - 1
    targets = jax.lax.broadcasted_iota(jnp.int32, ((1 << 21) + 1,), 0)
    sp = jnp.searchsorted(rid, targets, side="left")
    return jnp.sum(sp), sp[-1]


@jax.jit
def p_scatter_compact(h, l, salt):
    # alternative reduce: sorted-indices scatter for planes + segment_sum
    neq = (h[1:] != h[:-1]) | (l[1:] != l[:-1])
    starts = jnp.concatenate([jnp.ones((1,), bool), neq])
    rid = jnp.cumsum(starts.astype(jnp.int32)) - 1 + salt.astype(jnp.int32) * 0
    cap_out = 1 << 21
    out_h = jnp.zeros((cap_out,), jnp.uint32).at[rid].set(
        h, mode="drop", indices_are_sorted=True)
    out_l = jnp.zeros((cap_out,), jnp.uint32).at[rid].set(
        l, mode="drop", indices_are_sorted=True)
    counts = jax.ops.segment_sum(jnp.ones((CAP,), jnp.int32), rid,
                                 num_segments=cap_out,
                                 indices_are_sorted=True)
    return jnp.sum(out_h), jnp.sum(out_l), jnp.sum(counts)


timeit("tile_sort_sweep", p_tilesort_only, *rnd)
timeit("tile_merge_sweep", p_merge_sweep_only, *rnd)
timeit("xla_merge_stages(8 levels j>=tile)", p_xla_stages_only, *rnd)
timeit("laxsort", p_laxsort_only, *rnd)
timeit("reduce(searchsorted)", p_reduce_only, hi, lo)
timeit("cumsums", p_cumsums_only, hi, lo)
timeit("searchsorted", p_searchsorted_only, hi, lo)
timeit("scatter_compact", p_scatter_compact, hi, lo)
