"""Measure the remote-tunnel transfer characteristics: upload bw,
download bw vs fetch size, concurrent fetch, dtype views, and the
per-call round-trip latency. Informs the e2e pipeline design."""

import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import jax
import jax.numpy as jnp


def t(fn, n=3):
    best = None
    for _ in range(n):
        t0 = time.time()
        fn()
        el = time.time() - t0
        best = el if best is None else min(best, el)
    return best


def main():
    dev = jax.devices()[0]
    print("device:", dev)

    # round-trip latency: tiny scalar op + fetch
    one = jnp.int32(1)
    f = jax.jit(lambda x: x + 1)
    _ = np.asarray(f(one))
    lat = t(lambda: np.asarray(f(one)), 5)
    print(f"round-trip latency (scalar op+fetch): {lat*1e3:.1f} ms")

    # upload bandwidth: 8 MB and 32 MB
    for mb in (8, 32):
        h = np.random.randint(0, 2**31, size=(mb << 18,), dtype=np.int32)
        def up():
            a = jax.device_put(h, dev)
            a.block_until_ready()
            # force materialization with a dependent scalar fetch
            np.asarray(a[0])
        el = t(up)
        print(f"upload {mb} MB: {el:.3f}s = {mb/el:.0f} MB/s")

    # download bandwidth vs size: build data ON device, fetch
    g = jax.jit(lambda n_salt: (jax.lax.broadcasted_iota(
        jnp.uint32, (32 << 18,), 0) * n_salt))
    for mb in (1, 4, 12, 32):
        rows = mb << 18
        salt = [0]
        def down():
            salt[0] += 1
            a = g(jnp.uint32(salt[0]))
            np.asarray(a[:rows])
        el = t(down)
        print(f"fetch {mb} MB: {el:.3f}s = {mb/el:.0f} MB/s")

    # concurrent fetch: 12 MB as 4x3MB via threads vs one call
    salt = [100]
    def conc():
        salt[0] += 1
        a = g(jnp.uint32(salt[0]))
        rows = 12 << 18
        qs = [a[i * (rows // 4):(i + 1) * (rows // 4)] for i in range(4)]
        with ThreadPoolExecutor(4) as ex:
            list(ex.map(np.asarray, qs))
    el = t(conc)
    print(f"fetch 12 MB via 4 threads: {el:.3f}s = {12/el:.0f} MB/s")

    # device_get of a pytree (planes + counts together)
    salt = [200]
    def tree():
        salt[0] += 1
        a = g(jnp.uint32(salt[0]))
        rows = 4 << 18
        jax.device_get((a[:rows], a[rows:2 * rows], a[2 * rows:3 * rows]))
    el = t(tree)
    print(f"device_get 12 MB pytree: {el:.3f}s = {12/el:.0f} MB/s")


if __name__ == "__main__":
    main()
