"""Pallas bitonic sort kernel: algorithmic verification (interpret mode).

The kernel is round-2 perf groundwork (see its module docstring); these
tests pin its correctness independent of the Mosaic backend.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from gatb_core_tpu.ops.pallas_sort import bitonic_sort_u64


@pytest.mark.parametrize("n", [256, 2048, 8192])
def test_bitonic_sort_matches_npsort(n):
    rng = np.random.default_rng(n)
    hi = rng.integers(0, 1 << 30, n, dtype=np.uint32)
    lo = rng.integers(0, 1 << 32, n, dtype=np.uint32)
    oh, ol = bitonic_sort_u64(jnp.asarray(hi), jnp.asarray(lo),
                              interpret=True)
    got = (np.asarray(oh).astype(np.uint64) << np.uint64(32)) \
        | np.asarray(ol).astype(np.uint64)
    exp = np.sort((hi.astype(np.uint64) << np.uint64(32))
                  | lo.astype(np.uint64))
    assert (got == exp).all()


def test_bitonic_sort_with_duplicates_and_sentinels():
    n = 1024
    rng = np.random.default_rng(1)
    hi = rng.integers(0, 4, n, dtype=np.uint32)  # many duplicates
    lo = rng.integers(0, 8, n, dtype=np.uint32)
    hi[::7] = 0xFFFFFFFF  # sentinel rows
    lo[::7] = 0xFFFFFFFF
    oh, ol = bitonic_sort_u64(jnp.asarray(hi), jnp.asarray(lo),
                              interpret=True)
    got = (np.asarray(oh).astype(np.uint64) << np.uint64(32)) \
        | np.asarray(ol).astype(np.uint64)
    exp = np.sort((hi.astype(np.uint64) << np.uint64(32))
                  | lo.astype(np.uint64))
    assert (got == exp).all()


def test_rejects_non_power_of_two():
    with pytest.raises(ValueError):
        bitonic_sort_u64(jnp.zeros(300, jnp.uint32),
                         jnp.zeros(300, jnp.uint32), interpret=True)
