"""Pallas bitonic sort kernel: algorithmic verification (interpret mode).

The kernel is round-2 perf groundwork (see its module docstring); these
tests pin its correctness independent of the Mosaic backend.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from gatb_core_tpu.ops.pallas_sort import bitonic_sort_u64, sort_u32_limbs

pytestmark = pytest.mark.slow


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


# ---------------------------------------------------------------------------
# production tiled kernel (rolled stage loops + XLA inter-tile merges)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n,w,tile_log2", [
    (1024, 2, 9),      # multi-tile, 2 limbs
    (4096, 2, 12),     # single tile == whole array
    (8192, 1, 10),     # 1 limb, 8 tiles
    (16384, 3, 11),    # 3 limbs (k > 47 spans)
])
def test_sort_u32_limbs_matches_lexsort(n, w, tile_log2):
    rng = np.random.default_rng(n + w)
    limbs = [rng.integers(0, 2 ** 32, n, dtype=np.uint32) for _ in range(w)]
    limbs[0] = (limbs[0] % 5).astype(np.uint32)  # force duplicate runs
    out = sort_u32_limbs(tuple(jnp.asarray(x) for x in limbs),
                         tile_log2=tile_log2, interpret=True)
    got = np.stack([np.asarray(x) for x in out], axis=1)
    ref = np.stack(limbs, axis=1)
    ref = ref[np.lexsort(tuple(ref[:, j] for j in reversed(range(w))))]
    assert (got == ref).all()


def test_sort_u32_limbs_sentinels_to_tail():
    n = 2048
    rng = np.random.default_rng(3)
    hi = rng.integers(0, 1 << 20, n, dtype=np.uint32)
    lo = rng.integers(0, 1 << 32, n, dtype=np.uint32)
    hi[100:400] = 0xFFFFFFFF
    lo[100:400] = 0xFFFFFFFF
    oh, ol = sort_u32_limbs((jnp.asarray(hi), jnp.asarray(lo)),
                            tile_log2=9, interpret=True)
    oh, ol = np.asarray(oh), np.asarray(ol)
    assert (oh[-300:] == 0xFFFFFFFF).all() and (ol[-300:] == 0xFFFFFFFF).all()
    got = (oh[:-300].astype(np.uint64) << np.uint64(32)) | ol[:-300]
    assert (np.diff(got.astype(np.int64)) >= 0).all()
