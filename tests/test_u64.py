"""Bit-exactness tests for the uint32-pair 64-bit emulation and the
reference hash ports (hash64 / oahash64, NativeInt64.hpp:175-203)."""

import numpy as np
import jax
import jax.numpy as jnp

from gatb_core_tpu.ops.u64 import (
    U64, hash64, oahash64, u64_add, u64_mul, u64_shl, u64_shr, u64_xor,
    u64_mod_u32,
)

M64 = (1 << 64) - 1


def pack(values):
    v = np.asarray(values, dtype=np.uint64)
    return U64(jnp.asarray((v >> np.uint64(32)).astype(np.uint32)),
               jnp.asarray((v & np.uint64(0xFFFFFFFF)).astype(np.uint32)))


def unpack(u: U64) -> np.ndarray:
    return ((np.asarray(u.hi).astype(np.uint64) << np.uint64(32))
            | np.asarray(u.lo).astype(np.uint64))


def py_hash64(key, seed):
    h = seed
    h ^= ((h << 7) ^ (key * (h >> 3)) ^ (~((h << 11) + (key ^ (h >> 5))))) & M64
    h &= M64
    h = ((~h) + (h << 21)) & M64
    h ^= h >> 24
    h = ((h + (h << 3)) + (h << 8)) & M64
    h ^= h >> 14
    h = ((h + (h << 2)) + (h << 4)) & M64
    h ^= h >> 28
    return (h + (h << 31)) & M64


def py_oahash64(code):
    code ^= code >> 14
    code = ((~code) + (code << 18)) & M64
    code ^= code >> 31
    code = (code * 21) & M64
    code ^= code >> 11
    code = (code + (code << 6)) & M64
    code ^= code >> 22
    return code


@jax.jit
def _ops_kernel(a: U64, b: U64):
    return (u64_add(a, b), u64_mul(a, b), u64_xor(a, b),
            u64_shl(a, 13), u64_shr(a, 29), u64_shl(a, 37), u64_shr(a, 51))


def test_arithmetic():
    rng = np.random.default_rng(0)
    av = rng.integers(0, 1 << 64, 500, dtype=np.uint64)
    bv = rng.integers(0, 1 << 64, 500, dtype=np.uint64)
    add, mul, xor, shl13, shr29, shl37, shr51 = _ops_kernel(pack(av), pack(bv))
    a, b = av.astype(object), bv.astype(object)
    assert (unpack(add) == np.array([(int(x) + int(y)) & M64 for x, y in zip(a, b)], np.uint64)).all()
    assert (unpack(mul) == np.array([(int(x) * int(y)) & M64 for x, y in zip(a, b)], np.uint64)).all()
    assert (unpack(xor) == (av ^ bv)).all()
    assert (unpack(shl13) == np.array([(int(x) << 13) & M64 for x in a], np.uint64)).all()
    assert (unpack(shr29) == (av >> np.uint64(29))).all()
    assert (unpack(shl37) == np.array([(int(x) << 37) & M64 for x in a], np.uint64)).all()
    assert (unpack(shr51) == (av >> np.uint64(51))).all()


def test_hash64_bit_exact():
    rng = np.random.default_rng(1)
    keys = rng.integers(0, 1 << 64, 300, dtype=np.uint64)
    fn = jax.jit(lambda k, s: hash64(k, s))
    for seed in (0, 0xAAAAAAAA55555555, 123456789):
        out = fn(pack(keys), U64.from_int(seed, like=pack(keys).lo))
        exp = np.array([py_hash64(int(x), seed) for x in keys], np.uint64)
        assert (unpack(out) == exp).all()


def test_oahash64_bit_exact():
    rng = np.random.default_rng(2)
    keys = rng.integers(0, 1 << 64, 300, dtype=np.uint64)
    out = jax.jit(oahash64)(pack(keys))
    exp = np.array([py_oahash64(int(x)) for x in keys], np.uint64)
    assert (unpack(out) == exp).all()


def test_mod_u32():
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 1 << 64, 300, dtype=np.uint64)
    # large moduli regression: the round-1 fold wrapped uint32 above ~2^22
    # (ADVICE.md; BooPHF hits m = 3*n on genome-scale builds)
    for mod in (1, 2, 7, 1000003, 50_000_064, 3 * 8_040_763,
                (1 << 30), (1 << 31) - 1, (1 << 31) + 1, (1 << 32) - 5):
        out = jax.jit(lambda k: u64_mod_u32(k, mod))(pack(keys))
        exp = np.array([int(x) % mod for x in keys], np.uint32)
        assert (np.asarray(out) == exp).all(), mod
    # boundary values
    edge = pack(np.array([0, 1, M64, M64 - 1, 1 << 32, (1 << 32) - 1],
                         np.uint64))
    for mod in (3, 50_000_064, (1 << 32) - 1):
        out = u64_mod_u32(edge, mod)
        exp = np.array([x % mod for x in
                        [0, 1, M64, M64 - 1, 1 << 32, (1 << 32) - 1]],
                       np.uint32)
        assert (np.asarray(out) == exp).all(), mod
