"""Unit tests for the numeric core: codec, model, device kmer extraction.

Mirrors the reference TestKmer suite (test/unit/src/kmer/TestKmer.cpp):
model correctness across spans (k <= 32/64/96/128) vs string references.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from gatb_core_tpu.kmer.model import (
    ModelCanonical, ModelMinimizer, canonical, revcomp,
    kmer_to_string, string_to_kmer, mmer_lut_value,
)
from gatb_core_tpu.ops.bitpack import (
    string_to_codes, ascii_to_codes, revcomp_u32, mmer_allowed,
)
from gatb_core_tpu.ops.kmer_ops import (
    extract_kmers, kmers_to_py, py_to_limbs, nb_limbs, lex_lt,
)


def random_seq(rng, n, alphabet="ACGT"):
    return "".join(rng.choice(list(alphabet), size=n))


class TestCodec:
    def test_encoding_convention(self):
        # A=0 C=1 T=2 G=3 (IModel.hpp:73-84)
        codes, valid = string_to_codes("ACTGactg")
        assert codes.tolist() == [0, 1, 2, 3, 0, 1, 2, 3]
        assert valid.all()

    def test_invalid_chars(self):
        codes, valid = string_to_codes("ANCN")
        assert valid.tolist() == [True, False, True, False]
        # invalid chars still produce (c>>1)&3 like ConvertASCII
        assert codes[1] == (ord("N") >> 1) & 3

    def test_device_codec_matches_host(self):
        rng = np.random.default_rng(0)
        buf = rng.integers(0, 256, size=1000, dtype=np.uint8)
        hc, hv = string_to_codes(buf.tobytes().decode("latin-1")) \
            if False else (None, None)
        from gatb_core_tpu.ops.bitpack import ascii_to_codes_np
        hc, hv = ascii_to_codes_np(buf)
        dc, dv = ascii_to_codes(jnp.asarray(buf))
        assert (np.asarray(dc) == hc).all()
        assert (np.asarray(dv) == hv).all()

    def test_revcomp(self):
        assert kmer_to_string(revcomp(string_to_kmer("ACTG"), 4), 4) == "CAGT"
        # palindrome-ish sanity: revcomp(revcomp(x)) == x
        v = string_to_kmer("ACCGTGCA")
        assert revcomp(revcomp(v, 8), 8) == v

    def test_revcomp_u32_matches_py(self):
        rng = np.random.default_rng(1)
        for m in (4, 8, 10, 15):
            vals = rng.integers(0, 1 << (2 * m), size=200, dtype=np.uint32)
            got = np.asarray(revcomp_u32(jnp.asarray(vals), m))
            exp = np.array([revcomp(int(v), m) for v in vals], np.uint32)
            assert (got == exp).all(), m

    def test_mmer_allowed_matches_py(self):
        from gatb_core_tpu.kmer.model import mmer_allowed_py
        m = 10
        rng = np.random.default_rng(2)
        vals = rng.integers(0, 1 << (2 * m), size=500, dtype=np.uint32)
        got = np.asarray(mmer_allowed(jnp.asarray(vals), m))
        exp = np.array([mmer_allowed_py(int(v), m) for v in vals])
        assert (got == exp).all()
        # known cases: AA at start allowed, AA inside banned
        assert bool(mmer_allowed(jnp.asarray([string_to_kmer("AACCCCCCCC")],
                                             dtype=jnp.uint32), m))
        assert not bool(mmer_allowed(jnp.asarray([string_to_kmer("CCAACCCCCC")],
                                                 dtype=jnp.uint32), m))


class TestLimbs:
    def test_roundtrip(self):
        rng = np.random.default_rng(3)
        for k in (15, 16, 31, 32, 63, 127):
            vals = [int(rng.integers(0, 2**31)) << s for s in (0, 17)
                    for _ in (0, 1)]
            vals = [v & ((1 << (2 * k)) - 1) for v in vals]
            limbs = py_to_limbs(vals, k)
            assert limbs.shape[1] == nb_limbs(k)
            assert kmers_to_py(limbs) == vals

    def test_lex_order_is_integer_order(self):
        rng = np.random.default_rng(4)
        k = 63
        vals = [int(a) * (1 << 64) + int(b)
                for a, b in zip(rng.integers(0, 1 << 62, 50),
                                rng.integers(0, 1 << 63, 50))]
        vals = [v & ((1 << (2 * k)) - 1) for v in vals]
        limbs = jnp.asarray(py_to_limbs(vals, k))
        for i in range(len(vals)):
            lt = np.asarray(lex_lt(limbs[i][None].repeat(len(vals), 0), limbs))
            exp = np.array([vals[i] < v for v in vals])
            assert (lt == exp).all()


def _batch_from_seqs(seqs):
    from gatb_core_tpu.ops.bitpack import ascii_to_codes_np
    L = max(len(s) for s in seqs)
    B = len(seqs)
    codes = np.zeros((B, L), np.uint8)
    valid = np.zeros((B, L), bool)
    lengths = np.zeros(B, np.int32)
    for i, s in enumerate(seqs):
        c, v = ascii_to_codes_np(np.frombuffer(s.encode(), np.uint8))
        codes[i, :len(s)] = c
        valid[i, :len(s)] = v
        lengths[i] = len(s)
    return jnp.asarray(codes), jnp.asarray(valid), jnp.asarray(lengths), L


@pytest.mark.parametrize("k", [11, 16, 21, 31, 33, 63, 95, 127])
def test_extract_matches_python_model(k):
    m = 8 if k <= 16 else 10
    rng = np.random.default_rng(k)
    seqs = []
    for i in range(6):
        s = random_seq(rng, int(rng.integers(k + 5, k * 3 + 40)))
        if i % 3 == 2:  # inject invalid chars
            p = int(rng.integers(0, len(s)))
            s = s[:p] + "N" + s[p + 1:]
        seqs.append(s)
    seqs.append(random_seq(rng, k))      # exactly one kmer
    seqs.append(random_seq(rng, k - 1))  # too short: no kmers

    codes, valid, lengths, L = _batch_from_seqs(seqs)
    kb = extract_kmers(codes, valid, lengths, k, m)
    got_k = np.asarray(kb.kmers)
    got_v = np.asarray(kb.valid)
    got_m = np.asarray(kb.minimizer)

    model = ModelMinimizer(k, m)
    P = L - k + 1
    for i, s in enumerate(seqs):
        py = list(model.iter_kmers(s))
        for j in range(P):
            if j + k > len(s):
                assert not got_v[i, j]
                continue
            pv, pok, pmin = py[j]
            assert bool(got_v[i, j]) == pok, (i, j)
            if pok:
                dv = kmers_to_py(got_k[i, j][None])[0]
                assert dv == pv, (i, j)
                assert int(got_m[i, j]) == pmin, (i, j)


def test_bank_kmers_enumerates_full_space():
    from gatb_core_tpu.kmer.bank_kmers import BankKmers, iter_bank_kmers
    from gatb_core_tpu.kmer.model import string_to_kmer

    b = BankKmers(3)
    seqs = list(b)
    assert len(seqs) == 64
    assert [string_to_kmer(s.data) for s in seqs] == list(range(64))
    n, total, mx = b.estimate()
    assert (n, total, mx) == (64, 192, 3)
    # BankKmerIterator equivalent over an in-memory bank
    from gatb_core_tpu.bank.fasta import BankStrings

    out = list(iter_bank_kmers(BankStrings("ACTGA"), 3))
    assert len(out) == 1 and len(out[0][1]) == 3  # 3 windows of k=3
