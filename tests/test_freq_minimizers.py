"""Frequency-ordered minimizer tests (minimizer-type 1 equivalents)."""

import numpy as np
import pytest
import jax.numpy as jnp

from gatb_core_tpu.bank.fasta import BankStrings
from gatb_core_tpu.kmer.repartition import (
    census_mmers, freq_order_from_counts, build_freq_order,
)
from gatb_core_tpu.kmer.model import ModelMinimizer, revcomp
from gatb_core_tpu.ops.kmer_ops import extract_kmers
from gatb_core_tpu.ops.bitpack import ascii_to_codes_np


def test_freq_order_construction():
    counts = np.zeros(16, np.uint32)  # m=2
    counts[3] = 10
    counts[7] = 5
    counts[2] = 5
    freq = freq_order_from_counts(counts)
    # ascending (count, value): 2 -> rank0, 7 -> rank1, 3 -> rank2
    assert freq[2] == 0 and freq[7] == 1 and freq[3] == 2
    assert freq[0] == 16  # unseen
    assert freq[15] == 15  # pinned largest


def test_census_counts_canonical_mmers():
    m = 4
    seqs = ["ACGTACGTAA"]
    counts = census_mmers(BankStrings(*seqs), m)
    # every window's canonical 4-mer counted
    model_vals = []
    from gatb_core_tpu.kmer.model import string_to_kmer, canonical
    s = seqs[0]
    for i in range(len(s) - m + 1):
        model_vals.append(canonical(string_to_kmer(s[i:i + m]), m))
    exp = np.zeros(256, np.uint32)
    for v in model_vals:
        exp[v] += 1
    assert (counts == exp).all()


@pytest.mark.parametrize("k,m", [(15, 8), (31, 10)])
def test_extraction_with_freq_order_matches_model(k, m):
    rng = np.random.default_rng(k)
    seqs = ["".join(rng.choice(list("ACGT"), size=80)) for _ in range(6)]
    freq = build_freq_order(BankStrings(*seqs), m)

    model = ModelMinimizer(k, m, freq_order=freq)
    B = len(seqs)
    L = max(len(s) for s in seqs)
    codes = np.zeros((B, L), np.uint8)
    valid = np.zeros((B, L), bool)
    lengths = np.zeros(B, np.int32)
    for i, s in enumerate(seqs):
        c, v = ascii_to_codes_np(np.frombuffer(s.encode(), np.uint8))
        codes[i, :len(s)] = c
        valid[i, :len(s)] = v
        lengths[i] = len(s)
    kb = extract_kmers(jnp.asarray(codes), jnp.asarray(valid),
                       jnp.asarray(lengths), k, m,
                       freq_order=jnp.asarray(freq))
    got = np.asarray(kb.minimizer)
    gvalid = np.asarray(kb.valid)
    for i, s in enumerate(seqs):
        py = list(model.iter_kmers(s))
        for j, (pv, pok, pmin) in enumerate(py):
            if pok:
                assert gvalid[i, j]
                assert int(got[i, j]) == pmin, (i, j)
