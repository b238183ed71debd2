"""Multi-bank counting + solidity kinds (mirrors TestDSK.cpp:443-713
multi-bank solidity min/max/sum matrices)."""

import numpy as np
import pytest

from gatb_core_tpu.bank.fasta import BankStrings
from gatb_core_tpu.kmer.counting import (
    count_kmers_multibank, solidity_check,
)
from gatb_core_tpu.kmer.model import count_kmers_py
from gatb_core_tpu.ops.kmer_ops import kmers_to_py

K = 15
S1 = "ACGGTCATCAATGCCGTAAGGCTAGCTTACG"
S2 = "TTACGGACGGTCATCAATGCCGTAAGGAGTC"
S3 = "GGGTTTACCACGGTCATCAATGCCGTATTTT"


def _expected_matrix(bank_seqs):
    per_bank = [count_kmers_py(seqs, K) for seqs in bank_seqs]
    union = sorted(set().union(*[set(c) for c in per_bank]))
    mat = np.zeros((len(union), len(bank_seqs)), np.int32)
    for j, c in enumerate(per_bank):
        for i, v in enumerate(union):
            mat[i, j] = c.get(v, 0)
    return union, mat


def test_per_bank_matrix():
    bank_seqs = [[S1, S1], [S2], [S1, S3]]
    banks = [BankStrings(*seqs) for seqs in bank_seqs]
    res = count_kmers_multibank(banks, kmer_size=K, abundance_min=1,
                                batch_reads=8, batch_len=64)
    union, mat = _expected_matrix(bank_seqs)
    assert kmers_to_py(res.kmers) == union
    assert (res.counts_per_bank == mat).all()
    assert (res.counts_sum == mat.sum(axis=1)).all()


@pytest.mark.parametrize("kind", ["sum", "min", "max", "all", "one"])
def test_solidity_kinds(kind):
    bank_seqs = [[S1, S1], [S2], [S1, S3]]
    banks = [BankStrings(*seqs) for seqs in bank_seqs]
    res = count_kmers_multibank(banks, kmer_size=K, abundance_min=2,
                                solidity_kind=kind, batch_reads=8,
                                batch_len=64)
    union, mat = _expected_matrix(bank_seqs)
    lo, hi = 2, 2**31 - 1
    total = mat.sum(axis=1)
    in_range = (mat >= lo) & (mat <= hi)
    if kind == "sum":
        exp = (total >= lo)
    elif kind == "min":
        exp = (mat.min(axis=1) >= lo)
    elif kind == "max":
        exp = (mat.max(axis=1) >= lo)
    elif kind == "all":
        exp = in_range.all(axis=1)
    elif kind == "one":
        exp = in_range.any(axis=1)
    assert (res.solid_mask == exp).all(), kind


def test_custom_solidity():
    bank_seqs = [[S1], [S2]]
    banks = [BankStrings(*seqs) for seqs in bank_seqs]
    # kmers present in bank 0 (>=1) but absent (not >=1) from bank 1
    res = count_kmers_multibank(banks, kmer_size=K, abundance_min=1,
                                solidity_kind="custom",
                                solid_vec=[True, False],
                                batch_reads=8, batch_len=64)
    union, mat = _expected_matrix(bank_seqs)
    exp = (mat[:, 0] >= 1) & (mat[:, 1] == 0)
    assert (res.solid_mask == exp).all()


def test_per_bank_thresholds():
    counts = np.array([[3, 1], [2, 2], [0, 5]])
    # all: bank0 in [2,9], bank1 in [1,9]
    got = solidity_check(counts, "all", [(2, 9), (1, 9)])
    assert got.tolist() == [True, True, False]


def test_multibank_pass_invariance():
    """nb_passes > 1 must give identical matrices (DSK pass filter is a
    partition of kmers by minimizer; SortingCountAlgorithm.cpp:806)."""
    bank_seqs = [[S1, S2], [S3, S1]]
    banks1 = [BankStrings(*seqs) for seqs in bank_seqs]
    banks3 = [BankStrings(*seqs) for seqs in bank_seqs]
    r1 = count_kmers_multibank(banks1, kmer_size=K, abundance_min=1,
                               batch_reads=8, batch_len=64, nb_passes=1)
    r3 = count_kmers_multibank(banks3, kmer_size=K, abundance_min=1,
                               batch_reads=8, batch_len=64, nb_passes=3)
    np.testing.assert_array_equal(r1.kmers, r3.kmers)
    np.testing.assert_array_equal(r1.counts_per_bank, r3.counts_per_bank)
