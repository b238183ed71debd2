"""Counting pipeline tests vs the dict-based Python reference counter.

Mirrors the reference TestDSK suite (test/unit/src/kmer/TestDSK.cpp):
exact distinct/solid counts on literal sequences, abundance filters, and the
bundled reads1.fa fixture.
"""

import numpy as np
import pytest

from gatb_core_tpu.bank.fasta import BankStrings, BankFasta, open_bank
from gatb_core_tpu.kmer.counting import CountConfig, SortingCount, count_kmers
from gatb_core_tpu.kmer.model import count_kmers_py


def random_seqs(rng, n, lo, hi, with_n=False):
    out = []
    for i in range(n):
        s = "".join(rng.choice(list("ACGT"), size=int(rng.integers(lo, hi))))
        if with_n and i % 4 == 1:
            p = int(rng.integers(0, len(s)))
            s = s[:p] + "N" + s[p + 1:]
        out.append(s)
    return out


@pytest.mark.parametrize("k,amin", [(11, 1), (21, 1), (31, 1), (31, 2)])
def test_count_random_vs_python(k, amin):
    rng = np.random.default_rng(k * 100 + amin)
    seqs = random_seqs(rng, 30, k + 3, 4 * k + 60, with_n=True)
    seqs += seqs[:7]  # force some duplicates
    res = count_kmers(BankStrings(*seqs), kmer_size=k, abundance_min=amin,
                      batch_reads=16, batch_len=max(64, 2 * k))
    exp = count_kmers_py(seqs, k, abundance_min=amin)
    assert res.as_dict() == exp
    # table must be sorted ascending
    if res.nb_solid > 1:
        from gatb_core_tpu.ops.kmer_ops import kmers_to_py
        vals = kmers_to_py(res.solid_kmers)
        assert vals == sorted(vals)


def test_long_read_split_is_exact():
    """Reads longer than the batch length are split with k-1 overlap;
    every window must be counted exactly once."""
    rng = np.random.default_rng(7)
    k = 31
    long_read = "".join(rng.choice(list("ACGT"), size=5000))
    res = count_kmers(BankStrings(long_read), kmer_size=k, abundance_min=1,
                      batch_reads=4, batch_len=128)
    exp = count_kmers_py([long_read], k, abundance_min=1)
    assert res.as_dict() == exp


def test_dsk_check1_style():
    """Analogue of DSK_check1_aux (TestDSK.cpp:123-160): a literal sequence
    counted at several k / abundance thresholds with exact expectations."""
    seq = ("CATTGATAGTGGATGGT" * 6)[:100]
    for k in (13, 26, 27):
        for nks in (1, 2):
            res = count_kmers(BankStrings(seq), kmer_size=k,
                              abundance_min=nks, batch_reads=4, batch_len=128)
            exp = count_kmers_py([seq], k, abundance_min=nks)
            assert res.as_dict() == exp, (k, nks)
            assert res.info["kmers_nb_solid"] == len(exp)


def test_invalid_only_sequences():
    res = count_kmers(BankStrings("NNNNNNNNNNNNNNNN", "ACGT"), kmer_size=11,
                      abundance_min=1, batch_reads=4, batch_len=64)
    assert res.nb_solid == 0
    assert res.info["kmers_nb_valid"] == 0
    assert res.info["kmers_nb_invalid"] == 6


def test_reads1_fixture(test_db):
    """Count k=31 on the bundled reads1.fa and compare exactly with the
    Python reference counter (100 reads)."""
    bank = BankFasta(f"{test_db}/reads1.fa")
    seqs = [s.data for s in bank]
    assert len(seqs) == 100
    res = count_kmers(bank, kmer_size=31, abundance_min=1)
    exp = count_kmers_py(seqs, 31, abundance_min=1)
    assert res.info["kmers_nb_distinct"] == len(exp)
    assert res.as_dict() == exp

    res3 = count_kmers(bank, kmer_size=31, abundance_min=3)
    exp3 = {v: c for v, c in exp.items() if c >= 3}
    assert res3.as_dict() == exp3


def test_abundance_max():
    seqs = ["ACGTACGTACGTACGTACGT"] * 5 + ["TTTTGGGGCCCCAAAATTCG"]
    res = count_kmers(BankStrings(*seqs), kmer_size=15, abundance_min=1,
                      abundance_max=4, batch_reads=8, batch_len=64)
    exp = count_kmers_py(seqs, 15, abundance_min=1, abundance_max=4)
    assert res.as_dict() == exp


def test_histogram_counts_distinct_kmers():
    seqs = ["ACGTACGTACGTACGTACGT"] * 3
    res = count_kmers(BankStrings(*seqs), kmer_size=15, abundance_min=1,
                      batch_reads=8, batch_len=64)
    h = res.histogram.bins
    exp = count_kmers_py(seqs, 15)
    from collections import Counter
    by_ab = Counter(exp.values())
    for ab, n in by_ab.items():
        assert h[ab] == n
    assert int(h.sum()) == len(exp)


def test_multi_pass_counting_is_pass_invariant():
    """DSK pass loop: results identical for nb_passes in {1, 2, 5}."""
    rng = np.random.default_rng(11)
    seqs = ["".join(rng.choice(list("ACGTN"), p=[.24,.24,.24,.24,.04],
                               size=int(rng.integers(40, 200))))
            for _ in range(60)]
    from gatb_core_tpu.bank.fasta import BankStrings

    base = count_kmers(BankStrings(*seqs), kmer_size=25, abundance_min=1)
    for np_ in (2, 5):
        r = count_kmers(BankStrings(*seqs), kmer_size=25, abundance_min=1,
                        nb_passes=np_)
        assert r.info["kmers_nb_valid"] == base.info["kmers_nb_valid"]
        assert r.info["kmers_nb_distinct"] == base.info["kmers_nb_distinct"]
        assert (r.solid_kmers == base.solid_kmers).all()
        assert (r.solid_counts == base.solid_counts).all()


def test_high_abundance_counts_exact():
    """Counts >= 255 must survive the packed uint8+exceptions table fetch
    (counting._fetch_table) bit-exactly."""
    rng = np.random.default_rng(13)
    base = "".join(rng.choice(list("ACGT"), size=60))
    seqs = [base] * 300 + random_seqs(rng, 10, 40, 80)
    res = count_kmers(BankStrings(*seqs), kmer_size=21, abundance_min=1)
    exp = count_kmers_py(seqs, 21)
    got = dict(zip((tuple(r) for r in res.solid_kmers),
                   (int(c) for c in res.solid_counts)))
    assert len(got) == len(exp)
    from gatb_core_tpu.ops.kmer_ops import py_to_limbs
    for km, c in exp.items():
        assert got[tuple(py_to_limbs([km], 21)[0])] == c
    assert max(exp.values()) >= 255  # the exception path actually ran


def test_bank_stats_block():
    """seq_size_min/max/mean/deviation (the BankStats block the reference
    emits, SortingCountAlgorithm.cpp:735-742) — independently verified
    against a plain parse of reads1.fa."""
    from gatb_core_tpu.kmer.counting import count_kmers

    res = count_kmers("/root/reference/gatb-core/test/db/reads1.fa",
                      kmer_size=31, abundance_min=3)
    assert res.info["sequences_number"] == 100
    assert res.info["seq_size_min"] == 388
    assert res.info["seq_size_max"] == 1036
    assert res.info["seq_size_mean"] == 946.1
    assert res.info["seq_size_deviation"] == 91.7


def test_fold_modes_and_growth_exact():
    """Hybrid fold (r5): compact-first vs raw mode, wrong ratio hints
    (out-capacity overflow + replay), proactive accumulator growth and
    tiny superbatches must all be exact vs the dict ground truth."""
    import numpy as np

    from gatb_core_tpu.bank.fasta import BankStrings
    from gatb_core_tpu.kmer.counting import count_kmers
    from gatb_core_tpu.kmer.model import count_kmers_py

    rng = np.random.default_rng(5)
    genome = "".join(rng.choice(list("ACGT"), size=2000))
    hi_cov = [genome[i:i + 100] for i in range(0, 1900, 4)]   # ~25x
    lo_cov = ["".join(rng.choice(list("ACGT"), size=100))
              for _ in range(60)]
    cases = [
        ("hi-cov compact", hi_cov, dict(distinct_ratio_hint=0.05)),
        ("hint far too low", hi_cov, dict(distinct_ratio_hint=0.001)),
        ("lo-cov raw", lo_cov, {}),
        ("tiny superbatch", hi_cov, dict(superbatch_rows=1 << 12)),
        ("small acc budget", hi_cov, dict(distinct_ratio_hint=0.02,
                                          superbatch_rows=1 << 13)),
    ]
    for name, reads, kw in cases:
        res = count_kmers(BankStrings(*reads), kmer_size=31,
                          abundance_min=1, **kw)
        exp = count_kmers_py(reads, 31, abundance_min=1)
        assert res.as_dict() == exp, name
