"""Bank layer tests vs bundled fixtures (mirrors reference TestBank suite)."""

import gzip

import pytest

from gatb_core_tpu.bank.fasta import (
    BankFasta, BankStrings, BankAlbum, BankComposite, BankSplitter, open_bank,
)


def test_reads1_fa(test_db):
    bank = BankFasta(f"{test_db}/reads1.fa")
    seqs = list(bank)
    assert len(seqs) == 100
    assert all(len(s.data) > 0 for s in seqs)
    assert seqs[0].comment.startswith("gnl|ti|")
    # multi-line records must be concatenated
    assert max(len(s.data) for s in seqs) > 70


def test_gzip_equals_plain(test_db):
    plain = [s.data for s in BankFasta(f"{test_db}/reads1.fa")]
    gz = [s.data for s in BankFasta(f"{test_db}/reads1.fa.gz")]
    assert plain == gz


def test_fastq(test_db):
    seqs = list(BankFasta(f"{test_db}/sample.fastq"))
    assert len(seqs) > 0
    for s in seqs:
        assert s.quality is not None
        assert len(s.quality) == len(s.data)


def test_fastq_gz(test_db):
    plain = [(s.data, s.quality) for s in BankFasta(f"{test_db}/sample.fastq")]
    gz = [(s.data, s.quality) for s in BankFasta(f"{test_db}/sample.fastq.gz")]
    assert plain == gz


def test_comma_uri(test_db):
    a = list(BankFasta(f"{test_db}/reads1.fa"))
    b = list(BankFasta(f"{test_db}/sample1.fa"))
    both = list(BankFasta(f"{test_db}/reads1.fa,{test_db}/sample1.fa"))
    assert len(both) == len(a) + len(b)


def test_album(test_db, tmp_path):
    album = tmp_path / "album.txt"
    album.write_text(f"{test_db}/reads1.fa\n{test_db}/sample1.fa\n")
    bank = open_bank(str(album))
    assert isinstance(bank, BankComposite)
    assert len(list(bank)) == len(list(BankFasta(f"{test_db}/reads1.fa"))) + \
        len(list(BankFasta(f"{test_db}/sample1.fa")))


def test_bank_strings():
    bank = BankStrings("ACGT", "TTTT")
    seqs = list(bank)
    assert [s.data for s in seqs] == ["ACGT", "TTTT"]
    assert bank.get_size() == 8


def test_bank_splitter():
    ref = "ACGTACGTACGTACGTACGT"
    bank = BankSplitter(ref, read_size=8, overlap=4, coverage=2)
    seqs = [s.data for s in bank]
    assert all(len(s) == 8 for s in seqs)
    assert seqs[0] == ref[:8]
    assert seqs[1] == ref[4:12]


def test_estimate(test_db):
    bank = BankFasta(f"{test_db}/reads1.fa")
    n, total, maxsz = bank.estimate()
    assert n == 100
    assert maxsz == max(len(s.data) for s in bank)
