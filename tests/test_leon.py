"""Leon compressor tests (mirrors reference TestLeon: compress/decompress
round trips on the bundled leon fixtures)."""

import numpy as np
import pytest

from gatb_core_tpu.compression.range_coder import (
    Order0Model, RangeEncoder, RangeDecoder,
)
from gatb_core_tpu.compression.leon import LeonCompressor, LeonDecompressor
from gatb_core_tpu.bank.fasta import BankFasta, BankStrings


def test_range_coder_roundtrip():
    rng = np.random.default_rng(0)
    # skewed distribution to exercise adaptivity + rescale
    syms = rng.choice(256, size=5000, p=np.r_[[0.5], [0.5 / 255] * 255])
    enc = RangeEncoder()
    m = Order0Model(256)
    for s in syms:
        enc.encode(m, int(s))
    enc.flush()
    buf = enc.get_buffer()
    assert len(buf) < len(syms)  # actually compresses a skewed stream
    dec = RangeDecoder(buf)
    m2 = Order0Model(256)
    out = [dec.next_byte(m2) for _ in range(len(syms))]
    assert out == [int(s) for s in syms]


def test_range_coder_binary_model():
    bits = [1, 1, 1, 0, 1, 1, 1, 1, 0, 1] * 50
    enc = RangeEncoder()
    m = Order0Model(2)
    for b in bits:
        enc.encode(m, b)
    enc.flush()
    dec = RangeDecoder(enc.get_buffer())
    m2 = Order0Model(2)
    assert [dec.next_byte(m2) for _ in bits] == bits


def test_leon_fastq_roundtrip(test_db, tmp_path):
    """Round trip the reference's bundled leon1.fastq fixture."""
    src = f"{test_db}/leon1.fastq"
    out = str(tmp_path / "x.leon")
    comp = LeonCompressor(kmer_size=21, abundance_min=1)
    info = comp.compress(src, out)
    assert info["nb_reads"] > 0

    seqs = LeonDecompressor().decompress(out)
    orig = list(BankFasta(src))
    assert len(seqs) == len(orig)
    for got, exp in zip(seqs, orig):
        assert got.comment == exp.comment
        assert got.data == exp.data
        assert got.quality == exp.quality


def test_leon_fasta_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    genome = "".join(rng.choice(list("ACGT"), size=400))
    reads = [genome[i:i + 80] for i in range(0, 300, 11)]
    reads.append("NNNACGT" + genome[:40])  # N handling
    bank = BankStrings(*reads)
    out = str(tmp_path / "y.leon")
    info = LeonCompressor(kmer_size=21, abundance_min=1).compress(bank, out)
    seqs = LeonDecompressor().decompress(out)
    assert [s.data for s in seqs] == reads
    assert all(s.quality is None for s in seqs)


def test_leon_compression_ratio(tmp_path):
    """Overlapping reads (high coverage) must compress well below 2
    bits/base thanks to anchor prediction."""
    rng = np.random.default_rng(2)
    genome = "".join(rng.choice(list("ACGT"), size=1000))
    reads = [genome[i:i + 100] for i in range(0, 900, 5)] * 2
    bank = BankStrings(*reads)
    out = str(tmp_path / "z.leon")
    info = LeonCompressor(kmer_size=25, abundance_min=2).compress(bank, out)
    total_bases = sum(len(r) for r in reads)
    # stream (headers+DNA) must be well under raw 2 bits/base thanks to
    # anchor prediction; the kmer dictionary amortizes with coverage and
    # is excluded at this toy scale
    payload_bits_per_base = info["payload_bytes"] * 8 / total_bases
    assert payload_bits_per_base < 0.8, payload_bits_per_base
    assert info["compressed_bytes"] * 8 / total_bases < 2.0
