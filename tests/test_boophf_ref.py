"""Reference-format BooPHF interop (VERDICT r3 Missing #4):
build/parse/query the exact serialization gatb-core persists into
/dsk/mphf, validated against a compiled reference harness."""

import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

from gatb_core_tpu.collections.boophf_ref import (RefBooPHF, RefMPHFAdapter,
                                                  limbs_to_words64)

REF_THIRD = "/root/reference/gatb-core/thirdparty"


def test_build_roundtrip_permutation():
    rng = np.random.default_rng(5)
    for w in (1, 2, 3):
        keys = np.unique(
            rng.integers(0, 2**63, size=(4000, w), dtype=np.uint64), axis=0)
        m = RefBooPHF.build(keys)
        codes = m.lookup(keys)
        assert codes.min() >= 0 and codes.max() < len(keys)
        assert len(np.unique(codes)) == len(keys)
        m2 = RefBooPHF.from_bytes(m.to_bytes(), w)
        assert (m2.lookup(keys) == codes).all()


def test_limbs_to_words64():
    # k=21 (2 limbs -> 1 word), value = hi<<32 | lo
    limbs = np.array([[0x12345678, 0x9ABCDEF0]], np.uint32)
    w = limbs_to_words64(limbs, 21)
    assert w.shape == (1, 1) and w[0, 0] == 0x123456789ABCDEF0
    # k=47 (3 limbs -> 2 words little-endian)
    limbs = np.array([[0xAA, 0xBB, 0xCC]], np.uint32)
    w = limbs_to_words64(limbs, 47)
    assert w[0, 0] == (0xBB << 32) | 0xCC and w[0, 1] == 0xAA


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir(REF_THIRD)
                    or shutil.which("c++") is None,
                    reason="needs reference thirdparty headers + c++")
def test_against_reference_binary(tmp_path):
    """Compile the header-only harness (tools_dev/ref_boophf_harness.cpp)
    and assert: (1) our parse of the reference's stream answers every
    lookup identically, (2) the reference loads OUR stream and agrees,
    (3) our build is byte-identical to the reference build."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    exe = str(tmp_path / "ref_boophf")
    subprocess.run(
        ["c++", "-std=c++11", "-O2", f"-I{REF_THIRD}",
         os.path.join(here, "tools_dev", "ref_boophf_harness.cpp"),
         "-o", exe, "-lpthread"], check=True, timeout=120)
    rng = np.random.default_rng(11)
    keys = np.unique(rng.integers(0, 2**63, size=15000, dtype=np.uint64))
    kf = str(tmp_path / "k.u64")
    keys.tofile(kf)
    ref_bin = str(tmp_path / "ref.mphf")
    subprocess.run([exe, "save", kf, ref_bin], check=True, timeout=60)
    ref_bytes = open(ref_bin, "rb").read()

    m = RefBooPHF.from_bytes(ref_bytes, 1)
    q = np.concatenate([keys[rng.integers(0, len(keys), 400)],
                        rng.integers(0, 2**63, size=100, dtype=np.uint64)])
    qf = str(tmp_path / "q.u64")
    q.tofile(qf)
    out = subprocess.run([exe, "lookup", qf, ref_bin],
                         capture_output=True, text=True, check=True,
                         timeout=60)
    want = np.array([int(x) for x in out.stdout.split()], np.uint64)
    got = m.lookup(q[:, None])
    got_u = np.where(got < 0, np.uint64(2**64 - 1), got.astype(np.uint64))
    assert (got_u == want).all()

    ours = RefBooPHF.build(keys[:, None])
    assert ours.to_bytes() == ref_bytes          # byte-identical build
    our_bin = str(tmp_path / "ours.mphf")
    open(our_bin, "wb").write(ours.to_bytes())
    out2 = subprocess.run([exe, "lookup", qf, our_bin],
                          capture_output=True, text=True, check=True,
                          timeout=60)
    assert out2.stdout == out.stdout             # ref binary loads ours

    # 16-byte keys (the k>32 LargeInt<2> path: distinct jenkins tail)
    keys2 = np.unique(rng.integers(0, 2**63, size=(8000, 2),
                                   dtype=np.uint64), axis=0)
    k2f = str(tmp_path / "k2.u64")
    keys2.tofile(k2f)
    ref2 = str(tmp_path / "ref2.mphf")
    subprocess.run([exe, "save2", k2f, ref2], check=True, timeout=60)
    ours2 = RefBooPHF.build(keys2)
    assert ours2.to_bytes() == open(ref2, "rb").read()
    q2 = np.concatenate([keys2[rng.integers(0, len(keys2), 300)],
                         rng.integers(0, 2**63, size=(100, 2),
                                      dtype=np.uint64)])
    q2f = str(tmp_path / "q2.u64")
    q2.tofile(q2f)
    out3 = subprocess.run([exe, "lookup2", q2f, ref2],
                          capture_output=True, text=True, check=True,
                          timeout=60)
    want2 = np.array([int(x) for x in out3.stdout.split()], np.uint64)
    got2 = ours2.lookup(q2)
    got2u = np.where(got2 < 0, np.uint64(2**64 - 1),
                     got2.astype(np.uint64))
    assert (got2u == want2).all()


def test_graph_h5_mphf_interop(tmp_path):
    """Our .h5 carries /dsk/mphf in the reference format; a Graph.load
    that only finds that stream (reference-file situation) adapts it as
    the node index with NO rebuild."""
    import h5py

    from gatb_core_tpu.bank.fasta import BankStrings
    from gatb_core_tpu.debruijn.graph import Graph

    rng = np.random.default_rng(8)
    genome = "".join(rng.choice(list("ACGT"), size=2000))
    reads = [genome[s:s + 100] for s in rng.integers(0, 1900, size=200)]
    out = str(tmp_path / "g.h5")
    g = Graph.create(BankStrings(*reads), kmer_size=21, abundance_min=2,
                     output=out, build_branching=False, repartition=False,
                     batch_reads=64, batch_len=256)
    del g
    # simulate a reference-built file: drop OUR mphf encoding, keep the
    # reference stream at /dsk/mphf
    with h5py.File(out, "a") as f:
        for name in ("bits", "prefix", "perm", "fallback_keys",
                     "fallback_ranks"):
            if name in f["mphf"]:
                del f["mphf"][name]
        assert "mphf" in f["dsk"]
    g2 = Graph.load(out)
    assert isinstance(g2._mphf, RefMPHFAdapter)
    idx = g2.node_index(g2.solid_limbs)
    assert (idx == np.arange(g2.nb_nodes)).all()
    # abundance queries flow through the same index
    ab = g2.query_abundance(g2.solid_limbs[:50])
    assert (ab > 0).all()
