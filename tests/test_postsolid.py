"""Postsolid graph build: full HDF5 layout, resume, plan-driven CLI.

Covers the reference Graph::create pipeline shape (build_visitor_postsolid,
debruijn/impl/Graph.cpp:433-605) and its persisted layout
(Graph.cpp:424-428): /dsk, /histogram, /bloom, /debloom, /mphf (as a
group), /minimizers, /branching, plus the state machine bits.
"""

import numpy as np
import pytest

from gatb_core_tpu.bank.fasta import BankStrings
from gatb_core_tpu.debruijn.graph import Graph
from gatb_core_tpu.storage.hdf5 import (
    STATE_BLOOM_DONE, STATE_DEBLOOM_DONE, STATE_MPHF_DONE,
    STATE_BRANCHING_DONE, STATE_SORTING_COUNT_DONE,
)


def _mk_seqs(n=40, L=120, seed=5):
    rng = np.random.default_rng(seed)
    genome = "".join(rng.choice(list("ACGT"), size=600))
    starts = rng.integers(0, 600 - L, size=n)
    return [genome[s:s + L] for s in starts]


def test_full_hdf5_layout_and_state(tmp_path):
    out = str(tmp_path / "g.h5")
    g = Graph.create(BankStrings(*_mk_seqs()), kmer_size=21,
                     abundance_min=1, output=out)
    st = g.storage
    for bit in (STATE_SORTING_COUNT_DONE, STATE_MPHF_DONE, STATE_BLOOM_DONE,
                STATE_DEBLOOM_DONE, STATE_BRANCHING_DONE):
        assert st.check_state(bit), bin(st.get_state())
    import h5py

    st.close()
    f = h5py.File(out, "r")
    for grp in ("configuration", "dsk", "histogram", "bloom", "debloom",
                "mphf", "minimizers", "branching"):
        assert grp in f, grp
    assert "solid" in f["dsk"]
    assert "bloom" in f["bloom"]
    assert "cfp" in f["debloom"]
    assert "minimRepart" in f["minimizers"]
    f.close()


def test_load_resumes_postsolid(tmp_path):
    out = str(tmp_path / "g.h5")
    seqs = _mk_seqs(seed=6)
    g1 = Graph.create(BankStrings(*seqs), kmer_size=21, abundance_min=1,
                      output=out)
    deb1 = g1._debloom
    g1.storage.close()
    g2 = Graph.load(out)
    assert g2._mphf is not None
    assert g2._debloom is not None
    assert g2._container is not None
    assert g2._debloom.kind == deb1.kind
    assert (np.asarray(g2._debloom.bloom.words)
            == np.asarray(deb1.bloom.words)).all()
    assert (g2._debloom.cfp == deb1.cfp).all()
    # bloom_cfp membership equals exact on the 1-neighborhood after reload
    import jax.numpy as jnp
    from gatb_core_tpu.ops.neighbor_ops import neighbor_candidates

    cands = np.asarray(neighbor_candidates(
        jnp.asarray(g2.solid_limbs), 21)).reshape(-1, g2._w)
    assert (g2.contains(cands, mode="bloom_cfp")
            == g2.contains(cands, mode="exact")).all()
    # MPHF restored: node_index equals sorted rank
    idx = g2.node_index(g2.solid_limbs)
    assert (idx == np.arange(g2.nb_nodes)).all()
    g2.storage.close()


def test_membership_mode_switch():
    g = Graph.create(BankStrings(*_mk_seqs(seed=7)), kmer_size=15,
                     abundance_min=1)
    g.set_membership_mode("bloom_cfp")
    assert g.contains(g.solid_limbs).all()
    g.set_membership_mode("exact")
    with pytest.raises(ValueError):
        g.set_membership_mode("nope")


def test_debloom_original_kind(tmp_path):
    out = str(tmp_path / "g.h5")
    g = Graph.create(BankStrings(*_mk_seqs(seed=8)), kmer_size=15,
                     abundance_min=1, output=out,
                     debloom_kind="original")
    assert g._debloom.kind == "original"
    assert g._debloom.cascade is None
    g.storage.close()
    g2 = Graph.load(out)
    assert g2._debloom.kind == "original"
    assert (g2._debloom.cfp == g._debloom.cfp).all()
    g2.storage.close()


def test_dbgh5_cli_plan_forces_passes(tmp_path, test_db):
    """The plan flags must change behavior: a small -max-disk budget on a
    big estimated volume yields nb_passes > 1 (ConfigurationAlgorithm.cpp
    :350), -nb-passes forces the loop directly, and results stay
    golden-equal (the pass filter partitions kmers by minimizer, so the
    union over passes is exact)."""
    from gatb_core_tpu.kmer.configuration import compute_plan
    from gatb_core_tpu.tools.dbgh5 import main

    # volume ~ 76GB -> (volume/4)/max_disk + 1 passes with a 5GB budget
    plan = compute_plan(100_000_000, 10_000_000_000, 150, 31,
                        max_disk_space_mb=5000)
    assert plan.nb_passes > 1

    out = str(tmp_path / "plan.h5")
    rc = main(["-in", f"{test_db}/reads1.fa", "-kmer-size", "31",
               "-abundance-min", "3", "-out", out, "-nb-passes", "2",
               "-max-memory", "64", "-verbose", "0"])
    assert rc == 0
    g = Graph.load(out)
    assert g.nb_nodes == 623  # golden (reads1 k31 a3)
    assert g.get_info()["checksum_branching"] == "30eb72bc69eca0d3"
    g.storage.close()


def test_dbgh5_cli_postsolid_flags(tmp_path, test_db):
    from gatb_core_tpu.tools.dbgh5 import main

    out = str(tmp_path / "orig.h5")
    rc = main(["-in", f"{test_db}/reads1.fa", "-kmer-size", "31",
               "-abundance-min", "3", "-out", out, "-debloom", "original",
               "-bloom", "cache", "-verbose", "0"])
    assert rc == 0
    import h5py

    f = h5py.File(out, "r")
    assert f["debloom"].attrs["kind"] == "original"
    assert f["bloom"].attrs["kind"] == "cache"
    f.close()


REF_DBGH5 = "/root/repo/.ref_build/bin/Release/dbgh5"


@pytest.mark.skipif(not __import__("os").path.exists(REF_DBGH5),
                    reason="reference dbgh5 binary not built (.ref_build)")
def test_load_reference_dbgh5_h5(tmp_path, test_db):
    """Graph.load opens a .h5 produced by the REFERENCE dbgh5 binary:
    partitioned dsk/solid (re-sorted globally), string-typed attrs,
    cascading-debloom bloom2/3/4 datasets, and the Repartitor byte stream
    — a reference user's existing graph files keep working."""
    import subprocess

    import numpy as np

    out = str(tmp_path / "ref.h5")
    subprocess.run([REF_DBGH5, "-in", f"{test_db}/reads1.fa",
                    "-kmer-size", "31", "-abundance-min", "3",
                    "-out", out, "-verbose", "0"],
                   check=True, capture_output=True, cwd=str(tmp_path))
    from gatb_core_tpu.debruijn.graph import Graph
    from gatb_core_tpu.kmer.repartition import Repartitor

    g = Graph.load(out)
    assert g.nb_nodes == 623 and g.kmer_size == 31
    g._branching = None  # recompute from the loaded solid set
    assert len(g.branching_nodes()) == 24
    assert g.checksum_branching() == "30eb72bc69eca0d3"
    # cascading membership loaded from the reference file == exact
    import jax.numpy as jnp

    from gatb_core_tpu.ops.neighbor_ops import neighbor_candidates

    cands = np.asarray(neighbor_candidates(
        jnp.asarray(g.solid_limbs), 31)).reshape(-1, g._w)
    assert (g.contains(cands, mode="exact")
            == g.contains(cands, mode="bloom_cfp")).all()
    rep = Repartitor.load(g.storage)
    assert rep.nb_partitions >= 1 and len(rep.table) == 4 ** 10
    g.storage.close()


def test_repartitor_reference_stream_roundtrip(tmp_path):
    """Repartitor persists in the reference's exact byte-stream format
    (PartiInfo.cpp:228-293: <u16><u64><u16> header + u16 table + magic)."""
    import struct

    import numpy as np

    from gatb_core_tpu.kmer.repartition import Repartitor
    from gatb_core_tpu.storage.hdf5 import Storage

    table = (np.arange(4 ** 6) % 8).astype(np.uint16)
    rep = Repartitor(table, 8, 6)
    with Storage(str(tmp_path / "r.h5"), "w") as st:
        rep.save(st)
        raw = st.group("minimizers").get_dataset("minimRepart")
        buf = np.asarray(raw).tobytes()
        nbp, nbm, npass = struct.unpack_from("<HQH", buf, 0)
        assert (nbp, nbm, npass) == (8, 4 ** 6, 1)
        assert struct.unpack_from("<I", buf, len(buf) - 4)[0] == 0x12345678
        rep2 = Repartitor.load(st)
    assert rep2.nb_partitions == 8
    assert (rep2.table == table).all()


@pytest.mark.slow
def test_postsolid_time_properties():
    """build_postsolid + adjacency/unitig/simplify stamp per-stage wall
    times into info (the reference's per-Algorithm 'time' properties —
    VERDICT r2 weak #10 instrumentation)."""
    import numpy as np

    from gatb_core_tpu.bank.fasta import BankStrings
    from gatb_core_tpu.debruijn.graph import Graph

    rng = np.random.default_rng(23)
    seqs = ["".join(rng.choice(list("ACGT"), size=120)) for _ in range(30)]
    g = Graph.create(BankStrings(*seqs), kmer_size=21, abundance_min=1)
    g.precompute_adjacency()
    g.unitig_graph()
    g.simplify()
    for key in ("postsolid_time.mphf", "postsolid_time.debloom",
                "postsolid_time.branching", "postsolid_time.adjacency",
                "postsolid_time.unitigs", "postsolid_time.simplify"):
        assert key in g.info, key
        assert g.info[key] >= 0
