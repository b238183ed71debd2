"""On-chip postsolid profile (VERDICT r2 item 3 done-criterion):
build the bench dataset's solid table, then time build_postsolid
(MPHF/Bloom/Debloom/Branching) + adjacency + unitig compaction on the
TPU, against the counting phase's wall-clock.

The postsolid kernels are sort-join based since round 3 (rank_limbs);
this measures whether they actually beat the counting phase at ~1M
distinct kmers as required."""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

from bench import make_dataset, write_fasta  # noqa: E402


def main():
    from gatb_core_tpu.debruijn.graph import Graph

    reads = make_dataset(n_reads=200_000)
    n_reads, read_len = reads.shape
    tmp = tempfile.NamedTemporaryFile(suffix=".fa", delete=False)
    tmp.close()
    write_fasta(tmp.name, reads)

    t0 = time.time()
    g = Graph.create(tmp.name, kmer_size=31, abundance_min=3,
                     batch_reads=4096, batch_len=read_len,
                     superbatch_rows=n_reads * (read_len - 30) // 4,
                     build_branching=True, mphf_kind="boophf",
                     debloom_kind="cascading", repartition=False)
    t_create = time.time() - t0
    t_count = g.info.get("time_fill", 0.0) + g.info.get("time_merge", 0.0)

    t0 = time.time()
    g.precompute_adjacency()
    t_adj = time.time() - t0

    t0 = time.time()
    ug = g.unitig_graph()
    t_unitig = time.time() - t0

    os.unlink(tmp.name)
    print(f"nodes: {g.nb_nodes}  unitigs: {ug.nb_unitigs}")
    print(f"counting wall (fill+merge): {t_count:.2f}s")
    print(f"Graph.create total: {t_create:.2f}s")
    for key in sorted(k for k in g.info if k.startswith("postsolid_time")):
        print(f"  {key} = {g.info[key]}")
    print(f"adjacency: {t_adj:.2f}s  unitigs: {t_unitig:.2f}s")
    post = sum(v for k, v in g.info.items()
               if k.startswith("postsolid_time.")) + t_adj + t_unitig
    print(f"postsolid total: {post:.2f}s  "
          f"{'<=' if post <= t_count else '>'} counting {t_count:.2f}s")


if __name__ == "__main__":
    main()
