"""Round-5 Monument/simplify profile at reads3 scale (VERDICT r4 item 3:
reads3 Monument <= 5 s with identical contigs).

Builds the reads3 graph (k=21 a=2, 601,710 solid), simplifies, then
times Graph.contigs(traversal="monument") with cProfile breakdown.
Runs on local CPU (JAX_PLATFORMS=cpu upstream or via conftest-style
config below)."""

import cProfile
import gzip
import io
import os
import pstats
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

DB = "/root/reference/gatb-core/test/db"


def main():
    from gatb_core_tpu.debruijn.graph import Graph

    fasta = os.path.join(tempfile.gettempdir(), "gatb_reads3.fa")
    if not os.path.exists(fasta):
        with gzip.open(f"{DB}/reads3.fa.gz", "rb") as fin, \
                open(fasta, "wb") as fout:
            shutil.copyfileobj(fin, fout)

    t0 = time.time()
    g = Graph.create(fasta, kmer_size=21, abundance_min=2,
                     build_branching=False, mphf_kind="none",
                     bloom_kind="none", debloom_kind="none")
    print(f"graph build: {time.time() - t0:.1f}s, {g.nb_nodes} nodes",
          flush=True)

    t0 = time.time()
    g.simplify()
    t_simp = time.time() - t0
    print(f"simplify: {t_simp:.1f}s", flush=True)

    t0 = time.time()
    prof = cProfile.Profile()
    prof.enable()
    seqs, _ = g.contigs(traversal="monument")
    prof.disable()
    t_mon = time.time() - t0
    print(f"monument: {t_mon:.1f}s, {len(seqs)} contigs", flush=True)
    s = io.StringIO()
    pstats.Stats(prof, stream=s).sort_stats("cumulative").print_stats(25)
    print(s.getvalue())


if __name__ == "__main__":
    main()
