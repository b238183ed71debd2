"""Profile the end-to-end SortingCount.execute path on chip: where do
the ~1.2s per 200k reads go? Prints the info dict's phase breakdown
plus wall times per trial."""

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
    from gatb_core_tpu.kmer.counting import SortingCount, CountConfig

    n_reads = int(os.environ.get("PROF_READS", 200_000))
    reads = make_dataset(n_reads=n_reads)
    n_reads, read_len = reads.shape
    tmp = tempfile.NamedTemporaryFile(suffix=".fa", delete=False)
    tmp.close()
    write_fasta(tmp.name, reads)
    cfg = CountConfig(kmer_size=31, abundance_min=3, batch_reads=4096,
                      batch_len=read_len,
                      superbatch_rows=n_reads * (read_len - 30),
                      distinct_ratio_hint=0.06)
    for trial in range(3):
        t0 = time.time()
        res = SortingCount(cfg).execute(tmp.name)
        wall = time.time() - t0
        info = {k: v for k, v in res.info.items()
                if "time" in k or "fillsolid" in k}
        print(f"trial {trial}: wall={wall:.3f}s "
              f"reads/s={n_reads / wall:,.0f}")
        for k, v in sorted(info.items()):
            print(f"    {k} = {v}")
    os.unlink(tmp.name)


if __name__ == "__main__":
    main()
