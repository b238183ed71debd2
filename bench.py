"""Benchmark: k-mer counting throughput (k=31), reads/s on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "reads/s", "vs_baseline": N}

Dataset: synthetic 1 Mbp random genome, 200k x 150 bp reads sampled
uniformly (~30x coverage) — same data the reference baseline (dbgh5,
all CPU cores, see BASELINE.md "Measured") is run on.

Round-2 pipeline (one device dispatch for the whole dataset):
  extraction (lax.map over 16k-read chunks, minimizers skipped — the
  single-pass path never consumes them) -> ONE lax.sort of all ~23.6M
  (hi, lo) kmer limb planes (no padding; XLA's sort measured 3.9x faster
  than the tiled Pallas bitonic on v5e) -> scan-based distinct reduce +
  compaction sort (ops/sortops.count_sorted_planes; random gathers and
  scatters measured ~50M elem/s here, so the reduce uses only
  cumsum/associative scans and sorts).
Only scalars (n_distinct, total, checksums) leave the device: the remote
TPU tunnel ships every fetched output at 25-250 MB/s, so fetching tables
would measure the link, not the chip (BASELINE.md round-1 notes).
The timed unit is REPS chained full runs inside one dispatch (each rep's
input salted by the previous rep's checksum), amortizing the tunnel's
per-call round trip while defeating its execution cache.
"""

import json
import os
import time

import numpy as np

# Persistent compilation cache: tunnel compiles take 3-20+ min per program
# depending on congestion; cache the executable on disk so repeat runs
# (driver re-runs, retries after timeouts) skip the compile entirely.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))

# Reference baseline measured on this machine (see BASELINE.md "Measured"):
# gatb-core dbgh5 v1.4.2 (Release, -nb-cores 0 on the 2-core host) on the
# identical synthetic FASTA (200k x 150bp reads, 1Mbp genome, k=31,
# abundance-min=3): fill_partitions 0.697s + fill_solid_kmers 0.559s
# = 1.256s -> 159,236 reads/s for the counting phase.
REF_READS_PER_S = 159236.0

# Known exact result for this dataset (seed 7): asserted after warmup.
EXPECTED_DISTINCT = 999_959


def make_dataset(n_reads=200_000, read_len=150, genome_len=1_000_000,
                 seed=7):
    rng = np.random.default_rng(seed)
    genome = rng.integers(0, 4, size=genome_len, dtype=np.uint8)
    starts = rng.integers(0, genome_len - read_len, size=n_reads)
    idx = starts[:, None] + np.arange(read_len)[None, :]
    reads = genome[idx]  # (n_reads, read_len) 2-bit codes
    return reads


def write_fasta(path, reads):
    nts = np.frombuffer(b"ACTG", dtype=np.uint8)
    with open(path, "wb") as f:
        for i, r in enumerate(reads):
            f.write(b">r%d\n" % i)
            f.write(nts[r].tobytes())
            f.write(b"\n")


def main():
    import jax
    import jax.numpy as jnp

    from gatb_core_tpu.ops.kmer_ops import extract_kmers, nb_limbs
    from gatb_core_tpu.ops.sortops import count_planes

    K = 31
    B = int(os.environ.get("GATB_BENCH_B", 16384))  # reads per chunk
    n_reads_env = int(os.environ.get("GATB_BENCH_READS", 200_000))
    reads = make_dataset(n_reads=n_reads_env)
    full_dataset = n_reads_env == 200_000
    n_reads, read_len = reads.shape
    B = min(B, n_reads)
    n_batches = n_reads // B
    reads = reads[:n_batches * B]
    total_reads = n_batches * B

    w = nb_limbs(K)
    spare = (2 * K) % 32 != 0
    P = read_len - K + 1
    CAP_OUT = 1 << 21   # > EXPECTED_DISTINCT, bounds the reduce output
    # REPS chained runs inside one dispatch amortize the tunnel's per-call
    # round trip (~150 ms measured: 616k reads/s at REPS=1 vs 792k at
    # REPS=3); each rep's input is salted by the previous rep's checksum
    REPS = int(os.environ.get("GATB_BENCH_REPS", 3))

    jvalid = jnp.ones((B, read_len), bool)
    jlengths = jnp.full((B,), read_len, jnp.int32)

    def count_once(all_codes, salt):
        # `salt` defeats the remote-execution cache (identical (program,
        # input) pairs are served from a tunnel cache, BASELINE.md notes);
        # salt=0 preserves the reference dataset.
        all_codes = (all_codes + salt) & 3

        def ext(codes):
            kb = extract_kmers(codes, jvalid, jlengths, K,
                               with_minimizers=False)
            return (tuple(kb.kmers[..., j].reshape(-1) for j in range(w)),
                    kb.valid.reshape(-1))

        planes, val = jax.lax.map(ext, all_codes)
        flat = tuple(p.reshape(-1) for p in planes)
        fv = val.reshape(-1)
        # lax.sort needs no power-of-two padding: sort the exact row count
        out_p, counts, n, overflow = count_planes(
            flat, fv, spare_bits=spare, cap_out=CAP_OUT)
        # order+count sensitive checksum of the distinct table (scalars only
        # leave the device; the tunnel ships fetched outputs at 25-250MB/s)
        idx = jax.lax.broadcasted_iota(jnp.uint32, (CAP_OUT,), 0)
        weights = idx * jnp.uint32(2654435761) + counts.astype(jnp.uint32)
        chks = [jnp.sum(p * weights, dtype=jnp.uint32) for p in out_p]
        total = jnp.sum(counts)  # < 2^31 for this dataset
        return n, total, overflow, chks

    @jax.jit
    def count_repeated(all_codes, salt0):
        """REPS full counting runs inside one dispatch, each rep's input
        salted by the previous rep's checksum (data-dependent chaining:
        the remote tunnel caches identical executions and does not
        honor block_until_ready — BASELINE.md measurement notes).
        With REPS=1 this is a single plain run (no loop wrapper)."""
        if REPS == 1:
            n, total, ov, chks = count_once(all_codes, salt0)
            return (n.reshape(1), total.reshape(1), ov.reshape(1),
                    chks[0].reshape(1))

        def body(i, carry):
            salt, ns, totals, ovs, chk0s = carry
            n, total, ov, chks = count_once(all_codes, salt)
            ns = ns.at[i].set(n)
            totals = totals.at[i].set(total)
            ovs = ovs.at[i].set(ov)
            chk0s = chk0s.at[i].set(chks[0])
            return ((chks[0] & jnp.uint32(3)).astype(jnp.uint8),
                    ns, totals, ovs, chk0s)

        init = (salt0, jnp.zeros((REPS,), jnp.int32),
                jnp.zeros((REPS,), jnp.int32), jnp.zeros((REPS,), bool),
                jnp.zeros((REPS,), jnp.uint32))
        _, ns, totals, ovs, chk0s = jax.lax.fori_loop(0, REPS, body, init)
        return ns, totals, ovs, chk0s

    dataset = jnp.asarray(reads.reshape(n_batches, B, read_len))
    t0 = time.time()
    out = count_repeated(dataset, jnp.uint8(0))   # warmup/compile
    vals = [np.asarray(x) for x in out]
    t_warm = time.time() - t0
    assert not vals[2].any(), "CAP_OUT overflow — raise CAP_OUT"
    assert int(vals[1][0]) == total_reads * P, "total kmers mismatch"
    if full_dataset:
        assert int(vals[0][0]) == EXPECTED_DISTINCT, \
            f"distinct {int(vals[0][0])} != {EXPECTED_DISTINCT}"

    best = None
    for trial in range(3):  # best-of-3 calls (each = REPS chained runs)
        t0 = time.time()
        out = count_repeated(dataset, jnp.uint8(trial + 1))
        _ = [np.asarray(x) for x in out]
        elapsed = (time.time() - t0) / REPS
        best = elapsed if best is None else min(best, elapsed)
    reads_per_s = total_reads / best

    result = {
        "metric": "kmer_count_reads_per_s_chip_k31",
        "value": round(reads_per_s, 1),
        "unit": "reads/s",
        "vs_baseline": (round(reads_per_s / REF_READS_PER_S, 3)
                        if REF_READS_PER_S else None),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
