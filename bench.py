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

# Persistent compilation cache dir: HARMLESS-BUT-INERT through the axon
# tunnel (verified r4: the remote backend does not serialize executables,
# so nothing is ever written — see CLAUDE.md). Kept so a future backend
# that does support serialization starts caching automatically; the real
# timeout defense is ONE compiled program + print-first below.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

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

    from gatb_core_tpu.ops.bitpack import pack_batch_np
    from gatb_core_tpu.ops.kmer_ops import extract_kmers_packed, nb_limbs
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
    CAP_OUT = 1 << 20   # > EXPECTED_DISTINCT, bounds the reduce output
    # REPS chained runs inside one dispatch amortize the tunnel's per-call
    # round trip (~110 ms measured); each rep's input is salted by the
    # previous rep's checksum. REPS=16 already amortizes the RTT to >10x
    # (BASELINE.md round-3 table) and compiles in roughly half the time
    # of REPS=32 through the tunnel — keep the official program small.
    REPS = int(os.environ.get("GATB_BENCH_REPS", 16))

    jlengths = jnp.full((B,), read_len, jnp.int32)

    def count_once(all_words, all_vmask, salt):
        # `salt` defeats the remote-execution cache (identical (program,
        # input) pairs are served from a tunnel cache, BASELINE.md notes);
        # salt=0 preserves the reference dataset. XOR with the 01-repeat
        # pattern flips each base's low bit — padding bits beyond a
        # read's length never reach a valid window's limbs.
        all_words = all_words ^ ((salt & jnp.uint8(1)).astype(jnp.uint32)
                                 * jnp.uint32(0x55555555))

        def ext(args):
            words, vmask = args
            # packed extraction: the words ARE the funnel-shift stream
            # (production transfer format — 2.25 bits/base on the link)
            kb = extract_kmers_packed(words, vmask, jlengths, K, read_len,
                                      with_minimizers=False)
            return (tuple(kb.kmers[..., j].reshape(-1) for j in range(w)),
                    kb.valid.reshape(-1))

        planes, val = jax.lax.map(ext, (all_words, all_vmask))
        flat = tuple(p.reshape(-1) for p in planes)
        fv = val.reshape(-1)
        # round-3 kernel: one flat lax.sort of all kmer planes (measured
        # faster than both the tiled Pallas bitonic and columnsort here)
        # + blocked two-level compaction (per-block minor-axis sorts + one
        # small global sort); ~100 ms/rep on v5e
        out_p, counts, n, overflow = count_planes(
            flat, fv, spare_bits=spare, cap_out=CAP_OUT, blocked=True)
        # order+count sensitive checksum of the distinct table (scalars only
        # leave the device; the tunnel ships fetched outputs at 25-250MB/s)
        idx = jax.lax.broadcasted_iota(jnp.uint32, (CAP_OUT,), 0)
        weights = idx * jnp.uint32(2654435761) + counts.astype(jnp.uint32)
        chks = [jnp.sum(p * weights, dtype=jnp.uint32) for p in out_p]
        total = jnp.sum(counts)  # < 2^31 for this dataset
        return n, total, overflow, chks

    @jax.jit
    def count_repeated(all_words, all_vmask, salt0):
        """REPS full counting runs inside one dispatch, each rep's input
        salted by the previous rep's checksum (data-dependent chaining:
        the remote tunnel caches identical executions and does not
        honor block_until_ready — BASELINE.md measurement notes).
        With REPS=1 this is a single plain run (no loop wrapper)."""
        if REPS == 1:
            n, total, ov, chks = count_once(all_words, all_vmask, salt0)
            return (n.reshape(1), total.reshape(1), ov.reshape(1),
                    chks[0].reshape(1))

        def body(i, carry):
            salt, ns, totals, ovs, chk0s = carry
            n, total, ov, chks = count_once(all_words, all_vmask, salt)
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

    # stage the dataset in the packed production transfer format
    words_np, vmask_np = pack_batch_np(
        reads.reshape(-1, read_len),
        np.ones((total_reads, read_len), bool))
    dataset_w = jnp.asarray(words_np.reshape(n_batches, B, -1))
    dataset_v = jnp.asarray(vmask_np.reshape(n_batches, B, -1))
    t0 = time.time()
    out = count_repeated(dataset_w, dataset_v, jnp.uint8(0))  # warm/compile
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
        out = count_repeated(dataset_w, dataset_v, jnp.uint8(trial + 1))
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
    # The official metric line prints FIRST, before any optional extra
    # work — round 3's bench never printed because the e2e section's
    # extra program compiles ran ahead of the print (VERDICT.md Missing #1).
    print(json.dumps(result), flush=True)
    if os.environ.get("GATB_BENCH_E2E", "0") == "1":
        e2e = run_e2e(reads[:total_reads])
        e2e.update(run_e2e_resident(reads[:total_reads]))
        print(json.dumps(e2e), flush=True)


def run_e2e_resident(reads):
    """Data-resident e2e: the bank is parsed/packed/staged on device ONCE
    (outside the timer); each trial then measures one full counting
    dispatch over the staged reads PLUS the solid-table down-fetch —
    the compute+result story with the 33 MB/s read-upload excluded
    (VERDICT r3 weak #3 asked for this figure next to the cold one).
    Three pre-salted input copies defeat the tunnel's execution cache."""
    import time as _t

    import jax
    import jax.numpy as jnp

    from gatb_core_tpu.kmer.counting import _superbatch_count, _fetch_table
    from gatb_core_tpu.ops.bitpack import pack_batch_np

    n_reads, read_len = reads.shape
    K = 31
    staged = []
    for salt in range(3):
        r = reads if salt == 0 else (reads ^ np.uint8(salt)) % 4
        words, vmask = pack_batch_np(r, np.ones_like(r, bool))
        staged.append((jnp.asarray(words[None]), jnp.asarray(vmask[None]),
                       jnp.asarray(np.full((1, n_reads), read_len,
                                           np.int32))))

    def once(w, v, l):
        out = _superbatch_count(w, v, l, jnp.int32(0), k=K, m=10,
                                nb_passes=1, spare=True, cap_out=1 << 20,
                                packed=True, L=read_len, blocked=True)
        n = int(np.asarray(out[2]))
        kmers, counts = _fetch_table(out[0], out[1], n, 2)
        return len(kmers), int(counts.sum())

    once(*staged[0])                       # compile + warm
    times = []
    for w, v, l in staged:
        t0 = _t.time()
        nd, tot = once(w, v, l)
        times.append(_t.time() - t0)
        assert tot == n_reads * (read_len - K + 1)
    rps = n_reads / min(times)
    return {
        "e2e_resident_reads_per_s": round(rps, 1),
        "e2e_resident_vs_baseline": round(rps / REF_READS_PER_S, 3),
    }


def run_e2e(reads):
    """End-to-end SortingCount.execute on the same reads, from a FASTA
    file on disk: native C++ parse -> packed host->device transfer ->
    superbatch sort/reduce -> solidity -> solid-table fetch. This is the
    production path the reference's fill_partitions+fill_solid_kmers
    numbers measure (SortingCountAlgorithm.cpp:636-780) — including the
    remote-tunnel transfer costs the kernel metric deliberately excludes.
    """
    import tempfile
    import time as _t

    from gatb_core_tpu.kmer.counting import SortingCount, CountConfig

    n_reads, read_len = reads.shape
    tmp = tempfile.NamedTemporaryFile(suffix=".fa", delete=False)
    tmp.close()
    write_fasta(tmp.name, reads)
    cfg = CountConfig(kmer_size=31, abundance_min=3, batch_reads=4096,
                      batch_len=read_len,
                      # 4 superbatches: host->device uploads of the next
                      # superbatch overlap device compute of the current
                      # one (the 33 MB/s tunnel is the e2e bottleneck)
                      superbatch_rows=n_reads * (read_len - 30) // 4,
                      # plan-style distinct estimate: ~1Mbp genome at 30x
                      distinct_ratio_hint=0.06)
    times = []
    res = None
    for trial in range(3):  # first run warms the compile cache
        t0 = _t.time()
        res = SortingCount(cfg).execute(tmp.name)
        times.append(_t.time() - t0)
    os.unlink(tmp.name)
    assert res.info["kmers_nb_valid"] == n_reads * (read_len - 30)
    best = min(times[1:])
    rps = n_reads / best
    return {
        "e2e_reads_per_s": round(rps, 1),
        "e2e_vs_baseline": (round(rps / REF_READS_PER_S, 3)
                            if REF_READS_PER_S else None),
        "e2e_nb_solid": int(res.nb_solid),
    }


if __name__ == "__main__":
    main()
