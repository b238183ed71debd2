"""CountProcessor plugin API (kmer/count_processor.py).

Reference contract: ICountProcessor.hpp:92-200 (prototype/clone/
finishClones lifecycle, chain gating) + the kmer12.cpp custom-processor
snippet, ported in examples/kmer3_count_processor.py.
"""

import numpy as np
import pytest

from gatb_core_tpu.bank.fasta import BankStrings
from gatb_core_tpu.kmer.count_processor import (
    CountProcessor, CountProcessorChain, CountProcessorCollect,
    CountProcessorHistogram, CountProcessorSolidity)
from gatb_core_tpu.kmer.counting import (
    CountConfig, SortingCount, count_kmers, count_kmers_multibank)
from gatb_core_tpu.kmer.model import count_kmers_py

S1 = "ACGTACGTACGTACGTTTACCAGGTT"
S2 = "TTACCAGGTTACGTACGTAA"
K = 11


class RecordingProcessor(CountProcessor):
    """Checks the full lifecycle order and gathers per-part stats."""

    def __init__(self, log=None):
        self.log = log if log is not None else []
        self.total = 0
        self.distinct = 0

    def begin(self, config):
        self.log.append("begin")

    def end(self):
        self.log.append("end")

    def begin_pass(self, p):
        self.log.append(f"beginPass{p}")

    def end_pass(self, p):
        self.log.append(f"endPass{p}")

    def clone(self):
        c = RecordingProcessor(self.log)
        self.log.append("clone")
        return c

    def finish_clones(self, clones):
        self.log.append(f"finishClones{len(clones)}")
        for c in clones:
            if c is not self:
                self.total += c.total
                self.distinct += c.distinct

    def begin_part(self, pass_id, part_id, cache_size=0, name=""):
        self.log.append(f"beginPart{part_id}")

    def end_part(self, pass_id, part_id):
        self.log.append(f"endPart{part_id}")

    def process_table(self, part_id, kmers, counts, sums):
        self.total += int(np.sum(sums))
        self.distinct += len(kmers)
        return None


def test_custom_processor_lifecycle_and_totals():
    proc = RecordingProcessor()
    res = count_kmers(BankStrings(S1, S2), kmer_size=K, abundance_min=1,
                      processor=proc)
    truth = count_kmers_py([S1, S2], K)
    assert proc.distinct == len(truth) == res.info["kmers_nb_distinct"]
    assert proc.total == sum(truth.values())
    assert proc.log[0] == "begin" and proc.log[-1] == "end"
    assert "clone" in proc.log and "finishClones1" in proc.log
    i = proc.log.index
    assert i("beginPass0") < i("clone") < i("beginPart0") \
        < i("endPart0") < i("endPass0") < i("finishClones1") < i("end")


def test_custom_processor_multipass():
    proc = RecordingProcessor()
    res = count_kmers(BankStrings(S1, S2), kmer_size=K, abundance_min=1,
                      nb_passes=3, processor=proc)
    truth = count_kmers_py([S1, S2], K)
    assert proc.distinct == len(truth)
    assert proc.total == sum(truth.values())
    assert "finishClones3" in proc.log


def test_chain_gating_masks_downstream():
    hist = CountProcessorHistogram()
    sol = CountProcessorSolidity("sum", (2, 2**31 - 1))
    collect = CountProcessorCollect()
    chain = CountProcessorChain(hist, sol, collect)
    kmers = np.arange(10, dtype=np.uint32).reshape(5, 2)
    counts = np.array([[1], [2], [3], [1], [5]], np.int32)
    sums = counts[:, 0].astype(np.int64)
    keep = chain.process_table(0, kmers, counts, sums)
    assert keep.tolist() == [False, True, True, False, True]
    kk, cc, ss = collect.result(2)
    assert len(kk) == 3 and ss.tolist() == [2, 3, 5]
    # histogram saw ALL rows (it precedes solidity in the chain)
    assert int(hist.histogram.bins.sum()) == 5


def test_chain_get_instances():
    hist = CountProcessorHistogram()
    chain = CountProcessorChain(hist, CountProcessorCollect())
    assert chain.get(CountProcessorHistogram) is hist
    assert len(chain.get_instances()) == 3


def test_kmer12_port_common_kmers():
    """examples/kmer3_count_processor.py == numpy ground truth
    (kmer12.cpp semantics: pairs of banks sharing abundant kmers)."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from examples.kmer3_count_processor import CommonKmersProcessor

    bank_seqs = [[S1, S2], [S1], [S2, "AAACCCGGGTTTAAACCCGGG"]]
    banks = [BankStrings(*seqs) for seqs in bank_seqs]
    proc = CommonKmersProcessor(nb_banks=3, threshold=1)
    count_kmers_multibank(banks, kmer_size=K, abundance_min=1,
                          processor=proc)
    # ground truth from dict counting per bank
    per_bank = [count_kmers_py(seqs, K) for seqs in bank_seqs]
    union = set().union(*[set(d) for d in per_bank])
    for i in range(3):
        for j in range(i, 3):
            exp = sum(1 for kv in union
                      if per_bank[i].get(kv, 0) >= 1
                      and per_bank[j].get(kv, 0) >= 1)
            assert proc.get_count(i, j) == exp, (i, j)
