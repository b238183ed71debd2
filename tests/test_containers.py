"""Tests for the container layer leftovers + iterator adaptors + system
info (mirrors reference TestBag/TestContainer/TestMap/TestIterators)."""

import numpy as np
import pytest

from gatb_core_tpu.collections.containers import (
    OAHash, Hash16, ContainerSet, BagFile, BagCache, IteratorFile,
)
from gatb_core_tpu.misc.iterators import (
    truncate, filter_it, composite, paired, SubjectIterator,
    CancellableIterator, Dispatcher, SerialDispatcher,
)
from gatb_core_tpu.system.info import SystemInfo, FileSystem


def test_oahash():
    h = OAHash(100)
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 1 << 60, 80).tolist()
    for k in keys:
        h.increment(k)
    for k in keys[:10]:
        h.increment(k)
    assert h.nb_items == len(set(keys))
    assert h.get(keys[0]) >= 2 if keys.count(keys[0]) == 1 else True
    got = dict(h.items())
    from collections import Counter
    exp = Counter(keys)
    for k in keys[:10]:
        exp[k] += 1
    assert got == dict(exp)


def test_oahash_full():
    h = OAHash(4)
    with pytest.raises(RuntimeError):
        for i in range(100):
            h.increment(i)


def test_hash16_sorted_iteration():
    h = Hash16()
    for k in [5, 3, 9, 3, 5, 5]:
        h.insert(k)
    assert list(h.sorted_items()) == [(3, 2), (5, 3), (9, 1)]
    assert h.nb_items == 3


def test_container_set():
    cs = ContainerSet([5, 1, 9])
    assert 5 in cs and 1 in cs and 9 in cs
    assert 4 not in cs
    assert len(cs) == 3


def test_bagfile_roundtrip(tmp_path):
    path = str(tmp_path / "bag.bin")
    with BagFile(path) as bag:
        cache = BagCache(bag, cache_size=3)
        for v in [1, -5, 1 << 40, 7, 0]:
            cache.insert(v)
        cache.flush()
    assert list(IteratorFile(path)) == [1, -5, 1 << 40, 7, 0]


def test_iterator_adaptors():
    assert list(truncate(range(10), 3)) == [0, 1, 2]
    assert list(filter_it(range(6), lambda x: x % 2 == 0)) == [0, 2, 4]
    assert list(composite([1, 2], [3], [4])) == [1, 2, 3, 4]
    assert list(paired([1, 2, 3], "ab")) == [(1, "a"), (2, "b")]

    notifications = []
    s = SubjectIterator(range(25), period=10)
    s.add_listener(notifications.append)
    assert len(list(s)) == 25
    assert notifications == [10, 20]

    c = CancellableIterator(range(100))
    out = []
    for x in c:
        out.append(x)
        if x == 4:
            c.cancel()
    assert out == [0, 1, 2, 3, 4]


def test_dispatcher():
    out = []
    n = SerialDispatcher().iterate(range(10), out.append)
    assert n == 10 and out == list(range(10))
    acc = []
    n = Dispatcher(nb_cores=2).iterate(range(100), acc.append,
                                       group_size=7)
    assert n == 100 and sorted(acc) == list(range(100))
    ran = []
    Dispatcher(nb_cores=2).dispatch_commands(
        [lambda i=i: ran.append(i) for i in range(5)])
    assert sorted(ran) == list(range(5))


def test_system_info():
    assert SystemInfo.nb_cores() >= 1
    assert SystemInfo.memory_physical_total_mb() > 0
    assert SystemInfo.memory_project_mb() > 0
    assert FileSystem.available_space_mb() > 0
    assert FileSystem.max_files_number() > 0
    info = SystemInfo.version_info()
    assert "jax" in info
