"""Raw-file / gz-file storage backends (StorageFactory modes
STORAGE_FILE / STORAGE_GZFILE, Storage.hpp:66-76 + StorageFile.hpp):
same Group API as the HDF5 backend, so algorithm persistence round-trips
through any backend."""

import os

import numpy as np
import pytest

from gatb_core_tpu.storage.filedir import FileStorage, StorageFactory
from gatb_core_tpu.storage.hdf5 import STATE_SORTING_COUNT_DONE


@pytest.mark.parametrize("mode", ["file", "gzfile", "compressed-file"])
def test_file_storage_roundtrip(tmp_path, mode):
    st = StorageFactory.create(str(tmp_path / "store"), mode=mode,
                               file_mode="w")
    g = st.group("dsk")
    data = np.arange(100, dtype=np.uint64).reshape(25, 4)
    g.set_dataset("solid", data)
    g.set_property("nb", 25)
    sub = g.group("inner")
    sub.set_property("note", "deep")
    st.set_state_bit(STATE_SORTING_COUNT_DONE)

    st2 = StorageFactory.create(str(tmp_path / "store"), mode=mode)
    g2 = st2.group("dsk")
    assert np.array_equal(g2.get_dataset("solid"), data)
    assert g2.get_property("nb") == 25
    assert g2.group("inner").get_property("note") == "deep"
    assert st2.check_state(STATE_SORTING_COUNT_DONE)
    assert "solid" in g2 and "missing" not in g2


def test_file_storage_compound_and_streams(tmp_path):
    st = FileStorage(str(tmp_path / "s"), "w")
    dt = np.dtype([("value", np.uint64, (2,)), ("abundance", np.int32)])
    rec = np.zeros(5, dtype=dt)
    rec["value"] = np.arange(10).reshape(5, 2)
    rec["abundance"] = np.arange(5)
    g = st.group("dsk")
    g.set_dataset("solid", rec)
    back = st.group("dsk").get_dataset("solid")
    assert back.dtype == dt
    assert np.array_equal(back["value"], rec["value"])
    assert np.array_equal(back["abundance"], rec["abundance"])

    with g.ostream("blob") as os_:
        os_.write(b"hello ")
        os_.write(b"bytes")
    s = g.istream("blob")
    assert s.read() == b"hello bytes"


def test_file_storage_reference_layout(tmp_path):
    """The on-disk shape matches the reference's STORAGE_FILE scheme:
    a <name>_gatb/ directory with '.'-joined flat group files
    (StorageFile.hpp:57-75)."""
    st = FileStorage(str(tmp_path / "graph"), "w")
    st.group("dsk").group("histogram").set_property("cutoff", 3)
    folder = str(tmp_path / "graph_gatb")
    assert os.path.isdir(folder)
    assert os.path.exists(os.path.join(folder, "dsk.histogram.json"))


def test_factory_mode_errors(tmp_path):
    with pytest.raises(ValueError):
        StorageFactory.create(str(tmp_path / "x"), mode="nope")
