"""Storage byte streams inside HDF5 groups (ref: Storage::ostream /
istream, tools/storage/impl/Storage.cpp — the Repartitor and Leon
containers persist through these)."""
import tempfile
from gatb_core_tpu.storage.hdf5 import Storage

_fd, path = tempfile.mkstemp(suffix=".h5")
import os; os.close(_fd)
st = Storage(path, "w")
g = st.group("demo")
with g.ostream("blob") as os_:
    os_.write(b"reference-compatible ")
    os_.write(b"byte stream")
st.flush()

st2 = Storage(path, "r")
data = st2.group("demo").istream("blob").read()
print("round-tripped:", data.decode())
