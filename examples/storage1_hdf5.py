"""Storage tree persistence + reload (ref: examples/storage/storage1.cpp)."""
from gatb_core_tpu import Graph
from gatb_core_tpu.storage.hdf5 import Storage

graph = Graph.create("/root/reference/gatb-core/test/db/reads1.fa",
                     kmer_size=31, abundance_min=3,
                     output="/tmp/storage_example.h5")
graph.storage.close()
g2 = Graph.load("/tmp/storage_example.h5")
print("reloaded:", g2.nb_nodes, "state resumes after:",
      hex(g2.storage.get_state()))
g2.storage.close()
