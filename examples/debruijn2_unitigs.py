"""Unitigs + links + simplification (ref: examples/debruijn/debruijn24.cpp)."""
from gatb_core_tpu import Graph

graph = Graph.create("/root/reference/gatb-core/test/db/reads1.fa",
                     kmer_size=31, abundance_min=3, build_branching=False)
ug = graph.unitig_graph()
print("unitigs:", ug.nb_unitigs,
      "longest:", max(len(s) for s in ug.sequences))
ug.write_fasta("/tmp/unitigs_example.fa")
stats = graph.simplify()
print("simplify:", stats)
