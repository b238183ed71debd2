"""Unitig graph to GFA and back (ref: GraphUnitigs GFA load,
debruijn/impl/GraphUnitigs.cpp:669)."""
import numpy as np
from gatb_core_tpu.bank.fasta import BankStrings
from gatb_core_tpu.debruijn.graph import Graph
from gatb_core_tpu.debruijn.graph_unitigs import UnitigGraph

rng = np.random.default_rng(2)
genome = "".join(rng.choice(list("ACGT"), size=800))
g = Graph.create(BankStrings(genome, genome[200:], genome[:500]),
                 kmer_size=15, abundance_min=1, build_branching=False)
ug = g.unitig_graph()
ug.write_gfa("/tmp/example_unitigs.gfa")
back = UnitigGraph.load_gfa("/tmp/example_unitigs.gfa", 15)
print(f"{ug.nb_unitigs} unitigs round-tripped:",
      sorted(list(ug.sequences)) == sorted(list(back.sequences)))
