"""Mesh-sharded postsolid: adjacency + debloom + unitigs over an
8-device mesh, equal to single-device (ref: the Dispatcher-parallel
sweeps in DebloomAlgorithm.cpp:270-300 / Graph.cpp:3508-3610)."""
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
import numpy as np
from gatb_core_tpu.bank.fasta import BankStrings
from gatb_core_tpu.debruijn.graph import Graph
from gatb_core_tpu.parallel.mesh import make_mesh

rng = np.random.default_rng(21)
genome = "".join(rng.choice(list("ACGT"), size=900))
reads = [genome[s:s+100] for s in rng.integers(0, 800, size=120)]
mesh = make_mesh(8)
g1 = Graph.create(BankStrings(*reads), kmer_size=15, abundance_min=1)
g2 = Graph.create(BankStrings(*reads), kmer_size=15, abundance_min=1,
                  mesh=mesh)
same_adj = (g1.precompute_adjacency() == g2.precompute_adjacency()).all()
same_cfp = (g1._debloom.cfp == g2._debloom.cfp).all()
print(f"8-device mesh postsolid == single-device: adjacency={same_adj} "
      f"cfp={same_cfp} checksum={g1.checksum_branching() == g2.checksum_branching()}")
