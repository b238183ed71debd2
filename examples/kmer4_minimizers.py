"""Kmer model + minimizers over a sequence (ref: examples/kmer/kmer5.cpp
minimizer iteration)."""
import numpy as np
import jax.numpy as jnp
from gatb_core_tpu.ops.kmer_ops import extract_kmers, kmers_to_py
from gatb_core_tpu.kmer.model import kmer_to_string

seq = "CATTGATAGTCCAGTAATGACCGTTAACGATTAGC"
codes = np.frombuffer(seq.encode(), np.uint8)
lut = np.zeros(256, np.uint8)
for i, c in enumerate("ACTG"):
    lut[ord(c)] = i
k, m = 11, 5
batch = lut[codes][None, :]
kb = extract_kmers(jnp.asarray(batch), jnp.ones_like(batch, bool),
                   jnp.asarray([len(seq)], np.int32), k, m)
kmers = kmers_to_py(np.asarray(kb.kmers)[0][np.asarray(kb.valid)[0]])
mins = np.asarray(kb.minimizer)[0][np.asarray(kb.valid)[0]]
for v, mm in list(zip(kmers, mins))[:5]:
    print(kmer_to_string(v, k), "minimizer_hash:", hex(int(mm)))
print(f"{len(kmers)} canonical kmers")
