"""Leon compression round-trip (ref: tools/leon — reads + qualities
through the range-coder container format)."""
import tempfile
from gatb_core_tpu.compression.leon import LeonCompressor, LeonDecompressor

_fd, fastq = tempfile.mkstemp(suffix=".fastq")
import os; os.close(_fd)
with open(fastq, "w") as f:
    for i, seq in enumerate(["ACGTACGTACGTGGCA", "TTGACCGTAGGCATAT"]):
        f.write(f"@r{i}\n{seq}\n+\n{'I' * len(seq)}\n")
out = fastq + ".leon"
LeonCompressor().compress(fastq, out)
seqs = LeonDecompressor().decompress(out)
print("lossless:", [s.data for s in seqs])
