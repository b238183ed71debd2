"""leon-equivalent CLI: reference-free read compression
(reference tools/leon.cpp).

Usage:
  python -m gatb_core_tpu.tools.leon -c -file reads.fastq [-kmer-size 31]
  python -m gatb_core_tpu.tools.leon -d -file reads.fastq.leon [-out x.fastq]
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="leon")
    p.add_argument("-file", dest="file", required=True)
    p.add_argument("-c", dest="compress", action="store_true",
                   help="compress")
    p.add_argument("-d", dest="decompress", action="store_true",
                   help="decompress")
    p.add_argument("-kmer-size", dest="kmer_size", type=int, default=31)
    p.add_argument("-abundance", dest="abundance", type=int, default=2,
                   help="min abundance for the anchor dictionary")
    p.add_argument("-out", dest="out", default=None)
    args = p.parse_args(argv)

    if args.compress == args.decompress:
        print("choose exactly one of -c / -d", file=sys.stderr)
        return 1

    t0 = time.time()
    if args.compress:
        from ..compression.leon import LeonCompressor

        out = args.out or (args.file + ".leon")
        info = LeonCompressor(kmer_size=args.kmer_size,
                              abundance_min=args.abundance) \
            .compress(args.file, out)
        in_size = os.path.getsize(args.file)
        ratio = in_size / max(info["compressed_bytes"], 1)
        print(f"compressed {args.file} ({in_size} B) -> {out} "
              f"({info['compressed_bytes']} B), ratio {ratio:.2f}x, "
              f"{info['nb_reads']} reads, dict {info['dict_size']} kmers, "
              f"{time.time() - t0:.1f}s")
    else:
        from ..compression.leon import LeonDecompressor

        base = args.file[:-5] if args.file.endswith(".leon") else args.file
        out = args.out or (base + ".d")
        seqs = LeonDecompressor().decompress(args.file, out)
        print(f"decompressed {args.file} -> {out}, {len(seqs)} reads, "
              f"{time.time() - t0:.1f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
