"""ClearCache equivalent (tools/ClearCache.cpp): evict the OS page cache
before benchmarking by allocating and touching the requested amount of
memory. Usage: python -m gatb_core_tpu.tools.clear_cache [MB]."""

from __future__ import annotations

import sys

import numpy as np

from ..misc.time_info import Progress


def clear(n_bytes: int, chunk_mb: int = 64, verbose: bool = True) -> int:
    """Touch n_bytes of fresh memory in chunks (the reference's clear()
    loop with a ProgressTimer, ClearCache.cpp:40-60). Returns bytes
    touched."""
    chunk = chunk_mb << 20
    nb_iter = max(1, (n_bytes + chunk - 1) // chunk)
    progress = Progress(nb_iter, "clear cache", verbose=verbose)
    touched = 0
    blocks = []
    for _ in range(nb_iter):
        size = min(chunk, n_bytes - touched)
        if size <= 0:
            break
        block = np.empty(size, np.uint8)
        block[::4096] = 1          # touch every page
        blocks.append(block)
        touched += size
        progress.inc(1)
    progress.finish()
    del blocks
    return touched


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    mb = int(argv[0]) if argv else 0
    clear(mb << 20)
    return 0


if __name__ == "__main__":
    sys.exit(main())
