"""Named stopwatch map + progress reporting.

Ports of gatb-core TimeInfo (tools/misc/impl/TimeInfo.hpp: named
stopwatches merged into every algorithm's info properties) and Progress /
ProgressTimerAndSystem (impl/Progress.cpp: progress bar with ETA + RSS).
"""

from __future__ import annotations

import sys
import time
from contextlib import contextmanager


class TimeInfo:
    """Accumulating named stopwatches (TimeInfo.hpp:1-170)."""

    def __init__(self):
        self.entries: dict[str, float] = {}
        self._starts: dict[str, float] = {}

    def start(self, name: str) -> None:
        self._starts[name] = time.time()

    def stop(self, name: str) -> None:
        t0 = self._starts.pop(name, None)
        if t0 is not None:
            self.entries[name] = self.entries.get(name, 0.0) \
                + (time.time() - t0)

    @contextmanager
    def section(self, name: str):
        """RAII equivalent of the TIME_INFO macro."""
        self.start(name)
        try:
            yield
        finally:
            self.stop(name)

    def merge(self, other: "TimeInfo") -> None:
        for k, v in other.entries.items():
            self.entries[k] = self.entries.get(k, 0.0) + v

    def get_properties(self, root: str = "time") -> dict:
        out = {root: round(sum(self.entries.values()), 3)}
        for k, v in self.entries.items():
            out[f"{root}.{k}"] = round(v, 3)
        return out


def max_rss_mb() -> float:
    """Current max RSS in MB (SystemInfo equivalent, /proc based)."""
    try:
        import resource

        return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
    except Exception:  # pragma: no cover
        return 0.0


class Progress:
    """Terminal progress listener (Progress.cpp): init/inc/finish with
    percentage, ETA and memory, throttled to ~1 update/sec."""

    def __init__(self, total: int, message: str = "", verbose: bool = True,
                 stream=None):
        self.total = max(total, 1)
        self.message = message
        self.done = 0
        self.verbose = verbose
        self.stream = stream or sys.stderr
        self.t0 = time.time()
        self._last = 0.0

    def inc(self, n: int = 1) -> None:
        self.done += n
        now = time.time()
        if self.verbose and (now - self._last) > 1.0:
            self._last = now
            pct = 100.0 * self.done / self.total
            elapsed = now - self.t0
            eta = elapsed / max(self.done, 1) * (self.total - self.done)
            self.stream.write(
                f"\r[{self.message}]  {pct:5.1f}%   elapsed: {elapsed:6.1f}s"
                f"   remaining: {eta:6.1f}s   mem: {max_rss_mb():7.1f} MB")
            self.stream.flush()

    def finish(self) -> None:
        if self.verbose:
            elapsed = time.time() - self.t0
            self.stream.write(
                f"\r[{self.message}]  100.0%   elapsed: {elapsed:6.1f}s"
                f"{' ' * 30}\n")
            self.stream.flush()
