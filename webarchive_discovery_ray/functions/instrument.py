"""A5: hierarchical stage timers with top-k reporting.

Reference: ``warc-indexer/src/main/java/uk/bl/wa/util/Instrument.java:41-120``
— named, dotted-path timers accumulated per stage and logged as a top-20
list at job end (hooks at ``WARCIndexer.java:300,350,420,443,462-467``).

In the Ray engine, cross-task wall time comes from ``Dataset.stats()``;
this module covers the reference's IN-PROCESS breakdown: per-batch UDFs
time their sub-stages into a local Instrument, return the counters as an
extra metric column (or side output), and the driver merges instruments
with ``merge`` — the same pattern as Hadoop counters (A4)."""

from __future__ import annotations

import time
from collections import defaultdict

__all__ = ["Instrument"]


class Instrument:
    def __init__(self) -> None:
        self.total_ns: dict[str, int] = defaultdict(int)
        self.count: dict[str, int] = defaultdict(int)

    class _Timer:
        def __init__(self, inst: "Instrument", path: str):
            self.inst, self.path = inst, path

        def __enter__(self):
            self.t0 = time.monotonic_ns()
            return self

        def __exit__(self, *exc):
            self.inst.total_ns[self.path] += time.monotonic_ns() - self.t0
            self.inst.count[self.path] += 1
            return False

    def timer(self, path: str) -> "Instrument._Timer":
        """``with inst.timer("extract.tika.parse"): ...`` — dotted paths
        form the hierarchy, exactly like the reference's parent|child."""
        return Instrument._Timer(self, path)

    def add(self, path: str, ns: int, n: int = 1) -> None:
        self.total_ns[path] += ns
        self.count[path] += n

    def merge(self, other: "Instrument") -> "Instrument":
        for k, v in other.total_ns.items():
            self.total_ns[k] += v
        for k, v in other.count.items():
            self.count[k] += v
        return self

    def to_rows(self) -> list[dict]:
        return [
            {
                "path": k,
                "total_ms": self.total_ns[k] / 1e6,
                "count": self.count[k],
                "mean_ms": self.total_ns[k] / 1e6 / max(1, self.count[k]),
            }
            for k in self.total_ns
        ]

    def top_k(self, k: int = 20) -> list[dict]:
        """O4: the reference's top-20-by-total-time report."""
        return sorted(self.to_rows(), key=lambda r: -r["total_ms"])[:k]

    def report(self, k: int = 20) -> str:
        lines = [
            f"{r['path']}: {r['total_ms']:.1f}ms total, "
            f"{r['count']}x, {r['mean_ms']:.3f}ms mean"
            for r in self.top_k(k)
        ]
        return "\n".join(lines)
