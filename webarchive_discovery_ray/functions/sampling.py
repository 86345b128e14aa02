"""Deterministic sampling gates (O2/O3).

The reference's 1-in-N image sampling uses ``Math.random()``
(``warc-indexer/.../payload/ImageAnalyser.java:105-110``) — explicitly
non-reproducible. SURVEY.md §4.2(7) pins the new engine to seeded hashes
so distributed runs replay identically; the reservoir sampler keeps the
reference's fixed seed convention
(``ReservoirSamplingReducer.java:76-77``, seed 1231241245).
"""

from __future__ import annotations

from .hashing import stable_hash64

__all__ = ["seeded_gate", "seeded_reservoir"]

RESERVOIR_SEED = 1231241245  # the reference's fixed seed


def seeded_gate(key: str, one_in: int, seed: int = 0) -> bool:
    """Deterministic replacement for ``Math.random() < 1/N``: True for a
    stable 1-in-``one_in`` subset keyed by ``key``."""
    if one_in <= 1:
        return True
    return stable_hash64(f"gate:{key}", seed) % one_in == 0


def seeded_reservoir(keys: list[str], k: int, seed: int = RESERVOIR_SEED) -> list[int]:
    """Indices of a deterministic k-reservoir: rank every key by a seeded
    hash and keep the k smallest (equivalent sampling distribution to a
    reservoir pass, but order-independent => reproducible under any
    partitioning)."""
    if len(keys) <= k:
        return list(range(len(keys)))
    ranked = sorted(range(len(keys)), key=lambda i: (stable_hash64(keys[i], seed), i))
    return sorted(ranked[:k])
