"""Bucketed grouped passes — the repo's scale-safe alternative to raw-key
``groupby``.

Measured on this Ray version (see BASELINE.md "grouped-pass discipline"):
``Dataset.groupby(key).aggregate(...)`` over raw rows costs ~1.3 ms/row of
Python-side accumulate (a 235k-row Count took 33-37 s at 32 CPUs under both
sort- and hash-shuffle strategies), and ``groupby(key).map_groups(fn)``
pays one Python ``fn`` call per DISTINCT key. Both are fine when the input
is pre-aggregated/small; both are pathological over per-token / per-URL /
per-user row streams.

The bucketed pass keeps the SAME co-location guarantee with bounded group
count: attach ``bucket = stable_hash(key) % n_buckets`` (vectorized),
``groupby("bucket").map_groups(fn)`` so the shuffle machinery handles only
``n_buckets`` groups, and do the real per-key grouping INSIDE ``fn`` with
vectorized pandas kernels. All rows of a key land in one bucket, so any
per-key computation stays exact; skew is bounded by the hash (salt the key
first if one key dominates a bucket).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["bucket_of", "default_buckets", "coalesce_blocks", "typed_empty"]

_KNUTH = np.uint64(2654435761)


def bucket_of(values: pd.Series, n_buckets: int) -> pd.Series:
    """Stable int32 bucket id per value (int or string keys; vectorized).

    Only co-location matters — the hash need not match any other engine's.
    Ints use a Knuth multiplicative mix (consecutive ids would otherwise
    stripe buckets); strings use ``pd.util.hash_array`` (deterministic,
    fixed hash key)."""
    arr = values.to_numpy()
    if arr.dtype.kind in "iu":
        h = (arr.astype(np.uint64) * _KNUTH) >> np.uint64(16)
    else:
        h = pd.util.hash_array(arr.astype(object), categorize=False)
    return pd.Series((h % np.uint64(n_buckets)).astype(np.int32), index=values.index)


def coalesce_blocks(ds, target_block_bytes: int = 16 << 20):
    """Materialize a Dataset and re-pin its block count to its SIZE.

    A narrow stream produced by per-block map tasks inherits the corpus
    read's parallelism (e.g. 64 near-empty blocks for a few-MB candidate
    list), and every downstream all-to-all (groupby / sort) then pays
    scheduling per block — measured here: a 3-sort chain over 64–192 tiny
    blocks costs seconds of pure orchestration for milliseconds of
    compute. Re-pinning to ``ceil(size_bytes / target_block_bytes)``
    blocks makes the exchange data-sized. At real scale this is a no-op:
    when upstream blocks already hold ≥ ``target_block_bytes`` the
    condition never triggers and no extra exchange is added (the
    materialize is free — every all-to-all barriers its input anyway)."""
    m = ds.materialize()
    nb = m.num_blocks()
    target = max(1, min(nb, -(-m.size_bytes() // target_block_bytes)))
    if target < nb:
        m = m.repartition(target).materialize()
    return m


def typed_empty(**cols: str) -> pd.DataFrame:
    """Empty frame with declared dtypes.

    When a grouped pass's upstream is completely empty, Ray hands the
    ``map_groups`` fn a ZERO-COLUMN empty block — a fn that immediately
    sorts/groups by name then raises KeyError. Grouped fns guard with
    ``if not len(df): return typed_empty(col=dtype, ...)`` so the empty
    pipeline stays schema-stable end to end."""
    return pd.DataFrame({k: pd.Series([], dtype=v) for k, v in cols.items()})


def default_buckets(min_b: int = 16, per_cpu: int = 2, cap: int = 128) -> int:
    """Bucket count sized to the cluster: enough groups to spread over
    every CPU (×``per_cpu`` for stragglers), capped so tiny clusters do
    not shuffle hundreds of near-empty buckets."""
    import ray

    n_cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return int(min(cap, max(min_b, n_cpus * per_cpu)))
