"""Merge of pre-sorted runs — the engine primitive Ray Data lacks.

``Dataset.sort`` is a full range-sample + all-to-all exchange; when the
inputs are ALREADY globally sorted (CDX shards from prior jobs, per-wave
crawl outputs, compacted index runs), re-sorting ships every row through
the shuffle twice (sample + exchange) for nothing. ``merge_sorted_runs``
instead moves each row exactly once, directly to its output range task:

1. per-block (first, last, count) key fences are fetched with tiny remote
   tasks (keys only — the blocks stay in the object store);
2. output range boundaries come from the union of block-first fences
   (evenly spaced — since every input is sorted, block firsts are a
   uniform sample of the global key distribution, the same assumption
   Ray's own sort sampler makes);
3. one remote task per output range pulls ONLY the blocks intersecting
   its range (zero-copy object-store reads), slices each with a binary
   search, and merges the slices (stable by (input, row) on ties —
   pinned rule);
4. the result Dataset is assembled from the ordered task outputs, so it
   is globally sorted end to end.

Partitioning assumption (documented per the build brief): composite keys
join with ``\\x1f`` (0x1f sorts below every printable char, so the join
is order-preserving and prefix-safe for the engine's ASCII key columns
— surt_key/timestamp14/host). Reference precedent for merge-of-sorted:
the reference merges pre-sorted Solr shards and CDX streams rather than
re-sorting (`ArchiveCDXGenerator.java:185-243` relies on the
TotalOrderPartitioner producing already-ordered reducer outputs).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["merge_sorted_runs", "composite_key"]

_SEP = "\x1f"


def composite_key(tbl: pa.Table, keys: list[str]) -> np.ndarray:
    """Order-preserving composite string key (vectorized)."""
    import pyarrow.compute as pc

    if len(keys) == 1:
        col = pc.cast(tbl[keys[0]], pa.string())
        return col.to_numpy(zero_copy_only=False).astype(object)
    parts = [
        pc.cast(tbl[k], pa.string()).to_numpy(zero_copy_only=False).astype(object)
        for k in keys
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out + _SEP + p
    return out


def merge_sorted_runs(runs: list, keys: list[str], num_output_blocks: int | None = None):
    """Merge k datasets, each already sorted by ``keys``, into one
    globally sorted Dataset without a sort shuffle. Ties order by
    (run index, row position) — stable and pinned."""
    import ray
    import ray.data as rd

    refs_per_run = [r.to_arrow_refs() for r in runs]

    @ray.remote
    def fences(tbl: pa.Table) -> tuple:
        if tbl.num_rows == 0:
            return None
        ck = composite_key(tbl, keys)
        return (str(ck[0]), str(ck[-1]), tbl.num_rows)

    meta = [
        ray.get([fences.remote(b) for b in refs]) for refs in refs_per_run
    ]
    firsts: list[str] = []
    total_rows = 0
    for run_meta in meta:
        for m in run_meta:
            if m is not None:
                firsts.append(m[0])
                total_rows += m[2]
    if not firsts:
        return runs[0]
    firsts.sort()
    n_out = num_output_blocks or max(1, len(firsts))
    # boundaries: evenly spaced block-first fences (sorted inputs ⇒ the
    # fences sample the global distribution)
    if n_out > 1:
        idx = np.linspace(0, len(firsts) - 1, n_out + 1).astype(int)[1:-1]
        bounds = sorted(set(firsts[i] for i in idx))
    else:
        bounds = []
    los = [None] + list(bounds)
    his = list(bounds) + [None]

    schema = runs[0].schema().base_schema

    @ray.remote
    def merge_range(lo, hi, *blocks: pa.Table) -> pa.Table:
        slices = []
        for ri, tbl in enumerate(blocks):
            if tbl is None or tbl.num_rows == 0:
                continue
            ck = composite_key(tbl, keys)
            a = int(np.searchsorted(ck, lo, side="left")) if lo is not None else 0
            b = (
                int(np.searchsorted(ck, hi, side="left"))
                if hi is not None
                else tbl.num_rows
            )
            if b > a:
                slices.append((ri, tbl.slice(a, b - a), ck[a:b]))
        if not slices:
            return schema.empty_table()
        cks = np.concatenate([s[2] for s in slices])
        run_ix = np.concatenate(
            [np.full(len(s[2]), s[0], dtype=np.int64) for s in slices]
        )
        pos = np.concatenate(
            [np.arange(len(s[2]), dtype=np.int64) for s in slices]
        )
        order = np.lexsort((pos, run_ix, cks))
        merged = pa.concat_tables([s[1] for s in slices])
        return merged.take(pa.array(order, pa.int64()))

    # route each block only to ranges it can intersect (fence pruning)
    tasks = []
    for lo, hi in zip(los, his):
        blocks = []
        for refs, run_meta in zip(refs_per_run, meta):
            for ref, m in zip(refs, run_meta):
                if m is None:
                    continue
                first, last, _ = m
                if (hi is not None and first >= hi) or (
                    lo is not None and last < lo
                ):
                    continue
                blocks.append(ref)
        tasks.append(merge_range.remote(lo, hi, *blocks))
    # blocks stay in the object store — the driver holds only refs
    return rd.from_arrow_refs(tasks)
