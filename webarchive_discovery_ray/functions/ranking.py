"""Distributed global row_number — the rank-assignment primitive behind
order-statistic operators (rank-normalized signal blending, seeded
shuffle ranks, percentile exports).

Same two-phase device as ``pipelines/sessions.global_shuffle``: ONE
range-partitioned sort, then per-block offsets from a block-count-bounded
driver fold of block sizes (never row data), then an embarrassingly
parallel per-block arange. Total order must be made unambiguous by the
caller (append a unique id as the last sort key), which also makes the
assignment bit-identical to a SQL ``row_number() OVER (ORDER BY ...)``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["global_row_number"]


def global_row_number(ds, sort_cols, descending, rank_col, keep_cols):
    """1-based global row_number over ``sort_cols`` (per-key ``descending``
    flags). Returns a Dataset of ``keep_cols + [rank_col]``; the input
    never materializes on the driver (only per-block row counts do)."""
    import ray
    import ray.data as rd

    sorted_ds = ds.sort(sort_cols, descending=descending).materialize()
    refs = sorted_ds.to_arrow_refs()

    @ray.remote
    def block_rows(tbl: pa.Table) -> int:
        return tbl.num_rows

    counts = ray.get([block_rows.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)

    @ray.remote
    def rank_block(tbl: pa.Table, base: int) -> pa.Table:
        cols = {c: tbl[c] for c in keep_cols}
        cols[rank_col] = pa.array(
            np.arange(base + 1, base + 1 + tbl.num_rows, dtype=np.int64)
        )
        return pa.table(cols)

    out = [
        rank_block.remote(r, int(o)) for r, o in zip(refs, offsets)
    ]
    return rd.from_arrow_refs(out)
