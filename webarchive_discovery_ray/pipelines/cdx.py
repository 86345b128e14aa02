"""CDX captures: per-record capture lines + global SURT-ordered sort.

Reference: CDX line generation
(``warc-hadoop-recordreaders/.../lib/DereferencingArchiveToCDXRecordReader.java:155-240``
— key = canonicalised URL key, value = the capture fields) and the
globally-sorted CDX job (``ArchiveCDXGenerator.java:185-243``, TotalOrder
partitioner + sampler). Ray Data's ``sort`` does its own range sampling, so
the explicit split file disappears (SURVEY.md O1).
"""

from __future__ import annotations

import pyarrow as pa

from ..config import IndexConfig, SyntheticConfig
from ..schema import CAPTURES_SCHEMA
from ..stages.extract import extract_batch

__all__ = ["captures_from_pages_batch", "cdx_sorted", "revisit_captures"]


def captures_from_pages_batch(batch: pa.Table, cfg: IndexConfig) -> pa.Table:
    """pages batch -> captures batch (M38): one CDX-style row per record
    surviving the extraction filters. Pure columnar projection (fill_null
    for the reference's '-' placeholders) — no row iteration."""
    import pyarrow.compute as pc

    docs = extract_batch(batch, cfg)
    if docs.num_rows == 0:
        return CAPTURES_SCHEMA.empty_table()
    return pa.table(
        {
            "surt_key": docs["surt"],
            "timestamp14": pc.fill_null(docs["wayback_date"], ""),
            "url": docs["url"],
            "mime": pc.fill_null(docs["content_type"], "-"),
            "status": docs["status"],
            "digest": pc.fill_null(docs["hash"], "-"),
            "length": docs["content_length"],
            "offset": docs["source_offset"],
            "filename": docs["source_file"],
            "record_type": docs["record_type"],
        }
    ).cast(CAPTURES_SCHEMA)


def cdx_sorted(
    n_pages: int = 400,
    scfg: SyntheticConfig | None = None,
    icfg: IndexConfig | None = None,
    num_blocks: int = 32,
):
    """Globally (surt_key, timestamp14)-sorted captures over the synthetic
    fixture — the CDX generation pipeline end to end (generation, capture
    projection and the range-partitioned sort all distributed)."""
    from ..sources.synthetic import fixture_pages_ds

    scfg = scfg or SyntheticConfig()
    icfg = icfg or IndexConfig(response_include=())  # CDX keeps all statuses
    return (
        fixture_pages_ds(n_pages, scfg, num_blocks)
        .map_batches(
            lambda b: captures_from_pages_batch(b, icfg),
            batch_format="pyarrow",
            batch_size=None,
        )
        .sort(["surt_key", "timestamp14"])
    )


def revisit_captures(n_pages: int = 400, scfg: SyntheticConfig | None = None):
    """Captures table (digest-keyed) for the reduplication pipeline (J3)."""
    return cdx_sorted(n_pages, scfg)
