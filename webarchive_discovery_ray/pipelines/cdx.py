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

__all__ = [
    "captures_from_pages_batch",
    "cdx_sorted",
    "revisit_captures",
    "capture_intervals",
    "recrawl_schedule",
]


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


def capture_intervals(captures):
    """Per-URL capture history stats — the crawl-scheduling signal behind
    OutbackCDX's revisit decisions (``warc-hadoop-crawler-utils/.../recrawl``
    reads the same per-SURT fetch history): captures per surt_key, first /
    last capture timestamp, and the number of distinct content versions
    (digest changes). ONE hash-partitioned groupby on the capture key;
    timestamp14 strings order lexicographically so min/max are exact.
    Columns: surt_key, n_captures, first_ts14, last_ts14, n_versions."""
    import pandas as pd

    from ..functions.bucketing import bucket_of, default_buckets

    n_b = default_buckets()

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(bucket=bucket_of(df["surt_key"], n_b))

    def stats_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized over every SURT in the bucket (per-key map_groups
        # would pay one Python call per URL — functions/bucketing.py)
        g = df.groupby("surt_key", sort=False).agg(
            n_captures=("timestamp14", "size"),
            first_ts14=("timestamp14", "min"),
            last_ts14=("timestamp14", "max"),
            n_versions=("digest", "nunique"),
        )
        g = g.reset_index()
        g["n_captures"] = g["n_captures"].astype("int64")
        g["n_versions"] = g["n_versions"].astype("int64")
        return g

    return (
        captures.select_columns(["surt_key", "timestamp14", "digest"])
        .map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(stats_in_bucket, batch_format="pandas")
    )


_RECRAWL_DEFAULT_S = 2_592_000  # 30 days for single-capture URLs


def recrawl_schedule(captures):
    """Per-SURT recrawl schedule from the capture history — the decision
    OutbackCDX-backed crawlers make per URL (``warc-hadoop-crawler-utils``
    recrawl utilities read the same per-SURT history): URLs whose content
    changes often get short revisit intervals, static ones get long ones.

    All scheduling math is EXACT INTEGER arithmetic so the distributed
    result is bit-identical to the SQL mirror: change-rate in millis
    ``cr_m = 1000*(n_versions-1) // (n_captures-1)``, revisit interval
    ``next_fetch_s = span_s*(1500 - cr_m) // ((n_captures-1)*1000)``
    (1.5x the mean observed interval for static URLs scaling down to 0.5x
    for always-changing ones); single-capture URLs get the 30-day
    default. ONE bucketed grouped pass, same shape as
    :func:`capture_intervals`. Columns: surt_key, n_captures, n_versions,
    change_rate (exact double cr_m/1000), mean_interval_s, next_fetch_s.
    SQL-oracle-checked."""
    import pandas as pd

    from ..functions.bucketing import bucket_of, default_buckets

    n_b = default_buckets()

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(bucket=bucket_of(df["surt_key"], n_b))

    def schedule_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        epoch = (
            pd.to_datetime(df["timestamp14"], format="%Y%m%d%H%M%S")
            .astype("int64")
            // 1_000_000_000
        )
        d = df.assign(epoch=epoch)
        g = d.groupby("surt_key", sort=False).agg(
            n_captures=("epoch", "size"),
            first_e=("epoch", "min"),
            last_e=("epoch", "max"),
            n_versions=("digest", "nunique"),
        )
        n = g["n_captures"].astype("int64")
        v = g["n_versions"].astype("int64")
        span = (g["last_e"] - g["first_e"]).astype("int64")
        multi = n > 1
        denom = (n - 1).where(multi, 1)
        cr_m = (1000 * (v - 1) // denom).where(multi, 0).astype("int64")
        mean_iv = (span // denom).where(multi, 0).astype("int64")
        nxt = (span * (1500 - cr_m) // (denom * 1000)).where(
            multi, _RECRAWL_DEFAULT_S
        ).astype("int64")
        return pd.DataFrame(
            {
                "surt_key": g.index.to_numpy(),
                "n_captures": n.to_numpy(),
                "n_versions": v.to_numpy(),
                "change_rate": (cr_m / 1000.0).to_numpy(),
                "mean_interval_s": mean_iv.to_numpy(),
                "next_fetch_s": nxt.to_numpy(),
            }
        )

    return (
        captures.select_columns(["surt_key", "timestamp14", "digest"])
        .map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(schedule_in_bucket, batch_format="pandas")
    )
