"""Wave-level checkpoint/resume with per-partition lineage + metrics.

North-rule requirement: the frontier and seen-set state are resumable; a
wave's checkpoint is complete only when its ``manifest.json`` exists (the
directory is written to a temp path and atomically renamed), so replays
skip completed waves and an interrupted run resumes exactly where the last
complete wave ended — the resumed run's fetch log and seen set must be
byte-identical to an uninterrupted run (tested in test_crawl_parity.py).

The seen set is checkpointed as PER-WAVE DELTAS (the SURT keys first seen
in that wave: seeds, injected robots URLs, discovery winners) — the
driver already holds exactly these, so a checkpoint costs O(wave growth),
not O(total seen): at the 10^10-URL design point a full-set snapshot per
wave would rewrite the entire corpus-scale set every wave. Restore =
union of deltas for waves 0..last.

Layout (one directory per wave)::

    {dir}/wave_0003/
        manifest.json          # wave, seq counter, row counts, lineage
        frontier_next.parquet  # frontier entering wave 4
        fetchlog.parquet       # fetches performed in wave 3
        seen_delta.parquet     # SURT keys first seen during wave 3
        content_delta.parquet  # content hashes first seen (dedup_content)
        robots.json            # scheduled hosts + effective rules
"""

from __future__ import annotations

import json
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

__all__ = ["write_wave_checkpoint", "latest_complete_wave", "load_wave_checkpoint"]

FRONTIER_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("surt", pa.string()),
        ("host", pa.string()),
        ("priority", pa.int32()),
        ("hop", pa.int32()),
        ("seq", pa.int64()),
    ]
)

FETCHLOG_SCHEMA = pa.schema(
    [
        ("order", pa.int64()),
        ("wave", pa.int32()),
        ("host", pa.string()),
        ("slot", pa.int32()),
        ("url", pa.string()),
        ("surt", pa.string()),
        ("status", pa.int32()),
    ]
)


def _wave_dir(base: str, wave: int) -> str:
    return os.path.join(base, f"wave_{wave:04d}")


def write_wave_checkpoint(
    base: str,
    wave: int,
    next_frontier: pa.Table,
    wave_fetch_log: pa.Table,
    seen_delta: list[str],
    robots_scheduled: set[str],
    robots_rules: dict[str, list[str]],
    seq: int,
    stats: dict,
    backoff_hosts: set[str] | None = None,
    content_delta: list[str] | None = None,
    host_fetched: dict[str, int] | None = None,
    adaptive_last_dur: dict[str, int] | None = None,
    retry_attempts: dict[str, int] | None = None,
    retry_pending: list[tuple] | None = None,
) -> None:
    os.makedirs(base, exist_ok=True)
    final = _wave_dir(base, wave)
    tmp = final + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    pq.write_table(
        next_frontier.cast(FRONTIER_SCHEMA),
        os.path.join(tmp, "frontier_next.parquet"),
    )
    pq.write_table(
        wave_fetch_log.cast(FETCHLOG_SCHEMA),
        os.path.join(tmp, "fetchlog.parquet"),
    )
    # store the 64-bit shard-routing hash beside each key: resume-time
    # shard filtering becomes one vectorized modulo instead of a per-key
    # sha1 in every shard actor (n_shards x the hashing otherwise)
    from ..functions.hashing import stable_hash64
    from .seen import _SHARD_SEED

    delta_sorted = sorted(seen_delta)
    pq.write_table(
        pa.table(
            {
                "surt": pa.array(delta_sorted, type=pa.string()),
                "h64": pa.array(
                    [stable_hash64(k, _SHARD_SEED) for k in delta_sorted],
                    type=pa.uint64(),
                ),
            }
        ),
        os.path.join(tmp, "seen_delta.parquet"),
    )
    if content_delta is not None:
        # content-seen deltas (dedup_content crawls): same layout as the
        # SURT deltas — the key column is NAMED "surt" so the shard-side
        # restore_from_parquet path (vectorized h64 routing) is reused
        # verbatim for both pools
        cd_sorted = sorted(content_delta)
        pq.write_table(
            pa.table(
                {
                    "surt": pa.array(cd_sorted, type=pa.string()),
                    "h64": pa.array(
                        [stable_hash64(k, _SHARD_SEED) for k in cd_sorted],
                        type=pa.uint64(),
                    ),
                }
            ),
            os.path.join(tmp, "content_delta.parquet"),
        )
    with open(os.path.join(tmp, "robots.json"), "w") as f:
        json.dump(
            {
                "scheduled": sorted(robots_scheduled),
                "rules": robots_rules,
                # one-wave 5xx-backoff state (absent in pre-backoff
                # checkpoints; load_wave_checkpoint defaults to empty)
                "backoff": sorted(backoff_hosts or ()),
                # max_pages_per_host quota counters (None when the quota
                # is off; loader defaults to {})
                "host_fetched": host_fetched,
                # adaptive-politeness per-host last-fetch durations
                # (None when the knob is off; loader defaults to {})
                "adaptive_last_dur": adaptive_last_dur,
                # retry_5xx state: per-surt attempt counts + the rows
                # pending re-injection into the NEXT wave
                "retry_attempts": retry_attempts,
                "retry_pending": (
                    [list(r) for r in retry_pending]
                    if retry_pending is not None
                    else None
                ),
            },
            f,
        )
    # manifest LAST: its presence marks the wave complete
    manifest = {
        "wave": wave,
        "seq": seq,
        "n_seen_delta": len(seen_delta),
        "n_frontier_next": next_frontier.num_rows,
        "n_fetched": wave_fetch_log.num_rows,
        "stats": stats,
    }
    with open(os.path.join(tmp, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    if os.path.exists(final):
        shutil.rmtree(final)
    os.rename(tmp, final)


def latest_complete_wave(base: str) -> int | None:
    if not os.path.isdir(base):
        return None
    waves = []
    for name in os.listdir(base):
        if name.startswith("wave_") and not name.endswith(".tmp"):
            if os.path.exists(os.path.join(base, name, "manifest.json")):
                waves.append(int(name.split("_")[1]))
    return max(waves) if waves else None


def load_wave_checkpoint(base: str, wave: int) -> dict:
    d = _wave_dir(base, wave)
    with open(os.path.join(d, "manifest.json")) as f:
        manifest = json.load(f)
    with open(os.path.join(d, "robots.json")) as f:
        robots = json.load(f)
    frontier = pq.read_table(os.path.join(d, "frontier_next.parquet"))
    # the seen set is NOT materialized here (VERDICT r3 #3): the driver
    # hands the per-wave delta paths to the shard actors, each of which
    # reads and absorbs only its own slice — resume cost on the driver is
    # O(#waves) paths, independent of crawl history size
    seen_delta_paths: list[str] = []
    content_delta_paths: list[str] = []
    log_parts = []
    for w in range(wave + 1):
        wd = _wave_dir(base, w)
        p = os.path.join(wd, "fetchlog.parquet")
        if os.path.exists(p):
            log_parts.append(pq.read_table(p))
        sd = os.path.join(wd, "seen_delta.parquet")
        if os.path.exists(sd):
            seen_delta_paths.append(sd)
        cd = os.path.join(wd, "content_delta.parquet")
        if os.path.exists(cd):
            content_delta_paths.append(cd)
    fetch_log = (
        pa.concat_tables(log_parts) if log_parts else FETCHLOG_SCHEMA.empty_table()
    )
    return {
        "manifest": manifest,
        "frontier": frontier,
        "seen_delta_paths": seen_delta_paths,  # per-wave delta files
        "content_delta_paths": content_delta_paths,  # dedup_content crawls
        "robots_scheduled": set(robots["scheduled"]),
        "robots_rules": robots["rules"],
        "backoff_hosts": set(robots.get("backoff", [])),
        "host_fetched": robots.get("host_fetched") or {},
        "adaptive_last_dur": robots.get("adaptive_last_dur") or {},
        "retry_attempts": robots.get("retry_attempts") or {},
        "retry_pending": robots.get("retry_pending") or [],
        "fetch_log": fetch_log,
        "seq": manifest["seq"],
    }


def crawl_lineage(base: str):
    """Per-wave lineage + metrics table from a checkpointed crawl run —
    the north rule's "per-partition lineage + metrics" surfaced as a
    queryable table: one row per COMPLETE wave (manifest present), with
    the manifest's row counts, the global seq watermark, and the wave's
    recorded stats. Driver-side file scan of #waves manifests (bounded:
    one small JSON per wave). Columns: wave, seq, n_fetched,
    n_frontier_next, n_seen_delta, plus flattened integer stats."""
    import pandas as pd

    rows = []
    if os.path.isdir(base):
        for name in sorted(os.listdir(base)):
            mpath = os.path.join(base, name, "manifest.json")
            if not name.startswith("wave_") or not os.path.exists(mpath):
                continue
            with open(mpath) as f:
                m = json.load(f)
            row = {
                "wave": int(m["wave"]),
                "seq": int(m["seq"]),
                "n_fetched": int(m["n_fetched"]),
                "n_frontier_next": int(m["n_frontier_next"]),
                "n_seen_delta": int(m["n_seen_delta"]),
            }
            for k, v in sorted((m.get("stats") or {}).items()):
                if isinstance(v, (int, float)) and not isinstance(v, bool):
                    row[f"stat_{k}"] = v
            rows.append(row)
    if rows:
        # no columns= pin: take the key UNION so a stat that first
        # appears after wave 0 still gets its column
        return pd.DataFrame(rows)
    return pd.DataFrame(
        columns=["wave", "seq", "n_fetched", "n_frontier_next", "n_seen_delta"]
    )
