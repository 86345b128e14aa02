"""Ray-Data-native crawl frontier + fetch scheduler (the north-rule core).

Iterative wave loop (SURVEY.md §7.0 crawl plane): per wave,

1. robots injection (driver, batched seen-probe via the shard pool);
2. **politeness drain** — ``groupby("host").map_groups``: per-host queues
   ordered by (priority, seq), robots Disallow drop, take-K token budget,
   carryover beyond budget (the groupby is the per-host co-location
   shuffle; politeness is serialised per host by construction);
3. **fetch + extract** — ``map_batches(FetchExtractStage)`` actor pool over
   Arrow batches: deterministic page generation (stands in for HTTP fetch)
   + the full extraction chain; documents written per-wave to partitioned
   parquet (resumable output layout);
4. **discovery** — outlink candidates ordered by (parent host, parent
   slot, rank), batch-probed against the sharded seen set, assigned global
   ``seq`` numbers, queued under the candidate's host.

Crawl ordering and the final seen set are byte-identical to
``oracle/crawl_oracle.py`` under the same seed list + politeness budget
(pinned rules documented there). Scale notes:

* the frontier is partitioned by host via the Dataset groupby; hot-host
  skew is bounded by the politeness budget itself (a host fetches at most
  K URLs per wave no matter how many are queued), and the drain's carryover
  keeps the queue in the object store, not the driver;
* at a 10^10-URL design point, steps 1/4's driver lists become Dataset
  ops (sort + per-partition offsets for seq assignment; groupby(surt) for
  within-wave dedup) and the seen shards page cold partitions to parquet —
  the wave-boundary contract is unchanged;
* checkpoint/resume at wave granularity with per-wave lineage + metrics
  (``state/checkpoint.py``).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import pandas as pd
import pyarrow as pa

from ..config import CrawlConfig, IndexConfig, SyntheticConfig
from ..functions.normalisation import canonicalise_url
from ..functions.suffix import MALFORMED_HOST, extract_host
from ..functions.surt import surt_key
from ..functions.urls import url_path
from ..oracle.crawl_oracle import candidate_ok, crawl_index_config
from ..schema import DOCUMENTS_SCHEMA
from ..sources.synthetic import page_for_url
from ..state.checkpoint import (
    latest_complete_wave,
    load_wave_checkpoint,
    write_wave_checkpoint,
)
from ..state.robots import is_disallowed, parse_robots, robots_url_for_host
from ..state.seen import SeenShardPool
from ..stages.extract import extract_record

__all__ = ["FetchExtractStage", "run_crawl", "CrawlResult", "FETCH_SCHEMA"]

_CRAWL_FIELDS = [
    ("wave", pa.int32()),
    ("fetch_host", pa.string()),
    ("slot", pa.int32()),
    ("hop", pa.int32()),
    ("priority", pa.int32()),
    ("seq", pa.int64()),
    ("selected", pa.bool_()),
    ("fetch_status", pa.int32()),
    ("is_robots", pa.bool_()),
    ("cand_urls", pa.list_(pa.string())),
    ("cand_surts", pa.list_(pa.string())),
    ("cand_hosts", pa.list_(pa.string())),
    ("robots_rules", pa.list_(pa.string())),
]

FETCH_SCHEMA = pa.schema(list(DOCUMENTS_SCHEMA) + [pa.field(n, t) for n, t in _CRAWL_FIELDS])

_DRIVER_COLUMNS = [
    "fetch_host", "slot", "url", "surt", "fetch_status",
    "is_robots", "cand_urls", "cand_surts", "cand_hosts",
    "robots_rules", "hop", "priority",
]


class FetchExtractStage:
    """Actor-pool stage: frontier entry -> fetched capture -> document.

    The page generator stands in for the HTTP fetch (FIXTURES.md §2); the
    extraction chain is the real one (``stages/extract.py``). State (config,
    detector tables) is built once per actor. Candidate outlinks are
    filtered + SURT/host-keyed HERE (in the parallel stage, per SURVEY.md
    §7.1 step 5's scale note) so the driver's discovery step only runs the
    sharded seen-probe and seq assignment."""

    def __init__(
        self,
        scfg: SyntheticConfig,
        icfg: IndexConfig | None = None,
        wave: int = 0,
        ccfg: CrawlConfig | None = None,
    ):
        self.scfg = scfg
        self.icfg = crawl_index_config(icfg)
        self.wave = wave
        self.ccfg = ccfg or CrawlConfig()

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for r in batch.to_pylist():
            if not r.get("selected", True):
                # politeness carryover: pass through untouched (null doc
                # columns) so drain+fetch run as ONE dataset execution
                out.append(
                    {
                        k: r[k]
                        for k in ("url", "surt", "host", "priority", "hop", "seq")
                    }
                    | {"wave": self.wave, "selected": False, "slot": -1}
                )
                continue
            rec = page_for_url(r["url"], self.scfg)
            doc = extract_record(rec, self.icfg)
            assert doc is not None, f"crawl extraction must not filter {r['url']}"
            is_robots = r["url"].endswith("/robots.txt")
            cands = set(doc["links"])
            if doc["redirect_to_norm"]:
                cands.add(doc["redirect_to_norm"])
            cand_urls = [
                u
                for u in sorted(cands)
                if candidate_ok(u, r["hop"], self.ccfg, self.icfg.max_url_length)
            ]
            doc.update(
                wave=self.wave,
                fetch_host=r["host"],
                slot=r["slot"],
                hop=r["hop"],
                priority=r["priority"],
                seq=r["seq"],
                selected=True,
                fetch_status=rec["status"],
                is_robots=is_robots,
                cand_urls=cand_urls,
                cand_surts=[surt_key(u) for u in cand_urls],
                cand_hosts=[extract_host(u) for u in cand_urls],
                robots_rules=(
                    parse_robots(rec["payload"].decode("utf-8", "replace"))
                    if is_robots and rec["status"] == 200
                    else []
                ),
            )
            out.append(doc)
        if not out:
            return FETCH_SCHEMA.empty_table()
        return pa.Table.from_pylist(out, schema=FETCH_SCHEMA)


def _make_drain_fn(budget: int, robots_rules: dict[str, list[str]]):
    """Vectorized politeness drain over a host-hash-partitioned block.

    The block holds every row of each host it contains (guaranteed by
    ``repartition(keys=["host"])``), so per-host queues are complete:
    order by (priority, seq), drop robots-Disallowed rows (injected robots
    fetches at priority -1 are exempt; only hosts WITH rules pay the
    per-row Python check), then ``cumcount`` assigns slots — first
    ``budget`` per host are selected, the rest carry over."""
    import numpy as np

    def drain(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["host", "priority", "seq"], kind="mergesort")
        if robots_rules:
            ruled = df["host"].map(lambda h: h in robots_rules)
            if ruled.any():
                sub = df.loc[ruled]
                keep = np.fromiter(
                    (
                        p == -1
                        or not is_disallowed(url_path(u), robots_rules[h])
                        for p, u, h in zip(
                            sub["priority"].to_numpy(), sub["url"], sub["host"]
                        )
                    ),
                    dtype=bool,
                    count=len(sub),
                )
                drop_idx = sub.index[~keep]
                if len(drop_idx):
                    df = df.drop(index=drop_idx)
        slots = df.groupby("host", sort=False).cumcount().to_numpy()
        return df.assign(
            slot=np.where(slots < budget, slots, -1).astype("int32"),
            selected=slots < budget,
        )

    return drain


def _split_by_host(frontier_table: pa.Table, n_parts: int) -> list[pa.Table]:
    """Hash-partition the frontier by host into one Arrow table per part
    (all rows of a host land in exactly one part — the politeness
    co-location invariant). Hashing touches only the UNIQUE hosts via
    dictionary encoding, not every row."""
    import numpy as np
    import pyarrow.compute as pc

    from ..functions.hashing import stable_hash64

    if n_parts <= 1 or frontier_table.num_rows == 0:
        return [frontier_table]
    dict_arr = pc.dictionary_encode(frontier_table["host"].combine_chunks())
    uniq = dict_arr.dictionary.to_pylist()
    part_of_uniq = np.fromiter(
        (stable_hash64(h, 11) % n_parts for h in uniq), dtype=np.int64, count=len(uniq)
    )
    parts = part_of_uniq[dict_arr.indices.to_numpy()]
    out = []
    for p in range(n_parts):
        mask = parts == p
        if mask.any():
            out.append(frontier_table.filter(pa.array(mask)))
    return out


@dataclass
class CrawlResult:
    fetch_log: list[dict] = field(default_factory=list)
    seen_sorted: list[str] = field(default_factory=list)
    wave_stats: list[dict] = field(default_factory=list)
    docs_dir: str | None = None
    total_fetched: int = 0
    total_docs: int = 0


def _seed_frontier(seeds, pool: SeenShardPool) -> tuple[list[dict], int]:
    urls, keys, hosts, pris = [], [], [], []
    for url, pri in seeds:
        u = canonicalise_url(url)
        host = extract_host(u)
        if host == MALFORMED_HOST:
            continue
        urls.append(u)
        keys.append(surt_key(u))
        hosts.append(host)
        pris.append(pri)
    frontier = []
    seq = 0
    for u, k, h, p, new in zip(urls, keys, hosts, pris, pool.add_if_new(keys)):
        if new:
            frontier.append(
                {"url": u, "surt": k, "host": h, "priority": p, "hop": 0, "seq": seq}
            )
            seq += 1
    return frontier, seq


def run_crawl(
    seeds: list[tuple[str, int]],
    ccfg: CrawlConfig,
    scfg: SyntheticConfig,
    icfg: IndexConfig | None = None,
    checkpoint_dir: str | None = None,
    docs_dir: str | None = None,
    resume: bool = False,
    fetch_concurrency: int = 4,
    fetch_batch_size: int = 64,
) -> CrawlResult:
    """Run the crawl (optionally resuming from the last complete wave)."""
    import ray  # noqa: F401  (ray.data execution context)
    import ray.data as rd

    res = CrawlResult(docs_dir=docs_dir)
    pool = SeenShardPool(ccfg.seen_shards)
    robots_scheduled: set[str] = set()
    robots_rules: dict[str, list[str]] = {}
    start_wave = 0

    if resume and checkpoint_dir is not None:
        last = latest_complete_wave(checkpoint_dir)
        if last is not None:
            ck = load_wave_checkpoint(checkpoint_dir, last)
            frontier = ck["frontier"]
            pool.restore(ck["snapshots"])
            robots_scheduled = ck["robots_scheduled"]
            robots_rules = {k: list(v) for k, v in ck["robots_rules"].items()}
            res.fetch_log = ck["fetch_log"]
            seq = ck["seq"]
            start_wave = last + 1
        else:
            frontier, seq = _seed_frontier(seeds, pool)
    else:
        frontier, seq = _seed_frontier(seeds, pool)

    for wave in range(start_wave, ccfg.max_waves):
        if not frontier:
            break
        # --- robots injection -------------------------------------------
        if ccfg.respect_robots:
            new_hosts = sorted(
                {e["host"] for e in frontier} - robots_scheduled
            )
            robots_scheduled.update(new_hosts)
            rurls = [robots_url_for_host(h) for h in new_hosts]
            rkeys = [surt_key(u) for u in rurls]
            for h, u, k, new in zip(
                new_hosts, rurls, rkeys, pool.add_if_new(rkeys) if rkeys else []
            ):
                if new:
                    frontier.append(
                        {"url": u, "surt": k, "host": h, "priority": -1, "hop": 0, "seq": -1}
                    )
        # --- politeness drain (groupby host) ----------------------------
        frontier_table = pa.Table.from_pylist(
            frontier,
            schema=pa.schema(
                [
                    ("url", pa.string()),
                    ("surt", pa.string()),
                    ("host", pa.string()),
                    ("priority", pa.int32()),
                    ("hop", pa.int32()),
                    ("seq", pa.int64()),
                ]
            ),
        )
        # ONE execution per wave: hash-partition by host (politeness
        # co-location, SURVEY.md §7.3) -> vectorized drain per block ->
        # fetch+extract (carryover passes through) -> materialize.
        # The frontier lives on the driver between waves (documented scale
        # path: at 10^10 URLs it stays a Dataset and this becomes
        # repartition(keys=["host"]) under the hash-shuffle strategy), so
        # the host partitioning is a zero-shuffle driver-side split into
        # one Arrow table per partition = one block each.
        drain_parts = max(1, min(fetch_concurrency * 2, len(frontier) // 64 + 1))
        drained = (
            rd.from_arrow(_split_by_host(frontier_table, drain_parts))
            .map_batches(
                _make_drain_fn(ccfg.politeness_budget, robots_rules),
                batch_format="pandas",
                batch_size=None,  # whole block: keeps host groups intact
            )
            .map_batches(
                FetchExtractStage(scfg, icfg, wave, ccfg),
                batch_format="pyarrow",
                batch_size=fetch_batch_size,
                concurrency=fetch_concurrency,
            )
            .materialize()
        )
        carryover = (
            drained.filter(expr="selected == False")
            .select_columns(["url", "surt", "host", "priority", "hop", "seq"])
            .take_all()
        )
        fetched = drained.filter(expr="selected == True")
        if docs_dir is not None:
            fetched.write_parquet(os.path.join(docs_dir, f"wave_{wave:04d}"))
        link_rows = sorted(
            fetched.select_columns(_DRIVER_COLUMNS).take_all(),
            key=lambda r: (r["fetch_host"], r["slot"]),
        )
        res.total_docs += len(link_rows)
        # --- fetch log + robots results ---------------------------------
        wave_log = []
        for r in link_rows:
            entry = {
                "order": len(res.fetch_log),
                "wave": wave,
                "host": r["fetch_host"],
                "slot": r["slot"],
                "url": r["url"],
                "surt": r["surt"],
                "status": r["fetch_status"],
            }
            res.fetch_log.append(entry)
            wave_log.append(entry)
        new_robots = {
            r["fetch_host"]: list(r["robots_rules"])
            for r in link_rows
            if r["is_robots"] and r["fetch_status"] == 200
        }
        # --- discovery (deterministic order + sharded seen probe) -------
        # candidates were filtered + SURT/host-keyed in the parallel fetch
        # stage; the driver only routes them through the seen shards.
        cand_entries: list[tuple[str, str, str, int, int]] = []
        for r in link_rows:
            hop, pri = r["hop"], r["priority"]
            for u, k, h in zip(r["cand_urls"], r["cand_surts"], r["cand_hosts"]):
                cand_entries.append((u, k, h, hop, pri))
        keys = [k for _, k, _, _, _ in cand_entries]
        new_mask = pool.add_if_new(keys) if keys else []
        next_frontier = carryover
        new_count = 0
        for (u, k, h, hop, pri), new in zip(cand_entries, new_mask):
            if not new:
                continue
            next_frontier.append(
                {
                    "url": u,
                    "surt": k,
                    "host": h,
                    "priority": pri,
                    "hop": hop + 1,
                    "seq": seq,
                }
            )
            seq += 1
            new_count += 1
        robots_rules.update(new_robots)
        stats = {
            "wave": wave,
            "frontier": len(frontier),
            "fetched": len(link_rows),
            "carryover": len(carryover),
            "new_urls": new_count,
        }
        res.wave_stats.append(stats)
        res.total_fetched += len(link_rows)
        # --- checkpoint --------------------------------------------------
        if checkpoint_dir is not None:
            write_wave_checkpoint(
                checkpoint_dir,
                wave,
                next_frontier,
                wave_log,
                pool.snapshot(),
                robots_scheduled,
                robots_rules,
                seq,
                stats,
            )
        frontier = next_frontier
        if ccfg.max_urls is not None and len(res.fetch_log) >= ccfg.max_urls:
            break

    res.seen_sorted = pool.all_keys_sorted()
    return res
