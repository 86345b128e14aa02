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
    "fetch_host", "slot", "url", "surt", "host", "fetch_status",
    "is_robots", "cand_urls", "cand_surts", "cand_hosts",
    "robots_rules", "hop", "priority", "seq", "selected",
]

# scheduler-facing projection of FETCH_SCHEMA: what the driver loop needs
# for ordering, discovery and robots — no spans/payload-derived columns
DRIVER_SCHEMA = pa.schema(
    [pa.field(n, FETCH_SCHEMA.field(n).type) for n in _DRIVER_COLUMNS]
)


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
        driver_only: bool = False,
    ):
        self.scfg = scfg
        self.icfg = crawl_index_config(icfg)
        self.wave = wave
        self.ccfg = ccfg or CrawlConfig()
        # driver_only: no document sink this run — emit just the scheduler
        # columns (extraction still runs; link discovery needs it)
        self.driver_only = driver_only
        self.schema = DRIVER_SCHEMA if driver_only else FETCH_SCHEMA

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
            crawl_cols = dict(
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
            if self.driver_only:
                crawl_cols["url"] = doc["url"]
                crawl_cols["surt"] = doc["surt"]
                crawl_cols["host"] = doc["host"]
                out.append(crawl_cols)
            else:
                doc.update(crawl_cols)
                out.append(doc)
        if not out:
            return self.schema.empty_table()
        return pa.Table.from_pylist(out, schema=self.schema)


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


def _frontier_table(
    urls: list[str], surts: list[str], hosts: list[str],
    pris: list[int], hops: list[int], seqs: list[int],
) -> pa.Table:
    from ..state.checkpoint import FRONTIER_SCHEMA

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "surt": pa.array(surts, pa.string()),
            "host": pa.array(hosts, pa.string()),
            "priority": pa.array(pris, pa.int32()),
            "hop": pa.array(hops, pa.int32()),
            "seq": pa.array(seqs, pa.int64()),
        },
        schema=FRONTIER_SCHEMA,
    )


def _seed_frontier(seeds, pool: SeenShardPool) -> tuple[pa.Table, int]:
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
    fu, fk, fh, fp = [], [], [], []
    for u, k, h, p, new in zip(urls, keys, hosts, pris, pool.add_if_new(keys)):
        if new:
            fu.append(u)
            fk.append(k)
            fh.append(h)
            fp.append(p)
    n = len(fu)
    return _frontier_table(fu, fk, fh, fp, [0] * n, list(range(n))), n


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
    log_tables: list[pa.Table] = []
    start_wave = 0

    if resume and checkpoint_dir is not None:
        last = latest_complete_wave(checkpoint_dir)
        if last is not None:
            ck = load_wave_checkpoint(checkpoint_dir, last)
            frontier = ck["frontier"]
            pool.restore(ck["snapshots"])
            robots_scheduled = ck["robots_scheduled"]
            robots_rules = {k: list(v) for k, v in ck["robots_rules"].items()}
            if ck["fetch_log"].num_rows:
                log_tables.append(ck["fetch_log"])
            seq = ck["seq"]
            start_wave = last + 1
        else:
            frontier, seq = _seed_frontier(seeds, pool)
    else:
        frontier, seq = _seed_frontier(seeds, pool)

    import numpy as np
    import pyarrow.compute as pc

    from ..state.checkpoint import FETCHLOG_SCHEMA, FRONTIER_SCHEMA

    order_base = sum(t.num_rows for t in log_tables)
    for wave in range(start_wave, ccfg.max_waves):
        if frontier.num_rows == 0:
            break
        # --- robots injection -------------------------------------------
        if ccfg.respect_robots:
            new_hosts = sorted(
                set(pc.unique(frontier["host"]).to_pylist()) - robots_scheduled
            )
            robots_scheduled.update(new_hosts)
            rurls = [robots_url_for_host(h) for h in new_hosts]
            rkeys = [surt_key(u) for u in rurls]
            ru, rk, rh = [], [], []
            for h, u, k, new in zip(
                new_hosts, rurls, rkeys, pool.add_if_new(rkeys) if rkeys else []
            ):
                if new:
                    ru.append(u)
                    rk.append(k)
                    rh.append(h)
            if ru:
                robots_tbl = _frontier_table(
                    ru, rk, rh, [-1] * len(ru), [0] * len(ru), [-1] * len(ru)
                )
                frontier = pa.concat_tables([frontier, robots_tbl])
        # --- ONE execution per wave: hash-partition by host (politeness
        # co-location, SURVEY.md §7.3) -> vectorized drain per block ->
        # fetch+extract (carryover passes through) -> materialize.
        # The frontier lives on the driver between waves as an Arrow table
        # (documented scale path: at 10^10 URLs it stays a Dataset and this
        # becomes repartition(keys=["host"]) under the hash-shuffle
        # strategy); host partitioning is a zero-shuffle driver-side split
        # into one Arrow table per partition = one block each.
        frontier_rows = frontier.num_rows
        drain_parts = max(1, min(fetch_concurrency * 2, frontier_rows // 64 + 1))
        drained = (
            rd.from_arrow(_split_by_host(frontier, drain_parts))
            .map_batches(
                _make_drain_fn(ccfg.politeness_budget, robots_rules),
                batch_format="pandas",
                batch_size=None,  # whole block: keeps host groups intact
            )
            .map_batches(
                FetchExtractStage(
                    scfg, icfg, wave, ccfg, driver_only=docs_dir is None
                ),
                batch_format="pyarrow",
                batch_size=fetch_batch_size,
                concurrency=fetch_concurrency,
            )
        )
        if docs_dir is not None:
            # two consumers (doc sink + scheduler pull): materialize once
            drained = drained.materialize()
            drained.filter(expr="selected == True").write_parquet(
                os.path.join(docs_dir, f"wave_{wave:04d}")
            )
            pull = drained.select_columns(_DRIVER_COLUMNS)
        else:
            pull = drained  # single consumer: execute straight to refs
        drv = pa.concat_tables(ray.get(pull.to_arrow_refs())).combine_chunks()
        sel = drv["selected"]
        carry_tbl = (
            drv.filter(pc.invert(sel))
            .select(["url", "surt", "host", "priority", "hop", "seq"])
            .cast(FRONTIER_SCHEMA)
        )
        fetched_tbl = drv.filter(sel)
        # rule 4: global fetch order within a wave = (host, slot) ascending
        fetched_tbl = fetched_tbl.take(
            pc.sort_indices(
                fetched_tbl,
                sort_keys=[("fetch_host", "ascending"), ("slot", "ascending")],
            )
        )
        n_fetched = fetched_tbl.num_rows
        res.total_docs += n_fetched
        # --- fetch log (arrow, no row iteration) ------------------------
        wave_log_tbl = pa.table(
            {
                "order": pa.array(
                    np.arange(order_base, order_base + n_fetched), pa.int64()
                ),
                "wave": pa.array(np.full(n_fetched, wave, dtype=np.int32)),
                "host": fetched_tbl["fetch_host"],
                "slot": fetched_tbl["slot"],
                "url": fetched_tbl["url"],
                "surt": fetched_tbl["surt"],
                "status": fetched_tbl["fetch_status"],
            },
            schema=FETCHLOG_SCHEMA,
        )
        log_tables.append(wave_log_tbl)
        order_base += n_fetched
        # --- robots results (tiny subset) -------------------------------
        new_robots = {}
        robots_hits = fetched_tbl.filter(
            pc.and_(fetched_tbl["is_robots"], pc.equal(fetched_tbl["fetch_status"], 200))
        )
        for h, rules in zip(
            robots_hits["fetch_host"].to_pylist(), robots_hits["robots_rules"].to_pylist()
        ):
            new_robots[h] = list(rules)
        # --- discovery (deterministic order + sharded seen probe) -------
        # candidates were filtered + SURT/host-keyed in the parallel fetch
        # stage; flatten vectorized, probe the seen shards, and assign seq
        # numbers to first-unseen candidates in (host, slot, rank) order.
        cand_col = fetched_tbl["cand_urls"].combine_chunks()
        parents = pc.list_parent_indices(cand_col)
        cand_urls = pc.list_flatten(cand_col)
        cand_surts = pc.list_flatten(fetched_tbl["cand_surts"].combine_chunks())
        cand_hosts = pc.list_flatten(fetched_tbl["cand_hosts"].combine_chunks())
        cand_hops = pc.take(fetched_tbl["hop"], parents)
        cand_pris = pc.take(fetched_tbl["priority"], parents)
        keys = cand_surts.to_pylist()
        new_mask = np.array(pool.add_if_new(keys), dtype=bool) if keys else np.zeros(0, bool)
        new_idx = pa.array(np.nonzero(new_mask)[0])
        n_new = len(new_idx)
        new_tbl = pa.table(
            {
                "url": pc.take(cand_urls, new_idx),
                "surt": pc.take(cand_surts, new_idx),
                "host": pc.take(cand_hosts, new_idx),
                "priority": pc.take(cand_pris, new_idx),
                "hop": pc.add(pc.take(cand_hops, new_idx), 1),
                "seq": pa.array(np.arange(seq, seq + n_new), pa.int64()),
            }
        ).cast(FRONTIER_SCHEMA)
        seq += n_new
        next_frontier = pa.concat_tables([carry_tbl, new_tbl])
        robots_rules.update(new_robots)
        stats = {
            "wave": wave,
            "frontier": frontier_rows,
            "fetched": n_fetched,
            "carryover": carry_tbl.num_rows,
            "new_urls": n_new,
        }
        res.wave_stats.append(stats)
        res.total_fetched += n_fetched
        # --- checkpoint --------------------------------------------------
        if checkpoint_dir is not None:
            write_wave_checkpoint(
                checkpoint_dir,
                wave,
                next_frontier,
                wave_log_tbl,
                pool.snapshot(),
                robots_scheduled,
                robots_rules,
                seq,
                stats,
            )
        frontier = next_frontier
        if ccfg.max_urls is not None and order_base >= ccfg.max_urls:
            break

    res.fetch_log = (
        pa.concat_tables(log_tables).to_pylist() if log_tables else []
    )
    res.seen_sorted = pool.all_keys_sorted()
    return res
