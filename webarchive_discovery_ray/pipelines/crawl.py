"""Ray-Data-native crawl frontier + fetch scheduler (the north-rule core).

Iterative wave loop (SURVEY.md §7.0 crawl plane). The frontier lives in
the OBJECT STORE between waves as host-hash-partitioned Arrow blocks; the
driver handles only refs, counts, winner merging and robots bookkeeping —
no candidate URL ever crosses the driver unless it wins discovery.

Per wave:

1. **assemble** — per partition, a remote task concatenates the previous
   wave's carryover block (still in the object store) with the new rows
   (previous winners + freshly injected robots fetches, host-hash-routed);
2. **politeness drain** — vectorized per-block drain (blocks are complete
   host groups by construction): order (priority, seq), robots-Disallow
   drop, cumcount slot assignment under the per-host budget;
3. **fetch + extract** — ONE plain Ray task per block fuses the drain
   with deterministic page generation (stands in for HTTP fetch) + the
   full extraction chain; candidate outlinks are filtered + SURT-keyed in
   the task and emitted as list columns; when a document sink is
   attached, docs are written straight to per-(wave, partition) parquet
   fragments (atomic publish, resumable layout);
4. **candidate routing** — a split task (chained on the block ref, so it
   overlaps with still-running fetches) flattens + shard-keys the
   candidates (vectorized); the DRIVER routes the wave's blocks to the
   seen shards BY REFERENCE, ONE batched call per shard — tasks never
   call actors (a task-side RPC couples fetch slots to actor channel
   health and one delayed message stalls the wave), candidate bytes
   never touch the driver, and shards read the shared blocks zero-copy;
5. **discovery barrier** — each seen shard sorts its candidates by the
   pinned global order key (parent host, parent slot, link rank) and
   keeps first-unseen SURTs (vectorized batch dedup + batched
   cuckoo/bloom absorption); the winner merge is a TWO-PHASE PARALLEL
   SORT: the driver blocks only on per-shard smalls (counts, hosts,
   order_host boundary samples) and tiny per-range counts, then
   range-parallel tasks each merge one order_host range (binary-search
   slices of the pre-sorted shard tables), assign exact global ``seq``
   from per-range offsets, and hash-partition their slice — the next
   wave's assembly consumes the per-(range, part) outputs by reference.
   The per-wave fetch-log concat/sort/build runs fully OFF the critical
   path (wave counts and robots rules come from the split metas; one
   durability barrier at crawl end joins the streamed log writes).

Crawl ordering and the final seen set are byte-identical to
``oracle/crawl_oracle.py`` under the same seed list + politeness budget
(pinned rules documented there). Checkpoint/resume at wave granularity
with per-wave lineage + metrics (``state/checkpoint.py``).

Scale notes: hot-host skew is bounded by the politeness budget itself (a
host fetches at most K URLs per wave no matter how many are queued) and
carryover stays in the object store; the driver's per-wave work is
O(winners + fetched), independent of frontier size.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import CrawlConfig, IndexConfig, SyntheticConfig
from ..functions.hashing import stable_hash64
from ..functions.normalisation import canonicalise_url
from ..functions.suffix import MALFORMED_HOST, extract_host
from ..functions.surt import surt_key
from ..functions.urls import url_path
from ..oracle.crawl_oracle import candidate_ok, crawl_index_config
from ..schema import DOCUMENTS_SCHEMA
from ..state.checkpoint import (
    FETCHLOG_SCHEMA,
    FRONTIER_SCHEMA,
    latest_complete_wave,
    load_wave_checkpoint,
    write_wave_checkpoint,
)
from ..state.robots import (
    adaptive_budget_cap,
    effective_budget,
    fetch_duration_ms,
    is_disallowed,
    nofollow_scan,
    parse_robots,
    is_sitemap_index,
    parse_sitemap_locs,
    robots_url_for_host,
    sitemap_urls_of,
)
from ..state.seen import SeenShardPool, shard_of
from ..stages.extract import extract_record

__all__ = ["FetchExtractStage", "run_crawl", "CrawlResult", "DOCS_OUT_SCHEMA"]

# frontier blocks carry a stable partition id so carryover can be routed
# back to its host partition without inspecting rows
PART_SCHEMA = pa.schema(list(FRONTIER_SCHEMA) + [pa.field("part", pa.int32())])

# scheduler-facing output of the fetch stage (carry rows pass through with
# null fetch columns); candidate outlinks ride as list columns until the
# split task flattens + shard-keys them
OUT_SCHEMA = pa.schema(
    list(PART_SCHEMA)
    + [
        pa.field("slot", pa.int32()),
        pa.field("selected", pa.bool_()),
        pa.field("fetch_host", pa.string()),
        pa.field("fetch_status", pa.int32()),
        pa.field("is_robots", pa.bool_()),
        pa.field("robots_rules", pa.list_(pa.string())),
        pa.field("cand_urls", pa.list_(pa.string())),
        pa.field("cand_surts", pa.list_(pa.string())),
        pa.field("cand_hosts", pa.list_(pa.string())),
        # enqueue priority for THIS row's candidates: -1 when the row is
        # a fetched <sitemapindex> (children are sitemaps and recurse),
        # else max(parent priority, 0) — the pinned discovery rule
        pa.field("cand_pri", pa.int32()),
        # extraction payload hash of status-200 responses ("" otherwise):
        # the duplicate-content gate key (ccfg.dedup_content)
        pa.field("content_hash", pa.string()),
        # modeled fetch duration (state/robots.fetch_duration_ms): the
        # adaptive-politeness input, folded per host in the split meta
        pa.field("fetch_ms", pa.int32()),
        # WARC-sink carriers (populated only when ccfg.warc_dir is set —
        # empty strings / b"" otherwise, so the schema stays stable and
        # non-WARC crawls ship four constant columns): the raw capture
        # fields the per-block writer task serialises into response /
        # revisit members. Payload bytes move fetcher -> writer through
        # the object store exactly once (zero-copy Arrow binary).
        pa.field("w_ts14", pa.string()),
        pa.field("w_mime", pa.string()),
        pa.field("w_loc", pa.string()),
        pa.field("w_payload", pa.binary()),
    ]
)

# flattened candidate rows (built by the split task, routed by ref to the
# seen shards; ``shard`` pre-computed so each actor self-filters its rows)
CAND_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("surt", pa.string()),
        ("host", pa.string()),
        ("priority", pa.int32()),
        ("hop", pa.int32()),
        ("order_host", pa.string()),
        ("order_slot", pa.int32()),
        ("order_rank", pa.int32()),
        ("shard", pa.int32()),
    ]
)

# document-sink rows (per-wave, per-partition parquet fragments)
DOCS_OUT_SCHEMA = pa.schema(
    list(DOCUMENTS_SCHEMA)
    + [
        pa.field("wave", pa.int32()),
        pa.field("fetch_host", pa.string()),
        pa.field("slot", pa.int32()),
        pa.field("hop", pa.int32()),
        pa.field("priority", pa.int32()),
        pa.field("seq", pa.int64()),
        pa.field("fetch_status", pa.int32()),
        pa.field("is_robots", pa.bool_()),
    ]
)


class FetchExtractStage:
    """Fetch + extract, one task per frontier block.

    The page generator stands in for the HTTP fetch (FIXTURES.md §2); the
    extraction chain is the real one (``stages/extract.py``). Candidate
    outlinks are filtered + SURT/host-keyed here and emitted as LIST
    columns on the fetched rows — routing to the seen shards happens via
    driver-submitted by-reference actor calls (tasks never call actors:
    a task-side RPC couples every fetch slot to actor-channel health,
    and one delayed message stalls the wave on Ray's 30s seq_no timeout).
    Docs (when a sink is attached) are written as one parquet fragment
    per (wave, partition) — the resumable layout."""

    def __init__(
        self,
        scfg: SyntheticConfig,
        icfg: IndexConfig | None,
        wave: int,
        ccfg: CrawlConfig,
        docs_dir: str | None = None,
    ):
        self.scfg = scfg
        self.icfg = crawl_index_config(icfg)
        self.wave = wave
        self.ccfg = ccfg
        self.docs_dir = docs_dir
        self.warc = ccfg.warc_dir is not None

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: list[dict] = []
        docs: list[dict] | None = [] if self.docs_dir is not None else None
        part = int(batch["part"][0].as_py()) if batch.num_rows else -1
        for r in batch.to_pylist():
            if not r.get("selected", True):
                out.append(
                    {
                        k: r[k]
                        for k in ("url", "surt", "host", "priority", "hop", "seq", "part")
                    }
                    | {"selected": False, "slot": -1}
                )
                continue
            rec = page_for_url_cached(r["url"], self.scfg)
            doc = extract_record(rec, self.icfg)
            assert doc is not None, f"crawl extraction must not filter {r['url']}"
            is_robots = r["url"].endswith("/robots.txt")
            cset = set(doc["links"])
            if (
                self.ccfg.respect_nofollow
                and cset
                and b"nofollow" in rec["payload"]
            ):
                # rel=nofollow / meta-robots gate (state/robots.
                # nofollow_scan); substring pre-gate keeps the extra
                # token scan off every default page
                meta_nf, nf_drop = nofollow_scan(
                    rec["payload"].decode("utf-8", "replace"),
                    r["url"],
                    self.icfg.normalise_links,
                )
                cset = set() if meta_nf else cset - nf_drop
            if doc["redirect_to_norm"]:
                cset.add(doc["redirect_to_norm"])
            cand_pri = max(r["priority"], 0)
            if r["priority"] == -1 and not is_robots and rec["status"] == 200:
                # injected sitemap fetch (the only non-robots -1 rows):
                # <loc> URLs join the candidates, canonicalised like links
                text = rec["payload"].decode("utf-8", "replace")
                cset.update(
                    canonicalise_url(x) for x in parse_sitemap_locs(text)
                )
                if is_sitemap_index(text):
                    # index file: its locs are CHILD SITEMAPS — they keep
                    # priority -1 (fetched + parsed as sitemaps in turn),
                    # riding the normal checkpointed frontier
                    cand_pri = -1
            cand_urls = [
                u
                for u in sorted(cset)
                if candidate_ok(u, r["hop"], self.ccfg, self.icfg.max_url_length)
            ]
            crawl_cols = {
                "url": doc["url"],
                "surt": doc["surt"],
                "host": r["host"],
                "priority": r["priority"],
                "hop": r["hop"],
                "seq": r["seq"],
                "part": r["part"],
                "slot": r["slot"],
                "selected": True,
                "fetch_host": r["host"],
                "fetch_status": rec["status"],
                "is_robots": is_robots,
                "robots_rules": (
                    parse_robots(rec["payload"].decode("utf-8", "replace"))
                    if is_robots and rec["status"] == 200
                    else []
                ),
                "cand_urls": cand_urls,
                "cand_surts": [surt_key(u) for u in cand_urls],
                "cand_hosts": [extract_host(u) for u in cand_urls],
                "cand_pri": cand_pri,
                "content_hash": doc["hash"] if rec["status"] == 200 else "",
                "fetch_ms": fetch_duration_ms(
                    rec["status"], len(rec["payload"] or b"")
                ),
                "w_ts14": rec["timestamp14"] if self.warc else "",
                "w_mime": (rec["mime_served"] or "") if self.warc else "",
                "w_loc": (rec["location"] or "") if self.warc else "",
                "w_payload": rec["payload"] if self.warc else b"",
            }
            out.append(crawl_cols)
            if docs is not None:
                doc.update(
                    wave=self.wave,
                    fetch_host=r["host"],
                    slot=r["slot"],
                    hop=r["hop"],
                    priority=r["priority"],
                    seq=r["seq"],
                    fetch_status=rec["status"],
                    is_robots=is_robots,
                )
                docs.append(doc)
        # --- document sink: one fragment per (wave, partition) ----------
        if docs:
            import uuid

            import pyarrow.parquet as pq

            d = os.path.join(self.docs_dir, f"wave_{self.wave:04d}")
            os.makedirs(d, exist_ok=True)
            # atomic publish: a retried/reconstructed task may write the
            # same fragment concurrently — tmp + os.replace guarantees the
            # final file is one writer's COMPLETE (deterministic) output,
            # never a torn interleaving
            final = os.path.join(d, f"part_{part:05d}.parquet")
            tmp = f"{final}.tmp-{uuid.uuid4().hex}"
            pq.write_table(pa.Table.from_pylist(docs, schema=DOCS_OUT_SCHEMA), tmp)
            os.replace(tmp, final)
        if not out:
            return OUT_SCHEMA.empty_table()
        return pa.Table.from_pylist(out, schema=OUT_SCHEMA)


def page_for_url_cached(url: str, scfg: SyntheticConfig) -> dict:
    """Synthetic fetch (module-level indirection keeps the stage picklable
    while letting tests monkeypatch the fetch)."""
    from ..sources.synthetic import page_for_url

    return page_for_url(url, scfg)


def _robots_drop(df: pd.DataFrame, robots_rules: dict[str, list[str]]) -> pd.DataFrame:
    """Drop robots-Disallowed rows (injected robots fetches at priority -1
    are exempt; only hosts WITH rules pay the per-row Python check)."""
    if not robots_rules:
        return df
    ruled = df["host"].map(lambda h: h in robots_rules)
    if not ruled.any():
        return df
    sub = df.loc[ruled]
    keep = np.fromiter(
        (
            p == -1 or not is_disallowed(url_path(u), robots_rules[h])
            for p, u, h in zip(sub["priority"].to_numpy(), sub["url"], sub["host"])
        ),
        dtype=bool,
        count=len(sub),
    )
    drop_idx = sub.index[~keep]
    return df.drop(index=drop_idx) if len(drop_idx) else df


def _acfg_of(ccfg: CrawlConfig) -> tuple:
    """The four adaptive-politeness integers as a positional tuple for
    adaptive_budget_cap (ships in task args beside the boxed dict)."""
    return (
        ccfg.adaptive_delay_factor_permil,
        ccfg.adaptive_min_delay_ms,
        ccfg.adaptive_max_delay_ms,
        ccfg.adaptive_wave_window_ms,
    )


def _make_drain_fn(budget: int, rules_ref, backoff_ref=None, quota_ref=None,
                   max_pages: int | None = None, adaptive_ref=None,
                   acfg: tuple | None = None):
    """Vectorized politeness drain over a host-hash-partitioned block.

    The block holds every (surviving) row of each host it contains, so
    per-host queues are complete: order by (priority, seq), drop
    robots-Disallowed rows, then ``cumcount`` assigns slots — first
    ``budget`` per host are selected, the rest carry over.

    ``rules_ref`` is an ObjectRef to the robots-rules dict: embedding the
    dict in the task closure re-serializes it into EVERY task submission
    (at 50k ruled hosts that dominates the wave's driver time); the ref
    deserializes once per worker via the broadcast cache."""
    from ..functions.broadcast import get_broadcast

    def drain(df: pd.DataFrame) -> pd.DataFrame:
        robots_rules = get_broadcast(rules_ref) if rules_ref is not None else {}
        backoff = (
            get_broadcast(backoff_ref) if backoff_ref is not None else None
        )
        fetched = get_broadcast(quota_ref) if quota_ref is not None else None
        last_dur = (
            get_broadcast(adaptive_ref) if adaptive_ref is not None else None
        )
        df = df.sort_values(
            ["host", "priority", "seq", "surt"], kind="mergesort"
        )
        df = _robots_drop(df, robots_rules)
        budgets = _host_budgets(
            df["host"], budget, robots_rules, backoff, fetched, max_pages,
            last_dur, acfg,
        )
        if max_pages is not None:
            # retired hosts (no quota left): their rows leave the
            # frontier entirely — not fetched, not carried
            keep = budgets > 0
            if not keep.all():
                df = df[keep]
                budgets = budgets[keep]
        slots = df.groupby("host", sort=False).cumcount().to_numpy()
        return df.assign(
            slot=np.where(slots < budgets, slots, -1).astype("int32"),
            selected=slots < budgets,
        )

    return drain


def _host_budgets(
    hosts: pd.Series,
    budget: int,
    robots_rules: dict,
    backoff=None,
    fetched: dict | None = None,
    max_pages: int | None = None,
    last_dur: dict | None = None,
    acfg: tuple | None = None,
) -> np.ndarray:
    """Per-row effective politeness budget (Crawl-delay rule, pinned in
    state/robots.effective_budget, then the one-wave 5xx backoff halving
    ``max(1, eff // 2)``, then the max_pages_per_host quota cap — a
    value <= 0 marks the host RETIRED) — computed once per UNIQUE host
    in the block, then broadcast to rows."""
    if (
        not robots_rules
        and not backoff
        and max_pages is None
        and not last_dur
    ):
        return np.full(len(hosts), budget, dtype=np.int64)
    uniq = hosts.unique()
    m = {}
    for h in uniq:
        eff = effective_budget(budget, robots_rules.get(h)) if robots_rules else budget
        if backoff and h in backoff:
            eff = max(1, eff // 2)
        if last_dur and h in last_dur:
            # adaptive politeness cap (pinned order: after Crawl-delay
            # + 5xx, before quota — mirrored in the oracle)
            eff = min(eff, adaptive_budget_cap(last_dur[h], *acfg))
        if max_pages is not None:
            eff = min(eff, max_pages - (fetched or {}).get(h, 0))
        m[h] = eff
    return hosts.map(m).to_numpy(dtype=np.int64)


def _partition_by_host(tbl: pa.Table, n_parts: int) -> list[pa.Table]:
    """Hash-partition rows by host into EXACTLY ``n_parts`` tables (all
    rows of a host land in one part — the politeness co-location
    invariant). Hashing touches only the UNIQUE hosts via dictionary
    encoding. The ``part`` column is (re)attached."""
    import pyarrow.compute as pc

    base = tbl.drop_columns(["part"]) if "part" in tbl.column_names else tbl
    if tbl.num_rows == 0:
        empty = base.append_column("part", pa.array([], pa.int32()))
        return [empty] * n_parts
    dict_arr = pc.dictionary_encode(base["host"].combine_chunks())
    uniq = dict_arr.dictionary.to_pylist()
    part_of_uniq = np.fromiter(
        (stable_hash64(h, 11) % n_parts for h in uniq), dtype=np.int64, count=len(uniq)
    )
    parts = part_of_uniq[dict_arr.indices.to_numpy()]
    out = []
    for p in range(n_parts):
        sub = base.filter(pa.array(parts == p))
        out.append(
            sub.append_column(
                "part", pa.array(np.full(sub.num_rows, p, dtype=np.int32))
            )
        )
    return out


@dataclass
class CrawlResult:
    fetch_log: list[dict] = field(default_factory=list)
    seen_sorted: list[str] = field(default_factory=list)
    wave_stats: list[dict] = field(default_factory=list)
    docs_dir: str | None = None
    total_fetched: int = 0
    total_docs: int = 0
    compaction: dict | None = None  # crawl-end fragment-compaction report


def _frontier_table(
    urls: list[str], surts: list[str], hosts: list[str],
    pris: list[int], hops: list[int], seqs: list[int],
) -> pa.Table:
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


def _canon_seed_chunk(pairs: list) -> tuple[list, list, list, list]:
    """canonicalise + host + SURT for a seed chunk (regex-heavy: runs as a
    remote task per chunk so a wide seed list doesn't serialize on the
    driver)."""
    urls, keys, hosts, pris = [], [], [], []
    for url, pri in pairs:
        u = canonicalise_url(url)
        host = extract_host(u)
        if host == MALFORMED_HOST:
            continue
        urls.append(u)
        keys.append(surt_key(u))
        hosts.append(host)
        pris.append(pri)
    return urls, keys, hosts, pris


def _sitemap_chunk(urls: list) -> tuple[list, list, list, list]:
    """(canonical URL, SURT key, host, shard hash64) per advertised
    sitemap URL chunk — sitemap URLs come from robots payloads, so they
    canonicalise here (robots URLs are constructed canonical)."""
    from ..state.seen import _SHARD_SEED

    cu, keys, hs, hashes = [], [], [], []
    for u0 in urls:
        u = canonicalise_url(u0)
        h = extract_host(u)
        if h == MALFORMED_HOST:
            continue
        k = surt_key(u)
        cu.append(u)
        keys.append(k)
        hs.append(h)
        hashes.append(stable_hash64(k, _SHARD_SEED))
    return cu, keys, hs, hashes


def _robots_chunk(hosts: list) -> tuple[list, list, list]:
    """(robots URL, SURT key, shard hash64) per host chunk — the sha1
    shard hashing rides in the chunked remote tasks so the driver's only
    per-host work is a vectorized modulo."""
    from ..state.seen import _SHARD_SEED

    urls = [robots_url_for_host(h) for h in hosts]
    keys = [surt_key(u) for u in urls]
    return urls, keys, [stable_hash64(k, _SHARD_SEED) for k in keys]


_PAR_CHUNK = 4096  # below this, remote dispatch costs more than it saves


_REMOTE_FN_CACHE: dict = {}


def _chunked_remote(fn, items: list, n_out: int) -> tuple[list, ...]:
    """Run ``fn`` over chunks of ``items`` as Ray tasks; concatenate the
    per-chunk output lists in order (inline below the dispatch threshold).
    The remote wrapper is cached per function — ray.remote(fn) on every
    call would re-register/export the function each wave."""
    if len(items) <= _PAR_CHUNK:
        return fn(items)
    import ray

    rfn = _REMOTE_FN_CACHE.get(fn)
    if rfn is None:
        rfn = _REMOTE_FN_CACHE[fn] = ray.remote(fn)
    chunks = [items[i : i + _PAR_CHUNK] for i in range(0, len(items), _PAR_CHUNK)]
    outs = ray.get([rfn.remote(c) for c in chunks])
    return tuple([x for o in outs for x in o[i]] for i in range(n_out))


def _seed_frontier(seeds, pool: SeenShardPool) -> tuple[pa.Table, int]:
    """Seeds in list order; first occurrence of a SURT wins (at a 10^10
    design point the seed list is itself a Dataset read — the dedupe is
    the same shard probe). Canonicalisation fans out as chunked tasks."""
    urls, keys, hosts, pris = _chunked_remote(_canon_seed_chunk, list(seeds), 4)
    fu, fk, fh, fp = [], [], [], []
    for u, k, h, p, new in zip(urls, keys, hosts, pris, pool.add_if_new(keys)):
        if new:
            fu.append(u)
            fk.append(k)
            fh.append(h)
            fp.append(p)
    n = len(fu)
    return _frontier_table(fu, fk, fh, fp, [0] * n, list(range(n))), n


# --- module-level remote tasks (registered/exported ONCE per Ray session;
# per-wave closures would re-pickle and re-export them every wave) --------
import ray as _ray

_PULL_COLS = [
    "url", "surt", "host", "priority", "hop", "seq", "part", "slot",
    "selected", "fetch_host", "fetch_status", "is_robots", "robots_rules",
]


@_ray.remote
def _assemble(parts_list, p: int, extras_small, *carries: pa.Table) -> pa.Table:
    """Build one partition's wave-input block: the winner partition
    (``parts_list`` is the remote-resolved list of per-part frontier
    tables, read zero-copy from the shared plasma object) + the driver's
    small robots-injection rows for this part + the carryover blocks."""
    tbls = []
    if parts_list is not None and parts_list[p].num_rows:
        tbls.append(parts_list[p])
    for t in (extras_small, *carries):
        if t is not None and t.num_rows:
            tbls.append(t)
    if not tbls:
        return PART_SCHEMA.empty_table()
    return tbls[0] if len(tbls) == 1 else pa.concat_tables(tbls)


@_ray.remote
def _range_counts(boundaries: list, tbl) -> np.ndarray:
    """Per-order_host-range winner counts for ONE shard's (order-key-
    sorted) winner table — tiny task, the driver folds these into the
    per-range seq offsets (phase 1 of the two-phase distributed sort)."""
    n_ranges = len(boundaries) + 1
    if tbl is None or tbl.num_rows == 0:
        return np.zeros(n_ranges, dtype=np.int64)
    oh = np.asarray(tbl["order_host"].to_pylist(), dtype=object)
    cuts = np.searchsorted(oh, np.asarray(boundaries, dtype=object), side="left")
    edges = np.concatenate([[0], cuts, [len(oh)]])
    return np.diff(edges).astype(np.int64)


@_ray.remote
def _range_finalize(
    boundaries: list, r: int, seq_start: int, n_parts: int, *winner_parts
):
    """Phase 2 of the parallel winners merge: ONE order_host range across
    all shards — slice each sorted shard table to the range (binary
    search), concat + sort by the pinned global order (parent host,
    parent slot, link rank — unique per candidate, so the range-local
    sort reproduces the global order exactly), assign ``seq`` from this
    range's global offset, and hash-partition by host. Invoked with
    ``num_returns=n_parts + 1``: the per-part frontier tables stay
    remote; the last return is the small rows-per-part list the driver
    needs for the salt decision."""
    import pyarrow.compute as pc

    lo = boundaries[r - 1] if r > 0 else None
    hi = boundaries[r] if r < len(boundaries) else None
    slices = []
    for t in winner_parts:
        if t is None or t.num_rows == 0:
            continue
        oh = np.asarray(t["order_host"].to_pylist(), dtype=object)
        a = 0 if lo is None else int(np.searchsorted(oh, lo, side="left"))
        b = len(oh) if hi is None else int(np.searchsorted(oh, hi, side="left"))
        if b > a:
            slices.append(t.slice(a, b - a))
    if not slices:
        plist = _partition_by_host(FRONTIER_SCHEMA.empty_table(), n_parts)
        return (*plist, [0] * n_parts)
    winners = pa.concat_tables(slices).combine_chunks()
    winners = winners.take(
        pc.sort_indices(
            winners,
            sort_keys=[
                ("order_host", "ascending"),
                ("order_slot", "ascending"),
                ("order_rank", "ascending"),
            ],
        )
    )
    n = winners.num_rows
    extras = pa.table(
        {
            "url": winners["url"],
            "surt": winners["surt"],
            "host": winners["host"],
            "priority": winners["priority"],
            "hop": pc.add(winners["hop"], 1),
            "seq": pa.array(np.arange(seq_start, seq_start + n), pa.int64()),
        }
    ).cast(FRONTIER_SCHEMA)
    plist = _partition_by_host(extras, n_parts)
    return (*plist, [t.num_rows for t in plist])


def _pick_boundaries(samples: list[str], n_ranges: int) -> list[str]:
    """Range split points from the shards' order_host samples: distinct
    quantile picks (ranges are [prev, b) — a host never straddles)."""
    if n_ranges <= 1 or not samples:
        return []
    pool_sorted = sorted(samples)
    picks = []
    for i in range(1, n_ranges):
        v = pool_sorted[min(len(pool_sorted) - 1, i * len(pool_sorted) // n_ranges)]
        if not picks or v > picks[-1]:
            picks.append(v)
    return picks


@_ray.remote
def _count_rows(tbl: pa.Table) -> int:
    return tbl.num_rows


@_ray.remote
def _salt_split(tbl: pa.Table, n_sub: int) -> list[pa.Table]:
    """Split a hot partition block into n_sub salted sub-blocks by a
    stable per-URL hash. ANY split preserves parity (see _pre_drain), so
    the hash only needs to spread rows evenly."""
    if n_sub == 1:
        # num_returns=1 delivers the return value unsplit — hand back the
        # table itself, not a 1-list the caller would see as a list object
        return tbl
    salts = pd.util.hash_array(
        np.asarray(tbl["surt"].to_pylist(), dtype=object), categorize=False
    ) % n_sub
    return [tbl.filter(pa.array(salts == s)) for s in range(n_sub)]


@_ray.remote(num_returns=2)
def _pre_drain(tbl: pa.Table, budget: int, rules_boxed, backoff_boxed=None,
               quota_boxed=None, max_pages: int | None = None,
               adaptive_boxed=None, acfg: tuple | None = None):
    """Salted phase-1 drain over ONE sub-block of a hot partition: apply
    the robots drop (same rule as the main drain — dropped rows leave the
    frontier), then keep each host's top ``budget`` rows by the global
    (priority, seq) order as SURVIVORS; the rest carry over directly.
    Parity: a row selected by the global drain ranks < budget in any
    subset containing it, so the union of sub-block survivors contains
    every globally selected row, and the final drain over survivors
    assigns identical slots. ``rules_boxed`` is ``[rules_ref]`` or None —
    boxed so the dict deserializes once per worker via the broadcast
    cache, not once per task."""
    from ..functions.broadcast import get_broadcast

    if tbl.num_rows == 0:
        return tbl, tbl
    robots_rules = get_broadcast(rules_boxed[0]) if rules_boxed else {}
    backoff = get_broadcast(backoff_boxed[0]) if backoff_boxed else None
    fetched = get_broadcast(quota_boxed[0]) if quota_boxed else None
    last_dur = get_broadcast(adaptive_boxed[0]) if adaptive_boxed else None
    df = tbl.to_pandas()
    df = df.sort_values(["host", "priority", "seq", "surt"], kind="mergesort")
    df = _robots_drop(df, robots_rules)
    ranks = df.groupby("host", sort=False).cumcount().to_numpy()
    budgets = _host_budgets(
        df["host"], budget, robots_rules, backoff, fetched, max_pages,
        last_dur, acfg,
    )
    survive = ranks < budgets
    # quota parity: the final drain DROPS retired-host rows, so the
    # salted pre-drain must not carry them either
    carry_mask = ~survive if max_pages is None else (~survive) & (budgets > 0)
    cols = ["url", "surt", "host", "priority", "hop", "seq", "part"]
    sv = pa.Table.from_pandas(df.loc[survive, cols], preserve_index=False)
    cr = pa.Table.from_pandas(df.loc[carry_mask, cols], preserve_index=False)
    return sv.cast(PART_SCHEMA), cr.cast(PART_SCHEMA)


@_ray.remote
def _drain_fetch(
    tbl: pa.Table,
    budget: int,
    rules_boxed,
    scfg: SyntheticConfig,
    icfg,
    wave: int,
    ccfg: CrawlConfig,
    docs_dir: str | None,
    backoff_boxed=None,
    quota_boxed=None,
    adaptive_boxed=None,
) -> pa.Table:
    """Fused politeness drain + fetch/extract for ONE frontier block (the
    block holds complete host groups, so the drain's per-host queues are
    whole). Robots rules arrive boxed (once-per-worker broadcast)."""
    rules_ref = rules_boxed[0] if rules_boxed else None
    backoff_ref = backoff_boxed[0] if backoff_boxed else None
    quota_ref = quota_boxed[0] if quota_boxed else None
    adaptive_ref = adaptive_boxed[0] if adaptive_boxed else None
    drained = _make_drain_fn(
        budget, rules_ref, backoff_ref, quota_ref, ccfg.max_pages_per_host,
        adaptive_ref, _acfg_of(ccfg),
    )(tbl.to_pandas())
    stage = FetchExtractStage(scfg, icfg, wave, ccfg, docs_dir=docs_dir)
    return stage(pa.Table.from_pandas(drained, preserve_index=False))


@_ray.remote
def _gate_rows(n_shards: int, tbl: pa.Table) -> pa.Table:
    """Per-block duplicate-content gate rows: (key, host, slot, shard)
    of every SELECTED status-200 fetch — ``shard = shard_of(hash)`` so
    each content shard self-filters its rows from the shared block
    (the cand-routing delivery shape)."""
    import pyarrow.compute as pc

    empty = pa.table(
        {
            "key": pa.array([], pa.string()),
            "host": pa.array([], pa.string()),
            "slot": pa.array([], pa.int32()),
            "shard": pa.array([], pa.int32()),
        }
    )
    if tbl.num_rows == 0 or "selected" not in tbl.column_names:
        return empty
    f = tbl.filter(
        pc.and_(tbl["selected"], pc.equal(tbl["fetch_status"], 200))
    )
    if f.num_rows == 0:
        return empty
    keys = f["content_hash"].to_pylist()
    shards_arr = np.fromiter(
        (shard_of(k, n_shards) for k in keys), dtype=np.int32, count=len(keys)
    )
    return pa.table(
        {
            "key": pa.array(keys, pa.string()),
            "host": f["fetch_host"],
            "slot": f["slot"],
            "shard": pa.array(shards_arr),
        }
    )


@_ray.remote
def _write_warc_block(
    warc_dir: str, wave: int, tbl: pa.Table, *loser_tbls: pa.Table
) -> int:
    """Serialise ONE fetch block as ONE ``wave_{W}/part_{P}.warc.gz``
    fragment (multi-member gzip, one ISO-28500 record per SELECTED fetch
    in the block's pinned drain order). Content-gate losers — (host,
    slot) pairs in ``loser_tbls``, status-200 by construction — become
    ``revisit`` members (identical-payload-digest, payload dropped);
    everything else a ``response`` member. Deterministic bytes (pinned
    order, urn:sha1 ids, gzip mtime=0) + tmp/os.replace publish: a
    retried or re-run task rewrites the identical file. Returns the
    member count; runs fully off the wave critical path (joined at the
    checkpoint barrier / crawl end)."""
    import uuid

    from ..functions.hashing import sha1_b32
    from ..sources.warc import build_response_member, build_revisit_member

    if tbl.num_rows == 0 or "selected" not in tbl.column_names:
        return 0
    fetched = tbl.filter(tbl["selected"])
    if fetched.num_rows == 0:
        return 0
    part = int(tbl["part"][0].as_py())
    losers: set[tuple[str, int]] = set()
    for lt in loser_tbls:
        if lt.num_rows:
            losers.update(zip(lt["host"].to_pylist(), lt["slot"].to_pylist()))
    members = []
    cols = ["url", "fetch_host", "slot", "fetch_status",
            "w_ts14", "w_mime", "w_loc", "w_payload"]
    for r in fetched.select(cols).to_pylist():
        payload = r["w_payload"] or b""
        if (r["fetch_host"], r["slot"]) in losers and r["fetch_status"] == 200:
            members.append(
                build_revisit_member(
                    r["url"], r["w_ts14"], r["fetch_status"], r["w_mime"],
                    sha1_b32(payload), len(payload), r["w_loc"] or None,
                )
            )
        else:
            members.append(
                build_response_member(
                    r["url"], r["w_ts14"], r["fetch_status"], r["w_mime"],
                    payload, r["w_loc"] or None,
                )
            )
    d = os.path.join(warc_dir, f"wave_{wave:04d}")
    os.makedirs(d, exist_ok=True)
    final = os.path.join(d, f"part_{part:05d}.warc.gz")
    tmp = f"{final}.tmp-{uuid.uuid4().hex}"
    with open(tmp, "wb") as fh:
        fh.write(b"".join(members))
    os.replace(tmp, final)
    return len(members)


@_ray.remote(num_returns=4)
def _split_block(n_shards: int, tbl: pa.Table, *loser_tbls: pa.Table):
    """(meta, carry_table, fetched_table, candidate_table).

    Carry and candidates stay remote; candidates are flattened from the
    fetch stage's list columns (vectorized) and shard-keyed so each seen
    shard can self-filter its rows from the shared block.
    ``loser_tbls`` (dedup_content crawls only) are the content gate's
    per-shard (host, slot) verdicts: those rows' candidate lists are
    suppressed before flattening — the fetched/log/doc surface is
    untouched, duplicates just discover nothing."""
    import pyarrow.compute as pc

    empty = (
        {
            "part": -1,
            "cand_rows": 0,
            "fetched_rows": 0,
            "robots": [],
            "backoff": [],
            "host_counts": [],
            "last_dur": [],
            "retry": [],
        },
        FRONTIER_SCHEMA.empty_table(),
        OUT_SCHEMA.empty_table().select(_PULL_COLS),
        CAND_SCHEMA.empty_table(),
    )
    if tbl.num_rows == 0 or "selected" not in tbl.column_names:
        return empty  # empty input parts pass through the maps untouched
    part = int(tbl["part"][0].as_py())
    sel = tbl["selected"]
    carry = tbl.filter(pc.invert(sel)).select(
        ["url", "surt", "host", "priority", "hop", "seq", "part"]
    )
    fetched = tbl.filter(sel)
    # robots hits ride back in the meta dict (tiny): the driver needs the
    # wave's parsed rules for the NEXT wave's drain without joining on the
    # fetch-log finalize chain
    hits = fetched.filter(
        pc.and_(fetched["is_robots"], pc.equal(fetched["fetch_status"], 200))
    )
    robots_pairs = list(
        zip(hits["fetch_host"].to_pylist(), hits["robots_rules"].to_pylist())
    )
    # 5xx backoff hosts ride the same tiny meta (unique hosts that served
    # any status >= 500 this wave in this part)
    errs = fetched.filter(pc.greater_equal(fetched["fetch_status"], 500))
    backoff_hosts = sorted(set(errs["fetch_host"].to_pylist()))
    # 5xx retry carriers (ccfg.retry_5xx): the failed rows' frontier
    # identity — bounded by failures-in-block, the backoff meta class
    retry_rows = list(
        zip(
            errs["url"].to_pylist(), errs["surt"].to_pylist(),
            errs["host"].to_pylist(), errs["priority"].to_pylist(),
            errs["hop"].to_pylist(), errs["seq"].to_pylist(),
        )
    )
    # per-host fetched counts (max_pages_per_host quota fold): tiny —
    # bounded by hosts-in-block, the robots_pairs meta discipline
    _hc = pd.Series(fetched["fetch_host"].to_pylist()).value_counts()
    host_counts = list(zip(_hc.index.tolist(), _hc.to_numpy().astype(int).tolist()))
    # adaptive-politeness fold: each host's LAST-slot fetch duration
    # (tiny — bounded by hosts-in-block, the robots_pairs discipline)
    _fd = pd.DataFrame(
        {
            "h": fetched["fetch_host"].to_pylist(),
            "sl": fetched["slot"].to_pylist(),
            "d": fetched["fetch_ms"].to_pylist(),
        }
    )
    _li = _fd.groupby("h")["sl"].idxmax()
    last_dur_pairs = list(
        zip(_fd.loc[_li, "h"].tolist(), _fd.loc[_li, "d"].astype(int).tolist())
    )
    # duplicate-content suppression: candidates flatten from cand_src,
    # which drops the gate's loser rows (fetched itself is unchanged)
    cand_src = fetched
    if loser_tbls:
        lt = pa.concat_tables([t for t in loser_tbls if t.num_rows])\
            if any(t.num_rows for t in loser_tbls) else None
        if lt is not None and lt.num_rows and fetched.num_rows:
            lk = set(zip(lt["host"].to_pylist(), lt["slot"].to_pylist()))
            keep = np.fromiter(
                (
                    (h, sl) not in lk
                    for h, sl in zip(
                        fetched["fetch_host"].to_pylist(),
                        fetched["slot"].to_pylist(),
                    )
                ),
                dtype=bool,
                count=fetched.num_rows,
            )
            if not keep.all():
                cand_src = fetched.filter(pa.array(keep))
    cand_col = cand_src["cand_urls"].combine_chunks()
    lengths = pc.list_value_length(cand_col).to_numpy().astype(np.int64)
    total = int(lengths.sum())
    if total == 0:
        return (
            {
                "part": part,
                "cand_rows": 0,
                "fetched_rows": fetched.num_rows,
                "robots": robots_pairs,
                "backoff": backoff_hosts,
                "host_counts": host_counts,
                "last_dur": last_dur_pairs,
                "retry": retry_rows,
            },
            carry,
            fetched.select(_PULL_COLS),
            CAND_SCHEMA.empty_table(),
        )
    parents = pc.list_parent_indices(cand_col)
    starts = np.repeat(np.cumsum(lengths) - lengths, lengths)
    surts = pc.list_flatten(cand_src["cand_surts"].combine_chunks())
    shards_arr = np.fromiter(
        (shard_of(k, n_shards) for k in surts.to_pylist()),
        dtype=np.int32,
        count=total,
    )
    cand = pa.table(
        {
            "url": pc.list_flatten(cand_col),
            "surt": surts,
            "host": pc.list_flatten(cand_src["cand_hosts"].combine_chunks()),
            # per-row enqueue priority from the fetch stage: -1 for
            # <sitemapindex> children (recurse as sitemaps), else
            # max(parent priority, 0) (pinned rule, mirrored in the oracle)
            "priority": pc.take(cand_src["cand_pri"], parents),
            "hop": pc.take(cand_src["hop"], parents),
            "order_host": pc.take(cand_src["fetch_host"], parents),
            "order_slot": pc.take(cand_src["slot"], parents),
            "order_rank": pa.array(
                (np.arange(total) - starts).astype(np.int32)
            ),
            "shard": pa.array(shards_arr),
        }
    ).cast(CAND_SCHEMA)
    # sort by shard ONCE here and publish per-shard slice bounds: each
    # shard then takes a ZERO-COPY slice of the shared block instead of
    # filtering every row of every block (that scan cost n_shards x
    # total-candidates per wave and grew with the shard count)
    order = np.argsort(shards_arr, kind="stable")
    cand = cand.take(pa.array(order))
    sorted_shards = shards_arr[order]
    bounds = np.searchsorted(sorted_shards, np.arange(n_shards + 1)).tolist()
    return (
        {
            "part": part,
            "cand_rows": total,
            "fetched_rows": fetched.num_rows,
            "shard_bounds": bounds,
            "robots": robots_pairs,
            "backoff": backoff_hosts,
            "host_counts": host_counts,
            "last_dur": last_dur_pairs,
            "retry": retry_rows,
        },
        carry,
        fetched.select(_PULL_COLS),
        cand,
    )


@_ray.remote(num_cpus=0)
def _probe_ok(_x) -> int:
    """Zero-payload durability probe: scheduling this task forces its
    argument's producer to have SUCCEEDED (a failed producer fails the
    probe with RayTaskError), so ray.get on the probe propagates writer
    exceptions without pulling the producer's (large) result to the
    driver — the error-surfacing replacement for ray.wait(fetch_local=
    False), which silently ignores task failures."""
    return 0


@_ray.remote
def _finalize_fetch(wave: int, order_base: int, log_path: str | None, *parts):
    """Remote end-of-wave fetch finalization: concat the per-part fetched
    tables, apply the pinned rule-4 order (host, slot), build the wave's
    fetch-log table, optionally stream it to parquet (atomic publish).
    OFF the wave critical path: the driver gets the wave's count and
    robots map from the split metas and joins this chain only under
    collect_log / checkpointing (or once at crawl end to make the
    parquet writes durable)."""
    import pyarrow.compute as pc

    tbl = (
        pa.concat_tables(parts).combine_chunks()
        if parts
        else OUT_SCHEMA.empty_table().select(_PULL_COLS)
    )
    tbl = tbl.take(
        pc.sort_indices(
            tbl, sort_keys=[("fetch_host", "ascending"), ("slot", "ascending")]
        )
    )
    n = tbl.num_rows
    wave_log = pa.table(
        {
            "order": pa.array(np.arange(order_base, order_base + n), pa.int64()),
            "wave": pa.array(np.full(n, wave, dtype=np.int32)),
            "host": tbl["fetch_host"],
            "slot": tbl["slot"],
            "url": tbl["url"],
            "surt": tbl["surt"],
            "status": tbl["fetch_status"],
        },
        schema=FETCHLOG_SCHEMA,
    )
    if log_path is not None:
        import uuid

        import pyarrow.parquet as _pq

        os.makedirs(os.path.dirname(log_path), exist_ok=True)
        tmp = f"{log_path}.tmp-{uuid.uuid4().hex}"
        _pq.write_table(wave_log, tmp)
        os.replace(tmp, log_path)
    return wave_log


def run_crawl(
    seeds: list[tuple[str, int]],
    ccfg: CrawlConfig,
    scfg: SyntheticConfig,
    icfg: IndexConfig | None = None,
    checkpoint_dir: str | None = None,
    docs_dir: str | None = None,
    resume: bool = False,
    fetch_concurrency: int = 4,
    fetch_batch_size: int = 64,  # kept for API compat; blocks are batches
    collect_log: bool = False,
    collect_seen: bool = False,
) -> CrawlResult:
    """Run the crawl (optionally resuming from the last complete wave).

    ``fetch_concurrency`` sizes the partition count (``n_parts``), not an
    actor pool — the fused drain+fetch stage is a task pool that scales
    elastically to every free CPU (tasks never call actors; candidate
    routing is driver-submitted by reference).

    ``collect_log`` / ``collect_seen`` are TEST/ANALYSIS hooks: they pull
    the full fetch log (as Python dicts) / the sorted global seen set onto
    the driver — O(total fetched) / O(total seen) driver memory, never the
    default. Production runs stream the per-wave fetch log to parquet via
    ``checkpoint_dir`` (and, when only ``docs_dir`` is given, alongside
    the per-wave docs fragments)."""
    import pyarrow.compute as pc
    import ray

    # partitions ≫ workers: fine-grained blocks balance skewed hosts and
    # keep stragglers short; parts are cheap (empty ones short-circuit)
    n_parts = max(16, fetch_concurrency * 4)
    n_shards = ccfg.seen_shards

    import time as _time

    _debug = bool(os.environ.get("CRAWL_DEBUG_TIMING"))
    _marks: list[tuple[str, float]] = []

    def _mark(label: str) -> None:
        if _debug:
            _marks.append((label, _time.monotonic()))

    res = CrawlResult(docs_dir=docs_dir)
    pool = SeenShardPool(
        ccfg.seen_shards,
        spill_dir=ccfg.seen_spill_dir,
        spill_threshold=ccfg.seen_spill_threshold,
    )
    # duplicate-content gate state: a SECOND shard pool keyed by content
    # hash (same spill tier + checkpoint machinery; separate namespace)
    content_pool = (
        SeenShardPool(
            ccfg.seen_shards,
            spill_dir=None
            if ccfg.seen_spill_dir is None
            else os.path.join(ccfg.seen_spill_dir, "content"),
            spill_threshold=ccfg.seen_spill_threshold,
        )
        if ccfg.dedup_content
        else None
    )
    pending_content_delta: list[str] = []
    robots_scheduled: set[str] = set()
    robots_rules: dict[str, list[str]] = {}
    # Sitemap URLs advertised by rules not yet offered to the seen set.
    # Not checkpointed: resume recomputes from the (checkpointed) rules —
    # the seen-set probe makes re-offering idempotent.
    sitemap_pending: list[str] = []
    # hosts that served >=1 status>=500 response LAST wave (one-wave 5xx
    # backoff state; checkpointed at wave boundaries)
    backoff_hosts: set[str] = set()
    host_fetched: dict[str, int] = {}  # max_pages_per_host quota state
    adaptive_last_dur: dict[str, int] = {}  # adaptive politeness state
    retry_attempts: dict[str, int] = {}  # retry_5xx attempts per surt
    retry_pending: list[tuple] = []  # failed rows awaiting re-injection
    log_tables: list[pa.Table] = []  # retained ONLY under collect_log
    log_flush_refs: list = []  # streamed-log chains joined at crawl end
    warc_flush_refs: list = []  # WARC fragment writers, same join points
    # SURTs first seen since the last checkpoint; tracked ONLY when
    # checkpointing (building the per-wave Python string list costs
    # O(new URLs) driver time every wave otherwise)
    track_delta = checkpoint_dir is not None
    pending_delta: list[str] = []
    start_wave = 0
    order_base = 0
    carry_refs: dict[int, list["ray.ObjectRef"]] = {}
    carry_counts: dict[int, int] = {}

    if resume and checkpoint_dir is not None and (last := latest_complete_wave(checkpoint_dir)) is not None:
        ck = load_wave_checkpoint(checkpoint_dir, last)
        extras = ck["frontier"]  # carry + winners of the checkpointed wave
        # shard-side absorb: driver ships delta PATHS, each shard reads
        # its own slice (no driver-side key materialization)
        pool.restore_from_parquet(ck["seen_delta_paths"])
        if content_pool is not None:
            content_pool.restore_from_parquet(ck["content_delta_paths"])
        robots_scheduled = ck["robots_scheduled"]
        robots_rules = {k: list(v) for k, v in ck["robots_rules"].items()}
        if ccfg.follow_sitemaps:
            sitemap_pending = sorted(
                {u for r in robots_rules.values() for u in sitemap_urls_of(r)}
            )
        backoff_hosts = set(ck.get("backoff_hosts", set()))
        host_fetched = dict(ck.get("host_fetched") or {})
        adaptive_last_dur = dict(ck.get("adaptive_last_dur") or {})
        retry_attempts = dict(ck.get("retry_attempts") or {})
        retry_pending = [tuple(r) for r in ck.get("retry_pending") or []]
        order_base = ck["fetch_log"].num_rows
        if collect_log and order_base:
            log_tables.append(ck["fetch_log"])
        seq = ck["seq"]
        start_wave = last + 1
        robots_check_hosts = set(pc.unique(extras["host"]).to_pylist())
    else:
        extras, seq = _seed_frontier(seeds, pool)
        robots_check_hosts = set(pc.unique(extras["host"]).to_pylist())
        if track_delta:
            pending_delta.extend(extras["surt"].to_pylist())
    # the frontier lives as a PARTITION LIST in the object store between
    # waves; the driver holds only a ref + per-part row counts
    _seed_parts = _partition_by_host(extras, n_parts)
    extras_parts_ref = ray.put(_seed_parts)
    extras_rows_per_part = [t.num_rows for t in _seed_parts]
    del extras, _seed_parts
    # winners of the previous wave arrive as per-(range, part) refs from
    # the parallel merge; empty before wave 0
    winners_part_refs: dict[int, list] = {}
    winners_rows_refs: list = []
    pending_winner_rows = 0
    for wave in range(start_wave, ccfg.max_waves):
        _mark(f"w{wave}:start")
        # --- robots injection (new hosts only: a host already in the
        # frontier was scheduled at its first appearance) ----------------
        ru, rk, rh = [], [], []
        if ccfg.respect_robots:
            new_hosts = sorted(robots_check_hosts - robots_scheduled)
            robots_scheduled.update(new_hosts)
            rurls, rkeys, rhashes = _chunked_remote(_robots_chunk, new_hosts, 3)
            if rkeys:
                new_mask = np.asarray(
                    pool.add_if_new_hashed(rkeys, rhashes), dtype=bool
                )
                idx = np.flatnonzero(new_mask)
                ru = [rurls[i] for i in idx]
                rk = [rkeys[i] for i in idx]
                rh = [new_hosts[i] for i in idx]
                if track_delta:
                    pending_delta.extend(rk)
        # --- sitemap injection (rule 2b): advertised Sitemap URLs enter
        # as priority -1 fetches the first time their SURT is unseen ----
        if ccfg.respect_robots and ccfg.follow_sitemaps and sitemap_pending:
            pend, sitemap_pending = sitemap_pending, []
            surls, skeys, shosts, shashes = _chunked_remote(
                _sitemap_chunk, pend, 4
            )
            if skeys:
                smask = np.asarray(
                    pool.add_if_new_hashed(skeys, shashes), dtype=bool
                )
                sidx = np.flatnonzero(smask)
                ru += [surls[i] for i in sidx]
                rk += [skeys[i] for i in sidx]
                rh += [shosts[i] for i in sidx]
                if track_delta:
                    pending_delta.extend(skeys[i] for i in sidx)
        robots_tbl = (
            _frontier_table(ru, rk, rh, [-1] * len(ru), [0] * len(ru), [-1] * len(ru))
            if ccfg.respect_robots and ru
            else FRONTIER_SCHEMA.empty_table()
        )
        if retry_pending:
            # rule 6b (retry_5xx): failed fetches re-enter with their
            # ORIGINAL (priority, hop, seq) — already-seen rows riding
            # the injection path (the only path that re-fetches a URL)
            rt = _frontier_table(
                [r[0] for r in retry_pending], [r[1] for r in retry_pending],
                [r[2] for r in retry_pending], [r[3] for r in retry_pending],
                [r[4] for r in retry_pending], [r[5] for r in retry_pending],
            )
            robots_tbl = (
                pa.concat_tables([robots_tbl, rt])
                if robots_tbl.num_rows
                else rt
            )
            retry_pending = []
        frontier_rows = (
            sum(extras_rows_per_part)
            + pending_winner_rows
            + robots_tbl.num_rows
            + sum(carry_counts.values())
        )
        if frontier_rows == 0:
            break
        _mark(f"w{wave}:robots")
        # --- assemble wave input blocks (object-store resident) ---------
        robots_parts = _partition_by_host(robots_tbl, n_parts)
        input_refs = []
        pre_carry: dict[int, list] = {}  # salted-path direct carryover
        # robots rules enter the cluster ONCE per wave (object store), not
        # once per task closure; BOXED so tasks resolve them through the
        # per-worker broadcast cache instead of per-task deserialization
        rules_boxed = [ray.put(robots_rules)] if robots_rules else None
        # 5xx-backoff host set (last wave's offenders): its OWN small
        # broadcast — transient state never re-ships the rules dict
        backoff_boxed = (
            [ray.put(frozenset(backoff_hosts))]
            if ccfg.backoff_503 and backoff_hosts
            else None
        )
        # max_pages_per_host quota counters: own small broadcast (the
        # backoff discipline); None until a fetch happened, the drain
        # still caps at max_pages via the ccfg scalar
        quota_boxed = (
            [ray.put(dict(host_fetched))]
            if ccfg.max_pages_per_host is not None and host_fetched
            else None
        )
        # adaptive-politeness last-duration dict: own small broadcast
        adaptive_boxed = (
            [ray.put(dict(adaptive_last_dur))]
            if ccfg.adaptive_politeness and adaptive_last_dur
            else None
        )
        # per-part winner rows from the range tasks (tiny lists, needed
        # for the salt decision; the tables themselves stay remote)
        winners_rows_per_part = [0] * n_parts
        if winners_rows_refs:
            for rows in ray.get(winners_rows_refs):
                for p, c in enumerate(rows):
                    winners_rows_per_part[p] += c
        for p in range(n_parts):
            assembled = _assemble.remote(
                extras_parts_ref,
                p,
                robots_parts[p],
                *winners_part_refs.get(p, []),
                *carry_refs.get(p, []),
            )
            rows_p = (
                extras_rows_per_part[p]
                + winners_rows_per_part[p]
                + robots_parts[p].num_rows
                + carry_counts.get(p, 0)
            )
            if ccfg.salt_threshold is not None and rows_p > ccfg.salt_threshold:
                # hot-host path: salted phase-1 drain in parallel, only
                # survivors (≤ salt_factor × budget per host) re-merge
                subs = _salt_split.options(
                    num_returns=ccfg.salt_factor
                ).remote(assembled, ccfg.salt_factor)
                if ccfg.salt_factor == 1:
                    subs = [subs]
                outs = [
                    _pre_drain.remote(
                        sub, ccfg.politeness_budget, rules_boxed, backoff_boxed,
                        quota_boxed, ccfg.max_pages_per_host,
                        adaptive_boxed, _acfg_of(ccfg),
                    )
                    for sub in subs
                ]
                input_refs.append(
                    _assemble.remote(None, -1, None, *[sv for sv, _ in outs])
                )
                pre_carry[p] = [cr for _, cr in outs]
            else:
                input_refs.append(assembled)
        _mark(f"w{wave}:assemble")
        # resumable docs layout: clear this wave's fragment dir first so a
        # crashed prior attempt (possibly with a different n_parts) can't
        # leave stale part_*.parquet fragments beside the new ones
        if docs_dir is not None:
            wdir = os.path.join(docs_dir, f"wave_{wave:04d}")
            if os.path.isdir(wdir):
                import shutil

                shutil.rmtree(wdir)
        if ccfg.warc_dir is not None:
            wwdir = os.path.join(ccfg.warc_dir, f"wave_{wave:04d}")
            if os.path.isdir(wwdir):
                import shutil

                shutil.rmtree(wwdir)
        # --- ONE execution per wave: fused drain -> fetch/extract -------
        # ONE plain Ray task per block: the politeness drain and the
        # fetch/extract chain run fused in the same task (whole block =
        # complete host groups), and the split task chains directly on the
        # block's ObjectRef — split of early blocks overlaps with later
        # blocks still fetching, there is no per-wave streaming-executor
        # startup, and task outputs are stable (no eager block GC, so no
        # lineage reconstruction can re-run a fetch).
        block_refs = [
            _drain_fetch.remote(
                ref, ccfg.politeness_budget, rules_boxed, scfg, icfg, wave,
                ccfg, docs_dir, backoff_boxed, quota_boxed, adaptive_boxed,
            )
            for ref in input_refs
        ]
        _mark(f"w{wave}:exec")
        # --- duplicate-content gate (wave barrier, dedup_content only):
        # per-block (hash, host, slot) rows route BY REFERENCE to the
        # content shards (hash-sharded); each shard resolves first-wins
        # in the pinned (host, slot) order against its persistent
        # content-seen set and returns its loser table — the split tasks
        # consume those refs and suppress the losers' candidate lists.
        # Gate data is fetched-bounded (politeness budget x hosts), far
        # below the candidate volume the seen shards already route.
        loser_refs: list = []
        gate_small_refs: list = []
        if content_pool is not None:
            gate_refs = [_gate_rows.remote(n_shards, ref) for ref in block_refs]
            gate_outs = [
                content_pool.shards[s]
                .gate_first_seen.options(num_returns=2)
                .remote(gate_refs, s, track_delta)
                for s in range(n_shards)
            ]
            loser_refs = [o[0] for o in gate_outs]
            gate_small_refs = [o[1] for o in gate_outs]
        splits = [
            _split_block.remote(n_shards, ref, *loser_refs) for ref in block_refs
        ]
        # WARC sink: one writer task per block, fed the SAME block +
        # loser refs the split consumes (losers -> revisit members);
        # off the critical path, joined at the checkpoint barrier below
        # (so a checkpointed wave's fragments exist before the wave is
        # marked complete) or at the crawl-end durability barrier
        if ccfg.warc_dir is not None:
            warc_flush_refs.extend(
                _write_warc_block.remote(ccfg.warc_dir, wave, ref, *loser_refs)
                for ref in block_refs
            )
        # fetch-log finalization runs REMOTE (concat + rule-4 sort + log
        # build + robots scrape of ~budget×hosts rows): the driver gets
        # back only a count and the tiny robots map; the log table itself
        # is pulled only under collect_log / checkpointing
        log_path = (
            os.path.join(docs_dir, f"wave_{wave:04d}", "fetch_log.parquet")
            if docs_dir is not None and checkpoint_dir is None
            else None
        )
        # only submit when some consumer exists (log streaming, collect_log
        # or checkpointing) — otherwise the concat + rule-4 sort + log
        # build would run as pure wasted cluster work competing with the
        # next wave's fetch tasks
        wave_log_ref = None
        if log_path is not None or collect_log or checkpoint_dir is not None:
            wave_log_ref = _finalize_fetch.remote(
                wave, order_base, log_path, *[f for _, _, f, _ in splits]
            )
        if log_path is not None:
            log_flush_refs.append(wave_log_ref)
        metas = ray.get([m for m, _, _, _ in splits])
        carry_refs = {p: list(refs) for p, refs in pre_carry.items()}
        fetched_per_part: dict[int, int] = {}
        cand_refs = []
        cand_bounds = []  # per block: n_shards+1 slice offsets
        for meta, (_, carry_ref, _, cand_ref) in zip(metas, splits):
            if meta["part"] >= 0:
                carry_refs.setdefault(meta["part"], []).append(carry_ref)
                fetched_per_part[meta["part"]] = meta["fetched_rows"]
            if meta["cand_rows"]:
                cand_refs.append(cand_ref)
                cand_bounds.append(meta["shard_bounds"])
        if cand_refs:
            # candidate routing BY REFERENCE from the driver, BATCHED: one
            # accept call per shard per WAVE (not per block × shard). The
            # split task sorted each block by shard and published slice
            # bounds, so each shard takes a ZERO-COPY slice of the shared
            # block — total routing work is O(candidates), not
            # O(n_shards × candidates); no fetch task ever blocks on an
            # actor call, and the per-wave actor-RPC count is O(n_shards)
            ray.get(
                [
                    pool.shards[s].accept_routed_many.remote(
                        wave,
                        cand_refs,
                        s,
                        [(b[s], b[s + 1]) for b in cand_bounds],
                    )
                    for s in range(n_shards)
                ]
            )  # delivery barrier before finalize
        # carry counts via tiny remote probes (rows only, tables stay put)
        count_refs = [
            (p, r, _count_rows.remote(r))
            for p, refs in carry_refs.items()
            for r in refs
        ]
        counts = ray.get([c for _, _, c in count_refs])
        del block_refs, splits  # wave's intermediates can be GC'd
        carry_refs, carry_counts = {}, {}
        for (p, r, _), c in zip(count_refs, counts):
            if c > 0:
                carry_refs.setdefault(p, []).append(r)
                carry_counts[p] = carry_counts.get(p, 0) + c

        _mark(f"w{wave}:split")
        # --- discovery barrier (two-phase parallel winners merge): the
        # shards finalize concurrently; the driver blocks ONLY on their
        # small dicts (counts, hosts, boundary samples, optional SURT
        # delta) and on the tiny per-range counts — the heavy
        # merge/sort/seq/partition work fans out over order_host ranges
        # as parallel tasks whose outputs the next wave's assembly
        # consumes BY REFERENCE (the classic two-phase distributed sort:
        # exact global seq from per-range offsets)
        winner_refs, small_refs = pool.finalize_wave_split(wave, track_delta)
        # wave count + robots rules come straight from the split metas —
        # the fetch-log build/sort/write chain runs fully off the wave
        # critical path (joined only under collect_log / checkpointing,
        # plus one durability barrier at crawl end for streamed logs)
        n_fetched = sum(m["fetched_rows"] for m in metas)
        new_robots = {h: list(r) for m in metas for h, r in m["robots"]}
        res.total_docs += n_fetched
        wave_log = None  # pulled lazily (collect_log / checkpoint only)
        if collect_log:
            wave_log = ray.get(wave_log_ref)
            log_tables.append(wave_log)
        order_base += n_fetched
        _mark(f"w{wave}:log")
        smalls = ray.get(small_refs)
        n_new = sum(s["n"] for s in smalls)
        robots_check_hosts = set()
        for s in smalls:
            robots_check_hosts.update(s["hosts"])
            if track_delta:
                pending_delta.extend(s["surts"])
        winners_part_refs = {}
        winners_rows_refs = []
        if n_new:
            # few ranges for small waves (task overhead), more for wide
            n_ranges = 1 if n_new < 50_000 else min(8, n_shards)
            boundaries = _pick_boundaries(
                [x for s in smalls for x in s["samples"]], n_ranges
            )
            per_shard = ray.get(
                [_range_counts.remote(boundaries, w) for w in winner_refs]
            )
            per_range = np.sum(per_shard, axis=0)
            offs = seq + np.concatenate([[0], np.cumsum(per_range)[:-1]])
            outs = [
                _range_finalize.options(num_returns=n_parts + 1).remote(
                    boundaries, r, int(offs[r]), n_parts, *winner_refs
                )
                for r in range(len(boundaries) + 1)
            ]
            winners_part_refs = {
                p: [o[p] for o in outs] for p in range(n_parts)
            }
            winners_rows_refs = [o[n_parts] for o in outs]
        seq += n_new
        extras_parts_ref = None  # the seed list is consumed by wave 0
        extras_rows_per_part = [0] * n_parts
        pending_winner_rows = n_new
        robots_rules.update(new_robots)
        if ccfg.follow_sitemaps and new_robots:
            sitemap_pending = sorted(
                {u for r in new_robots.values() for u in sitemap_urls_of(r)}
            )
        if ccfg.backoff_503:
            # one-wave state: REPLACED each wave (a clean wave recovers)
            backoff_hosts = {h for m in metas for h in m["backoff"]}
        if ccfg.max_pages_per_host is not None:
            # quota counters: CUMULATIVE fold (effective from next wave,
            # matching the oracle's post-drain increment timing)
            for m in metas:
                for h, n in m["host_counts"]:
                    host_fetched[h] = host_fetched.get(h, 0) + int(n)
        if ccfg.retry_5xx:
            # 5xx retry fold: re-inject next wave, up to retry_5xx
            # additional attempts per surt (order irrelevant — the drain
            # re-sorts by (priority, seq, surt) per host)
            for m in metas:
                for row in m.get("retry", []):
                    a = retry_attempts.get(row[1], 0)
                    if a < ccfg.retry_5xx:
                        retry_attempts[row[1]] = a + 1
                        retry_pending.append(tuple(row))
        if ccfg.adaptive_politeness:
            # last-duration fold: this wave's value REPLACES the host's
            # entry (hosts that did not fetch keep their previous one —
            # the oracle's persistent-dict timing); a host lives in one
            # partition, so exactly one meta carries it per wave
            for m in metas:
                for h, d in m.get("last_dur", []):
                    adaptive_last_dur[h] = int(d)
        stats = {
            "wave": wave,
            "frontier": frontier_rows,
            "fetched": n_fetched,
            "carryover": sum(carry_counts.values()),
            "new_urls": n_new,
            # per-partition lineage (north_rule): what each host partition
            # contributed this wave — replays/audits read this per (wave,
            # partition) alongside the docs fragment of the same name
            "partitions": {
                str(p): {
                    "fetched": fetched_per_part.get(p, 0),
                    "carryover": carry_counts.get(p, 0),
                }
                for p in sorted(set(fetched_per_part) | set(carry_counts))
            },
        }
        res.wave_stats.append(stats)
        res.total_fetched += n_fetched
        _mark(f"w{wave}:discovery")
        # --- checkpoint (sync point: frontier pulled once to persist) ---
        if content_pool is not None and track_delta and gate_small_refs:
            for sm in ray.get(gate_small_refs):
                pending_content_delta.extend(sm["keys"])
        if checkpoint_dir is not None:
            if warc_flush_refs:
                # fragment-durability barrier: a checkpoint marks this
                # wave complete, so its WARC fragments must exist first
                # (a resumed run never re-enters a completed wave).
                # ray.get, not ray.wait(fetch_local=False): the barrier
                # must PROPAGATE a writer failure (ENOSPC, permissions)
                # and fail the wave before the checkpoint is written —
                # wait() would mark a wave complete over missing
                # fragments. Results are tiny ints, so get() is cheap.
                ray.get(warc_flush_refs)
                warc_flush_refs = []
            if wave_log is None:
                wave_log = ray.get(wave_log_ref)
            carry_tbls = ray.get([r for refs in carry_refs.values() for r in refs])
            all_winner_refs = [
                r for refs in winners_part_refs.values() for r in refs
            ]
            winner_tbls = [
                t.select(FRONTIER_SCHEMA.names)
                for t in ray.get(all_winner_refs)
                if t.num_rows
            ]
            next_frontier = pa.concat_tables(
                [t.select(FRONTIER_SCHEMA.names) for t in carry_tbls] + winner_tbls
            ) if (carry_tbls or winner_tbls) else FRONTIER_SCHEMA.empty_table()
            write_wave_checkpoint(
                checkpoint_dir,
                wave,
                next_frontier,
                wave_log,
                pending_delta,
                robots_scheduled,
                robots_rules,
                seq,
                stats,
                backoff_hosts=backoff_hosts,
                content_delta=(
                    pending_content_delta if content_pool is not None else None
                ),
                host_fetched=(
                    host_fetched if ccfg.max_pages_per_host is not None else None
                ),
                adaptive_last_dur=(
                    adaptive_last_dur if ccfg.adaptive_politeness else None
                ),
                retry_attempts=(retry_attempts if ccfg.retry_5xx else None),
                retry_pending=(retry_pending if ccfg.retry_5xx else None),
            )
            pending_delta = []
            pending_content_delta = []
        if ccfg.max_urls is not None and order_base >= ccfg.max_urls:
            break

    if _debug:
        for (l1, t1), (l2, t2) in zip(_marks, _marks[1:]):
            print(f"[crawl-timing] {l1} -> {l2}: {t2 - t1:.2f}s")
    # durability barrier: streamed per-wave fetch-log writes happen in
    # remote tasks off the wave critical path — join them once here so
    # the files exist when run_crawl returns
    # error-propagating barriers, not ray.wait(fetch_local=False): a
    # failed writer task must raise here, not leave files silently
    # missing behind a successful-looking return. warc refs hold tiny
    # ints so ray.get is free; log refs hold full wave-log tables, so
    # join them through a zero-payload probe task (a failed parent makes
    # the probe fail, propagating the exception without shipping the
    # table to the driver).
    if log_flush_refs:
        ray.get([_probe_ok.remote(r) for r in log_flush_refs])
    if warc_flush_refs:
        ray.get(warc_flush_refs)
    # driver-side materializations are OPT-IN (test/analysis hooks): the
    # production outputs are the streamed per-wave parquet artifacts
    if collect_log:
        res.fetch_log = (
            pa.concat_tables(log_tables).to_pylist() if log_tables else []
        )
    if collect_seen:
        res.seen_sorted = pool.all_keys_sorted()
    # crawl-end fragment compaction (automatic scheduling policy,
    # VERDICT r3 #8): bounded file count across resumed runs
    if docs_dir is not None and ccfg.compact_fragments_threshold is not None:
        from ..sources.sinks import maybe_compact_fragments

        res.compaction = maybe_compact_fragments(
            docs_dir,
            max_fragments=ccfg.compact_fragments_threshold,
            target_bytes=ccfg.compact_target_bytes,
        )
    return res
