"""Sequential single-thread crawl oracle: the pinned frontier semantics.

The reference delegates crawling to Heritrix; BASELINE.json's north rule
requires a new frontier whose crawl ordering and URL-seen set are
byte-identical between the distributed Ray implementation and this
sequential definition, given the same seed list + politeness budget.

Pinned rules (shared with ``pipelines/crawl.py``; Heritrix-convention BFS):

1. Seeds are consumed in list order; each is canonicalised; first
   occurrence of a SURT key enters wave-0 frontier with hop 0 and an
   increasing global ``seq``.
2. Per wave: every frontier host that has no robots decision yet gets an
   implicit ``/robots.txt`` fetch injected at priority -1 / seq -1 (if its
   SURT is unseen); rules take effect for drains in LATER waves.
3. Per-host drain: order queue by (priority, seq); drop entries disallowed
   by the host's (previous-wave) robots rules; fetch the first
   ``politeness_budget`` entries (slots 0..K-1); the rest carry over.
4. Global fetch order within a wave = (host, slot) ascending — the
   politeness interleave is pinned for reproducibility.
5. Outlink candidates per fetched page = extraction's ``links`` (kind=link
   only) + ``redirect_to_norm``, deduped, sorted lexicographically; kept if
   http(s), parseable host, <= 2000 chars, hop+1 <= hop_limit.
6. Discovery order = (parent host, parent slot, candidate rank); first
   unseen SURT wins, gets the next global ``seq``, parent's priority,
   hop+1, and is queued for the next wave under the CANDIDATE's host.
7. Stop at max_waves, empty frontier, or >= max_urls total fetches
   (checked at wave end).
8. Link-level gates (both knob-controlled, applied between rules 5 and
   6): rel=nofollow / meta-robots-nofollow drops anchor targets
   (``state/robots.nofollow_scan``); the duplicate-content gate
   (``dedup_content``) empties the candidate set of any status-200
   fetch whose payload hash an earlier fetch already served.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..config import CrawlConfig, IndexConfig, SyntheticConfig
from ..functions.normalisation import canonicalise_url
from ..functions.suffix import MALFORMED_HOST, extract_host
from ..functions.surt import surt_key
from ..functions.urls import url_path
from ..sources.synthetic import page_for_url
from ..state.robots import (
    adaptive_budget_cap,
    effective_budget,
    fetch_duration_ms,
    is_disallowed,
    is_sitemap_index,
    nofollow_scan,
    parse_robots,
    parse_sitemap_locs,
    robots_url_for_host,
    sitemap_urls_of,
)
from .extract_oracle import oracle_extract_record

__all__ = ["oracle_crawl", "crawl_index_config", "OracleCrawlResult"]


def crawl_index_config(base: IndexConfig | None = None) -> IndexConfig:
    """Extraction config used inside the crawl: accept every status (the
    crawler records all fetches), responses only."""
    base = base or IndexConfig()
    return IndexConfig(
        record_type_include=("response",),
        protocol_include=base.protocol_include,
        url_exclude=base.url_exclude,
        response_include=(),
        surt_exclusions=base.surt_exclusions,
        max_url_length=base.max_url_length,
        max_text_length=base.max_text_length,
        extract_image_links=base.extract_image_links,
        normalise_links=base.normalise_links,
    )


@dataclass
class _Entry:
    url: str
    surt: str
    host: str
    priority: int
    hop: int
    seq: int


@dataclass
class OracleCrawlResult:
    fetch_log: list[dict] = field(default_factory=list)
    seen_sorted: list[str] = field(default_factory=list)
    wave_stats: list[dict] = field(default_factory=list)
    docs: list[dict] = field(default_factory=list)


def candidate_ok(url: str, hop: int, ccfg: CrawlConfig, max_url_length: int = 2000) -> bool:
    if hop + 1 > ccfg.hop_limit:
        return False
    if not url.startswith("http"):
        return False
    if len(url) > max_url_length:
        return False
    if extract_host(url) == MALFORMED_HOST:
        return False
    if ccfg.scope_surt_prefixes is not None:
        # SURT-prefix scope (Heritrix SurtPrefixedDecideRule): candidates
        # outside every prefix never enqueue. Seeds/robots/sitemap
        # injections bypass this gate by construction (they are not
        # candidates).
        sk = surt_key(url)
        if not any(sk.startswith(p) for p in ccfg.scope_surt_prefixes):
            return False
    return True


def scope_from_seeds(seeds: list[tuple[str, int]]) -> tuple[str, ...]:
    """The common stay-on-seed-hosts scope: each seed's host-SURT prefix
    (``com,example)``) — pass as ``CrawlConfig.scope_surt_prefixes``."""
    return tuple(
        sorted({surt_key(canonicalise_url(u)).split(")")[0] + ")" for u, _ in seeds})
    )


def oracle_crawl(
    seeds: list[tuple[str, int]],
    ccfg: CrawlConfig,
    scfg: SyntheticConfig,
    icfg: IndexConfig | None = None,
) -> OracleCrawlResult:
    icfg = crawl_index_config(icfg)
    res = OracleCrawlResult()
    seen: set[str] = set()
    content_seen: set[str] = set()  # dedup_content gate (payload hashes)
    robots_scheduled: set[str] = set()
    robots_rules: dict[str, list[str]] = {}
    backoff_prev: set[str] = set()  # hosts that served >=500 LAST wave
    host_fetched: dict[str, int] = {}  # max_pages_per_host quota state
    last_dur: dict[str, int] = {}  # adaptive politeness: last fetch ms
    retry_attempts: dict[str, int] = {}  # retry_5xx: attempts per surt
    seq = 0
    frontier: list[_Entry] = []
    for url, pri in seeds:
        u = canonicalise_url(url)
        k = surt_key(u)
        if k in seen:
            continue
        host = extract_host(u)
        if host == MALFORMED_HOST:
            continue
        seen.add(k)
        frontier.append(_Entry(u, k, host, pri, 0, seq))
        seq += 1

    for wave in range(ccfg.max_waves):
        if not frontier:
            break
        # rule 2: robots injection
        if ccfg.respect_robots:
            for host in sorted({e.host for e in frontier}):
                if host in robots_scheduled:
                    continue
                robots_scheduled.add(host)
                rurl = robots_url_for_host(host)
                rk = surt_key(rurl)
                if rk not in seen:
                    seen.add(rk)
                    frontier.append(_Entry(rurl, rk, host, -1, 0, -1))
        # rule 2b: sitemap injection — every Sitemap URL advertised by a
        # KNOWN host's rules whose SURT is still unseen (idempotent via
        # the seen set, so scanning all rules every wave is resume-safe)
        if ccfg.respect_robots and ccfg.follow_sitemaps:
            pend = sorted(
                {u for rules in robots_rules.values() for u in sitemap_urls_of(rules)}
            )
            for su in pend:
                u = canonicalise_url(su)
                k = surt_key(u)
                if k in seen:
                    continue
                host = extract_host(u)
                if host == MALFORMED_HOST:
                    continue
                seen.add(k)
                frontier.append(_Entry(u, k, host, -1, 0, -1))
        # rule 3: per-host drain
        by_host: dict[str, list[_Entry]] = {}
        for e in frontier:
            by_host.setdefault(e.host, []).append(e)
        selected: list[tuple[str, int, _Entry]] = []
        carryover: list[_Entry] = []
        dropped = 0
        for host in sorted(by_host):
            queue = sorted(
                by_host[host], key=lambda e: (e.priority, e.seq, e.surt)
            )
            rules = robots_rules.get(host, [])
            host_budget = effective_budget(ccfg.politeness_budget, rules)
            if ccfg.backoff_503 and host in backoff_prev:
                # one-wave 5xx backoff: half budget after an error wave
                host_budget = max(1, host_budget // 2)
            if ccfg.adaptive_politeness and host in last_dur:
                # Heritrix adaptive delay mapped onto the wave window
                # (pinned order: after Crawl-delay + 5xx, before quota)
                host_budget = min(
                    host_budget,
                    adaptive_budget_cap(
                        last_dur[host],
                        ccfg.adaptive_delay_factor_permil,
                        ccfg.adaptive_min_delay_ms,
                        ccfg.adaptive_max_delay_ms,
                        ccfg.adaptive_wave_window_ms,
                    ),
                )
            if ccfg.max_pages_per_host is not None:
                # queue-total-budget quota: cap at the host's remaining
                # allowance; a RETIRED host (nothing left) drops its
                # whole queue — rows vanish, they never carry again
                remaining = ccfg.max_pages_per_host - host_fetched.get(host, 0)
                if remaining <= 0:
                    dropped += len(queue)
                    continue
                host_budget = min(host_budget, remaining)
            slot = 0
            for e in queue:
                if e.priority != -1 and rules and is_disallowed(url_path(e.url), rules):
                    dropped += 1
                    continue
                if slot < host_budget:
                    selected.append((host, slot, e))
                    slot += 1
                else:
                    carryover.append(e)
        if ccfg.max_pages_per_host is not None:
            for host, _slot, _e in selected:
                host_fetched[host] = host_fetched.get(host, 0) + 1
        # rule 4: fetch in (host, slot) order
        new_robots: dict[str, list[str]] = {}
        wave_backoff: set[str] = set()
        wave_failed: list[_Entry] = []
        page_candidates: list[tuple[str, int, list[str], int, int]] = []
        for host, slot, e in selected:  # already (host, slot) sorted
            rec = page_for_url(e.url, scfg)
            if rec["status"] >= 500:
                wave_backoff.add(host)
                if ccfg.retry_5xx:
                    wave_failed.append(e)
            if ccfg.adaptive_politeness:
                # (host, slot) order => the last assignment per host is
                # the host's LAST fetch of the wave, Heritrix's input
                last_dur[host] = fetch_duration_ms(
                    rec["status"], len(rec["payload"] or b"")
                )
            doc = oracle_extract_record(rec, icfg)
            res.fetch_log.append(
                {
                    "order": len(res.fetch_log),
                    "wave": wave,
                    "host": host,
                    "slot": slot,
                    "url": e.url,
                    "surt": e.surt,
                    "status": rec["status"],
                }
            )
            if doc is not None:
                res.docs.append(doc)
            if e.url.endswith("/robots.txt") and rec["status"] == 200:
                new_robots[host] = parse_robots(rec["payload"].decode("utf-8", "replace"))
            # duplicate-content gate: a status-200 response whose payload
            # hash was already fetched (global (wave, host, slot) order —
            # exactly this loop's order) contributes NO candidates; the
            # fetch is still logged and the doc still emitted
            content_dup = False
            if ccfg.dedup_content and rec["status"] == 200 and doc is not None:
                h_key = doc["hash"]
                content_dup = h_key in content_seen
                content_seen.add(h_key)
            cands: set[str] = set(doc["links"]) if doc else set()
            if ccfg.respect_nofollow and cands and b"nofollow" in rec["payload"]:
                # rel=nofollow / meta-robots gate — same shared scan +
                # substring pre-gate as pipelines/crawl.FetchExtractStage
                meta_nf, nf_drop = nofollow_scan(
                    rec["payload"].decode("utf-8", "replace"),
                    e.url,
                    icfg.normalise_links,
                )
                cands = set() if meta_nf else cands - nf_drop
            if doc and doc["redirect_to_norm"]:
                cands.add(doc["redirect_to_norm"])
            cand_pri = max(e.priority, 0)
            if (
                e.priority == -1
                and not e.url.endswith("/robots.txt")
                and rec["status"] == 200
            ):
                # injected sitemap fetch: its <loc> URLs join the
                # candidate set, canonicalised like extracted links
                text = rec["payload"].decode("utf-8", "replace")
                cands.update(
                    canonicalise_url(x) for x in parse_sitemap_locs(text)
                )
                if is_sitemap_index(text):
                    # <sitemapindex>: locs are CHILD SITEMAPS — they keep
                    # priority -1 and recurse through the normal frontier
                    cand_pri = -1
            if content_dup:
                cands = set()
            page_candidates.append((host, slot, sorted(cands), e.hop, cand_pri))
        # rule 6: discovery (copy: carryover count must stay the drain's)
        next_frontier = list(carryover)
        new_count = 0
        for host, slot, cands, hop, cand_pri in page_candidates:
            for u in cands:
                if not candidate_ok(u, hop, ccfg, icfg.max_url_length):
                    continue
                k = surt_key(u)
                if k in seen:
                    continue
                seen.add(k)
                chost = extract_host(u)
                # candidates enqueue at the fetch row's cand_pri: -1 for
                # index children (recurse as sitemaps), else
                # max(parent priority, 0) — the pinned discovery rule
                next_frontier.append(_Entry(u, k, chost, cand_pri, hop + 1, seq))
                seq += 1
                new_count += 1
        # rule 6b: 5xx retry re-injection (Heritrix fetch retries): a
        # failed SELECTED fetch re-enters the next wave's frontier with
        # its ORIGINAL (priority, hop, seq) — it is already in the seen
        # set, so this is the only path that re-fetches a URL — up to
        # retry_5xx additional attempts per surt
        if ccfg.retry_5xx:
            for e in wave_failed:
                a = retry_attempts.get(e.surt, 0)
                if a < ccfg.retry_5xx:
                    retry_attempts[e.surt] = a + 1
                    next_frontier.append(e)
        robots_rules.update(new_robots)
        backoff_prev = wave_backoff if ccfg.backoff_503 else set()
        res.wave_stats.append(
            {
                "wave": wave,
                "frontier": len(frontier),
                "fetched": len(selected),
                "carryover": len(carryover),
                "dropped_robots": dropped,
                "new_urls": new_count,
            }
        )
        frontier = next_frontier
        if ccfg.max_urls is not None and len(res.fetch_log) >= ccfg.max_urls:
            break

    res.seen_sorted = sorted(seen)
    return res


def oracle_recrawl_seeds(capture_rows, rank_rows, default_interval_s=2_592_000):
    """Sequential closed-loop seed derivation — the independent mirror of
    ``pipelines/cdx.recrawl_seed_list`` (plain dict/loop construction, no
    pandas): per SURT take the latest capture's URL (max (timestamp14,
    url)), the exact-integer recrawl interval (PersistLogMapper-style
    fetch-history decision: ``span*(1500 - 1000*(v-1)//(n-1)) //
    ((n-1)*1000)``, single captures -> ``default_interval_s``), the host
    PageRank boost ``floor(rank_r * 1e8)``, and order by (priority=
    due-days asc, boost desc, surt asc). Returns ordered dicts with
    1-based seed_rank."""
    import math
    from calendar import timegm
    from collections import defaultdict
    from time import strptime

    hist = defaultdict(list)
    for r in capture_rows:
        hist[r["surt_key"]].append(r)
    ranks = {r["host"]: float(r["rank_r"]) for r in rank_rows}
    out = []
    for surt, rows in hist.items():
        latest = max(rows, key=lambda r: (r["timestamp14"], r["url"]))
        epochs = [timegm(strptime(r["timestamp14"], "%Y%m%d%H%M%S")) for r in rows]
        n = len(rows)
        versions = len({r["digest"] for r in rows})
        if n > 1:
            span = max(epochs) - min(epochs)
            cr_m = 1000 * (versions - 1) // (n - 1)
            nxt = span * (1500 - cr_m) // ((n - 1) * 1000)
        else:
            nxt = default_interval_s
        host = ".".join(reversed(surt.split(")", 1)[0].split(",")))
        boost = math.floor(ranks.get(host, 0.0) * 1e8)
        out.append(
            {
                "surt_key": surt,
                "url": latest["url"],
                "host": host,
                "next_fetch_s": nxt,
                "priority": nxt // 86400,
                "boost": boost,
            }
        )
    out.sort(key=lambda d: (d["priority"], -d["boost"], d["surt_key"]))
    for i, d in enumerate(out):
        d["seed_rank"] = i + 1
    return out
