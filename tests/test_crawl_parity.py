"""Crawl-plane parity: Ray frontier vs sequential oracle.

North-rule gates: crawl ordering (the fetch log) and the final URL-seen
set must be byte-identical under the same seed list + politeness budget;
checkpoint/resume must reproduce the uninterrupted run exactly.
"""

import pytest

from webarchive_discovery_ray.config import CrawlConfig, SyntheticConfig
from webarchive_discovery_ray.oracle.crawl_oracle import oracle_crawl
from webarchive_discovery_ray.pipelines.crawl import run_crawl
from webarchive_discovery_ray.sources.synthetic import seed_urls

SYN = SyntheticConfig(n_hosts=10, pages_per_host=60, max_fanout=6)
CRAWL = CrawlConfig(politeness_budget=3, max_waves=4, seen_shards=4)


@pytest.fixture(scope="module")
def seeds():
    return seed_urls(SYN, n_seeds=6)


@pytest.fixture(scope="module")
def oracle_result(seeds):
    return oracle_crawl(seeds, CRAWL, SYN)


def _log_key(entry):
    return (entry["order"], entry["wave"], entry["host"], entry["slot"], entry["url"], entry["surt"], entry["status"])


def test_oracle_sanity(oracle_result):
    r = oracle_result
    assert len(r.fetch_log) > 20
    assert len(r.seen_sorted) > len(r.fetch_log)  # discovered more than fetched
    assert r.wave_stats[0]["fetched"] > 0
    # politeness: no host exceeds budget within a wave
    per = {}
    for e in r.fetch_log:
        per[(e["wave"], e["host"])] = per.get((e["wave"], e["host"]), 0) + 1
    assert max(per.values()) <= CRAWL.politeness_budget
    # robots fetched for hosts that appear
    assert any(e["url"].endswith("/robots.txt") for e in r.fetch_log)
    # fetch order pinned: sorted by (wave, host, slot)
    keys = [(e["wave"], e["host"], e["slot"]) for e in r.fetch_log]
    assert keys == sorted(keys)


def test_ray_crawl_matches_oracle(ray_session, seeds, oracle_result):
    got = run_crawl(seeds, CRAWL, SYN, fetch_concurrency=2, fetch_batch_size=16,
                    collect_log=True, collect_seen=True)
    exp = oracle_result
    assert [_log_key(e) for e in got.fetch_log] == [_log_key(e) for e in exp.fetch_log]
    assert got.seen_sorted == exp.seen_sorted  # byte-identical seen set
    keys = ("wave", "frontier", "fetched", "carryover", "new_urls")
    assert [{k: s[k] for k in keys} for s in got.wave_stats] == [
        {k: s[k] for k in keys} for s in exp.wave_stats
    ]
    # per-partition lineage sums to the wave totals
    for s in got.wave_stats:
        assert sum(p["fetched"] for p in s["partitions"].values()) == s["fetched"]


def test_robots_disallow_takes_effect(seeds):
    """With robots on, disallowed sections are dropped in later waves."""
    r_on = oracle_crawl(seeds, CRAWL, SYN)
    r_off = oracle_crawl(
        seeds,
        CrawlConfig(
            politeness_budget=CRAWL.politeness_budget,
            max_waves=CRAWL.max_waves,
            seen_shards=CRAWL.seen_shards,
            respect_robots=False,
        ),
        SYN,
    )
    assert not any(e["url"].endswith("/robots.txt") for e in r_off.fetch_log)
    assert any(s.get("dropped_robots", 0) > 0 for s in r_on.wave_stats), (
        "fixture must exercise the robots drop path"
    )


def test_checkpoint_resume_identical(ray_session, seeds, oracle_result, tmp_path_factory):
    """Kill-and-resume: run 2 waves with checkpoints, then resume to 4;
    result must equal the uninterrupted 4-wave run (and the oracle)."""
    ckpt = str(tmp_path_factory.mktemp("crawl_ckpt"))
    partial_cfg = CrawlConfig(
        politeness_budget=CRAWL.politeness_budget, max_waves=2, seen_shards=CRAWL.seen_shards
    )
    run_crawl(seeds, partial_cfg, SYN, checkpoint_dir=ckpt, fetch_concurrency=2)
    resumed = run_crawl(
        seeds, CRAWL, SYN, checkpoint_dir=ckpt, resume=True, fetch_concurrency=2,
        collect_log=True, collect_seen=True,
    )
    exp = oracle_result
    assert [_log_key(e) for e in resumed.fetch_log] == [_log_key(e) for e in exp.fetch_log]
    assert resumed.seen_sorted == exp.seen_sorted


def test_docs_sink_fragments(ray_session, seeds, tmp_path_factory):
    """Document sink: per-(wave, partition) parquet fragments, one doc per
    fetch, span schema intact (resumable output layout)."""
    import glob

    import pyarrow.parquet as pq

    docs_dir = str(tmp_path_factory.mktemp("crawl_docs"))
    r = run_crawl(seeds, CRAWL, SYN, docs_dir=docs_dir, fetch_concurrency=2,
                  collect_log=True)
    frags = sorted(glob.glob(f"{docs_dir}/wave_*/part_*.parquet"))
    assert frags
    total = 0
    for f in frags:
        t = pq.read_table(f)
        total += t.num_rows
        assert {"doc_id", "spans", "wave", "slot", "fetch_host"} <= set(t.schema.names)
    assert total == len(r.fetch_log)


def test_hot_host_budget_bound(ray_session):
    """Hot-host skew: the budget bounds any host's per-wave fetches, and the
    hot host accumulates carryover instead of starving other hosts."""
    syn = SyntheticConfig(n_hosts=6, pages_per_host=80, max_fanout=8, hot_host_share=0.6)
    seeds = seed_urls(syn, n_seeds=4)
    ccfg = CrawlConfig(politeness_budget=2, max_waves=3, seen_shards=2)
    exp = oracle_crawl(seeds, ccfg, syn)
    got = run_crawl(seeds, ccfg, syn, fetch_concurrency=2,
                    collect_log=True, collect_seen=True)
    assert [_log_key(e) for e in got.fetch_log] == [_log_key(e) for e in exp.fetch_log]
    assert got.seen_sorted == exp.seen_sorted
    per = {}
    for e in got.fetch_log:
        per.setdefault((e["wave"], e["host"]), 0)
        per[(e["wave"], e["host"])] += 1
    assert max(per.values()) <= 2
    assert any(s["carryover"] > 0 for s in got.wave_stats)


def test_salted_predrain_byte_parity(ray_session):
    """Hot-host salting (SURVEY §7.1-7): with salt_threshold forced low so
    EVERY sizeable partition takes the salted pre-drain path, the fetch
    log, seen set, and wave stats must stay byte-identical to the
    sequential oracle — the salted top-budget union provably contains the
    global per-host selection, and carryover (survivor losers + salted
    direct carry) must sum to the oracle's count. Politeness invariants
    (budget bound, pinned order) must survive the split."""
    syn = SyntheticConfig(n_hosts=8, pages_per_host=80, max_fanout=8, hot_host_share=0.6)
    seeds = seed_urls(syn, n_seeds=8)

    def cfg(**kw):
        return CrawlConfig(politeness_budget=2, max_waves=4, seen_shards=2, **kw)

    exp = oracle_crawl(seeds, cfg(), syn)
    got = run_crawl(
        seeds,
        # threshold 0: EVERY non-empty partition takes the salted path
        cfg(salt_threshold=0, salt_factor=4),
        syn,
        fetch_concurrency=2,
        collect_log=True,
        collect_seen=True,
    )
    assert [_log_key(e) for e in got.fetch_log] == [_log_key(e) for e in exp.fetch_log]
    assert got.seen_sorted == exp.seen_sorted
    keys = ("wave", "frontier", "fetched", "carryover", "new_urls")
    assert [{k: s[k] for k in keys} for s in got.wave_stats] == [
        {k: s[k] for k in keys} for s in exp.wave_stats
    ]
    per = {}
    for e in got.fetch_log:
        per[(e["wave"], e["host"])] = per.get((e["wave"], e["host"]), 0) + 1
    assert max(per.values()) <= 2


def test_resume_with_different_n_parts_leaves_no_stale_fragments(
    ray_session, seeds, tmp_path_factory
):
    """A crashed attempt's docs fragments must not survive a re-run with a
    different partition count (fragment files are keyed by part number;
    the wave dir is cleared before each wave's fetch)."""
    import glob

    import pyarrow.parquet as pq

    docs_dir = str(tmp_path_factory.mktemp("stale_docs"))
    # attempt 1: wide partitioning (fetch_concurrency 8 -> 32 parts)
    r1 = run_crawl(seeds, CRAWL, SYN, docs_dir=docs_dir, fetch_concurrency=8)
    n1 = sum(
        pq.read_metadata(f).num_rows
        for f in glob.glob(f"{docs_dir}/wave_*/part_*.parquet")
    )
    assert n1 == r1.total_fetched
    # attempt 2 (simulates a retry after a crash): narrower partitioning
    # renumbers parts — stale part_*.parquet from attempt 1 must be gone
    r2 = run_crawl(seeds, CRAWL, SYN, docs_dir=docs_dir, fetch_concurrency=2)
    n2 = sum(
        pq.read_metadata(f).num_rows
        for f in glob.glob(f"{docs_dir}/wave_*/part_*.parquet")
    )
    assert n2 == r2.total_fetched == r1.total_fetched


def test_max_urls_stop_condition(ray_session, seeds):
    """ccfg.max_urls bounds the total fetches: the crawl stops after the
    first wave that crosses the budget (matching the oracle's rule)."""
    ccfg = CrawlConfig(politeness_budget=3, max_waves=4, seen_shards=2, max_urls=20)
    exp = oracle_crawl(seeds, ccfg, SYN)
    got = run_crawl(seeds, ccfg, SYN, fetch_concurrency=2,
                    collect_log=True, collect_seen=True)
    assert [_log_key(e) for e in got.fetch_log] == [_log_key(e) for e in exp.fetch_log]
    assert got.seen_sorted == exp.seen_sorted
    assert got.total_fetched >= 20  # crossed within the stopping wave
    full = run_crawl(seeds, CRAWL, SYN, fetch_concurrency=2, collect_log=True)
    assert got.total_fetched < full.total_fetched  # it actually stopped early


def test_salted_predrain_factor_one(ray_session):
    """Regression: salt_factor=1 (degenerate split) must not crash —
    with num_returns=1 Ray hands back the return value unsplit, so
    _salt_split returns the table itself, and parity must still hold."""
    syn = SyntheticConfig(n_hosts=4, pages_per_host=40, max_fanout=6)
    seeds = seed_urls(syn, n_seeds=4)

    def cfg(**kw):
        return CrawlConfig(politeness_budget=2, max_waves=3, seen_shards=2, **kw)

    exp = oracle_crawl(seeds, cfg(), syn)
    got = run_crawl(
        seeds,
        cfg(salt_threshold=0, salt_factor=1),
        syn,
        fetch_concurrency=2,
        collect_log=True,
    )
    assert [_log_key(e) for e in got.fetch_log] == [_log_key(e) for e in exp.fetch_log]
