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


def test_finalize_wave_split_matches_single_finalize(ray_session):
    """The (winners, small) split finalize must agree with the plain
    finalize on counts/hosts/samples, including the empty-shard case."""
    import pyarrow as pa

    from webarchive_discovery_ray.state.seen import SeenSet

    ss = SeenSet()
    t = pa.table(
        {
            "url": [f"http://h{i % 3}.com/p{i}" for i in range(30)],
            "surt": [f"com,h{i % 3})/p{i}" for i in range(30)],
            "host": [f"h{i % 3}.com" for i in range(30)],
            "priority": pa.array([0] * 30, pa.int32()),
            "hop": pa.array([0] * 30, pa.int32()),
            "order_host": [f"h{i % 3}.com" for i in range(30)],
            "order_slot": pa.array([i // 3 for i in range(30)], pa.int32()),
            "order_rank": pa.array([i % 3 for i in range(30)], pa.int32()),
        }
    )
    ss.accept(7, t)
    w, small = ss.finalize_wave_split(7, want_surts=True, n_samples=5)
    assert small["n"] == w.num_rows == 30
    assert set(small["hosts"]) == {"h0.com", "h1.com", "h2.com"}
    assert set(small["surts"]) == set(t["surt"].to_pylist())
    assert len(small["samples"]) == 5
    # samples are drawn from the SORTED order_host column
    assert small["samples"] == sorted(small["samples"])
    # empty shard: no candidates accepted for this wave
    w2, small2 = ss.finalize_wave_split(8, want_surts=True, n_samples=5)
    assert w2 is None and small2["n"] == 0 and small2["samples"] == []
    # re-finalizing wave 7 returns nothing new (all SURTs now seen)
    ss.accept(9, t)
    w3, small3 = ss.finalize_wave_split(9, want_surts=False, n_samples=5)
    assert w3 is None and small3["n"] == 0


def test_range_finalize_reproduces_global_sort(ray_session):
    """Range-parallel winners merge == the single global sort: exact seq
    from per-range offsets, every row in exactly one range."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    from webarchive_discovery_ray.pipelines.crawl import (
        _pick_boundaries,
        _range_counts,
        _range_finalize,
    )

    rng = np.random.default_rng(11)
    shards = []
    all_rows = []
    for s in range(4):
        n = 200
        hosts = [f"host{rng.integers(0, 40):03d}.com" for _ in range(n)]
        t = pa.table(
            {
                "url": [f"http://{h}/{i}" for i, h in enumerate(hosts)],
                "surt": [f"{h})/{s}-{i}" for i, h in enumerate(hosts)],
                "host": hosts,
                "priority": pa.array([0] * n, pa.int32()),
                "hop": pa.array([0] * n, pa.int32()),
                "order_host": hosts,
                "order_slot": pa.array(
                    rng.integers(0, 1000, n).astype("int32")
                ),
                "order_rank": pa.array(np.arange(n, dtype="int32")),
            }
        )
        t = t.take(
            pc.sort_indices(
                t,
                sort_keys=[
                    ("order_host", "ascending"),
                    ("order_slot", "ascending"),
                    ("order_rank", "ascending"),
                ],
            )
        )
        shards.append(t)
        all_rows.append(t)
    # sequential reference: global sort + seq
    glob = pa.concat_tables(all_rows)
    glob = glob.take(
        pc.sort_indices(
            glob,
            sort_keys=[
                ("order_host", "ascending"),
                ("order_slot", "ascending"),
                ("order_rank", "ascending"),
            ],
        )
    )
    want = {s: i + 1000 for i, s in enumerate(glob["surt"].to_pylist())}

    samples = [h for t in shards for h in t["order_host"].to_pylist()[::37]]
    boundaries = _pick_boundaries(samples, 4)
    assert boundaries, "fixture must produce split points"
    refs = [ray.put(t) for t in shards]
    counts = ray.get([_range_counts.remote(boundaries, r) for r in refs])
    per_range = np.sum(counts, axis=0)
    assert per_range.sum() == 800
    offs = 1000 + np.concatenate([[0], np.cumsum(per_range)[:-1]])
    n_parts = 8
    got = {}
    for r in range(len(boundaries) + 1):
        outs = ray.get(
            list(
                _range_finalize.options(num_returns=n_parts + 1).remote(
                    boundaries, r, int(offs[r]), n_parts, *refs
                )
            )
        )
        rows = outs[n_parts]
        assert sum(rows) == per_range[r]
        for p in range(n_parts):
            for surt, seq in zip(
                outs[p]["surt"].to_pylist(), outs[p]["seq"].to_pylist()
            ):
                got[surt] = seq
    assert got == want


def test_add_if_new_hashed_matches_plain_routing(ray_session):
    """Precomputed-hash routing == the plain per-key path, duplicates and
    cross-shard distribution included."""
    from webarchive_discovery_ray.functions.hashing import stable_hash64
    from webarchive_discovery_ray.state.seen import _SHARD_SEED, SeenShardPool

    keys = [f"com,site{i % 37})/p/{i % 61}" for i in range(500)]
    a = SeenShardPool(4)
    b = SeenShardPool(4)
    got_a = a.add_if_new(keys)
    hashes = [stable_hash64(k, _SHARD_SEED) for k in keys]
    got_b = b.add_if_new_hashed(keys, hashes)
    assert got_a == got_b
    # second pass: everything already seen
    assert not any(b.add_if_new_hashed(keys, hashes))


def test_bloom_add_many_equals_scalar_adds():
    from webarchive_discovery_ray.state.seen import BloomFilter

    keys = [f"key-{i}" for i in range(2000)]
    a = BloomFilter(1 << 16)
    b = BloomFilter(1 << 16)
    for k in keys:
        a.add(k)
    b.add_many(keys)
    assert (a.bits == b.bits).all()
    assert all(b.might_contain(k) for k in keys)


# --- closed crawl loop: round-2 signals drive the follow-up crawl -----------

def _loop_captures_and_ranks():
    """Hand-authored capture history + host ranks over the synthetic
    universe: a fast-changing URL (due now), a static multi-capture URL
    (long interval), single-capture URLs (30-day default), and two hosts
    differing only by PageRank (the tie-break)."""
    caps = [
        # fast-changing: 3 captures, 3 versions over 2 days -> due soon
        dict(surt_key="com,example,site0)/hot.html", url="http://site0.example.com/hot.html",
             timestamp14="20240101000000", digest="d1"),
        dict(surt_key="com,example,site0)/hot.html", url="http://site0.example.com/hot.html",
             timestamp14="20240102000000", digest="d2"),
        dict(surt_key="com,example,site0)/hot.html", url="http://site0.example.com/hot.html",
             timestamp14="20240103000000", digest="d3"),
        # static: 3 captures, 1 version over 100 days -> 1.5x mean interval
        dict(surt_key="com,example,site1)/static.html", url="http://site1.example.com/static.html",
             timestamp14="20240101000000", digest="s"),
        dict(surt_key="com,example,site1)/static.html", url="http://site1.example.com/static.html",
             timestamp14="20240220000000", digest="s"),
        dict(surt_key="com,example,site1)/static.html", url="http://site1.example.com/static.html",
             timestamp14="20240410000000", digest="s"),
        # single captures on rank-differing hosts (same 30-day priority)
        dict(surt_key="com,example,site2)/a.html", url="http://site2.example.com/a.html",
             timestamp14="20240105000000", digest="x1"),
        dict(surt_key="com,example,site3)/b.html", url="http://site3.example.com/b.html",
             timestamp14="20240105000000", digest="x2"),
        # latest-URL arg-max: same SURT captured under two url spellings
        dict(surt_key="com,example,site4)/c", url="http://site4.example.com/c?v=old",
             timestamp14="20240101000000", digest="y1"),
        dict(surt_key="com,example,site4)/c", url="http://site4.example.com/c?v=new",
             timestamp14="20240106000000", digest="y2"),
    ]
    ranks = [
        dict(host="site0.example.com", rank_r=0.05),
        dict(host="site1.example.com", rank_r=0.10),
        dict(host="site2.example.com", rank_r=0.02),
        dict(host="site3.example.com", rank_r=0.30),  # outranks site2
        # site4 missing -> boost 0
    ]
    return caps, ranks


def test_recrawl_seed_list_matches_sequential_rule(ray_session):
    import ray.data as rd

    from webarchive_discovery_ray.oracle.crawl_oracle import oracle_recrawl_seeds
    from webarchive_discovery_ray.pipelines.cdx import recrawl_seed_list

    caps, ranks = _loop_captures_and_ranks()
    got = sorted(
        recrawl_seed_list(rd.from_items(caps), rd.from_items(ranks)).take_all(),
        key=lambda r: r["seed_rank"],
    )
    exp = oracle_recrawl_seeds(caps, ranks)
    assert [
        {k: r[k] for k in ("surt_key", "url", "host", "next_fetch_s",
                           "priority", "boost", "seed_rank")}
        for r in got
    ] == exp
    by_surt = {r["surt_key"]: r for r in exp}
    # fast-changing first (due now), static long-interval last
    assert exp[0]["surt_key"] == "com,example,site0)/hot.html"
    assert exp[-1]["surt_key"] == "com,example,site1)/static.html"
    # same priority class: higher-PageRank host wins the tie-break
    s2, s3 = by_surt["com,example,site2)/a.html"], by_surt["com,example,site3)/b.html"]
    assert s2["priority"] == s3["priority"] and s3["seed_rank"] < s2["seed_rank"]
    # arg-max picked the LATEST capture's URL spelling
    assert by_surt["com,example,site4)/c"]["url"].endswith("v=new")


def test_closed_loop_crawl_byte_parity(ray_session):
    """The follow-up crawl seeded by the round-2 signals reproduces the
    sequential oracle byte-for-byte: fetch-log order and seen set."""
    from webarchive_discovery_ray.oracle.crawl_oracle import (
        oracle_crawl,
        oracle_recrawl_seeds,
    )

    caps, ranks = _loop_captures_and_ranks()
    seed_rows = oracle_recrawl_seeds(caps, ranks)
    seeds = [(r["url"], int(r["priority"])) for r in seed_rows]
    got = run_crawl(seeds, CRAWL, SYN, fetch_concurrency=2, fetch_batch_size=16,
                    collect_log=True, collect_seen=True)
    exp = oracle_crawl(seeds, CRAWL, SYN)
    assert [_log_key(e) for e in got.fetch_log] == [_log_key(e) for e in exp.fetch_log]
    assert got.seen_sorted == exp.seen_sorted


# ---------------------------------------------------------------------------
# round-4: seen-set spill/probe tier + shard-side checkpoint resume
# ---------------------------------------------------------------------------


def test_seen_spill_probe_semantics(tmp_path):
    """SeenSet with a tiny spill threshold must behave byte-identically to
    plain-set semantics across many spills: add_if_new masks, contains,
    snapshot, len — while actually holding only the hot tier in RAM."""
    import hashlib

    from webarchive_discovery_ray.state.seen import SeenSet

    ss = SeenSet(spill_dir=str(tmp_path / "spill"), spill_threshold=40)
    ref: set[str] = set()
    # 12 chunks of 60 keys with heavy cross-chunk duplication -> keys that
    # were spilled several chunks ago get re-offered and must be rejected
    for c in range(12):
        keys = [
            "com,host)/p%d" % (int(hashlib.sha1(f"{c}:{i}".encode()).hexdigest(), 16) % 250)
            for i in range(60)
        ]
        got = ss.add_if_new(keys)
        want = []
        batch_seen: set[str] = set()
        for k in keys:
            is_new = k not in ref and k not in batch_seen
            want.append(is_new)
            batch_seen.add(k)
        ref.update(batch_seen)
        assert got == want, f"chunk {c} mask mismatch"
    st = ss.spill_stats()
    assert st["spilled"] > 0, "fixture must actually force spills"
    assert st["hot"] < len(ref), "hot tier must not hold the full set"
    assert st["hot"] + st["spilled"] == len(ref)
    assert len(ss) == len(ref)
    assert ss.snapshot() == sorted(ref)  # byte-identical representation
    probe = list(ref)[:50] + ["com,host)/definitely-not-seen-%d" % i for i in range(20)]
    assert ss.contains(probe) == [k in ref for k in probe]


def test_seen_spill_compaction_folds_runs(tmp_path):
    """Exceeding max_runs triggers tiered compaction; membership and the
    sorted snapshot survive the fold."""
    from webarchive_discovery_ray.state.seen import SeenSet

    ss = SeenSet(spill_dir=str(tmp_path / "spill"), spill_threshold=10)
    ref = []
    for c in range(20):  # 20 spills > max_runs=8 -> at least one compaction
        keys = [f"com,h{c:02d})/p{i}" for i in range(10)]
        ss.add_if_new(keys)
        ref.extend(keys)
    st = ss.spill_stats()
    assert st["runs"] <= 8
    assert st["spilled"] == len(ref)
    assert ss.snapshot() == sorted(ref)
    assert ss.contains(ref[:30]) == [True] * 30
    assert ss.contains(["com,h99)/nope"]) == [False]


def test_forced_spill_crawl_byte_parity(ray_session, seeds, oracle_result, tmp_path_factory):
    """The VERDICT-r3 done-gate: the crawl byte-parity suite with the
    spill tier FORCED (tiny per-shard memory cap) — fetch log and final
    seen set must still match the sequential oracle exactly."""
    spill_dir = str(tmp_path_factory.mktemp("seen_spill"))
    cfg = CrawlConfig(
        politeness_budget=CRAWL.politeness_budget,
        max_waves=CRAWL.max_waves,
        seen_shards=CRAWL.seen_shards,
        seen_spill_threshold=16,
        seen_spill_dir=spill_dir,
    )
    got = run_crawl(seeds, cfg, SYN, fetch_concurrency=2, fetch_batch_size=16,
                    collect_log=True, collect_seen=True)
    exp = oracle_result
    assert [_log_key(e) for e in got.fetch_log] == [_log_key(e) for e in exp.fetch_log]
    assert got.seen_sorted == exp.seen_sorted


def test_checkpoint_resume_shard_side_no_driver_keys(
    ray_session, seeds, oracle_result, tmp_path_factory
):
    """Resume ships seen-delta PATHS to the shards (never a key list
    through the driver) and still reproduces the uninterrupted run —
    including with the spill tier forced on the resumed pool."""
    from webarchive_discovery_ray.state.checkpoint import (
        latest_complete_wave,
        load_wave_checkpoint,
    )

    ckpt = str(tmp_path_factory.mktemp("crawl_ckpt_shard"))
    partial_cfg = CrawlConfig(
        politeness_budget=CRAWL.politeness_budget, max_waves=2,
        seen_shards=CRAWL.seen_shards,
    )
    run_crawl(seeds, partial_cfg, SYN, checkpoint_dir=ckpt, fetch_concurrency=2)
    # the checkpoint loader exposes paths, not materialized keys
    ck = load_wave_checkpoint(ckpt, latest_complete_wave(ckpt))
    assert "seen_keys" not in ck
    assert ck["seen_delta_paths"] and all(
        p.endswith("seen_delta.parquet") for p in ck["seen_delta_paths"]
    )
    spill_dir = str(tmp_path_factory.mktemp("seen_spill_resume"))
    cfg = CrawlConfig(
        politeness_budget=CRAWL.politeness_budget, max_waves=CRAWL.max_waves,
        seen_shards=CRAWL.seen_shards,
        seen_spill_threshold=16, seen_spill_dir=spill_dir,
    )
    resumed = run_crawl(
        seeds, cfg, SYN, checkpoint_dir=ckpt, resume=True, fetch_concurrency=2,
        collect_log=True, collect_seen=True,
    )
    exp = oracle_result
    assert [_log_key(e) for e in resumed.fetch_log] == [_log_key(e) for e in exp.fetch_log]
    assert resumed.seen_sorted == exp.seen_sorted


def test_crawl_end_fragment_compaction_converges(ray_session, seeds, tmp_path_factory):
    """VERDICT-r3 #8 done-gate: a multi-resume crawl with the automatic
    compaction policy converges to a bounded fragment count, with every
    document row surviving (content equality vs an uncompacted run)."""
    import glob
    import os

    import pandas as pd
    import pyarrow.parquet as pq

    def _read_all(d):
        frames = []
        for p in sorted(glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True)):
            rel = os.path.relpath(p, d).split(os.sep)
            if rel[0] == "_compact" and not os.path.exists(
                os.path.join(d, "_compact", rel[1], "_DONE")
            ):
                continue
            frames.append(pq.read_table(p).to_pandas())
        return (
            pd.concat(frames, ignore_index=True)
            .sort_values(["doc_id"], ignore_index=True)
            if frames
            else pd.DataFrame()
        )

    # uncompacted baseline: staged checkpointed run (2 waves, then 4)
    base_docs = str(tmp_path_factory.mktemp("docs_plain"))
    base_ckpt = str(tmp_path_factory.mktemp("ckpt_plain"))
    cfg2 = CrawlConfig(politeness_budget=3, max_waves=2, seen_shards=4)
    cfg4 = CrawlConfig(politeness_budget=3, max_waves=4, seen_shards=4)
    run_crawl(seeds, cfg2, SYN, docs_dir=base_docs, checkpoint_dir=base_ckpt,
              fetch_concurrency=2)
    run_crawl(seeds, cfg4, SYN, docs_dir=base_docs, checkpoint_dir=base_ckpt,
              resume=True, fetch_concurrency=2)
    want = _read_all(base_docs)
    assert len(want) > 0

    # compacted run: same staging, tiny threshold so the policy fires
    docs = str(tmp_path_factory.mktemp("docs_compact"))
    ckpt = str(tmp_path_factory.mktemp("ckpt_compact"))
    ccfg2 = CrawlConfig(politeness_budget=3, max_waves=2, seen_shards=4,
                        compact_fragments_threshold=2)
    ccfg4 = CrawlConfig(politeness_budget=3, max_waves=4, seen_shards=4,
                        compact_fragments_threshold=2)
    r1 = run_crawl(seeds, ccfg2, SYN, docs_dir=docs, checkpoint_dir=ckpt,
                   fetch_concurrency=2)
    assert r1.compaction is not None and r1.compaction["written"] > 0
    r2 = run_crawl(seeds, ccfg4, SYN, docs_dir=docs, checkpoint_dir=ckpt,
                   resume=True, fetch_concurrency=2)
    assert r2.compaction is not None
    got = _read_all(docs)
    # convergence: bounded file count, manifests intact, rows identical
    live = [
        p for p in glob.glob(os.path.join(docs, "**", "*.parquet"), recursive=True)
        if "_compact" not in p
        or os.path.exists(
            os.path.join(docs, "_compact",
                         os.path.relpath(p, os.path.join(docs, "_compact")).split(os.sep)[0],
                         "_DONE")
        )
    ]
    assert r2.compaction["fragments_after"] <= max(
        2, r2.compaction["groups"]
    ) or len(live) <= 1 + r2.compaction["groups"]
    rounds = sorted(glob.glob(os.path.join(docs, "_compact", "round_*")))
    assert rounds
    for rdir in rounds:
        if os.path.exists(os.path.join(rdir, "_DONE")):
            assert os.path.exists(os.path.join(rdir, "_PLAN.json"))
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(
        got.astype(str), want.astype(str)
    )


def test_crawl_delay_budget_byte_parity(ray_session):
    """Crawl-delay politeness (round 4): hosts serving ``Crawl-delay: d``
    get effective per-wave budget max(1, budget // d) from the wave after
    their robots fetch — Ray frontier == sequential oracle byte-for-byte,
    and the rule demonstrably bites (some host fetches fewer URLs than
    the base budget in some wave)."""
    from webarchive_discovery_ray.sources.synthetic import robots_crawl_delay
    from webarchive_discovery_ray.state.robots import parse_robots

    syn = SyntheticConfig(
        n_hosts=10, pages_per_host=60, max_fanout=6,
        robots_crawl_delay_ratio=0.5,
    )
    # fixture sensitivity: at ratio 0.5 some crawled host must carry a delay
    assert any(
        robots_crawl_delay(f"site{i}.example.com", syn) for i in range(10)
    ) or any(
        robots_crawl_delay(f"site{i}.example.co.uk", syn) for i in range(10)
    )
    sds = seed_urls(syn, n_seeds=6)
    cfg = CrawlConfig(politeness_budget=3, max_waves=4, seen_shards=4)
    exp = oracle_crawl(sds, cfg, syn)
    got = run_crawl(sds, cfg, syn, fetch_concurrency=2, fetch_batch_size=16,
                    collect_log=True, collect_seen=True)
    assert [_log_key(e) for e in got.fetch_log] == [_log_key(e) for e in exp.fetch_log]
    assert got.seen_sorted == exp.seen_sorted
    # the delay rule must actually reduce some host's wave take: compare
    # to the same crawl with delays stripped from the generator
    syn_off = SyntheticConfig(
        n_hosts=10, pages_per_host=60, max_fanout=6,
        robots_crawl_delay_ratio=0.0,
    )
    base = oracle_crawl(seed_urls(syn_off, n_seeds=6), cfg, syn_off)
    assert [_log_key(e) for e in got.fetch_log] != [_log_key(e) for e in base.fetch_log], (
        "fixture must exercise the Crawl-delay budget reduction"
    )
    # sentinel parses and never collides with a path prefix
    rules = parse_robots("User-agent: *\nDisallow: /x/\nCrawl-delay: 3\n")
    assert "crawl-delay:3" in rules and "/x/" in rules


def test_sitemap_discovery_byte_parity(ray_session):
    """Sitemap discovery (round 4): robots ``Sitemap:`` URLs inject as
    priority -1 fetches from the wave after the robots fetch; a 200
    sitemap's <loc> URLs join its candidate set at default priority —
    Ray frontier == sequential oracle byte-for-byte, and the rule
    demonstrably bites (sitemap fetches appear in the log and
    sitemap-only pages get crawled)."""
    from webarchive_discovery_ray.sources.synthetic import (
        host_sitemaps,
        hosts,
        sitemap_locs,
    )

    syn = SyntheticConfig(
        n_hosts=10, pages_per_host=60, max_fanout=6,
        robots_sitemap_ratio=0.6,
    )
    advertised = {
        u for h in hosts(syn) for u in host_sitemaps(h, syn)
    }
    assert advertised, "fixture must advertise sitemaps"
    sds = seed_urls(syn, n_seeds=6)
    cfg = CrawlConfig(politeness_budget=3, max_waves=5, seen_shards=4)
    exp = oracle_crawl(sds, cfg, syn)
    got = run_crawl(sds, cfg, syn, fetch_concurrency=2, fetch_batch_size=16,
                    collect_log=True, collect_seen=True)
    assert [_log_key(e) for e in got.fetch_log] == [_log_key(e) for e in exp.fetch_log]
    assert got.seen_sorted == exp.seen_sorted
    # sensitivity: sitemap fetches happened...
    sm_fetches = [e for e in got.fetch_log if e["url"] in advertised]
    assert sm_fetches, "no advertised sitemap was fetched"
    # ...their discoveries got crawled (URLs only reachable via <loc>)
    fetched_urls = {e["url"] for e in got.fetch_log}
    sm_only = {
        loc
        for sm in sm_fetches
        for loc in sitemap_locs(sm["url"], syn)
        if "/articles/sm" in loc
    }
    assert sm_only & fetched_urls, "no sitemap-discovered page was crawled"
    # a host advertising TWO sitemaps exercises the same-wave injected
    # tie-break (drain order (priority, seq, surt))
    two = [h for h in hosts(syn) if len(host_sitemaps(h, syn)) == 2]
    crawled_hosts = {e["host"] for e in got.fetch_log}
    assert any(h in crawled_hosts for h in two), (
        "fixture must crawl a two-sitemap host to exercise the tie-break"
    )


def test_backoff_503_byte_parity_and_sensitivity(ray_session):
    """5xx backoff (round 4): a host serving any status>=500 response in
    wave W drains at max(1, budget//2) in wave W+1 only. Ray ==
    sequential oracle byte-for-byte; the rule demonstrably bites (some
    host's fetch count drops the wave after its 503); and the rule is a
    REAL behaviour change (backoff on != backoff off)."""
    syn = SyntheticConfig(n_hosts=10, pages_per_host=120, max_fanout=8)
    sds = seed_urls(syn, n_seeds=6)
    cfg = CrawlConfig(politeness_budget=4, max_waves=6, seen_shards=4,
                      backoff_503=True)
    exp = oracle_crawl(sds, cfg, syn)
    got = run_crawl(sds, cfg, syn, fetch_concurrency=2, fetch_batch_size=16,
                    collect_log=True, collect_seen=True)
    assert [_log_key(e) for e in got.fetch_log] == [_log_key(e) for e in exp.fetch_log]
    assert got.seen_sorted == exp.seen_sorted
    # sensitivity: find a (host, wave) with a 5xx and a full-budget drain
    # whose next wave drained at most half the budget
    from collections import defaultdict

    per = defaultdict(int)
    bad = set()
    for e in got.fetch_log:
        per[(e["host"], e["wave"])] += 1
        if e["status"] >= 500:
            bad.add((e["host"], e["wave"]))
    bitten = [
        (h, w)
        for (h, w) in bad
        if per[(h, w)] == cfg.politeness_budget
        and 0 < per.get((h, w + 1), 0) <= cfg.politeness_budget // 2
    ]
    assert bitten, "no host demonstrably halved after a 5xx wave"
    off = run_crawl(
        sds, CrawlConfig(politeness_budget=4, max_waves=6, seen_shards=4),
        syn, fetch_concurrency=2, fetch_batch_size=16, collect_log=True,
    )
    assert [_log_key(e) for e in off.fetch_log] != [
        _log_key(e) for e in got.fetch_log
    ], "backoff_503 must change the schedule on a 5xx-bearing fixture"


def test_backoff_503_checkpoint_resume_identical(ray_session, tmp_path_factory):
    """Kill-and-resume across a backoff boundary: the one-wave offender
    set is checkpointed, so the resumed crawl equals the uninterrupted
    one byte-for-byte."""
    syn = SyntheticConfig(n_hosts=10, pages_per_host=120, max_fanout=8)
    sds = seed_urls(syn, n_seeds=6)
    cfg = CrawlConfig(politeness_budget=4, max_waves=6, seen_shards=4,
                      backoff_503=True)
    full = run_crawl(sds, cfg, syn, fetch_concurrency=2, fetch_batch_size=16,
                     collect_log=True, collect_seen=True)
    ckdir = str(tmp_path_factory.mktemp("backoff_ck"))
    cfg1 = CrawlConfig(politeness_budget=4, max_waves=3, seen_shards=4,
                       backoff_503=True)
    run_crawl(sds, cfg1, syn, fetch_concurrency=2, fetch_batch_size=16,
              checkpoint_dir=ckdir)
    got = run_crawl(sds, cfg, syn, fetch_concurrency=2, fetch_batch_size=16,
                    checkpoint_dir=ckdir, resume=True,
                    collect_log=True, collect_seen=True)
    assert [_log_key(e) for e in got.fetch_log] == [_log_key(e) for e in full.fetch_log]
    assert got.seen_sorted == full.seen_sorted


def test_robots_allow_longest_match_byte_parity(ray_session):
    """RFC 9309 Allow carve-outs (round 4): among matching Allow/Disallow
    prefixes the longest wins (tie -> Allow). Ray frontier == sequential
    oracle byte-for-byte, and the rule demonstrably bites (a page under a
    Disallowed prefix re-admitted by a longer Allow gets fetched while a
    sibling stays blocked)."""
    from webarchive_discovery_ray.functions.urls import url_path
    from webarchive_discovery_ray.sources.synthetic import (
        hosts,
        robots_allows,
        robots_disallows,
    )
    from webarchive_discovery_ray.state.robots import is_disallowed, parse_robots

    syn = SyntheticConfig(
        n_hosts=14, pages_per_host=80, max_fanout=7,
        robots_disallow_ratio=0.8, robots_allow_ratio=0.8,
    )
    allowed_hosts = [h for h in hosts(syn) if robots_allows(h, syn)]
    assert allowed_hosts, "fixture must serve Allow lines"
    sds = seed_urls(syn, n_seeds=8)
    cfg = CrawlConfig(politeness_budget=4, max_waves=5, seen_shards=4)
    exp = oracle_crawl(sds, cfg, syn)
    got = run_crawl(sds, cfg, syn, fetch_concurrency=2, fetch_batch_size=16,
                    collect_log=True, collect_seen=True)
    assert [_log_key(e) for e in got.fetch_log] == [_log_key(e) for e in exp.fetch_log]
    assert got.seen_sorted == exp.seen_sorted
    # sensitivity: some fetched URL sits under a Disallow prefix but is
    # re-admitted by its host's longer Allow prefix
    carved = 0
    for e in got.fetch_log:
        h = e["host"]
        dis, alw = robots_disallows(h, syn), robots_allows(h, syn)
        if not alw:
            continue
        p = url_path(e["url"])
        if any(p.startswith(d) for d in dis) and any(
            p.startswith(a) for a in alw
        ):
            carved += 1
    assert carved, "no Allow-carved URL was actually fetched"
    # kernel pins: longest-match + tie->Allow + sentinel immunity
    rules = parse_robots(
        "User-agent: *\nDisallow: /a/\nAllow: /a/b\nCrawl-delay: 2\n"
        "Sitemap: http://x/s.xml\n"
    )
    assert is_disallowed("/a/x", rules)
    assert not is_disallowed("/a/b", rules)  # tie in spirit: allow wins
    assert not is_disallowed("/a/bc", rules)  # longer allow match
    assert not is_disallowed("/ok", rules)
    assert is_disallowed("/a/", rules) and not is_disallowed("/", rules)


def test_sitemap_index_recursion_byte_parity(ray_session):
    """<sitemapindex> recursion (round 4): a fetched priority -1 sitemap
    whose body is an index emits its child <loc> sitemaps as candidates
    that KEEP priority -1 (fetched + parsed as sitemaps in turn, riding
    the normal checkpointed frontier); a <urlset>'s locs stay at default
    priority. Ray == sequential oracle byte-for-byte, and the recursion
    demonstrably bites."""
    from webarchive_discovery_ray.sources.synthetic import (
        host_sitemaps,
        hosts,
        sitemap_children,
        sitemap_is_index,
        sitemap_locs,
    )

    syn = SyntheticConfig(
        n_hosts=12, pages_per_host=60, max_fanout=6,
        robots_sitemap_ratio=0.7, sitemap_index_ratio=0.6,
    )
    indexes = {
        sm for h in hosts(syn) for sm in host_sitemaps(h, syn)
        if sitemap_is_index(sm, syn)
    }
    assert indexes, "fixture must advertise at least one index sitemap"
    children = {c for sm in indexes for c in sitemap_children(sm, syn)}
    sds = seed_urls(syn, n_seeds=8)
    cfg = CrawlConfig(politeness_budget=3, max_waves=6, seen_shards=4)
    exp = oracle_crawl(sds, cfg, syn)
    got = run_crawl(sds, cfg, syn, fetch_concurrency=2, fetch_batch_size=16,
                    collect_log=True, collect_seen=True)
    assert [_log_key(e) for e in got.fetch_log] == [_log_key(e) for e in exp.fetch_log]
    assert got.seen_sorted == exp.seen_sorted
    fetched_urls = {e["url"] for e in got.fetch_log}
    # sensitivity ladder: an index was fetched -> a child was fetched ->
    # a child-discovered page (only reachable via the child's <loc>) was
    # fetched
    hit_idx = indexes & fetched_urls
    assert hit_idx, "no advertised index sitemap was fetched"
    hit_kids = children & fetched_urls
    assert hit_kids, "no index child sitemap was fetched"
    kid_locs = {
        loc for c in hit_kids for loc in sitemap_locs(c, syn)
        if "/articles/sm" in loc
    }
    assert kid_locs & fetched_urls, "no child-discovered page was crawled"


def test_sitemap_checkpoint_resume_identical(ray_session, tmp_path_factory):
    """Kill-and-resume across the sitemap-pending boundary: pending
    sitemap URLs are NOT checkpointed — resume recomputes them from the
    checkpointed rules and the seen-set probe keeps re-offers idempotent.
    The resumed crawl must equal the uninterrupted one byte-for-byte."""
    syn = SyntheticConfig(
        n_hosts=10, pages_per_host=60, max_fanout=6,
        robots_sitemap_ratio=0.6,
    )
    sds = seed_urls(syn, n_seeds=6)
    cfg = CrawlConfig(politeness_budget=3, max_waves=5, seen_shards=4)
    full = run_crawl(sds, cfg, syn, fetch_concurrency=2, fetch_batch_size=16,
                     collect_log=True, collect_seen=True)
    ckdir = str(tmp_path_factory.mktemp("sitemap_ck"))
    # phase 1: stop after wave 1 (robots of wave 0 known, sitemaps pending)
    cfg1 = CrawlConfig(politeness_budget=3, max_waves=2, seen_shards=4)
    run_crawl(sds, cfg1, syn, fetch_concurrency=2, fetch_batch_size=16,
              checkpoint_dir=ckdir)
    # phase 2: resume to completion
    got = run_crawl(sds, cfg, syn, fetch_concurrency=2, fetch_batch_size=16,
                    checkpoint_dir=ckdir, resume=True,
                    collect_log=True, collect_seen=True)
    assert [_log_key(e) for e in got.fetch_log] == [_log_key(e) for e in full.fetch_log]
    assert got.seen_sorted == full.seen_sorted


def test_all_politeness_features_combined_resume(ray_session, tmp_path_factory):
    """Everything at once: forced seen-set spill + Crawl-delay + Allow
    carve-outs + sitemap-index recursion + 5xx backoff + rel/meta
    nofollow + the duplicate-content gate + SURT scope + per-host total
    quota + the WARC sink, byte-parity vs the oracle AND kill-and-resume
    identical across the combined state (spill runs, pending sitemaps,
    backoff set, quota counters, rules with all three sentinel kinds),
    with the resumed run's WARC fragments byte-identical to the
    uninterrupted run's."""
    import glob
    import os

    from webarchive_discovery_ray.oracle.crawl_oracle import scope_from_seeds

    syn = SyntheticConfig(
        n_hosts=12, pages_per_host=100, max_fanout=7,
        robots_disallow_ratio=0.6, robots_allow_ratio=0.6,
        robots_crawl_delay_ratio=0.3, robots_sitemap_ratio=0.5,
        sitemap_index_ratio=0.5, link_nofollow_ratio=0.2,
        meta_nofollow_ratio=0.1, duplicate_content_ratio=0.2,
    )
    sds = seed_urls(syn, n_seeds=8)
    scope = scope_from_seeds(sds[:7])  # bites: one seed host out of scope
    spill = str(tmp_path_factory.mktemp("combined_spill"))
    warc_full = str(tmp_path_factory.mktemp("combined_warc_full"))

    def mk(waves, spill_dir, warc_dir):
        return CrawlConfig(politeness_budget=4, max_waves=waves,
                           seen_shards=4, backoff_503=True,
                           dedup_content=True, seen_spill_threshold=16,
                           seen_spill_dir=spill_dir,
                           scope_surt_prefixes=scope,
                           max_pages_per_host=12, warc_dir=warc_dir)

    cfg = mk(6, spill, warc_full)
    exp = oracle_crawl(sds, cfg, syn)
    full = run_crawl(sds, cfg, syn, fetch_concurrency=2, fetch_batch_size=16,
                     collect_log=True, collect_seen=True)
    assert [_log_key(e) for e in full.fetch_log] == [_log_key(e) for e in exp.fetch_log]
    assert full.seen_sorted == exp.seen_sorted
    # quota + scope bite under the combination
    per: dict[str, int] = {}
    for e in exp.fetch_log:
        per[e["host"]] = per.get(e["host"], 0) + 1
    assert per and max(per.values()) <= 12
    # kill after wave 2, resume to completion — byte-identical, and the
    # WARC fragment set matches the uninterrupted run byte-for-byte
    ckdir = str(tmp_path_factory.mktemp("combined_ck"))
    spill2 = str(tmp_path_factory.mktemp("combined_spill2"))
    warc_res = str(tmp_path_factory.mktemp("combined_warc_res"))
    run_crawl(sds, mk(3, spill2, warc_res), syn, fetch_concurrency=2,
              fetch_batch_size=16, checkpoint_dir=ckdir)
    got = run_crawl(sds, mk(6, spill2, warc_res), syn, fetch_concurrency=2,
                    fetch_batch_size=16, checkpoint_dir=ckdir, resume=True,
                    collect_log=True, collect_seen=True)
    assert [_log_key(e) for e in got.fetch_log] == [_log_key(e) for e in full.fetch_log]
    assert got.seen_sorted == full.seen_sorted

    def frags(d):
        return {
            os.path.relpath(f, d): open(f, "rb").read()
            for f in sorted(glob.glob(os.path.join(d, "wave_*", "part_*.warc.gz")))
        }

    assert frags(warc_full) == frags(warc_res)


def test_nofollow_byte_parity(ray_session):
    """rel=nofollow / meta-robots-nofollow gating (round 4): anchors
    carrying a rel nofollow token don't enqueue their target; a page with
    <meta name="robots" content="... nofollow ..."> contributes no
    extraction links at all — Ray frontier == sequential oracle
    byte-for-byte, and both rules demonstrably bite."""
    from webarchive_discovery_ray.sources.synthetic import page_for_url
    from webarchive_discovery_ray.state.robots import nofollow_scan

    syn = SyntheticConfig(
        n_hosts=10, pages_per_host=60, max_fanout=6,
        link_nofollow_ratio=0.3, meta_nofollow_ratio=0.15,
    )
    cfg = CrawlConfig(politeness_budget=3, max_waves=4, seen_shards=4)
    sds = seed_urls(syn, n_seeds=6)
    exp = oracle_crawl(sds, cfg, syn)
    got = run_crawl(sds, cfg, syn, fetch_concurrency=2, fetch_batch_size=16,
                    collect_log=True, collect_seen=True)
    assert [_log_key(e) for e in got.fetch_log] == [_log_key(e) for e in exp.fetch_log]
    assert got.seen_sorted == exp.seen_sorted
    # fixture sensitivity: both directive kinds appear among fetched pages
    metas, rels = 0, 0
    for e in exp.fetch_log:
        rec = page_for_url(e["url"], syn)
        if b"nofollow" not in rec["payload"]:
            continue
        meta_nf, drop = nofollow_scan(
            rec["payload"].decode("utf-8", "replace"), e["url"]
        )
        metas += meta_nf
        rels += bool(drop)
    assert metas > 0, "fixture must exercise meta robots nofollow"
    assert rels > 0, "fixture must exercise rel=nofollow anchors"
    # the gate must actually shrink discovery vs the same crawl with the
    # directives ignored
    off = oracle_crawl(
        sds,
        CrawlConfig(politeness_budget=3, max_waves=4, seen_shards=4,
                    respect_nofollow=False),
        syn,
    )
    assert len(exp.seen_sorted) < len(off.seen_sorted), (
        "nofollow gating must reduce the discovered URL set"
    )
    # knob-off generator output unchanged: default fixtures byte-identical
    syn_off = SyntheticConfig(n_hosts=10, pages_per_host=60, max_fanout=6)
    base_on_gate = oracle_crawl(seed_urls(syn_off, n_seeds=6), cfg, syn_off)
    base_no_gate = oracle_crawl(
        seed_urls(syn_off, n_seeds=6),
        CrawlConfig(politeness_budget=3, max_waves=4, seen_shards=4,
                    respect_nofollow=False),
        syn_off,
    )
    assert [_log_key(e) for e in base_on_gate.fetch_log] == [
        _log_key(e) for e in base_no_gate.fetch_log
    ]
    assert base_on_gate.seen_sorted == base_no_gate.seen_sorted


def test_dedup_content_byte_parity(ray_session):
    """Duplicate-content gate (round 4): a status-200 fetch whose payload
    hash was already fetched (global (wave, host, slot) order) contributes
    NO candidates — Ray frontier (sharded content pool + wave-barrier
    first-wins gate) == sequential oracle byte-for-byte, and the rule
    demonstrably bites."""
    from webarchive_discovery_ray.sources.synthetic import page_for_url

    syn = SyntheticConfig(
        n_hosts=10, pages_per_host=60, max_fanout=6,
        duplicate_content_ratio=0.35,
    )
    cfg = CrawlConfig(politeness_budget=3, max_waves=4, seen_shards=4,
                      dedup_content=True)
    sds = seed_urls(syn, n_seeds=6)
    exp = oracle_crawl(sds, cfg, syn)
    got = run_crawl(sds, cfg, syn, fetch_concurrency=2, fetch_batch_size=16,
                    collect_log=True, collect_seen=True)
    assert [_log_key(e) for e in got.fetch_log] == [_log_key(e) for e in exp.fetch_log]
    assert got.seen_sorted == exp.seen_sorted
    # fixture sensitivity: some fetched 200 pages shared payload bytes
    hashes: dict[str, int] = {}
    for e in exp.fetch_log:
        rec = page_for_url(e["url"], syn)
        if rec["status"] == 200:
            hashes[rec["payload_sha1"]] = hashes.get(rec["payload_sha1"], 0) + 1
    assert any(v > 1 for v in hashes.values()), (
        "fixture must contain duplicate-content fetches"
    )
    # the gate must actually shrink discovery vs the same crawl without it
    off = oracle_crawl(
        sds,
        CrawlConfig(politeness_budget=3, max_waves=4, seen_shards=4,
                    dedup_content=False),
        syn,
    )
    assert len(exp.seen_sorted) < len(off.seen_sorted), (
        "content gate must reduce the discovered URL set"
    )
    # knob-off: gate enabled over the default generator changes nothing
    # (all payloads distinct except protocol-level error/redirect bodies,
    # which never participate — only status 200 registers)
    syn_off = SyntheticConfig(n_hosts=10, pages_per_host=60, max_fanout=6)
    base = oracle_crawl(seed_urls(syn_off, n_seeds=6),
                        CrawlConfig(politeness_budget=3, max_waves=4,
                                    seen_shards=4), syn_off)
    gate = oracle_crawl(seed_urls(syn_off, n_seeds=6),
                        CrawlConfig(politeness_budget=3, max_waves=4,
                                    seen_shards=4, dedup_content=True),
                        syn_off)
    # identical UNLESS the default corpus happens to serve duplicate 200
    # bodies; assert equality only when it provably has none
    h2: dict[str, int] = {}
    for e in base.fetch_log:
        rec = page_for_url(e["url"], syn_off)
        if rec["status"] == 200:
            h2[rec["payload_sha1"]] = h2.get(rec["payload_sha1"], 0) + 1
    if not any(v > 1 for v in h2.values()):
        assert [_log_key(e) for e in gate.fetch_log] == [
            _log_key(e) for e in base.fetch_log
        ]
        assert gate.seen_sorted == base.seen_sorted


def test_dedup_content_checkpoint_resume_identical(ray_session, tmp_path_factory):
    """Kill-and-resume with the content gate on: the content-seen pool
    checkpoints as per-wave deltas (content_delta.parquet) and restores
    shard-side — the resumed crawl equals the uninterrupted one
    byte-for-byte (a lost content set would re-admit duplicate pages'
    candidates and diverge)."""
    syn = SyntheticConfig(
        n_hosts=10, pages_per_host=60, max_fanout=6,
        duplicate_content_ratio=0.35,
    )
    sds = seed_urls(syn, n_seeds=6)
    cfg = CrawlConfig(politeness_budget=3, max_waves=5, seen_shards=4,
                      dedup_content=True)
    full = run_crawl(sds, cfg, syn, fetch_concurrency=2, fetch_batch_size=16,
                     collect_log=True, collect_seen=True)
    ckdir = str(tmp_path_factory.mktemp("dedup_ck"))
    cfg1 = CrawlConfig(politeness_budget=3, max_waves=2, seen_shards=4,
                       dedup_content=True)
    run_crawl(sds, cfg1, syn, fetch_concurrency=2, fetch_batch_size=16,
              checkpoint_dir=ckdir)
    got = run_crawl(sds, cfg, syn, fetch_concurrency=2, fetch_batch_size=16,
                    checkpoint_dir=ckdir, resume=True,
                    collect_log=True, collect_seen=True)
    assert [_log_key(e) for e in got.fetch_log] == [_log_key(e) for e in full.fetch_log]
    assert got.seen_sorted == full.seen_sorted


def test_max_pages_per_host_quota(ray_session, seeds, oracle_result, tmp_path_factory):
    """Heritrix queue-total-budget rule: per-host total fetch quota,
    retired hosts drop their queues. Byte-parity vs the sequential
    oracle, the cap provably bites, knob-off is byte-identical, and
    kill-resume restores the quota counters."""
    quota_cfg = CrawlConfig(politeness_budget=3, max_waves=4, seen_shards=4,
                            max_pages_per_host=5)
    exp = oracle_crawl(seeds, quota_cfg, SYN)
    got = run_crawl(seeds, quota_cfg, SYN, fetch_concurrency=2,
                    collect_log=True, collect_seen=True)
    assert [_log_key(e) for e in got.fetch_log] == [_log_key(e) for e in exp.fetch_log]
    assert got.seen_sorted == exp.seen_sorted
    # sensitivity: every host stops at the quota, and the unquota'd crawl
    # provably fetched more from at least one host
    per: dict[str, int] = {}
    for e in exp.fetch_log:
        per[e["host"]] = per.get(e["host"], 0) + 1
    assert per and max(per.values()) <= 5
    base_per: dict[str, int] = {}
    for e in oracle_result.fetch_log:
        base_per[e["host"]] = base_per.get(e["host"], 0) + 1
    assert max(base_per.values()) > 5, "fixture must exceed the quota"
    assert len(exp.fetch_log) < len(oracle_result.fetch_log)
    # knob-off: None leaves the default crawl byte-identical
    off = run_crawl(seeds, CRAWL, SYN, fetch_concurrency=2, collect_log=True,
                    collect_seen=True)
    assert [_log_key(e) for e in off.fetch_log] == [
        _log_key(e) for e in oracle_result.fetch_log
    ]
    # salted pre-drain path agrees (any split factor is parity-safe,
    # including retired-host drops)
    salted_cfg = CrawlConfig(politeness_budget=3, max_waves=4, seen_shards=4,
                             max_pages_per_host=5, salt_threshold=1,
                             salt_factor=3)
    salted = run_crawl(seeds, salted_cfg, SYN, fetch_concurrency=2,
                       collect_log=True, collect_seen=True)
    assert [_log_key(e) for e in salted.fetch_log] == [
        _log_key(e) for e in exp.fetch_log
    ]
    assert salted.seen_sorted == exp.seen_sorted
    # kill-and-resume: counters checkpoint and restore
    ckpt = str(tmp_path_factory.mktemp("quota_ckpt"))
    partial = CrawlConfig(politeness_budget=3, max_waves=2, seen_shards=4,
                          max_pages_per_host=5)
    run_crawl(seeds, partial, SYN, checkpoint_dir=ckpt, fetch_concurrency=2)
    resumed = run_crawl(seeds, quota_cfg, SYN, checkpoint_dir=ckpt,
                        resume=True, fetch_concurrency=2, collect_log=True,
                        collect_seen=True)
    assert [_log_key(e) for e in resumed.fetch_log] == [
        _log_key(e) for e in exp.fetch_log
    ]
    assert resumed.seen_sorted == exp.seen_sorted


def test_scope_surt_prefixes(ray_session, seeds, oracle_result):
    """Heritrix SurtPrefixedDecideRule: candidates outside the SURT scope
    never enqueue. Byte-parity vs the oracle through the shared
    candidate_ok gate, the scope provably bites, seeds/robots stay in
    scope by construction, and knob-off is byte-identical."""
    from webarchive_discovery_ray.oracle.crawl_oracle import scope_from_seeds
    from webarchive_discovery_ray.functions.surt import surt_key

    scope = scope_from_seeds(seeds[:2])  # stay on the first two seed hosts
    cfg = CrawlConfig(politeness_budget=3, max_waves=4, seen_shards=4,
                      scope_surt_prefixes=scope)
    exp = oracle_crawl(seeds, cfg, SYN)
    got = run_crawl(seeds, cfg, SYN, fetch_concurrency=2,
                    collect_log=True, collect_seen=True)
    assert [_log_key(e) for e in got.fetch_log] == [_log_key(e) for e in exp.fetch_log]
    assert got.seen_sorted == exp.seen_sorted
    # sensitivity: discovery shrank vs the unscoped crawl, and every
    # DISCOVERED (non-seed, non-robots) fetch is inside the scope
    assert len(exp.seen_sorted) < len(oracle_result.seen_sorted)
    seed_surts = {surt_key(u) for u, _ in seeds}
    for e in exp.fetch_log:
        if e["surt"] in seed_surts or e["url"].endswith("/robots.txt"):
            continue
        assert any(e["surt"].startswith(p) for p in scope), e["url"]
    # the scope kept hosts beyond the first two OUT (seeds themselves and
    # their robots are the only out-of-scope fetches)
    in_scope_hosts = {e["host"] for e in exp.fetch_log
                      if any(surt_key("http://" + e["host"] + "/").startswith(p)
                             for p in scope)}
    all_hosts = {e["host"] for e in exp.fetch_log}
    assert in_scope_hosts < all_hosts  # some seed hosts are out of scope
    base_hosts = {e["host"] for e in oracle_result.fetch_log}
    assert all_hosts < base_hosts  # scope pruned discovered hosts
    # knob-off: None reproduces the base crawl byte-for-byte
    off = run_crawl(seeds, CRAWL, SYN, fetch_concurrency=2,
                    collect_log=True)
    assert [_log_key(e) for e in off.fetch_log] == [
        _log_key(e) for e in oracle_result.fetch_log
    ]


def _adaptive_cfg(**kw):
    base = dict(
        politeness_budget=3, max_waves=4, seen_shards=4,
        adaptive_politeness=True,
        # factor 5.0, floor 3s, window 7s: every host's earned delay is
        # >= 3000 ms, so the wave cap is <= 7000 // 3000 = 2 < budget —
        # the knob provably bites from wave 1 on
        adaptive_delay_factor_permil=5000,
        adaptive_min_delay_ms=3000,
        adaptive_max_delay_ms=30000,
        adaptive_wave_window_ms=7000,
    )
    base.update(kw)
    return CrawlConfig(**base)


def test_adaptive_politeness_parity(ray_session, seeds):
    """Adaptive politeness (Heritrix delayFactor/minDelayMs/maxDelayMs on
    the wave window): Ray crawl must match the sequential oracle
    byte-identically with the knob biting."""
    ccfg = _adaptive_cfg()
    exp = oracle_crawl(seeds, ccfg, SYN)
    got = run_crawl(seeds, ccfg, SYN, fetch_concurrency=2,
                    collect_log=True, collect_seen=True)
    assert [_log_key(e) for e in got.fetch_log] == [_log_key(e) for e in exp.fetch_log]
    assert got.seen_sorted == exp.seen_sorted


def test_adaptive_politeness_sensitivity(seeds, oracle_result):
    """The knob BITES: with the cap at 2 (< budget 3) no host exceeds 2
    fetches in any wave after its first fetch, and the crawl differs
    from the knob-off run; knob-off stays byte-identical to the
    pre-adaptive fixture (default-off safety)."""
    on = oracle_crawl(seeds, _adaptive_cfg(), SYN)
    off = oracle_result  # CRAWL: same shape, knob off
    assert [_log_key(e) for e in on.fetch_log] != [_log_key(e) for e in off.fetch_log]
    first_wave = {}
    per = {}
    for e in on.fetch_log:
        h = e["host"]
        first_wave.setdefault(h, e["wave"])
        per[(e["wave"], h)] = per.get((e["wave"], h), 0) + 1
    for (w, h), n in per.items():
        if w > first_wave[h]:
            assert n <= 2, (w, h, n)
    # knob-off run has at least one host at full budget in a later wave
    per_off = {}
    fw_off = {}
    for e in off.fetch_log:
        fw_off.setdefault(e["host"], e["wave"])
        per_off[(e["wave"], e["host"])] = per_off.get((e["wave"], e["host"]), 0) + 1
    assert any(
        n == 3 for (w, h), n in per_off.items() if w > fw_off[h]
    ), "fixture never reaches full budget; sensitivity test is vacuous"


def test_adaptive_politeness_resume(ray_session, seeds, tmp_path_factory):
    """The per-host last-duration dict is checkpointed: kill-and-resume
    with the knob biting equals the uninterrupted run and the oracle."""
    ccfg = _adaptive_cfg()
    ckpt = str(tmp_path_factory.mktemp("adaptive_ckpt"))
    run_crawl(seeds, _adaptive_cfg(max_waves=2), SYN,
              checkpoint_dir=ckpt, fetch_concurrency=2)
    resumed = run_crawl(seeds, ccfg, SYN, checkpoint_dir=ckpt, resume=True,
                        fetch_concurrency=2, collect_log=True, collect_seen=True)
    exp = oracle_crawl(seeds, ccfg, SYN)
    assert [_log_key(e) for e in resumed.fetch_log] == [_log_key(e) for e in exp.fetch_log]
    assert resumed.seen_sorted == exp.seen_sorted


def test_adaptive_composes_with_salt_quota_backoff(ray_session):
    """Feature composition: adaptive politeness + hot-host salting +
    per-host quota + 5xx backoff active at once must stay byte-identical
    to the sequential oracle (the adaptive cap sits inside the pinned
    shrink chain, and the salted pre-drain applies the SAME budget
    vector, so the survivor-union containment argument still holds)."""
    syn = SyntheticConfig(n_hosts=8, pages_per_host=80, max_fanout=8,
                          hot_host_share=0.5)
    sds = seed_urls(syn, n_seeds=5)
    ccfg = _adaptive_cfg(
        salt_threshold=1, salt_factor=4,
        max_pages_per_host=9, backoff_503=True,
    )
    exp = oracle_crawl(sds, ccfg, syn)
    got = run_crawl(sds, ccfg, syn, fetch_concurrency=2,
                    collect_log=True, collect_seen=True)
    assert [_log_key(e) for e in got.fetch_log] == [_log_key(e) for e in exp.fetch_log]
    assert got.seen_sorted == exp.seen_sorted
    # the adaptive cap actually bit in this configuration
    first_wave, per = {}, {}
    for e in exp.fetch_log:
        first_wave.setdefault(e["host"], e["wave"])
        per[(e["wave"], e["host"])] = per.get((e["wave"], e["host"]), 0) + 1
    capped = [n for (w, h), n in per.items() if w > first_wave[h]]
    assert capped and max(capped) <= 2


def test_retry_5xx_byte_parity_and_sensitivity(ray_session):
    """5xx fetch retries (round 5, the Heritrix fetch-retry schedule):
    a failed SELECTED fetch re-enters the next wave with its original
    (priority, hop, seq), up to retry_5xx additional attempts per surt.
    Ray == sequential oracle byte-for-byte; the synthetic world is
    deterministic so every retry fails again — the fetch log must carry
    exactly 1 + retry_5xx attempts for early-failing URLs."""
    from collections import Counter

    syn = SyntheticConfig(n_hosts=10, pages_per_host=120, max_fanout=8)
    sds = seed_urls(syn, n_seeds=6)
    cfg = CrawlConfig(politeness_budget=4, max_waves=6, seen_shards=4,
                      retry_5xx=2)
    exp = oracle_crawl(sds, cfg, syn)
    got = run_crawl(sds, cfg, syn, fetch_concurrency=2, fetch_batch_size=16,
                    collect_log=True, collect_seen=True)
    assert [_log_key(e) for e in got.fetch_log] == [_log_key(e) for e in exp.fetch_log]
    assert got.seen_sorted == exp.seen_sorted
    by_url = Counter(e["url"] for e in got.fetch_log)
    first_wave = {}
    statuses = {}
    for e in got.fetch_log:
        first_wave.setdefault(e["url"], e["wave"])
        statuses[e["url"]] = e["status"]
    # retries preserve the row's ORIGINAL priority, so a retry can be
    # legitimately starved by newer higher-priority discoveries (the
    # Heritrix same-precedence re-enqueue); the schedule bounds are:
    # at least one failure runs the FULL schedule, none exceeds it,
    # and successes fetch exactly once
    fails = [u for u, st in statuses.items() if st >= 500]
    assert fails, "fixture must contain 5xx URLs"
    assert any(by_url[u] == 1 + cfg.retry_5xx for u in fails)
    assert all(by_url[u] <= 1 + cfg.retry_5xx for u in fails)
    assert any(by_url[u] > 1 for u in fails)  # the knob demonstrably bites
    for u, st in statuses.items():
        if st < 500:
            assert by_url[u] == 1, (u, by_url[u])
    # knob-off: unchanged behaviour (single attempt per URL)
    off = oracle_crawl(sds, CrawlConfig(politeness_budget=4, max_waves=6,
                                        seen_shards=4), syn)
    assert max(Counter(e["url"] for e in off.fetch_log).values()) == 1


def test_retry_5xx_checkpoint_resume_identical(ray_session, tmp_path_factory):
    """Retry state (pending rows + attempt counts) is checkpointed:
    kill-and-resume mid-schedule equals the uninterrupted run."""
    syn = SyntheticConfig(n_hosts=10, pages_per_host=120, max_fanout=8)
    sds = seed_urls(syn, n_seeds=6)
    cfg = CrawlConfig(politeness_budget=4, max_waves=6, seen_shards=4,
                      retry_5xx=2)
    ckpt = str(tmp_path_factory.mktemp("retry_ckpt"))
    run_crawl(sds, CrawlConfig(politeness_budget=4, max_waves=3, seen_shards=4,
                               retry_5xx=2), syn,
              checkpoint_dir=ckpt, fetch_concurrency=2)
    resumed = run_crawl(sds, cfg, syn, checkpoint_dir=ckpt, resume=True,
                        fetch_concurrency=2, collect_log=True,
                        collect_seen=True)
    exp = oracle_crawl(sds, cfg, syn)
    assert [_log_key(e) for e in resumed.fetch_log] == [_log_key(e) for e in exp.fetch_log]
    assert resumed.seen_sorted == exp.seen_sorted


def test_retry_composes_with_adaptive_and_backoff(ray_session):
    """Round-5 scheduler features compose: 5xx retries under adaptive
    politeness + 5xx backoff stay byte-identical to the oracle (retries
    drain beneath the full shrink chain and re-fail deterministically)."""
    from collections import Counter

    syn = SyntheticConfig(n_hosts=10, pages_per_host=120, max_fanout=8)
    sds = seed_urls(syn, n_seeds=6)
    ccfg = _adaptive_cfg(max_waves=6, retry_5xx=2, backoff_503=True)
    exp = oracle_crawl(sds, ccfg, syn)
    got = run_crawl(sds, ccfg, syn, fetch_concurrency=2,
                    collect_log=True, collect_seen=True)
    assert [_log_key(e) for e in got.fetch_log] == [_log_key(e) for e in exp.fetch_log]
    assert got.seen_sorted == exp.seen_sorted
    assert max(Counter(e["url"] for e in got.fetch_log).values()) <= 3
