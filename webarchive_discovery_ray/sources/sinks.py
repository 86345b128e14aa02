"""Sinks: JSONL writer, buffered document consumer, bounded-retry sender.

Reference parity targets:

* S4 SingleFileDocumentConsumer (JSONL per input, optional gzip) —
  ``warc-indexer/src/main/java/uk/bl/wa/indexer/delivery/
  SingleFileDocumentConsumer.java:96-131``
* S6 Solr/Opensearch consumer with count+byte-threshold buffering —
  ``warc-indexer/.../delivery/BufferedDocumentConsumer.java:98-133``
  (defaults 500 docs / 20 MB, ``reference.conf``)
* S7 TinyCDXSender: batched POST with sleep-retry, drop-after-repeated-
  failure — ``warc-hadoop-recordreaders/.../cdx/TinyCDXSender.java:71-135``

The network targets (Solr, OutbackCDX) do not exist in this sandbox, so
the transport is injectable: pass any ``send(list[dict]) -> None``
callable (tests use recording/failing fakes; production wires an HTTP
POST). The Ray-side shape — an actor-pool ``map_batches`` stage whose
per-actor buffer flushes on thresholds and on ``__del__`` — is real.
"""

from __future__ import annotations

import gzip
import json
import os
import time
from typing import Callable

import pyarrow as pa

__all__ = [
    "write_jsonl",
    "write_xml",
    "BufferedSinkStage",
    "RetrySender",
    "run_buffered_sink",
    "export_partitioned",
    "compact_parquet_dir",
]


def write_jsonl(ds, path: str, compress: bool = False) -> int:
    """S4: one JSONL file per input block under ``path`` (gzip optional).
    Returns the row count. Block-parallel: one file per block task, like
    the reference's one-output-per-input-WARC layout."""
    os.makedirs(path, exist_ok=True)

    def dump(batch: pa.Table) -> pa.Table:
        import hashlib
        import uuid

        rows = batch.to_pylist()
        text = "".join(json.dumps(r, default=str) + "\n" for r in rows)
        # deterministic name from content: a retried/reconstructed task
        # re-writes the SAME file (tmp + os.replace = atomic), never a
        # second uuid-named duplicate of the block
        digest = hashlib.md5(text.encode("utf-8")).hexdigest()[:16]
        name = os.path.join(path, f"part-{digest}.jsonl")
        if compress:
            name += ".gz"
        tmp = name + f".tmp-{uuid.uuid4().hex}"
        if compress:
            with gzip.open(tmp, "wt", encoding="utf-8") as f:
                f.write(text)
        else:
            with open(tmp, "w", encoding="utf-8") as f:
                f.write(text)
        os.replace(tmp, name)
        return pa.table({"n": pa.array([len(rows)], pa.int64())})

    counts = ds.map_batches(dump, batch_format="pyarrow", batch_size=None)
    return int(counts.sum("n") or 0)


def _xml_escape(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace('"', "&quot;")
    )


def write_xml(ds, path: str, compress: bool = False) -> int:
    """S4 XML variant: Solr ``<add><doc><field name=...>`` batches, one
    file per input block (gzip optional), mirroring the reference's XML
    output format (``SingleFileDocumentConsumer.java:96-131`` writing
    ``SolrRecord.writeXml`` per record under one ``<add>`` root).

    Multi-valued (list) columns emit one ``<field>`` per value; None
    values are omitted (a dropped field, matching addField semantics).
    Returns the row count."""
    os.makedirs(path, exist_ok=True)

    def dump(batch: pa.Table) -> pa.Table:
        import hashlib
        import uuid

        rows = batch.to_pylist()
        parts = ["<add>\n"]
        for r in rows:
            parts.append("<doc>\n")
            for k, v in r.items():
                values = v if isinstance(v, list) else [v]
                for item in values:
                    if item is None:
                        continue
                    parts.append(
                        f'  <field name="{_xml_escape(str(k))}">'
                        f"{_xml_escape(str(item))}</field>\n"
                    )
            parts.append("</doc>\n")
        parts.append("</add>\n")
        text = "".join(parts)
        # deterministic content-derived name + atomic replace: retried
        # tasks overwrite instead of duplicating the block (see dump in
        # write_jsonl)
        digest = hashlib.md5(text.encode("utf-8")).hexdigest()[:16]
        name = os.path.join(path, f"part-{digest}.xml")
        if compress:
            name += ".gz"
        tmp = name + f".tmp-{uuid.uuid4().hex}"
        if compress:
            with gzip.open(tmp, "wt", encoding="utf-8") as f:
                f.write(text)
        else:
            with open(tmp, "w", encoding="utf-8") as f:
                f.write(text)
        os.replace(tmp, name)
        return pa.table({"n": pa.array([len(rows)], pa.int64())})

    counts = ds.map_batches(dump, batch_format="pyarrow", batch_size=None)
    return int(counts.sum("n") or 0)


class BufferedSinkStage:
    """S6: actor-pool sink with count + byte flush thresholds.

    Use as ``ds.map_batches(BufferedSinkStage, fn_constructor_kwargs=
    {"send": fn}, concurrency=N, batch_size=B)`` — each actor buffers rows
    and flushes when ``batch_docs`` or ``batch_bytes`` is reached (the
    reference's 500-doc / 20 MB defaults). Each accounting row carries a
    ``buffered`` column (rows still held after the batch) so callers can
    detect an unflushed tail; the GUARANTEED final flush is an explicit
    ``close()`` (reference: ``DocumentConsumer.close() -> commit``) — via
    :func:`run_buffered_sink` when running as a distributed sink. ``__del__``
    also flushes as a best-effort backstop, but is not guaranteed at Ray
    actor teardown."""

    def __init__(
        self,
        send: Callable[[list[dict]], None],
        batch_docs: int = 500,
        batch_bytes: int = 20 * 1024 * 1024,
    ):
        self.send = send
        self.batch_docs = batch_docs
        self.batch_bytes = batch_bytes
        self.buf: list[dict] = []
        self.buf_bytes = 0
        self.flushed = 0

    def _flush(self) -> None:
        if self.buf:
            self.send(self.buf)
            self.flushed += len(self.buf)
            self.buf, self.buf_bytes = [], 0

    def close(self) -> int:
        """Flush the buffered tail; return total rows flushed so far.
        The explicit commit path — call from the driver on teardown."""
        self._flush()
        return self.flushed

    def __call__(self, batch: pa.Table) -> pa.Table:
        flushed_before = self.flushed
        for r in batch.to_pylist():
            self.buf.append(r)
            self.buf_bytes += sum(len(str(v)) for v in r.values())
            if len(self.buf) >= self.batch_docs or self.buf_bytes >= self.batch_bytes:
                self._flush()
        return pa.table(
            {
                "accepted": pa.array([batch.num_rows], pa.int64()),
                "flushed": pa.array([self.flushed - flushed_before], pa.int64()),
                "buffered": pa.array([len(self.buf)], pa.int64()),
            }
        )

    def __del__(self):  # best-effort backstop only; close() is the contract
        try:
            self._flush()
        except Exception:
            pass


def run_buffered_sink(
    ds,
    make_send: Callable[[int], Callable[[list[dict]], None]],
    n_shards: int = 4,
    batch_docs: int = 500,
    batch_bytes: int = 20 * 1024 * 1024,
) -> dict:
    """Drive ``ds`` through ``n_shards`` buffered sink actors with a
    GUARANTEED final flush (explicit ``close()`` fan-out from the driver
    after the stream drains — the reference's consumer-close contract,
    ``BufferedDocumentConsumer.java:98-133``).

    ``make_send(shard_id)`` builds the transport inside each sink actor
    (so file handles / HTTP sessions are actor-local, never pickled).
    Batches are routed round-robin per map worker (content-independent)
    to the sink actors by handle — streaming, no driver materialization.
    Returns ``{"accepted": n, "flushed": n}``; equal after close.
    """
    import ray

    @ray.remote(num_cpus=0)
    class _SinkShard:
        def __init__(self, shard_id: int):
            self.stage = BufferedSinkStage(
                send=make_send(shard_id),
                batch_docs=batch_docs,
                batch_bytes=batch_bytes,
            )

        def accept(self, batch: pa.Table) -> int:
            self.stage(batch)
            return batch.num_rows

        def close(self) -> int:
            return self.stage.close()

    actors = [_SinkShard.remote(i) for i in range(n_shards)]

    class _Route:
        # per-worker round-robin: every map worker cycles through all
        # shards (start offset decorrelated by pid), so the fan-out holds
        # even when batches share content — a first-row content hash
        # degenerates to one shard on sorted/constant-key data
        def __init__(self):
            self._next = os.getpid() % n_shards

        def __call__(self, batch: pa.Table) -> pa.Table:
            shard = self._next
            self._next = (shard + 1) % n_shards
            n = ray.get(actors[shard].accept.remote(batch))
            return pa.table({"accepted": pa.array([n], pa.int64())})

    accepted = int(
        ds.map_batches(_Route, batch_format="pyarrow", concurrency=(1, n_shards))
        .sum("accepted")
        or 0
    )
    flushed = sum(ray.get([a.close.remote() for a in actors]))
    for a in actors:
        ray.kill(a)
    return {"accepted": accepted, "flushed": flushed}


class RetrySender:
    """S7: bounded-retry transport wrapper — sleep between attempts, drop
    the batch (counted, not raised) after ``max_attempts`` sequential
    failures, exactly the TinyCDXSender contract."""

    def __init__(
        self,
        send: Callable[[list[dict]], None],
        max_attempts: int = 3,
        sleep_s: float = 0.0,
    ):
        self.send = send
        self.max_attempts = max_attempts
        self.sleep_s = sleep_s
        self.sent = 0
        self.dropped = 0

    def __call__(self, rows: list[dict]) -> None:
        for attempt in range(self.max_attempts):
            try:
                self.send(rows)
                self.sent += len(rows)
                return
            except Exception:
                if attempt + 1 < self.max_attempts and self.sleep_s:
                    time.sleep(self.sleep_s)
        self.dropped += len(rows)


def export_partitioned(
    ds,
    out_dir: str,
    key_col: str,
    n_partitions: int = 64,
) -> dict:
    """Resumable hash-partitioned Parquet export — the general form of the
    crawl plane's per-(wave, partition) fragment discipline
    (``pipelines/crawl.py`` checkpoints; brief: "write partitioned
    Parquet so a failed run can skip finished partitions"; cf. the
    reference's one-output-per-reducer layout).

    Layout: ``out_dir/part=NNNNN/data.parquet`` plus a ``MANIFEST.json``
    per partition recording row count and a value hash. Each partition is
    written ATOMICALLY (tmp dir + ``os.replace``) by its own grouped
    task, so a crashed run leaves only whole partitions; a re-run SKIPS
    every partition whose manifest already exists and rewrites the rest
    — no coordination state beyond the filesystem.

    One bucketed grouped pass (rows hash-route by md5(key) — same
    discipline as ``functions/bucketing``); rows are sorted by key
    within a partition so content is deterministic. Returns
    ``{"written": k, "skipped": m, "rows": n}`` (driver holds counts
    only)."""
    import hashlib as _hl
    import json as _json

    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    # resume guard: manifests are only trustworthy under the SAME layout —
    # a re-run with a different key or partition count would skip
    # partitions from a different hash domain and duplicate/drop rows
    layout_path = os.path.join(out_dir, "_LAYOUT.json")
    layout = {"key": key_col, "n_partitions": int(n_partitions)}
    if os.path.exists(layout_path):
        with open(layout_path) as f:
            existing = _json.load(f)
        if existing != layout:
            raise ValueError(
                f"export layout mismatch: {out_dir} was written with "
                f"{existing}, requested {layout}"
            )
    else:
        tmp_layout = layout_path + ".tmp"
        with open(tmp_layout, "w") as f:
            _json.dump(layout, f)
        os.replace(tmp_layout, layout_path)

    def part_of(vals: pd.Series) -> np.ndarray:
        md5 = _hl.md5
        return np.fromiter(
            (
                int.from_bytes(md5(str(v).encode()).digest()[:8], "big")
                % n_partitions
                for v in vals.to_numpy()
            ),
            dtype=np.int64,
            count=len(vals),
        )

    def route(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(_part=part_of(df[key_col]))

    def write_partition(df: pd.DataFrame) -> pd.DataFrame:
        part = int(df["_part"].iloc[0])
        pdir = os.path.join(out_dir, f"part={part:05d}")
        manifest = os.path.join(pdir, "MANIFEST.json")
        if os.path.exists(manifest):
            return pd.DataFrame(
                {"part": [part], "rows": [0], "skipped": [True]}
            )
        body = df.drop(columns=["_part"]).sort_values(
            key_col, kind="mergesort", ignore_index=True
        )
        digest = _hl.md5(
            pd.util.hash_pandas_object(body.astype(str), index=False)
            .values.tobytes()
        ).hexdigest()
        tmp = pdir + ".tmp"
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        pq.write_table(
            pa.Table.from_pandas(body, preserve_index=False),
            os.path.join(tmp, "data.parquet"),
        )
        with open(os.path.join(tmp, "MANIFEST.json"), "w") as f:
            _json.dump({"part": part, "rows": len(body), "md5": digest}, f)
        shutil.rmtree(pdir, ignore_errors=True)  # stale partial from a crash
        os.replace(tmp, pdir)
        return pd.DataFrame({"part": [part], "rows": [len(body)], "skipped": [False]})

    results = (
        ds.map_batches(route, batch_format="pandas")
        .groupby("_part")
        .map_groups(write_partition, batch_format="pandas")
        .take_all()  # bounded: one row per partition
    )
    return {
        "written": sum(1 for r in results if not r["skipped"]),
        "skipped": sum(1 for r in results if r["skipped"]),
        "rows": int(sum(r["rows"] for r in results)),
    }


def compact_parquet_dir(
    in_dir: str,
    out_dir: str,
    target_bytes: int = 128 << 20,
) -> dict:
    """Compact a tree of small parquet fragments into few large files —
    the post-pass for the crawl plane's per-(wave, partition) fragment
    layout (``pipelines/crawl.py``) and any long-lived export that has
    accumulated small files (the reference's small-output problem: one
    file per reducer per run, ``HostsReportReducer`` et al.).

    Planning is metadata-only on the driver: a recursive SORTED listing
    of ``*.parquet`` fragments with their on-disk sizes, greedy-binned
    in listing order into groups summing to <= ``target_bytes`` (every
    group holds >= 1 file; an oversized file forms its own group). The
    plan is pinned atomically to ``out_dir/_PLAN.json`` on first run; a
    re-run must see the identical fragment listing or it fails loudly —
    a changed input set would make manifest-based skipping silently
    drop or duplicate rows.

    One Ray task per group (``from_items`` with one block per group):
    read the group's fragments in listed order, concat, write
    ``out_dir/compact_NNNNN.parquet`` atomically (tmp + ``os.replace``),
    then its ``compact_NNNNN.json`` manifest (sources, rows, bytes).
    A crash between the two leaves data without a manifest, which a
    re-run rewrites; a group whose manifest exists is SKIPPED, so
    resume cost is proportional to the unfinished tail only. Returns
    ``{"groups", "written", "skipped", "rows", "bytes_in"}`` (driver
    holds counts only).
    """
    import json as _json

    import pyarrow.parquet as _pq

    import ray.data as _rd

    os.makedirs(out_dir, exist_ok=True)
    out_abs = os.path.abspath(out_dir)

    files: list[tuple[str, int]] = []
    for root, dirs, names in os.walk(in_dir):
        # never re-compact our own output when it nests under in_dir
        dirs[:] = sorted(
            d for d in dirs if os.path.abspath(os.path.join(root, d)) != out_abs
        )
        for n in sorted(names):
            if n.endswith(".parquet"):
                p = os.path.join(root, n)
                files.append((os.path.relpath(p, in_dir), os.path.getsize(p)))
    files.sort()

    groups: list[list[int]] = []
    acc = 0
    for i, (_, sz) in enumerate(files):
        if not groups or acc + sz > target_bytes and acc > 0:
            groups.append([i, i + 1])
            acc = sz
        else:
            groups[-1][1] = i + 1
            acc += sz

    plan = {
        "target_bytes": int(target_bytes),
        "files": [[p, int(s)] for p, s in files],
        "groups": groups,
    }
    plan_path = os.path.join(out_dir, "_PLAN.json")
    if os.path.exists(plan_path):
        with open(plan_path) as f:
            existing = _json.load(f)
        if existing != plan:
            raise ValueError(
                f"compaction plan mismatch: {out_dir} was planned over a "
                "different fragment listing or target size; compact into "
                "a fresh directory instead of resuming this one"
            )
    else:
        tmp_plan = plan_path + ".tmp"
        with open(tmp_plan, "w") as f:
            _json.dump(plan, f)
        os.replace(tmp_plan, plan_path)

    if not files:
        return {"groups": 0, "written": 0, "skipped": 0, "rows": 0, "bytes_in": 0}

    items = [
        {
            "gid": gi,
            "paths": [files[i][0] for i in range(lo, hi)],
            "bytes": sum(files[i][1] for i in range(lo, hi)),
        }
        for gi, (lo, hi) in enumerate(groups)
    ]

    def compact_group(row: dict) -> dict:
        gid = int(row["gid"])
        final = os.path.join(out_dir, f"compact_{gid:05d}.parquet")
        manifest = os.path.join(out_dir, f"compact_{gid:05d}.json")
        if os.path.exists(manifest):
            return {"gid": gid, "rows": 0, "bytes_in": 0, "skipped": True}
        tables = [
            _pq.read_table(os.path.join(in_dir, rel)) for rel in row["paths"]
        ]
        body = pa.concat_tables(tables, promote_options="default")
        tmp = final + ".tmp"
        _pq.write_table(body, tmp)
        os.replace(tmp, final)
        tmp_m = manifest + ".tmp"
        with open(tmp_m, "w") as f:
            json.dump(
                {
                    "gid": gid,
                    "sources": list(row["paths"]),
                    "rows": body.num_rows,
                    "bytes_in": int(row["bytes"]),
                },
                f,
            )
        os.replace(tmp_m, manifest)
        return {
            "gid": gid,
            "rows": body.num_rows,
            "bytes_in": int(row["bytes"]),
            "skipped": False,
        }

    results = (
        _rd.from_items(items, override_num_blocks=len(items))
        .map(compact_group)  # one row == one whole compaction group (coarse task)
        .take_all()  # bounded: one row per group
    )
    return {
        "groups": len(groups),
        "written": sum(1 for r in results if not r["skipped"]),
        "skipped": sum(1 for r in results if r["skipped"]),
        "rows": int(sum(r["rows"] for r in results)),
        "bytes_in": int(sum(r["bytes_in"] for r in results)),
    }


def maybe_compact_fragments(
    docs_dir: str,
    max_fragments: int = 64,
    target_bytes: int = 128 << 20,
) -> dict | None:
    """Automatic compaction policy over a fragment tree (VERDICT r3 #8):
    when the number of parquet fragments under ``docs_dir`` crosses
    ``max_fragments``, run the resumable compactor into a fresh
    ``_compact/round_NNN`` directory and — only once EVERY group's
    manifest exists — delete the source fragments recorded in the pinned
    plan. Repeated resumed runs therefore converge to a bounded file
    count: earlier rounds' outputs are ordinary data files and fold into
    later rounds (tiered, LSM-style).

    Crash safety inherits from :func:`compact_parquet_dir` (atomic
    per-group outputs, plan pinning) plus the delete-after-complete rule
    here: a crash mid-delete leaves extra source fragments AND their
    compacted copies — the next call sees the complete round (every
    manifest present, the ``_DONE`` marker absent), finishes the
    deletion idempotently and stamps ``_DONE``. A reader that lists
    ``**/*.parquet`` under ``docs_dir`` excluding in-flight rounds (no
    ``_DONE``) always sees exactly one copy of every row."""
    import glob as _glob
    import json as _json

    comp_root = os.path.join(docs_dir, "_compact")

    def _live_fragments() -> list[str]:
        out = []
        for p in _glob.glob(
            os.path.join(docs_dir, "**", "*.parquet"), recursive=True
        ):
            rel = os.path.relpath(p, docs_dir)
            parts = rel.split(os.sep)
            if parts[0] == "_compact":
                # only COMPLETE rounds count as live data
                rdir = os.path.join(comp_root, parts[1])
                if not os.path.exists(os.path.join(rdir, "_DONE")):
                    continue
            out.append(p)
        return sorted(out)

    # finish any complete-but-undeleted round first (crash recovery)
    if os.path.isdir(comp_root):
        for rname in sorted(os.listdir(comp_root)):
            rdir = os.path.join(comp_root, rname)
            plan_path = os.path.join(rdir, "_PLAN.json")
            done_path = os.path.join(rdir, "_DONE")
            if not os.path.exists(plan_path) or os.path.exists(done_path):
                continue
            with open(plan_path) as f:
                plan = _json.load(f)
            n_groups = len(plan["groups"])
            n_manifests = len(_glob.glob(os.path.join(rdir, "compact_*.json")))
            if n_manifests == n_groups and n_groups > 0:
                for rel, _sz in plan["files"]:
                    src = os.path.join(docs_dir, rel)
                    if os.path.exists(src):
                        os.unlink(src)
                with open(done_path + ".tmp", "w") as f:
                    f.write("")
                os.replace(done_path + ".tmp", done_path)

    # an INCOMPLETE round (crash mid-compaction) must be RESUMED, never
    # bypassed: its partial outputs duplicate still-present sources, so a
    # fresh round walking the tree would double-count them. The compactor
    # is resumable by construction (pinned plan + per-group manifests),
    # and the listing it planned over is unchanged (sources are only
    # deleted after a round completes).
    incomplete = None
    if os.path.isdir(comp_root):
        for rname in sorted(os.listdir(comp_root)):
            rdir = os.path.join(comp_root, rname)
            if os.path.exists(os.path.join(rdir, "_PLAN.json")) and not os.path.exists(
                os.path.join(rdir, "_DONE")
            ):
                incomplete = rname
                break
    frags = _live_fragments()
    if incomplete is None and len(frags) <= max_fragments:
        return None
    os.makedirs(comp_root, exist_ok=True)
    if incomplete is not None:
        round_id = int(incomplete.split("_")[1])
    else:
        existing = [n for n in os.listdir(comp_root) if n.startswith("round_")]
        round_id = (
            max((int(n.split("_")[1]) for n in existing), default=-1) + 1
        )
    out_dir = os.path.join(comp_root, f"round_{round_id:03d}")
    res = compact_parquet_dir(docs_dir, out_dir, target_bytes=target_bytes)
    if res["groups"] and res["written"] + res["skipped"] == res["groups"]:
        with open(os.path.join(out_dir, "_PLAN.json")) as f:
            plan = _json.load(f)
        for rel, _sz in plan["files"]:
            src = os.path.join(docs_dir, rel)
            if os.path.exists(src):
                os.unlink(src)
        done = os.path.join(out_dir, "_DONE")
        with open(done + ".tmp", "w") as f:
            f.write("")
        os.replace(done + ".tmp", done)
        # prune now-empty fragment directories (wave_* and stale rounds)
        for root, dirs, names in os.walk(docs_dir, topdown=False):
            if root != docs_dir and not dirs and not names:
                os.rmdir(root)
    res["round"] = round_id
    res["fragments_before"] = len(frags)
    res["fragments_after"] = len(_live_fragments())
    return res
