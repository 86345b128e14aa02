"""Sharded URL-seen set: cuckoo-filter-accelerated exact membership actors.

New construction per BASELINE.json north_rule (the reference leaves URL
dedup to post-hoc MDX hash grouping and notes the non-scalable Solr
dup-check at ``WARCIndexer.java:184-187``). Design per SURVEY.md §2.7/§7.4
and the north star's sharded cuckoo-filter seen set with Bloom fallback:

* keys are SURT URL keys, routed to ``hash(surt) % n_shards`` actor shards;
* each shard holds a CUCKOO filter (2-choice bucketed 16-bit fingerprints,
  xor-partial-key relocation — supports delete, unlike Bloom) as the fast
  *definitely-new* path, plus the exact Python set as the authoritative
  membership store — probabilistic structures are accelerators only,
  because the north rule demands byte-identical final seen sets vs the
  oracle. When a cuckoo insert fails (filter saturated), the shard falls
  back to a Bloom filter for the overflow — the north star's
  bloom-fallback-for-spill-partitions rule;
* snapshots serialise the sorted key list (the byte-comparable
  representation) for checkpoint/resume;
* SPILL TIER (round-4): past a configurable hot-set size each shard
  persists its exact keys to sorted parquet runs on local disk and keeps
  only the filters + the hot (not-yet-spilled) set in RAM. Membership is
  an LSM-style probe: filter-negative -> definitely new (no IO);
  filter-positive and not in the hot set -> binary-search the per-run
  row-group fence index held in RAM (1/row_group_size of the keys) and
  read exactly the needed row groups. Runs are disjoint by construction
  (a key enters the hot set only when globally unseen), and tiered
  compaction folds runs together when their count crosses a bound, so a
  probe touches O(log) runs. This is what lets a shard hold its slice of
  a 10^10-URL seen set with bounded RAM while the byte-identical-seen-set
  rule still holds (``snapshot`` streams the runs back).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np

from ..functions.hashing import stable_hash64

__all__ = [
    "BloomFilter",
    "CuckooFilter",
    "SeenSet",
    "SpilledRuns",
    "shard_of",
    "SeenShardPool",
]

_SHARD_SEED = 7


def shard_of(key: str, n_shards: int) -> int:
    return stable_hash64(key, _SHARD_SEED) % n_shards


class BloomFilter:
    """Minimal deterministic Bloom filter over strings."""

    def __init__(self, n_bits: int = 1 << 20, k: int = 4):
        self.n_bits = n_bits
        self.k = k
        self.bits = np.zeros(n_bits // 8 + 1, dtype=np.uint8)

    def _positions(self, key: str) -> list[int]:
        d = hashlib.sha1(key.encode("utf-8")).digest()
        h1 = int.from_bytes(d[:8], "big")
        h2 = int.from_bytes(d[8:16], "big") | 1
        return [((h1 + i * h2) % self.n_bits) for i in range(self.k)]

    def add(self, key: str) -> None:
        for p in self._positions(key):
            self.bits[p >> 3] |= 1 << (p & 7)

    def add_many(self, keys: list[str]) -> None:
        """Batched add: one vectorized scatter instead of per-key numpy
        ops (the wave-barrier path — shards absorb whole winner lists)."""
        if not keys:
            return
        n_bits, k = self.n_bits, self.k
        pos = np.empty(len(keys) * k, dtype=np.int64)
        j = 0
        for key in keys:
            d = hashlib.sha1(key.encode("utf-8")).digest()
            h1 = int.from_bytes(d[:8], "big")
            h2 = int.from_bytes(d[8:16], "big") | 1
            for i in range(k):
                pos[j] = (h1 + i * h2) % n_bits
                j += 1
        np.bitwise_or.at(
            self.bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8)
        )

    def might_contain(self, key: str) -> bool:
        return all(self.bits[p >> 3] & (1 << (p & 7)) for p in self._positions(key))


class CuckooFilter:
    """Deterministic cuckoo filter (Fan et al., CoNEXT'14 construction):
    ``n_buckets`` (power of two) buckets of ``bucket_size`` 16-bit
    fingerprints; candidate buckets ``i1 = H(key)`` and
    ``i2 = i1 ^ H(fp)`` (xor partial-key — an involution, so either
    bucket recovers the other from the stored fingerprint alone), with
    bounded random-walk relocation on insert. Supports delete, which
    Bloom cannot; ~95% load factor at bucket_size 4.

    ``add`` returns False when the relocation walk fails (filter full) —
    the caller is expected to fall back (SeenSet uses a Bloom overflow)."""

    MAX_KICKS = 500

    def __init__(self, n_buckets: int = 1 << 16, bucket_size: int = 4):
        assert n_buckets & (n_buckets - 1) == 0, "n_buckets must be a power of two"
        self.n_buckets = n_buckets
        self.bucket_size = bucket_size
        # buckets as plain Python lists: scalar membership (`fp in row`)
        # and slot writes are ~10x cheaper than per-key numpy ops on
        # 4-element rows — this class sits on the wave-barrier hot path
        self.table: list[list[int]] = [
            [0] * bucket_size for _ in range(n_buckets)
        ]
        self.count = 0
        # memoized H(fp) for the alt-index involution (fp space is 16-bit;
        # walks and probes revisit the same fingerprints constantly)
        self._alt_cache: dict[int, int] = {}
        # victim stash: a failed relocation walk must NOT drop the evicted
        # fingerprint (that would be a false negative for an EARLIER key);
        # the homeless (bucket, fp) pair parks here
        self.stash: set[tuple[int, int]] = set()
        # set on the first failed walk: callers should stop inserting here
        # (lookups stay valid) — without this every post-saturation add
        # would pay the full MAX_KICKS walk and grow the stash unboundedly
        self.saturated = False

    def _fp_and_index(self, key: str) -> tuple[int, int]:
        d = hashlib.sha1(key.encode("utf-8")).digest()
        fp = int.from_bytes(d[:2], "big") or 1  # 0 marks an empty slot
        i1 = int.from_bytes(d[2:10], "big") & (self.n_buckets - 1)
        return fp, i1

    def _alt_index(self, i: int, fp: int) -> int:
        # xor with a hash of the fingerprint (mod 2^k keeps the involution)
        h = self._alt_cache.get(fp)
        if h is None:
            h = self._alt_cache[fp] = int.from_bytes(
                hashlib.sha1(fp.to_bytes(2, "big")).digest()[:8], "big"
            )
        return (i ^ h) & (self.n_buckets - 1)

    def _bucket_insert(self, i: int, fp: int) -> bool:
        row = self.table[i]
        for s in range(self.bucket_size):
            if row[s] == 0:
                row[s] = fp
                return True
        return False

    def add(self, key: str) -> bool:
        fp, i1 = self._fp_and_index(key)
        i2 = self._alt_index(i1, fp)
        if self._bucket_insert(i1, fp) or self._bucket_insert(i2, fp):
            self.count += 1
            return True
        # relocation walk (deterministic slot choice keeps runs replayable)
        i = i1 if (fp & 1) else i2
        for kick in range(self.MAX_KICKS):
            slot = (fp + kick) % self.bucket_size
            row = self.table[i]
            fp, row[slot] = row[slot], fp
            i = self._alt_index(i, fp)
            if self._bucket_insert(i, fp):
                self.count += 1
                return True
        # walk failed: park the homeless victim in the stash (it belongs
        # to an EARLIER key — dropping it would create a false negative;
        # the walk's swaps keep the table's population constant, so the
        # net effect of this add is +1 stored fingerprint: the new key's)
        # and signal saturation so the caller engages its fallback for
        # THIS key and every later one
        self.stash.add((i, fp))
        self.count += 1
        self.saturated = True
        return False

    def add_many(self, keys: list[str]) -> list[bool]:
        """Batched add with the same per-key semantics as :meth:`add`
        (including walks/stash/saturation) but one tight loop — the
        fast common case (an empty slot in bucket 1 or 2) costs a digest
        plus a few list ops."""
        out = []
        table = self.table
        rng = range(self.bucket_size)
        for key in keys:
            if self.saturated:
                out.append(False)
                continue
            d = hashlib.sha1(key.encode("utf-8")).digest()
            fp = int.from_bytes(d[:2], "big") or 1
            i1 = int.from_bytes(d[2:10], "big") & (self.n_buckets - 1)
            placed = False
            row = table[i1]
            for s in rng:
                if row[s] == 0:
                    row[s] = fp
                    placed = True
                    break
            if not placed:
                row = table[self._alt_index(i1, fp)]
                for s in rng:
                    if row[s] == 0:
                        row[s] = fp
                        placed = True
                        break
            if placed:
                self.count += 1
                out.append(True)
            else:
                # rare: both buckets full — take the full relocation-walk
                # path (which does its own counting/stash/saturation)
                out.append(self.add(key))
        return out

    def might_contain(self, key: str) -> bool:
        fp, i1 = self._fp_and_index(key)
        if fp in self.table[i1]:
            return True
        i2 = self._alt_index(i1, fp)
        if fp in self.table[i2]:
            return True
        return bool(self.stash) and (
            (i1, fp) in self.stash or (i2, fp) in self.stash
        )

    def delete(self, key: str) -> bool:
        fp, i1 = self._fp_and_index(key)
        for i in (i1, self._alt_index(i1, fp)):
            row = self.table[i]
            for s in range(self.bucket_size):
                if row[s] == fp:
                    row[s] = 0
                    self.count -= 1
                    return True
            if (i, fp) in self.stash:
                self.stash.discard((i, fp))
                self.count -= 1
                return True
        return False


class SpilledRuns:
    """Per-shard on-disk tier of the exact seen set: sorted, mutually
    disjoint parquet runs with an in-RAM row-group fence index.

    Each run is ONE parquet file holding a single sorted ``surt`` string
    column written with ``row_group_size = fence_every``; the fences (the
    first key of every row group) stay in RAM, so a membership probe is
    ``searchsorted`` over the fences followed by reading exactly the row
    groups that could contain the queried keys. RAM cost per run is
    ~len(run)/fence_every keys; probe IO is one row group per hit range.

    Tiered compaction: when the run count exceeds ``max_runs``, all runs
    merge into one (numpy sorted merge of disjoint sorted arrays =
    concatenate + sort) — classic LSM amortisation, O(n log n) total
    write volume over a shard's lifetime."""

    def __init__(self, spill_dir: str, fence_every: int = 4096, max_runs: int = 8):
        self.spill_dir = spill_dir
        self.fence_every = fence_every
        self.max_runs = max_runs
        self._runs: list[dict] = []  # {path, fences(np object), n}
        self._next_id = 0
        os.makedirs(spill_dir, exist_ok=True)

    @property
    def n_keys(self) -> int:
        return sum(r["n"] for r in self._runs)

    @property
    def n_runs(self) -> int:
        return len(self._runs)

    def _write_run(self, sorted_keys: np.ndarray) -> dict:
        import pyarrow as pa
        import pyarrow.parquet as pq

        path = os.path.join(self.spill_dir, f"run_{self._next_id:06d}.parquet")
        self._next_id += 1
        pq.write_table(
            pa.table({"surt": pa.array(sorted_keys, type=pa.string())}),
            path,
            row_group_size=self.fence_every,
        )
        fences = sorted_keys[:: self.fence_every].copy()
        return {"path": path, "fences": fences, "n": len(sorted_keys)}

    def spill(self, keys: set[str]) -> None:
        """Persist ``keys`` (disjoint from every existing run by the
        caller's invariant) as a new run; compact when over ``max_runs``."""
        if not keys:
            return
        arr = np.sort(np.asarray(list(keys), dtype=object))
        if len(self._runs) + 1 > self.max_runs:
            merged = np.sort(
                np.concatenate([self._read_run(r) for r in self._runs] + [arr])
            )
            for r in self._runs:
                os.unlink(r["path"])
            self._runs = [self._write_run(merged)]
        else:
            self._runs.append(self._write_run(arr))

    def _read_run(self, run: dict) -> np.ndarray:
        import pyarrow.parquet as pq

        return np.asarray(
            pq.read_table(run["path"], columns=["surt"])["surt"].to_pylist(),
            dtype=object,
        )

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized membership over all runs: per run, route each query
        key to its row group via the fence index, read only the row groups
        that received queries, binary-search inside. Returns a bool mask
        aligned with ``keys``."""
        import pyarrow.parquet as pq

        found = np.zeros(len(keys), dtype=bool)
        if not len(keys):
            return found
        for run in self._runs:
            todo = ~found
            if not todo.any():
                break
            q = keys[todo]
            # row group of each query: rightmost fence <= key
            rg = np.searchsorted(run["fences"], q, side="right") - 1
            valid = rg >= 0
            if not valid.any():
                continue
            pf = pq.ParquetFile(run["path"])
            hit = np.zeros(len(q), dtype=bool)
            for g in np.unique(rg[valid]):
                sel = valid & (rg == g)
                block = np.asarray(
                    pf.read_row_group(int(g), columns=["surt"])["surt"].to_pylist(),
                    dtype=object,
                )
                pos = np.searchsorted(block, q[sel])
                pos_ok = pos < len(block)
                eq = np.zeros(sel.sum(), dtype=bool)
                if pos_ok.any():
                    eq[pos_ok] = block[pos[pos_ok]] == q[sel][pos_ok]
                hit[sel] = eq
            idx = np.flatnonzero(todo)
            found[idx[hit]] = True
        return found

    def all_keys(self) -> list[str]:
        """Every spilled key (sorted merge across runs) — the snapshot /
        byte-parity read-back path."""
        if not self._runs:
            return []
        return np.sort(
            np.concatenate([self._read_run(r) for r in self._runs])
        ).tolist()

    def clear(self) -> None:
        for r in self._runs:
            if os.path.exists(r["path"]):
                os.unlink(r["path"])
        self._runs = []


class SeenSet:
    """One shard's state: cuckoo accelerator (+ Bloom overflow) + exact
    authoritative set.

    Besides point membership (``add_if_new``), a shard resolves WAVE
    CANDIDATES: fetch tasks stream candidate tables in via ``accept``
    (keys pre-routed by ``shard_of``), and at the wave barrier
    ``finalize_wave`` sorts the shard's candidates by the pinned global
    order key (parent host, parent slot, link rank), takes the first
    occurrence of each unseen SURT, and returns the winner rows. The
    driver then only merges per-shard winner order keys to assign global
    ``seq`` numbers — candidate URL strings never cross the driver except
    as winners."""

    def __init__(
        self,
        n_bits: int = 1 << 20,
        spill_dir: str | None = None,
        spill_threshold: int | None = None,
    ):
        self._n_bits = n_bits
        # cuckoo slots sized n_bits/4 (4 slots/bucket = n_bits/16 buckets,
        # ~0.5 MB at the 1M-bit default); Bloom engages only as the
        # overflow fallback once the cuckoo walk first fails
        self._cuckoo = CuckooFilter(n_buckets=max(1 << 10, n_bits >> 4))
        self._bloom: BloomFilter | None = None
        # HOT tier: keys seen but not yet spilled. The authoritative set
        # is hot ∪ spilled runs (disjoint: a key enters hot only when the
        # full probe said unseen, and spilling moves the whole hot set).
        self._exact: set[str] = set()
        self._pending: dict[int, list] = {}
        # SPILL tier (None threshold = resident-only, the small-crawl mode)
        self._spill_threshold = spill_threshold
        self._runs: SpilledRuns | None = None
        if spill_threshold is not None:
            if spill_dir is None:
                import tempfile

                spill_dir = tempfile.mkdtemp(prefix="seen_spill_")
            self._runs = SpilledRuns(spill_dir)

    def _maybe_spill(self) -> None:
        if (
            self._spill_threshold is not None
            and len(self._exact) >= self._spill_threshold
        ):
            self._runs.spill(self._exact)
            self._exact = set()

    def _seen_mask(self, surts) -> np.ndarray:
        """Authoritative seen-mask for a pandas Series of keys: one
        C-speed ``isin`` against the hot set, then — only when a spill
        tier exists — a filter-gated probe of the on-disk runs (filter
        negative = definitely never added, no IO; only the filter's false
        positives and true spilled keys touch parquet)."""
        seen = surts.isin(self._exact).to_numpy()
        if self._runs is not None and self._runs.n_keys:
            cand = np.flatnonzero(~seen)
            if len(cand):
                keys = surts.to_numpy(dtype=object)[cand]
                gate = np.fromiter(
                    (self._acc_might_contain(k) for k in keys),
                    dtype=bool,
                    count=len(keys),
                )
                if gate.any():
                    hit = self._runs.contains_many(keys[gate])
                    seen[cand[gate]] = hit
        return seen

    def _acc_add(self, key: str) -> None:
        # once the cuckoo saturates, route adds straight to the Bloom
        # overflow (cuckoo lookups stay valid for everything it holds) —
        # retrying the filter would pay a full relocation walk per key
        if self._cuckoo.saturated or not self._cuckoo.add(key):
            if self._bloom is None:  # overflow fallback (north-star rule)
                self._bloom = BloomFilter(self._n_bits)
            self._bloom.add(key)

    def _acc_add_many(self, keys: list[str]) -> None:
        """Batched accelerator add (wave-barrier path): cuckoo add_many,
        overflow failures go to the Bloom in ONE vectorized scatter."""
        if not keys:
            return
        ok = self._cuckoo.add_many(keys)
        spill = [k for k, o in zip(keys, ok) if not o]
        if spill:
            if self._bloom is None:
                self._bloom = BloomFilter(self._n_bits)
            self._bloom.add_many(spill)

    def _acc_might_contain(self, key: str) -> bool:
        return self._cuckoo.might_contain(key) or (
            self._bloom is not None and self._bloom.might_contain(key)
        )

    def add_if_new(self, keys: list[str]) -> list[bool]:
        """For each key: True when newly added. Vectorized: in-batch
        first-occurrence via pandas ``duplicated`` + one C-speed ``isin``
        probe of the exact set, then ONE batched accelerator add. (The
        exact set is authoritative; the accelerator exists for the spill
        regime where the exact set pages out — per-key probes here would
        be pure overhead.)"""
        import pandas as pd

        if not keys:
            return []
        ser = pd.Series(keys, dtype=object)
        mask = (~ser.duplicated().to_numpy() & ~self._seen_mask(ser)).tolist()
        new = [k for k, m in zip(keys, mask) if m]
        self._exact.update(new)
        self._acc_add_many(new)
        self._maybe_spill()
        return mask

    def contains(self, keys: list[str]) -> list[bool]:
        import pandas as pd

        if not keys:
            return []
        return self._seen_mask(pd.Series(keys, dtype=object)).tolist()

    def accept(self, wave: int, tbl) -> int:
        """Buffer a candidate table chunk for ``wave``. Columns: url,
        surt, host, priority, hop, order_host, order_slot, order_rank."""
        self._pending.setdefault(wave, []).append(tbl)
        return tbl.num_rows

    def accept_routed(self, wave: int, tbl, shard_id: int) -> int:
        """Buffer this shard's rows of a SHARED candidate block (driver
        routes the block by reference to every shard; the ``shard``
        column pre-computed by the split task says which rows are ours —
        the plasma read is zero-copy, only our rows are materialised)."""
        import pyarrow.compute as pc

        mine = tbl.filter(pc.equal(tbl["shard"], shard_id))
        if mine.num_rows:
            self._pending.setdefault(wave, []).append(mine)
        return mine.num_rows

    def accept_routed_many(
        self, wave: int, refs: list, shard_id: int, bounds: list | None = None
    ) -> int:
        """Batched delivery: ONE actor call per shard per wave. ``refs``
        is the wave's full list of shared candidate-block ObjectRefs (a
        list argument is not auto-dereferenced by Ray, so the plasma reads
        happen here — still zero-copy). ``bounds`` carries this shard's
        (start, stop) slice per block (the split task sorts each block by
        shard), so taking our rows is a zero-copy SLICE — no per-shard
        filter scan of every block; without bounds, fall back to the
        filter path (legacy callers/tests)."""
        import ray

        total = 0
        tbls = ray.get(list(refs))
        if bounds is None:
            for tbl in tbls:
                total += self.accept_routed(wave, tbl, shard_id)
            return total
        for tbl, (start, stop) in zip(tbls, bounds):
            if stop > start:
                mine = tbl.slice(start, stop - start)
                self._pending.setdefault(wave, []).append(mine)
                total += mine.num_rows
        return total

    def finalize_wave(self, wave: int):
        """Wave barrier: sort this shard's candidates by the global order
        key, keep the first occurrence of each unseen SURT (adding it to
        the seen set), and return the winner table (order columns kept so
        the driver can merge shards for seq assignment)."""
        import pyarrow as pa
        import pyarrow.compute as pc

        chunks = self._pending.pop(wave, [])
        if not chunks:
            return None
        t = pa.concat_tables(chunks)
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
        import pandas as pd

        # vectorized first-unseen selection: in-table duplicates drop via
        # ``duplicated`` (table is sorted by the pinned order key, so
        # "first" is the correct occurrence), already-seen keys via ONE
        # C-speed ``isin`` probe; the accelerator absorbs the winners in
        # one batched add — same semantics as the per-key loop, without
        # paying per-key Python on the wave barrier
        surts = pd.Series(t["surt"].to_pylist(), dtype=object)
        mask = ~surts.duplicated().to_numpy() & ~self._seen_mask(surts)
        new = [k for k, m in zip(surts, mask) if m]
        self._exact.update(new)
        self._acc_add_many(new)
        self._maybe_spill()
        w = t.filter(pa.array(mask))
        return w if w.num_rows else None

    def finalize_wave_split(self, wave: int, want_surts: bool, n_samples: int):
        """Two-object finalize for the parallel winners merge: (winners
        table, small dict). The small dict carries everything the DRIVER
        needs (count, unique hosts, optional SURT delta, and evenly-spaced
        ``order_host`` samples for range-boundary selection) so the heavy
        merge/sort/partition can run in range-parallel tasks off the
        driver's critical path."""
        w = self.finalize_wave(wave)
        if w is None:
            return None, {"n": 0, "hosts": [], "surts": [], "samples": []}
        import pyarrow as pa
        import pyarrow.compute as pc

        oh = w["order_host"]
        idx = np.linspace(0, w.num_rows - 1, num=min(n_samples, w.num_rows))
        samples = oh.take(pa.array(idx.astype(np.int64))).to_pylist()
        return w, {
            "n": w.num_rows,
            "hosts": pc.unique(w["host"]).to_pylist(),
            "surts": w["surt"].to_pylist() if want_surts else [],
            "samples": samples,
        }

    def gate_first_seen(
        self, refs: list, shard_id: int, want_keys: bool = False
    ):
        """Content-seen gate (wave barrier of the duplicate-content
        rule): ``refs`` are the wave's per-block gate tables — columns
        ``key`` (content hash), ``host``, ``slot``, ``shard`` — shared
        by reference with every shard (same delivery shape as
        ``accept_routed_many``). This shard takes its ``shard`` rows,
        sorts them by the pinned global fetch order (host, slot), keeps
        the FIRST occurrence of each key not already in the seen set
        (adding it — exact set + accelerator + spill tier, the normal
        add path), and returns ``(losers, small)``: ``losers`` is the
        (host, slot) table of suppressed rows (duplicate content ⇒ the
        row contributes no candidates), ``small`` carries the newly
        seen keys when ``want_keys`` (checkpoint delta) plus the add
        count. Correctness needs only per-shard order: all occurrences
        of one key share its shard, and first-wins is per-key."""
        import pandas as pd
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray

        mine = []
        for tbl in ray.get(list(refs)):
            if tbl.num_rows:
                part = tbl.filter(pc.equal(tbl["shard"], shard_id))
                if part.num_rows:
                    mine.append(part)
        empty_losers = pa.table(
            {"host": pa.array([], pa.string()), "slot": pa.array([], pa.int32())}
        )
        if not mine:
            return empty_losers, {"n_new": 0, "keys": []}
        t = pa.concat_tables(mine)
        t = t.take(
            pc.sort_indices(
                t, sort_keys=[("host", "ascending"), ("slot", "ascending")]
            )
        )
        keys = pd.Series(t["key"].to_pylist(), dtype=object)
        first_new = ~keys.duplicated().to_numpy() & ~self._seen_mask(keys)
        new = [k for k, m in zip(keys, first_new) if m]
        self._exact.update(new)
        self._acc_add_many(new)
        self._maybe_spill()
        # a row loses when its key was seen before it in the pinned
        # order: everything except the first-new rows of unseen keys
        losers_mask = ~first_new
        losers = t.filter(pa.array(losers_mask)).select(["host", "slot"])
        return losers, {"n_new": len(new), "keys": new if want_keys else []}

    def snapshot(self) -> list[str]:
        """Sorted authoritative key list (hot ∪ spilled) — the
        byte-comparable representation; streams spilled runs back."""
        if self._runs is None or not self._runs.n_keys:
            return sorted(self._exact)
        return sorted(set(self._runs.all_keys()) | self._exact)

    def restore(self, keys: list[str]) -> None:
        if self._runs is not None:
            self._runs.clear()
        self._exact = set(keys)
        self._cuckoo = CuckooFilter(n_buckets=max(1 << 10, self._n_bits >> 4))
        self._bloom = None
        self._acc_add_many(list(keys))
        self._maybe_spill()

    def restore_from_parquet(
        self, paths: list[str], shard_id: int, n_shards: int
    ) -> int:
        """Shard-side checkpoint resume (round-4, VERDICT r3 #2): read
        the checkpoint's ``seen_delta.parquet`` files HERE, keep only the
        keys this shard owns (same ``shard_of`` routing as live adds),
        absorb them into filters + hot set, spill as configured. The
        driver passes paths, never key lists. Returns the number of keys
        absorbed."""
        import pyarrow.parquet as pq

        if self._runs is not None:
            self._runs.clear()
        self._exact = set()
        self._cuckoo = CuckooFilter(n_buckets=max(1 << 10, self._n_bits >> 4))
        self._bloom = None
        total = 0
        for p in paths:
            t = pq.read_table(p)
            keys = t["surt"].to_pylist()
            if "h64" in t.schema.names:
                # vectorized routing off the stored hash (no per-key sha1)
                h = t["h64"].to_numpy(zero_copy_only=False).astype(np.uint64)
                mask = (h % np.uint64(n_shards)).astype(np.int64) == shard_id
                mine = [k for k, m in zip(keys, mask) if m]
            else:  # legacy checkpoints without the hash column
                mine = [k for k in keys if shard_of(k, n_shards) == shard_id]
            if not mine:
                continue
            self._exact.update(mine)
            self._acc_add_many(mine)
            self._maybe_spill()
            total += len(mine)
        return total

    def spill_stats(self) -> dict:
        """Test/observability hook: hot-set size + spill-tier layout."""
        return {
            "hot": len(self._exact),
            "spilled": 0 if self._runs is None else self._runs.n_keys,
            "runs": 0 if self._runs is None else self._runs.n_runs,
        }

    def __len__(self) -> int:
        n = len(self._exact)
        if self._runs is not None:
            n += self._runs.n_keys
        return n


class SeenShardPool:
    """Driver-side facade over ``n_shards`` Ray actors holding SeenSets.

    Batch calls are partitioned by shard and issued concurrently; results
    are re-assembled in input order. Construction is lazy so the module
    imports without Ray initialised (driver contract)."""

    def __init__(
        self,
        n_shards: int,
        n_bits: int = 1 << 20,
        spill_dir: str | None = None,
        spill_threshold: int | None = None,
    ):
        import ray

        self.n_shards = n_shards
        shard_cls = ray.remote(num_cpus=0)(SeenSet)
        self._shards = [
            shard_cls.remote(
                n_bits,
                spill_dir=None
                if spill_dir is None
                else os.path.join(spill_dir, f"shard_{i:03d}"),
                spill_threshold=spill_threshold,
            )
            for i in range(n_shards)
        ]

    @property
    def shards(self):
        """Actor handles (picklable) — fetch tasks route candidate tables
        directly to shards via ``accept``."""
        return self._shards

    def finalize_wave(self, wave: int):
        """Barrier: resolve every shard's wave candidates; returns the
        list of non-empty winner tables (driver merges their order keys)."""
        import ray

        return [
            t
            for t in ray.get([s.finalize_wave.remote(wave) for s in self._shards])
            if t is not None
        ]

    def finalize_wave_refs(self, wave: int) -> list:
        """Like :meth:`finalize_wave` but returns the per-shard ObjectRefs
        without materializing them — the winner merge can then run as a
        remote task with the refs as auto-dereferenced args."""
        return [s.finalize_wave.remote(wave) for s in self._shards]

    def finalize_wave_split(
        self, wave: int, want_surts: bool, n_samples: int = 33
    ) -> tuple[list, list]:
        """(winner_table_refs, small_dict_refs) per shard: the tables stay
        remote for the range-parallel merge; the smalls are what the
        driver blocks on (counts, hosts, samples, optional SURT delta)."""
        pairs = [
            s.finalize_wave_split.options(num_returns=2).remote(
                wave, want_surts, n_samples
            )
            for s in self._shards
        ]
        return [p[0] for p in pairs], [p[1] for p in pairs]

    def add_if_new(self, keys: list[str]) -> list[bool]:
        hashes = [stable_hash64(k, _SHARD_SEED) for k in keys]
        return self.add_if_new_hashed(keys, hashes)

    def add_if_new_hashed(self, keys: list[str], hash64s) -> list[bool]:
        """add_if_new with the shard hashes precomputed (e.g. by the
        chunked remote canonicalization tasks) — driver routing is one
        numpy modulo + argsort instead of a per-key Python loop."""
        import ray

        if not keys:
            return []
        shards = (
            np.asarray(hash64s, dtype=np.uint64) % np.uint64(self.n_shards)
        ).astype(np.int64)
        order = np.argsort(shards, kind="stable")
        sorted_shards = shards[order]
        bounds = np.searchsorted(sorted_shards, np.arange(self.n_shards + 1))
        refs = []
        for s in range(self.n_shards):
            a, b = int(bounds[s]), int(bounds[s + 1])
            if b > a:
                refs.append(
                    (a, b, self._shards[s].add_if_new.remote(
                        [keys[i] for i in order[a:b]]
                    ))
                )
        out = np.zeros(len(keys), dtype=bool)
        for a, b, ref in refs:
            out[order[a:b]] = ray.get(ref)
        return out.tolist()

    def snapshot(self) -> list[list[str]]:
        import ray

        return ray.get([s.snapshot.remote() for s in self._shards])

    def restore(self, snapshots: list[list[str]]) -> None:
        import ray

        ray.get(
            [s.restore.remote(snap) for s, snap in zip(self._shards, snapshots)]
        )

    def restore_keys(self, keys: list[str]) -> None:
        """Restore from a flat key list (checkpoint delta union): keys are
        re-routed to their shards by the same hash."""
        by_shard: dict[int, list[str]] = {i: [] for i in range(self.n_shards)}
        for k in keys:
            by_shard[shard_of(k, self.n_shards)].append(k)
        self.restore([by_shard[i] for i in range(self.n_shards)])

    def restore_from_parquet(self, paths: list[str]) -> list[int]:
        """Shard-side checkpoint resume: each shard actor reads the delta
        parquet files itself and keeps only its slice — the driver holds
        PATHS, never keys, so resume cost on the driver is O(#waves), not
        O(total seen). Returns per-shard absorbed counts."""
        import ray

        return ray.get(
            [
                s.restore_from_parquet.remote(paths, i, self.n_shards)
                for i, s in enumerate(self._shards)
            ]
        )

    def spill_stats(self) -> list[dict]:
        import ray

        return ray.get([s.spill_stats.remote() for s in self._shards])

    def all_keys_sorted(self) -> list[str]:
        """The byte-comparable global representation: sorted union."""
        out: list[str] = []
        for snap in self.snapshot():
            out.extend(snap)
        return sorted(out)

    def total(self) -> int:
        return len(self.all_keys_sorted())
