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
  representation) for checkpoint/resume; at 10^10-URL scale each shard
  would persist to a Lance/Parquet side table and keep only the filters +
  hot set in RAM — the actor API is unchanged.
"""

from __future__ import annotations

import hashlib

import numpy as np

from ..functions.hashing import stable_hash64

__all__ = ["BloomFilter", "CuckooFilter", "SeenSet", "shard_of", "SeenShardPool"]

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

    def __init__(self, n_bits: int = 1 << 20):
        self._n_bits = n_bits
        # cuckoo slots sized n_bits/4 (4 slots/bucket = n_bits/16 buckets,
        # ~0.5 MB at the 1M-bit default); Bloom engages only as the
        # overflow fallback once the cuckoo walk first fails
        self._cuckoo = CuckooFilter(n_buckets=max(1 << 10, n_bits >> 4))
        self._bloom: BloomFilter | None = None
        self._exact: set[str] = set()
        self._pending: dict[int, list] = {}

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
        mask = (~ser.duplicated() & ~ser.isin(self._exact)).tolist()
        new = [k for k, m in zip(keys, mask) if m]
        self._exact.update(new)
        self._acc_add_many(new)
        return mask

    def contains(self, keys: list[str]) -> list[bool]:
        return [self._acc_might_contain(k) and k in self._exact for k in keys]

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
        mask = (~surts.duplicated() & ~surts.isin(self._exact)).to_numpy()
        new = [k for k, m in zip(surts, mask) if m]
        self._exact.update(new)
        self._acc_add_many(new)
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

    def snapshot(self) -> list[str]:
        return sorted(self._exact)

    def restore(self, keys: list[str]) -> None:
        self._exact = set(keys)
        self._cuckoo = CuckooFilter(n_buckets=max(1 << 10, self._n_bits >> 4))
        self._bloom = None
        self._acc_add_many(list(keys))

    def __len__(self) -> int:
        return len(self._exact)


class SeenShardPool:
    """Driver-side facade over ``n_shards`` Ray actors holding SeenSets.

    Batch calls are partitioned by shard and issued concurrently; results
    are re-assembled in input order. Construction is lazy so the module
    imports without Ray initialised (driver contract)."""

    def __init__(self, n_shards: int, n_bits: int = 1 << 20):
        import ray

        self.n_shards = n_shards
        shard_cls = ray.remote(num_cpus=0)(SeenSet)
        self._shards = [shard_cls.remote(n_bits) for _ in range(n_shards)]

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

    def all_keys_sorted(self) -> list[str]:
        """The byte-comparable global representation: sorted union."""
        out: list[str] = []
        for snap in self.snapshot():
            out.extend(snap)
        return sorted(out)

    def total(self) -> int:
        return len(self.all_keys_sorted())
