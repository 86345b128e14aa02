"""Deduplication operators: exact, MinHash+LSH, SimHash, embedding near-dup,
and the reference's hash-group reduplication (J3).

Reference precedent: exact content-hash dedup is the MDX reduplication
machinery (``warc-hadoop-recordreaders/.../mdx/MDXReduplicatingReducer.java:72-153``,
group by digest, exemplar merge); ssdeep fields (FuzzyHashAnalyser) are
emitted for near-dup *search* but the clustering operators here are new
construction for training-data pipelines.

Shuffle strategy: one hash-partitioned groupby per operator; MinHash
shingles/signatures are computed batch-local (combiner style) so only
(band, band_hash, doc_id) triples shuffle, not documents.
"""

from __future__ import annotations

import hashlib
from typing import Iterable

import numpy as np
import pandas as pd
import pyarrow as pa

from ..sources.io import read_table

__all__ = [
    "exact_dedup",
    "minhash_lsh_pairs",
    "simhash_signatures",
    "embedding_neardup_pairs",
    "reduplicate",
]


def _md5_hex(text: str) -> str:
    return hashlib.md5(text.encode("utf-8")).hexdigest()


def exact_dedup(sf_dir: str):
    """Exact dedup by content hash: one exemplar (min doc_id) per text.

    Columns: h (md5 hex), doc_id. SQL oracle:
    ``SELECT md5(text) h, min(doc_id) doc_id FROM documents GROUP BY 1``."""
    from ray.data.aggregate import Min

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def add_hash(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"h": [_md5_hex(t) for t in df["text"]], "doc_id": df["doc_id"]}
        )

    return (
        ds.map_batches(add_hash, batch_format="pandas")
        .groupby("h")
        .aggregate(Min("doc_id", alias_name="doc_id"))
    )


_N_PERM = 32
_BANDS = 8  # 8 bands x 4 rows
_ROWS_PER_BAND = _N_PERM // _BANDS


def _perm_seeds(n_perm: int = _N_PERM) -> np.ndarray:
    """Deterministic per-permutation xor seeds (sha-derived, no RNG)."""
    return np.array(
        [
            int.from_bytes(hashlib.sha1(f"minhash-perm-{i}".encode()).digest()[:8], "big")
            for i in range(n_perm)
        ],
        dtype=np.uint64,
    )


def _shingles(text: str, k: int = 3) -> set[int]:
    toks = text.split()
    grams = [" ".join(toks[i : i + k]) for i in range(max(0, len(toks) - k + 1))] or [text]
    return {
        int.from_bytes(hashlib.md5(g.encode()).digest()[:8], "big") for g in grams
    }


def _splitmix64(z: np.ndarray) -> np.ndarray:
    # finalizer of the splitmix64 generator; uint64 wraparound intended
    with np.errstate(over="ignore"):
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _minhash_signature(shingle_hashes: Iterable[int], seeds: np.ndarray) -> np.ndarray:
    """min over shingles of splitmix64(x ^ seed_i), vectorised uint64 —
    one independent uniform hash per permutation, no modular bigints."""
    h = np.fromiter(shingle_hashes, dtype=np.uint64)
    return _splitmix64(h[None, :] ^ seeds[:, None]).min(axis=1)


def minhash_lsh_pairs(sf_dir: str, threshold: float = 0.3):
    """MinHash+LSH near-duplicate pairs with exact-Jaccard verification.

    shingle -> 32-perm minhash -> 8x4 band buckets -> groupby(band,
    band_hash) candidate pairs -> exact 3-gram Jaccard verify against the
    broadcast text store. Columns: doc_a, doc_b, jaccard (rounded 6).
    Deterministic; rows-only driver check (non-SQL)."""
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Count

    from ..functions.broadcast import get_broadcast

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    seeds = _perm_seeds()

    def to_bands(batch: pa.Table) -> pa.Table:
        doc_ids, buckets = [], []
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            sig = _minhash_signature(_shingles(text), seeds)
            for band in range(_BANDS):
                chunk = sig[band * _ROWS_PER_BAND : (band + 1) * _ROWS_PER_BAND]
                bh = hashlib.md5(chunk.tobytes()).hexdigest()[:16]
                doc_ids.append(doc_id)
                buckets.append(f"{band}:{bh}")
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "bucket": pa.array(buckets, pa.string()),
            }
        )

    bands_ds = ds.map_batches(to_bands, batch_format="pyarrow").materialize()
    # singleton pruning: the overwhelming majority of LSH buckets hold one
    # doc — drop them BEFORE the per-group pair stage so map_groups only
    # touches true collisions (the bucket-count groupby is a vectorized
    # hash aggregate; the surviving-bucket set is tiny and broadcasts)
    counts = bands_ds.groupby("bucket").aggregate(Count(alias_name="n"))
    hot = {r["bucket"] for r in counts.filter(expr="n >= 2").take_all()}
    if not hot:
        return pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "jaccard": pa.array([], pa.float64()),
            }
        )
    hot_arr = pa.array(sorted(hot), pa.string())

    def keep_hot(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch["bucket"], value_set=hot_arr))

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(df["doc_id"].unique())
        rows = [
            {"doc_a": ids[i], "doc_b": ids[j]}
            for i in range(len(ids))
            for j in range(i + 1, len(ids))
        ]
        return pd.DataFrame(rows, columns=["doc_a", "doc_b"])

    candidates = (
        bands_ds.map_batches(keep_hot, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    # distinct candidate pairs (bands produce duplicates)
    distinct_pairs = candidates.groupby(["doc_a", "doc_b"]).aggregate(
        Count(alias_name="n_bands")
    )

    texts_ref = ray.put(
        {
            r["doc_id"]: r["text"]
            for r in read_table(sf_dir, "documents", columns=["doc_id", "text"]).take_all()
        }
    )

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        texts = get_broadcast(texts_ref)
        out = []
        for da, db in zip(df["doc_a"], df["doc_b"]):
            sa = _shingles(texts[da])
            sb = _shingles(texts[db])
            j = len(sa & sb) / len(sa | sb) if sa | sb else 0.0
            if j >= threshold:
                out.append({"doc_a": int(da), "doc_b": int(db), "jaccard": round(j, 6)})
        return pd.DataFrame(out, columns=["doc_a", "doc_b", "jaccard"])

    return distinct_pairs.map_batches(verify, batch_format="pandas")


def simhash_signatures(sf_dir: str):
    """64-bit SimHash per document (token-weighted). Columns: doc_id,
    simhash (16-char hex). Deterministic; rows-only."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def simhash(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for text in df["text"]:
            acc = np.zeros(64, dtype=np.int64)
            for tok in text.split():
                h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
                for bit in range(64):
                    acc[bit] += 1 if (h >> bit) & 1 else -1
            sig = 0
            for bit in range(64):
                if acc[bit] > 0:
                    sig |= 1 << bit
            out.append(f"{sig:016x}")
        return pd.DataFrame({"doc_id": df["doc_id"], "simhash": out})

    return ds.map_batches(simhash, batch_format="pandas")


def embedding_neardup_pairs(sf_dir: str, threshold: float = 0.25):
    """Embedding-cosine near-dup pairs, label-bucketed (IVF-style).

    ``groupby(label)`` co-locates each coarse bucket; within-bucket pairwise
    cosine runs as one numpy matmul per group. Cross-bucket near-dups are
    missed by construction (documented approximation — the exact variant is
    an all-pairs O(n^2) shuffle). Columns: vec_a, vec_b, cos (rounded 6)."""
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["vec_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        mat = np.stack(df["embedding"].to_numpy()[order]).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        sims = (mat / norms[:, None]) @ (mat / norms[:, None]).T
        ia, ib = np.triu_indices(len(ids), k=1)
        mask = sims[ia, ib] >= threshold
        return pd.DataFrame(
            {
                "vec_a": ids[ia[mask]],
                "vec_b": ids[ib[mask]],
                "cos": np.round(sims[ia, ib][mask], 6),
            }
        )

    return ds.groupby("label").map_groups(pairs, batch_format="pandas")


def reduplicate(ds, batch_format: str = "pyarrow"):
    """J3: hash-keyed reduplication — group records by payload digest; the
    first ``response`` (lowest timestamp14, then url — iteration order is
    pinned, where the reference relies on Hadoop value order) is the
    exemplar; each ``revisit`` merges the exemplar's fields under its own
    (its keys win) and becomes record_type=``reduplicated``; unresolved
    revisits pass through. Non-revisit records pass through unchanged.

    Reference: ``MDXReduplicatingReducer.java:72-153``."""

    def fix_group(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["timestamp14", "url"], kind="mergesort")
        responses = df[df["record_type"] == "response"]
        exemplar = responses.iloc[0] if len(responses) else None
        out = []
        for _, row in df.iterrows():
            if row["record_type"] != "revisit":
                out.append(row.to_dict())
                continue
            if exemplar is None:
                out.append(row.to_dict())  # unresolved revisit
                continue
            merged = exemplar.to_dict()
            for k, v in row.to_dict().items():
                if v is not None and not (isinstance(v, float) and pd.isna(v)):
                    merged[k] = v
            merged["record_type"] = "reduplicated"
            out.append(merged)
        return pd.DataFrame(out)

    return ds.groupby("digest").map_groups(fix_group, batch_format="pandas")
