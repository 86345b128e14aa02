"""Deduplication operators: exact, MinHash+LSH, SimHash, embedding near-dup,
and the reference's hash-group reduplication (J3).

Reference precedent: exact content-hash dedup is the MDX reduplication
machinery (``warc-hadoop-recordreaders/.../mdx/MDXReduplicatingReducer.java:72-153``,
group by digest, exemplar merge); ssdeep fields (FuzzyHashAnalyser) are
emitted for near-dup *search* but the clustering operators here are new
construction for training-data pipelines.

Shuffle strategy: one hash-partitioned exchange per operator, expressed
as BUCKETED grouped passes (``functions/bucketing.py`` — raw-key
``groupby`` walks rows/groups in Python on this Ray version); MinHash
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
    "ngram_jaccard_pairs",
    "containment_pairs",
    "simhash_signatures",
    "embedding_neardup_pairs",
    "semdedup_keep",
    "cluster_representatives",
    "neardup_dedup_apply",
    "cross_minhash_dedup",
    "reduplicate",
    "dup_span_fraction",
    "paragraph_dedup",
    "incremental_dedup",
    "gram_novelty",
    "simhash_neardup_pairs",
    "exact_substring_spans",
    "exact_substring_dedup_apply",
]


def _md5_hex(text: str) -> str:
    return hashlib.md5(text.encode("utf-8")).hexdigest()


def exact_dedup(sf_dir: str):
    """Exact dedup by content hash: one exemplar (min doc_id) per text.

    One bucketed grouped pass (``functions/bucketing.py`` — a raw-key
    ``groupby(h).aggregate(Min)`` walks every distinct hash in Python):
    per-batch partial min per hash (combiner), then a vectorized grouped
    min inside each hash bucket. Columns: h (md5 hex), doc_id. SQL
    oracle: ``SELECT md5(text) h, min(doc_id) doc_id FROM documents
    GROUP BY 1``."""
    from ..functions.bucketing import bucket_of, default_buckets

    n_b = default_buckets()
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def partial_min(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame(
            {"h": [_md5_hex(t) for t in df["text"]], "doc_id": df["doc_id"]}
        )
        g = g.groupby("h", sort=False)["doc_id"].min().reset_index()
        g["bucket"] = bucket_of(g["h"], n_b)
        return g

    def min_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("h", sort=False)["doc_id"].min().reset_index()

    return (
        ds.map_batches(partial_min, batch_format="pandas")
        .groupby("bucket")
        .map_groups(min_in_bucket, batch_format="pandas")
    )


_SPAN_W = 8  # duplicated-window width in whitespace tokens


def dup_span_fraction(sf_dir: str, w: int = _SPAN_W):
    """Exact duplicated-substring coverage per document, at token
    granularity (the "Deduplicating Training Data Makes Language Models
    Better" metric, token-window form): a w-token window is *duplicated*
    when its text occurs ≥2 times anywhere in the corpus (any doc, any
    position, including within one doc); each document reports the
    fraction of its tokens covered by the union of its duplicated windows.

    Shape — TWO bucketed grouped passes (``functions/bucketing.py``; no
    joins, no raw-key aggregates, no driver materialization):
    (1) per-batch shingle emission, (md5(window), doc_id, pos) rows keyed
    by ``bucket(sh)`` — one vectorized pass per bucket finds the window
    hashes occurring ≥2 times (all occurrences of a hash co-locate) and
    emits only their (doc_id, pos) rows;
    (2) those rows union the per-doc token counts (pos = -1 marker) and a
    second pass keyed by ``bucket(doc_id)`` computes each doc's interval
    union with a vectorized grouped diff/clip — every document appears
    (zero coverage included). Columns: doc_id, n_tokens, n_dup_tokens,
    dup_fraction (one double division of two exact ints — bit-identical
    to the SQL oracle's)."""
    from ..functions.bucketing import bucket_of, default_buckets

    n_b = default_buckets()
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def shingle_positions(df: pd.DataFrame) -> pd.DataFrame:
        # batch-vectorized (same shape as minhash to_bands): flatten all
        # windows, md5 ONCE per unique window text, map back via the
        # inverse index — duplicate windows within a batch (common in
        # templated corpora) hash once
        md5 = hashlib.md5
        grams: list[str] = []
        ids: list[np.ndarray] = []
        poss: list[np.ndarray] = []
        for did, text in zip(df["doc_id"], df["text"]):
            toks = text.split()
            n = len(toks) - w + 1
            if n <= 0:
                continue
            grams.extend(" ".join(toks[i : i + w]) for i in range(n))
            ids.append(np.full(n, did, dtype=np.int64))
            poss.append(np.arange(n, dtype=np.int64))
        if grams:
            uniq, inv = np.unique(np.asarray(grams, dtype=object), return_inverse=True)
            uniq_h = np.asarray(
                [md5(g.encode("utf-8")).hexdigest() for g in uniq], dtype=object
            )
            shs = uniq_h[inv]
            out = pd.DataFrame(
                {
                    "sh": pd.Series(shs, dtype=str),
                    "doc_id": np.concatenate(ids),
                    "pos": np.concatenate(poss),
                }
            )
        else:
            out = pd.DataFrame(
                {
                    "sh": pd.Series([], dtype=str),
                    "doc_id": pd.Series([], dtype="int64"),
                    "pos": pd.Series([], dtype="int64"),
                }
            )
        out["bucket"] = bucket_of(out["sh"], n_b)
        return out

    def dup_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["sh"].value_counts()
        dup = set(vc.index[vc.to_numpy() >= 2])
        sub = df[df["sh"].isin(dup)]
        return pd.DataFrame(
            {
                "doc_id": sub["doc_id"].to_numpy(),
                "pos": sub["pos"].to_numpy(),
                "n_tok": np.zeros(len(sub), dtype="int64"),
            }
        )

    dup_pos = (
        ds.map_batches(shingle_positions, batch_format="pandas")
        .groupby("bucket")
        .map_groups(dup_in_bucket, batch_format="pandas")
    )

    def count_tokens(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "pos": np.full(len(df), -1, dtype="int64"),
                "n_tok": df["text"].str.split().str.len().astype("int64"),
            }
        )

    toks = read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        count_tokens, batch_format="pandas"
    )

    def add_doc_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(bucket=bucket_of(df["doc_id"], n_b))

    def coverage_bucket(df: pd.DataFrame) -> pd.DataFrame:
        t = df[df["pos"] < 0]  # one marker row per doc carries n_tok
        d = (
            df[df["pos"] >= 0]
            .drop_duplicates(["doc_id", "pos"])
            .sort_values(["doc_id", "pos"], kind="mergesort")
        )
        if len(d):
            # grouped interval union: within a doc each position covers
            # [pos, pos+w); the union adds min(gap, w) per sorted step and
            # w for the doc's first position (diff is NaN there)
            diffs = d.groupby("doc_id")["pos"].diff()
            contrib = np.minimum(diffs.fillna(w).to_numpy(), w)
            cov = pd.Series(contrib).groupby(d["doc_id"].to_numpy()).sum()
        else:
            cov = pd.Series(dtype="float64")
        n_dup = t["doc_id"].map(cov).fillna(0).astype("int64").to_numpy()
        n_tok = t["n_tok"].to_numpy()
        return pd.DataFrame(
            {
                "doc_id": t["doc_id"].to_numpy(),
                "n_tokens": n_tok,
                "n_dup_tokens": n_dup,
                "dup_fraction": np.where(
                    n_tok > 0, n_dup / np.where(n_tok > 0, n_tok, 1).astype("float64"), 0.0
                ),
            }
        )

    return (
        dup_pos.union(toks)
        .map_batches(add_doc_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(coverage_bucket, batch_format="pandas")
    )


_PARA_W = 16  # paragraph width in whitespace tokens


def paragraph_dedup(sf_dir: str, w: int = _PARA_W):
    """Corpus-wide exact paragraph dedup with document reassembly — the
    RefinedWeb / CCNet "exact line dedup" shape over fixed token windows
    (the synthetic corpus has no newlines, so a paragraph is a
    NON-overlapping w-token window of the whitespace token stream,
    trailing partial window included). An occurrence survives iff it is
    the first occurrence of its text corpus-wide (lexicographic min
    (doc_id, para_idx) per md5); each document is re-assembled from its
    surviving paragraphs in order; documents that lose every paragraph
    drop from the output.

    Shape — two bucketed exchanges, text shuffles once:
    (1) winners pass keyed by ``bucket(h)``: per-batch paragraph hashing
        (md5 once per unique paragraph per batch), only
        (h, doc_id, para_idx) triples move; each bucket emits the LOSER
        occurrences only (duplicated hashes minus their argmin), so the
        reassembly side-table is proportional to duplication, not corpus
        size;
    (2) reassembly pass keyed by ``bucket(doc_id)``: documents union the
        loser markers; one vectorized in-bucket anti-join (merge
        indicator) + ordered join rebuilds the text.

    Columns: doc_id, n_paras, n_kept, text."""
    from ..functions.bucketing import bucket_of, default_buckets, typed_empty

    n_b = default_buckets()
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def para_rows(df: pd.DataFrame) -> list[np.ndarray | list]:
        """Shared explode: per-doc non-overlapping windows → flat
        (ptext, doc_id, para_idx) arrays."""
        texts: list[str] = []
        ids: list[np.ndarray] = []
        idxs: list[np.ndarray] = []
        for did, text in zip(df["doc_id"], df["text"]):
            toks = text.split()
            if not toks:
                continue
            n_p = (len(toks) + w - 1) // w
            texts.extend(" ".join(toks[p * w : (p + 1) * w]) for p in range(n_p))
            ids.append(np.full(n_p, did, dtype=np.int64))
            idxs.append(np.arange(n_p, dtype=np.int64))
        if not texts:
            return [[], np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)]
        return [texts, np.concatenate(ids), np.concatenate(idxs)]

    def para_hashes(df: pd.DataFrame) -> pd.DataFrame:
        md5 = hashlib.md5
        texts, ids, idxs = para_rows(df)
        if len(texts):
            # md5 once per unique paragraph per batch (templated corpora
            # repeat paragraphs within a batch)
            uniq, inv = np.unique(np.asarray(texts, dtype=object), return_inverse=True)
            uniq_h = np.asarray(
                [md5(t.encode("utf-8")).hexdigest() for t in uniq], dtype=object
            )
            hs = pd.Series(uniq_h[inv], dtype=str)
        else:
            hs = pd.Series([], dtype=str)
        out = pd.DataFrame({"h": hs, "doc_id": ids, "para_idx": idxs})
        out["bucket"] = bucket_of(out["h"], n_b)
        return out

    def losers_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return typed_empty(
                doc_id="int64", para_idx="int64", text=str, bucket="int32"
            )
        d = df.sort_values(["h", "doc_id", "para_idx"], kind="mergesort")
        lose = d.loc[d["h"].duplicated(), ["doc_id", "para_idx"]]
        lose = lose.assign(text="", bucket=bucket_of(lose["doc_id"], n_b))
        return lose[["doc_id", "para_idx", "text", "bucket"]]

    losers = (
        ds.map_batches(para_hashes, batch_format="pandas")
        .groupby("bucket")
        .map_groups(losers_in_bucket, batch_format="pandas")
    )

    def doc_markers(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "para_idx": np.full(len(df), -1, dtype="int64"),
                "text": df["text"],
                "bucket": bucket_of(df["doc_id"], n_b),
            }
        )

    docs = ds.map_batches(doc_markers, batch_format="pandas")

    def reassemble(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return typed_empty(
                doc_id="int64", n_paras="int64", n_kept="int64", text=str
            )
        lost = df.loc[df["para_idx"] >= 0, ["doc_id", "para_idx"]]
        texts, ids, idxs = para_rows(df[df["para_idx"] < 0])
        paras = pd.DataFrame(
            {"doc_id": ids, "para_idx": idxs, "ptext": pd.Series(texts, dtype=str)}
        )
        if len(lost):
            m = paras.merge(lost, on=["doc_id", "para_idx"], how="left", indicator=True)
            kept = m[m["_merge"] == "left_only"]
        else:
            kept = paras
        if not len(kept):
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "n_paras": pd.Series([], dtype="int64"),
                    "n_kept": pd.Series([], dtype="int64"),
                    "text": pd.Series([], dtype=str),
                }
            )
        tot = paras.groupby("doc_id", sort=False).size()
        kept = kept.sort_values(["doc_id", "para_idx"], kind="mergesort")
        agg = kept.groupby("doc_id", sort=False)["ptext"].agg(" ".join)
        n_kept = kept.groupby("doc_id", sort=False).size()
        return pd.DataFrame(
            {
                "doc_id": agg.index.to_numpy(),
                "n_paras": tot.reindex(agg.index).to_numpy(),
                "n_kept": n_kept.to_numpy(),
                "text": agg.to_numpy(),
            }
        )

    return (
        docs.union(losers)
        .groupby("bucket")
        .map_groups(reassemble, batch_format="pandas")
    )


def incremental_dedup(sf_dir: str, bloom_bits: int | None = None):
    """Dedup a crawl INCREMENT against an existing snapshot — the
    recurring-crawl shape (the reference dedups revisits against the
    prior index via digest lookups, MDXReduplicatingReducer.java:72-153;
    here the whole increment is deduped against the whole snapshot).
    Base = even doc_ids (the already-indexed snapshot), delta = odd
    doc_ids (the new increment). The content key is a FINGERPRINT —
    md5 of the first 16 whitespace tokens (the reference keys revisit
    dedup on a payload digest; the synthetic corpus has unique full
    texts but templated openings, so the prefix window is the digest
    analogue that actually collides). Empty docs are skipped. A delta
    doc survives iff its fingerprint appears nowhere in the snapshot
    AND it is the first occurrence (min doc_id) within the increment.

    Scale asymmetry this encodes: snapshot >> increment at 100 TB, so
    the 16 KiB Bloom is built over the DELTA hashes and broadcast; the
    snapshot stream ships ONLY hashes that hit the increment's Bloom
    (false positives ship harmlessly and die in the exact verify — they
    can never drop a surviving doc). One bucketed exchange keyed by
    bucket(h) resolves base-markers and within-delta min together.

    Columns: doc_id, h."""
    import ray

    from ..functions.broadcast import get_broadcast
    from ..functions.bucketing import bucket_of, default_buckets, typed_empty
    from .sketches import _BLOOM_BITS, bloom_add, bloom_contains

    # bloom_bits is a TEST KNOB: a tiny filter forces heavy false
    # positives, pinning that FPs only ship extra snapshot hashes and can
    # never change the exact anti-join answer
    nbits = bloom_bits if bloom_bits is not None else _BLOOM_BITS
    n_b = default_buckets()
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def _hash_side(df: pd.DataFrame, parity: int) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy()
        nonempty = np.asarray([t.strip() != "" for t in df["text"]], dtype=bool)
        sub = df[(ids % 2 == parity) & nonempty]
        if len(sub):
            fps = np.asarray(
                [" ".join(t.split()[:16]) for t in sub["text"]], dtype=object
            )
            uniq, inv = np.unique(fps, return_inverse=True)
            uniq_h = np.asarray(
                [_md5_hex(t) for t in uniq], dtype=object
            )
            hs = pd.Series(uniq_h[inv], dtype=str, index=sub.index)
        else:
            hs = pd.Series([], dtype=str)
        return pd.DataFrame(
            {"h": hs.to_numpy(), "doc_id": sub["doc_id"].to_numpy()}
        )

    def _key64(hs: pd.Series) -> np.ndarray:
        return np.array([int(h[:16], 16) for h in hs], dtype=np.uint64)

    def delta_bloom(df: pd.DataFrame) -> pd.DataFrame:
        d = _hash_side(df, 1)
        bits = np.zeros(nbits >> 3, dtype=np.uint8)
        if len(d):
            bloom_add(bits, _key64(d["h"]))
        return pd.DataFrame({"bits": [bits.tobytes()]})

    parts = ds.map_batches(delta_bloom, batch_format="pandas").take_all()
    bits = np.zeros(nbits >> 3, dtype=np.uint8)
    for p in parts:
        bits |= np.frombuffer(p["bits"], dtype=np.uint8)
    bloom_ref = ray.put(bits)

    def base_markers(df: pd.DataFrame) -> pd.DataFrame:
        b = _hash_side(df, 0)
        if len(b):
            b = b[bloom_contains(get_broadcast(bloom_ref), _key64(b["h"]))]
        out = pd.DataFrame(
            {"h": b["h"].to_numpy(), "doc_id": np.full(len(b), -1, dtype=np.int64)}
        )
        out["bucket"] = bucket_of(out["h"], n_b)
        return out

    def delta_rows(df: pd.DataFrame) -> pd.DataFrame:
        out = _hash_side(df, 1)
        out["bucket"] = bucket_of(out["h"], n_b)
        return out

    def keep_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return typed_empty(doc_id="int64", h=str)
        in_base = set(df.loc[df["doc_id"].to_numpy() < 0, "h"])
        d = df[df["doc_id"].to_numpy() >= 0]
        d = d[~d["h"].isin(in_base)]
        g = d.groupby("h", sort=False)["doc_id"].min().reset_index()
        return g[["doc_id", "h"]]

    return (
        ds.map_batches(base_markers, batch_format="pandas")
        .union(ds.map_batches(delta_rows, batch_format="pandas"))
        .groupby("bucket")
        .map_groups(keep_in_bucket, batch_format="pandas")
    )


_NOVELTY_W = 8  # novelty window width in whitespace tokens


def gram_novelty(sf_dir: str, w: int = _NOVELTY_W):
    """Per-document n-gram NOVELTY — the marginal-data-value signal used
    to order/curate pretraining corpora: the fraction of a document's
    overlapping w-token windows whose FIRST corpus-wide occurrence
    (lexicographic min (doc_id, pos)) lies in this document. A fully
    templated doc scores ~0, a fully original doc scores 1. Docs with
    fewer than w tokens have no windows and drop from the output.

    Shape — the dup_span_fraction exchange plan reused with per-doc
    partial counters instead of positions: (md5, doc_id, pos) triples
    bucket by gram hash (all occurrences of a gram co-locate, so the
    in-bucket sort + ``duplicated()`` scan finds the exact global first
    occurrence); each bucket emits one (n_windows, n_novel) partial per
    doc, and a second exchange keyed by bucket(doc_id) folds the
    partials. Window text never shuffles — only hashes and counters.

    Columns: doc_id, n_windows, n_novel, novelty (one double division
    of two exact ints — bit-identical to the SQL oracle's)."""
    from ..functions.bucketing import bucket_of, default_buckets, typed_empty

    n_b = default_buckets()
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def window_hashes(df: pd.DataFrame) -> pd.DataFrame:
        md5 = hashlib.md5
        grams: list[str] = []
        ids: list[np.ndarray] = []
        poss: list[np.ndarray] = []
        for did, text in zip(df["doc_id"], df["text"]):
            toks = text.split()
            n = len(toks) - w + 1
            if n <= 0:
                continue
            grams.extend(" ".join(toks[i : i + w]) for i in range(n))
            ids.append(np.full(n, did, dtype=np.int64))
            poss.append(np.arange(n, dtype=np.int64))
        if grams:
            # md5 once per unique window per batch (templated corpora
            # repeat windows within a batch)
            uniq, inv = np.unique(np.asarray(grams, dtype=object), return_inverse=True)
            uniq_h = np.asarray(
                [md5(g.encode("utf-8")).hexdigest() for g in uniq], dtype=object
            )
            out = pd.DataFrame(
                {
                    "sh": pd.Series(uniq_h[inv], dtype=str),
                    "doc_id": np.concatenate(ids),
                    "pos": np.concatenate(poss),
                }
            )
        else:
            out = pd.DataFrame(
                {
                    "sh": pd.Series([], dtype=str),
                    "doc_id": pd.Series([], dtype="int64"),
                    "pos": pd.Series([], dtype="int64"),
                }
            )
        out["bucket"] = bucket_of(out["sh"], n_b)
        return out

    def novel_partials(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return typed_empty(
                doc_id="int64", n_windows="int64", n_novel="int64", bucket="int32"
            )
        d = df.sort_values(["sh", "doc_id", "pos"], kind="mergesort")
        novel = (~d["sh"].duplicated()).to_numpy().astype("int64")
        g = pd.DataFrame({"doc_id": d["doc_id"].to_numpy(), "novel": novel})
        agg = (
            g.groupby("doc_id", sort=False)["novel"]
            .agg(n_windows="size", n_novel="sum")
            .reset_index()
        )
        agg["bucket"] = bucket_of(agg["doc_id"], n_b)
        return agg

    def fold_doc(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return typed_empty(
                doc_id="int64", n_windows="int64", n_novel="int64", novelty="float64"
            )
        agg = (
            df.groupby("doc_id", sort=False)[["n_windows", "n_novel"]]
            .sum()
            .reset_index()
        )
        agg["novelty"] = agg["n_novel"].to_numpy() / agg["n_windows"].to_numpy().astype(
            "float64"
        )
        return agg[["doc_id", "n_windows", "n_novel", "novelty"]]

    return (
        ds.map_batches(window_hashes, batch_format="pandas")
        .groupby("bucket")
        .map_groups(novel_partials, batch_format="pandas")
        .groupby("bucket")
        .map_groups(fold_doc, batch_format="pandas")
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


def _gram_list(text: str, k: int = 3) -> list[str]:
    """The ONE word-k-gram rule every Jaccard-family op shares (incl. the
    ``or [text]`` short-doc fallback) — the prefix-filter proof, the
    MinHash banding, and both DuckDB oracles all assume byte-identical
    gram lists, so keep this the single definition."""
    toks = text.split()
    return [" ".join(toks[i : i + k]) for i in range(max(0, len(toks) - k + 1))] or [
        text
    ]


def _shingles(text: str, k: int = 3) -> set[int]:
    return {
        int.from_bytes(hashlib.md5(g.encode()).digest()[:8], "big")
        for g in _gram_list(text, k)
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


def _band_key(chunk: np.ndarray) -> str:
    """LSH band bucket key: md5 of the band's minhash values joined as
    decimal strings (truncated to 16 hex chars). The join format is
    arbitrary — two docs share a bucket iff the 4 values are equal —
    and this form is directly expressible in the DuckDB oracle
    (``md5(string_agg(v::VARCHAR, '-' ORDER BY perm))``)."""
    return hashlib.md5(
        "-".join(str(int(v)) for v in chunk).encode()
    ).hexdigest()[:16]


def minhash_lsh_pairs(sf_dir: str, threshold: float = 0.3):
    """MinHash+LSH near-duplicate pairs with exact-Jaccard verification.

    shingle -> 32-perm minhash -> 8x4 band buckets -> bucketed co-grouped
    self-merge (pairs emitted only when an LSH bucket holds ≥2 docs —
    singleton pruning is inherent to the merge) -> distinct pairs ->
    tag-join verify. Columns: doc_a, doc_b, jaccard (rounded 6).
    Deterministic; the full chain (md5 shingles -> splitmix64 minhash ->
    decimal-join band keys -> exact hashed-shingle Jaccard) is mirrored
    by a DuckDB SQL oracle in ``__ray_entry__.oracle_sql()``.

    100-TB shuffle discipline (cf. the reference's reducer-side grouping,
    ``MDXReduplicatingReducer.java:72-153``): the corpus text is never
    materialized on the driver, and every exchange is a bucketed grouped
    pass (``functions/bucketing.py`` — no join-aggregator actor pools):

    1. pass A keys corpus texts by bucket(doc_id) and each pair SIDE by
       bucket(its doc) — the in-bucket merge attaches the text to every
       side referencing a co-located doc (the corpus streams through this
       ONE shuffle; unreferenced texts drop there);
    2. pass B keys both halves by bucket(pair) and computes the exact
       3-gram Jaccard — candidate-bounded data only."""

    from ..functions.bucketing import default_buckets

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    n_b = default_buckets()
    distinct_pairs = _lsh_candidate_pairs(ds, n_b)
    return _attach_verify_jaccard(ds, distinct_pairs, threshold, n_b)


def _lsh_candidate_pairs(ds, n_b: int, cross_parity: bool = False):
    """Shingle → minhash → LSH band buckets → in-bucket candidate pairs
    (the shared candidate stage of :func:`minhash_lsh_pairs` and
    :func:`cross_minhash_dedup`). With ``cross_parity`` the in-bucket
    self-merge keeps only pairs whose doc ids differ in parity — the
    snapshot(even)/delta(odd) split rule of :func:`incremental_dedup` —
    so a snapshot never pairs with itself (cross-corpus dedup never
    drops a delta doc for matching another delta doc)."""
    seeds = _perm_seeds()

    def to_bands(batch: pa.Table) -> pa.Table:
        """Batch-vectorized shingle -> minhash -> band keys.

        One flattened pass per batch: every doc's k-grams land in one
        array, md5 runs ONCE per unique gram (duplicate grams — within or
        across docs — are hashed once), and the 32 per-permutation mins
        for ALL docs come from a single ``np.minimum.reduceat`` over the
        doc-segmented hash array (min over duplicates equals min over the
        shingle SET, so the per-doc dedup of ``_shingles`` is not needed
        here). Oracle semantics (md5 grams, splitmix64 perms, decimal-join
        band keys) are unchanged."""
        texts = batch["text"].to_pylist()
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        grams: list[str] = []
        starts = np.empty(len(texts), dtype=np.int64)
        for j, text in enumerate(texts):
            starts[j] = len(grams)
            grams.extend(_gram_list(text))
        uniq, inv = np.unique(np.asarray(grams, dtype=object), return_inverse=True)
        uniq_h = np.fromiter(
            (
                int.from_bytes(hashlib.md5(g.encode()).digest()[:8], "big")
                for g in uniq
            ),
            dtype=np.uint64,
            count=len(uniq),
        )
        h = uniq_h[inv]  # doc-segment-ordered gram hashes
        v = _splitmix64(h[None, :] ^ seeds[:, None])  # (32, total_grams)
        sig = np.minimum.reduceat(v, starts, axis=1)  # (32, n_docs)
        doc_ids = np.repeat(ids, _BANDS)
        buckets = [
            f"{band}:{_band_key(sig[band * _ROWS_PER_BAND : (band + 1) * _ROWS_PER_BAND, d])}"
            for d in range(len(texts))
            for band in range(_BANDS)
        ]
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "bucket": pa.array(buckets, pa.string()),
            }
        )

    # ---- candidate pairs: bucketed co-grouped self-merge ----------------
    # bands rows keyed by bucket(lsh key) co-locate every doc sharing an
    # LSH band bucket; a vectorized in-bucket pandas self-merge with
    # doc_a < doc_b gives exactly the within-bucket pairs (singleton
    # buckets vanish -- their only "pair" is the self-pair the < filter
    # drops). No per-group Python calls, no join-aggregator actor pools
    # (functions/bucketing.py -- every exchange below is the same bucketed
    # grouped pass).
    from ..functions.bucketing import bucket_of

    def band_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(b=bucket_of(df["bucket"], n_b))

    def pairs_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        m = df[["bucket", "doc_id"]].merge(df[["bucket", "doc_id"]], on="bucket")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        if cross_parity:
            m = m[(m["doc_id_x"] % 2) != (m["doc_id_y"] % 2)]
        return pd.DataFrame(
            {"doc_a": m["doc_id_x"].to_numpy(), "doc_b": m["doc_id_y"].to_numpy()}
        )

    # bands are ~100x narrower than the text they come from but inherit
    # the corpus read's block count — re-pin to data size so the band
    # sort schedules over data-sized blocks (no-op at real scale)
    from ..functions.bucketing import coalesce_blocks

    raw_pairs = (
        coalesce_blocks(
            ds.map_batches(to_bands, batch_format="pyarrow").map_batches(
                band_bucket, batch_format="pandas"
            )
        )
        .groupby("b")
        .map_groups(pairs_in_bucket, batch_format="pandas")
    )

    # No standalone distinct pass: a pair rediscovered in k band buckets
    # emits k copies, but every copy of (pair, side) lands in the SAME
    # doc-bucket of the attach pass below (the bucket is a function of
    # the side's doc), so an in-bucket drop_duplicates there is exact —
    # one fewer all-to-all, and the duplicate factor is bounded by the
    # band count (8). Materialized (size-pinned) because both
    # side-taggers consume it.
    return coalesce_blocks(raw_pairs)


def cross_minhash_dedup(sf_dir: str, threshold: float = 0.3):
    """Fuzzy cross-corpus dedup — drop crawl-increment documents that
    NEAR-duplicate anything already in the snapshot (the MinHash
    analogue of :func:`incremental_dedup`'s exact-fingerprint rule;
    reference precedent for deduping an increment against the prior
    index: ``MDXReduplicatingReducer.java:72-153``). Snapshot = even
    doc_ids, delta = odd (the same split rule as incremental_dedup, so
    side is a pure function of doc_id and never needs carrying through
    an exchange).

    Chain: the shared candidate stage (:func:`_lsh_candidate_pairs`
    with ``cross_parity``, so only snapshot×delta pairs survive the
    in-bucket merge — within-side duplicates are a different op's job)
    → the shared exact-Jaccard tag-join verify → one per-batch partial
    + one bucketed fold collapsing verified matches per delta doc.
    Every exchange is candidate-bounded; the corpus text streams
    through the verify's pass A once.

    Columns: delta_id (the increment doc to drop), n_matches (verified
    snapshot near-dups), best_match (min matching snapshot doc_id).
    SQL-oracle-checked (the full splitmix64/UHUGEINT minhash mirror
    with the parity join filter)."""
    from ..functions.bucketing import (
        bucket_of,
        coalesce_blocks,
        default_buckets,
        typed_empty,
    )

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    n_b = default_buckets()
    pairs = _lsh_candidate_pairs(ds, n_b, cross_parity=True)
    verified = _attach_verify_jaccard(ds, pairs, threshold, n_b)

    def match_partials(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return typed_empty(
                delta_id="int64", n="int64", snap_min="int64", bucket="int32"
            )
        a = df["doc_a"].to_numpy(dtype="int64")
        b = df["doc_b"].to_numpy(dtype="int64")
        a_odd = (a % 2) == 1
        delta = np.where(a_odd, a, b)
        snap = np.where(a_odd, b, a)
        part = (
            pd.DataFrame({"delta_id": delta, "snap": snap})
            .groupby("delta_id", sort=False)["snap"]
            .agg(["count", "min"])
            .reset_index()
        )
        return pd.DataFrame(
            {
                "delta_id": part["delta_id"].astype("int64"),
                "n": part["count"].astype("int64"),
                "snap_min": part["min"].astype("int64"),
                "bucket": bucket_of(part["delta_id"].astype("int64"), n_b),
            }
        )

    def fold_matches(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return typed_empty(
                delta_id="int64", n_matches="int64", best_match="int64"
            )
        g = df.groupby("delta_id", sort=False).agg(
            n_matches=("n", "sum"), best_match=("snap_min", "min")
        )
        return pd.DataFrame(
            {
                "delta_id": g.index.to_numpy().astype("int64"),
                "n_matches": g["n_matches"].to_numpy().astype("int64"),
                "best_match": g["best_match"].to_numpy().astype("int64"),
            }
        )

    partials = coalesce_blocks(
        verified.map_batches(match_partials, batch_format="pandas")
    )
    return partials.groupby("bucket").map_groups(
        fold_matches, batch_format="pandas"
    )


def _attach_pair_texts(ds, distinct_pairs, n_b: int):
    """Shared tag-join text-attach stage (no driver/corpus
    materialization) — the first half of every candidate-pair verify
    (:func:`_attach_verify_jaccard`'s Jaccard,
    :func:`edit_distance_pairs`' Levenshtein).

    Two bucketed co-group passes replace three hash joins with the SAME
    shuffle discipline: pass A keys corpus texts by bucket(doc_id) and
    each pair SIDE by bucket(its doc) -- the in-bucket merge attaches
    the text to every side referencing a co-located doc (texts of
    unreferenced docs drop there, the semi-join's effect); the returned
    dataset is keyed by bucket(pair) so one more ``groupby("bucket")``
    co-locates a pair's two sides (side==1 carries doc_a's text, side==2
    doc_b's). The corpus text streams through pass A once; the output
    ships only candidate-bounded data. Exact (pair, side) dedup happens
    inside the attach bucket — all copies of a rediscovered pair land
    there, so ``distinct_pairs`` may carry duplicates.
    """
    from ..functions.bucketing import bucket_of, coalesce_blocks

    def tag_texts(df: pd.DataFrame) -> pd.DataFrame:
        key = df["doc_id"].astype("int64")
        return pd.DataFrame(
            {
                "key": key,
                "doc_a": np.full(len(df), -1, dtype="int64"),
                "doc_b": np.full(len(df), -1, dtype="int64"),
                "side": np.zeros(len(df), dtype="int64"),
                "text": df["text"],
                "bucket": bucket_of(key, n_b),
            }
        )

    def tag_side(col: str, side: int):
        def tag(df: pd.DataFrame) -> pd.DataFrame:
            key = df[col].astype("int64")
            return pd.DataFrame(
                {
                    "key": key,
                    "doc_a": df["doc_a"].astype("int64"),
                    "doc_b": df["doc_b"].astype("int64"),
                    "side": np.full(len(df), side, dtype="int64"),
                    "text": pd.Series([""] * len(df), dtype=object, index=df.index),
                    "bucket": bucket_of(key, n_b),
                }
            )

        return tag

    def attach_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        texts = df[df["side"] == 0][["key", "text"]]
        # exact pair dedup lives here (see distinct_pairs note): all
        # copies of a (pair, side) row share this bucket
        sides = df[df["side"] > 0][
            ["key", "doc_a", "doc_b", "side"]
        ].drop_duplicates()
        m = sides.merge(texts, on="key", how="inner")
        out = m[["doc_a", "doc_b", "side", "text"]].copy()
        out["bucket"] = bucket_of(out["doc_a"] * 1_000_003 + out["doc_b"], n_b)
        return out

    tagged = (
        coalesce_blocks(ds.map_batches(tag_texts, batch_format="pandas"))
        .union(distinct_pairs.map_batches(tag_side("doc_a", 1), batch_format="pandas"))
        .union(distinct_pairs.map_batches(tag_side("doc_b", 2), batch_format="pandas"))
    )
    return coalesce_blocks(
        tagged.groupby("bucket").map_groups(attach_in_bucket, batch_format="pandas")
    )


def _attach_verify_jaccard(ds, distinct_pairs, threshold: float, n_b: int):
    """Tag-join exact-Jaccard verify over :func:`_attach_pair_texts` —
    consumed by ``minhash_lsh_pairs``; ``ngram_jaccard_pairs`` uses the
    same two-pass tag-join SHAPE but attaches precomputed gram-hash
    signatures instead of text (its candidate count makes per-pair
    re-shingling the hot loop)."""

    def verify_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        a = df[df["side"] == 1][["doc_a", "doc_b", "text"]].rename(
            columns={"text": "text_a"}
        )
        b = df[df["side"] == 2][["doc_a", "doc_b", "text"]].rename(
            columns={"text": "text_b"}
        )
        m = a.merge(b, on=["doc_a", "doc_b"])
        out = []
        for da, db, ta, tb in zip(m["doc_a"], m["doc_b"], m["text_a"], m["text_b"]):
            sa = _shingles(ta)
            sb = _shingles(tb)
            j = len(sa & sb) / len(sa | sb) if sa | sb else 0.0
            if j >= threshold:
                out.append({"doc_a": int(da), "doc_b": int(db), "jaccard": round(j, 6)})
        return pd.DataFrame(out, columns=["doc_a", "doc_b", "jaccard"])

    return _attach_pair_texts(ds, distinct_pairs, n_b).groupby("bucket").map_groups(
        verify_in_bucket, batch_format="pandas"
    )


def edit_distance_pairs(sf_dir: str):
    """Exact edit-distance verification of LSH candidate pairs — the
    Levenshtein analogue of :func:`minhash_lsh_pairs`' Jaccard verify
    (the fuzzy-match census a dedup triage runs when token-set overlap
    is too coarse: near-identical boilerplate with small in-place edits
    scores high here even when reordering kills Jaccard).

    Candidates come from the SAME shared MinHash+LSH stage
    (:func:`_lsh_candidate_pairs`); texts attach through the shared
    two-pass tag-join (:func:`_attach_pair_texts` — the corpus shuffles
    once, pair data is candidate-bounded); the per-pair kernel is the
    byte-level Levenshtein DP (``functions.fuzzy.levenshtein_bytes``,
    vectorized one DP row at a time over uint8 arrays — UTF-8 BYTE
    edits, matching DuckDB's byte-based ``levenshtein``). Per-pair cost
    is O(|a|·|b|/w) vector ops on candidate-bounded pairs only — the
    corpus itself is never pairwise-compared.

    Columns: doc_a, doc_b, dist (int64 byte edits), sim_ppm (exact
    integer parts-per-million similarity ``(denom − dist)·10⁶ //
    denom`` with ``denom = max(octet_len_a, octet_len_b)``; the
    both-empty pair pins to 1_000_000). A float ``1 − dist/denom``
    would hit REAL decimal ties (denom a power of two ⇒ exact
    ...5×10⁻⁷ values) where numpy banker's and DuckDB half-away-from-
    zero rounding disagree — the integer floor division is engine-exact
    by construction. SQL-oracle-checked: the DuckDB mirror replays the
    full candidate chain and verifies with its native ``levenshtein``."""
    from ..functions.bucketing import default_buckets
    from ..functions.fuzzy import levenshtein_bytes

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    n_b = default_buckets()
    pairs = _lsh_candidate_pairs(ds, n_b)

    def verify_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        a = df[df["side"] == 1][["doc_a", "doc_b", "text"]].rename(
            columns={"text": "text_a"}
        )
        b = df[df["side"] == 2][["doc_a", "doc_b", "text"]].rename(
            columns={"text": "text_b"}
        )
        m = a.merge(b, on=["doc_a", "doc_b"])
        out = []
        for da, db, ta, tb in zip(m["doc_a"], m["doc_b"], m["text_a"], m["text_b"]):
            ba, bb = ta.encode("utf-8"), tb.encode("utf-8")
            dist = levenshtein_bytes(ba, bb)
            denom = max(len(ba), len(bb))
            sim_ppm = (
                1_000_000 if denom == 0 else ((denom - dist) * 1_000_000) // denom
            )
            out.append(
                {
                    "doc_a": int(da),
                    "doc_b": int(db),
                    "dist": dist,
                    "sim_ppm": sim_ppm,
                }
            )
        res = pd.DataFrame(out, columns=["doc_a", "doc_b", "dist", "sim_ppm"])
        return res.astype(
            {"doc_a": "int64", "doc_b": "int64", "dist": "int64", "sim_ppm": "int64"}
        )

    return _attach_pair_texts(ds, pairs, n_b).groupby("bucket").map_groups(
        verify_in_bucket, batch_format="pandas"
    )


def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.3):
    """Exact n-gram Jaccard near-duplicate pairs via df-ordered prefix
    filtering — EVERY pair with 3-gram Jaccard >= threshold, no LSH
    false negatives; the exact counterpart of ``minhash_lsh_pairs``
    (Bayardo, Ma & Srikant, "Scaling Up All Pairs Similarity Search",
    WWW'07 prefix-filter lemma).

    Chain (each exchange a bucketed grouped pass, cf. module docstring):

    1. distinct md5-hex16 3-gram shingles per doc — zero-shuffle, one
       flattened ``np.unique`` pass per batch, md5 once per unique gram;
    2. global document frequency per gram — ONE pass keyed by
       bucket(gram): the bucket holds every row of a gram, so the
       in-bucket ``transform('size')`` IS the global df;
    3. per-doc prefix selection keyed by bucket(doc): under the total
       order (df asc, gram asc), keep each doc's first
       ``|A| - ceil(t|A|) + 1`` grams. Lemma: for any pair with
       J >= t, the SMALLEST shared gram has rank <= |A| - |A∩B| + 1
       <= |A| - ceil(t|A|) + 1 in both docs, so it lies in both
       prefixes — a self-join on prefix grams is complete;
    4. in-bucket self-merge on prefix grams -> candidate pairs (the
       attach pass dedups rediscovered pairs in-bucket);
    5. signature-based exact-Jaccard verify: per-doc sorted-unique
       uint64 signatures derived from the SAME gram table (no second
       tokenize/md5 pass), attached through the minhash-style tag-join
       shape, one ``np.intersect1d`` per candidate pair.

    100-TB skew note: this never self-joins on hot grams — a stop-gram
    (high df) sorts to the END of every doc's order and falls out of the
    prefix index, so candidate fan-out is governed by the rare-gram df
    distribution, not the stopword one. Threshold arithmetic is exact
    (``Fraction``), so prefix lengths never suffer float-ceil edges.
    Mirrored by a DuckDB oracle that generates candidates from ANY
    shared gram — the lemma guarantees identical qualifying output.
    """
    from fractions import Fraction

    from ..functions.bucketing import bucket_of, coalesce_blocks, default_buckets

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    n_b = default_buckets()
    tf = Fraction(str(threshold))
    num, den = tf.numerator, tf.denominator

    def to_grams(batch: pa.Table) -> pa.Table:
        """(doc_id, gram-hex16) rows, distinct within doc — vectorized:
        one flattened gram list, md5 once per batch-unique gram, per-doc
        dedup via a single np.unique over (doc_index, gram_index) keys."""
        texts = batch["text"].to_pylist()
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        grams: list[str] = []
        counts = np.empty(len(texts), dtype=np.int64)
        for j, text in enumerate(texts):
            gl = _gram_list(text)
            grams.extend(gl)
            counts[j] = len(gl)
        uniq, inv = np.unique(np.asarray(grams, dtype=object), return_inverse=True)
        hexes = np.asarray(
            [hashlib.md5(g.encode()).hexdigest()[:16] for g in uniq], dtype=object
        )
        doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
        key = np.unique(doc_idx * np.int64(len(uniq)) + inv)
        return pa.table(
            {
                "doc_id": pa.array(ids[key // len(uniq)], pa.int64()),
                "g": pa.array(hexes[key % len(uniq)], pa.string()),
            }
        )

    def df_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "g": df["g"].to_numpy(),
                "df": df.groupby("g")["g"].transform("size").to_numpy(),
            }
        )

    def prefix_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["doc_id", "df", "g"], ignore_index=True)
        sz = df.groupby("doc_id")["g"].transform("size").to_numpy()
        rank = df.groupby("doc_id").cumcount().to_numpy()
        # sz - ceil(t*sz) + 1, with ceil(a/b) = -((-a)//b) in exact ints
        keep_len = sz - (-(((-num) * sz) // den)) + 1
        keep = rank < keep_len
        # rank + sz ride along for the PPJoin length/positional filters
        out = df.loc[keep, ["doc_id", "g"]].copy()
        out["pos"] = rank[keep]
        out["sz"] = sz[keep]
        return out

    def pairs_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        """Self-merge on prefix grams + the two PPJoin candidate filters
        (Xiao et al., "Efficient Similarity Joins for Near Duplicate
        Detection", WWW'08) — both provably output-preserving:

        * length filter: J >= t needs min(|A|,|B|) >= t*max(|A|,|B|)
          (exact ints: min*den >= max*num);
        * positional filter: every shared gram of a qualifying pair sits
          at rank >= the match's rank in BOTH df-orders, so the overlap
          I <= min(|A|-pa, |B|-pb); J >= t needs
          I >= alpha = ceil(t/(1+t)*(|A|+|B|)). For the pair's SMALLEST
          shared gram (which the prefix lemma puts in both prefixes) the
          bound is tight-enough by construction, so at least one bucket
          keeps every qualifying pair while non-qualifying matches drop
          at generation time instead of riding two more exchanges."""
        m = df.merge(df, on="g")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        sx = m["sz_x"].to_numpy()
        sy = m["sz_y"].to_numpy()
        lo = np.minimum(sx, sy)
        hi = np.maximum(sx, sy)
        alpha = -((-(num * (sx + sy))) // (num + den))
        ub = np.minimum(sx - m["pos_x"].to_numpy(), sy - m["pos_y"].to_numpy())
        m = m[(lo * den >= hi * num) & (ub >= alpha)]
        return pd.DataFrame(
            {"doc_a": m["doc_id_x"].to_numpy(), "doc_b": m["doc_id_y"].to_numpy()}
        ).drop_duplicates(ignore_index=True)

    grams = coalesce_blocks(ds.map_batches(to_grams, batch_format="pyarrow"))
    with_df = (
        grams.map_batches(
            lambda df: df.assign(b=bucket_of(df["g"], n_b)), batch_format="pandas"
        )
        .groupby("b")
        .map_groups(df_in_bucket, batch_format="pandas")
    )
    prefixes = (
        coalesce_blocks(with_df)
        .map_batches(
            lambda df: df.assign(b=bucket_of(df["doc_id"], n_b)),
            batch_format="pandas",
        )
        .groupby("b")
        .map_groups(prefix_in_bucket, batch_format="pandas")
    )
    raw_pairs = (
        coalesce_blocks(prefixes)
        .map_batches(
            lambda df: df.assign(b=bucket_of(df["g"], n_b)), batch_format="pandas"
        )
        .groupby("b")
        .map_groups(pairs_in_bucket, batch_format="pandas")
    )
    distinct_pairs = coalesce_blocks(raw_pairs)

    # ---- signature attach + vectorized verify ---------------------------
    # Unlike the LSH chain (few hundred candidates -> text attach +
    # per-pair re-shingling is fine), the exact chain at a low threshold
    # can carry 10^5-10^6 candidates, so the verify must not re-tokenize
    # or re-hash per PAIR — or at all: each doc's sorted-unique uint64
    # gram-hash SIGNATURE is derived from the gram table the chain has
    # ALREADY built (hex16 == the first 8 md5 bytes, so int(hex, 16)
    # reproduces `_shingles`'s values without a second md5 pass over the
    # corpus), shipped as one binary value through the same two bucketed
    # attach/verify passes, and each pair costs one np.intersect1d over
    # two sorted arrays. np.unique (not just sort) because uniqueness
    # must hold POST-hash — a 64-bit gram collision inside a doc would
    # otherwise violate intersect1d's assume_unique and diverge from the
    # oracle's DISTINCT-on-hash semantics.

    def sigs_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("doc_id", kind="mergesort", ignore_index=True)
        ids = df["doc_id"].to_numpy()
        h = np.fromiter(
            (int(x, 16) for x in df["g"].to_numpy()),
            dtype=np.uint64,
            count=len(df),
        )
        first = np.flatnonzero(np.diff(ids, prepend=ids[0] - 1))
        bounds = np.append(first, len(ids))
        out_ids = ids[first].astype(np.int64)
        sigs = [
            np.unique(h[s:e2]).tobytes()
            for s, e2 in zip(bounds[:-1], bounds[1:])
        ]
        return pd.DataFrame(
            {
                "key": out_ids,
                "doc_a": np.full(len(out_ids), -1, dtype="int64"),
                "doc_b": np.full(len(out_ids), -1, dtype="int64"),
                "side": np.zeros(len(out_ids), dtype="int64"),
                "sig": pd.Series(sigs, dtype=object),
                "bucket": bucket_of(pd.Series(out_ids), n_b),
            }
        )

    sig_rows = (
        grams.map_batches(
            lambda df: df.assign(b=bucket_of(df["doc_id"], n_b)),
            batch_format="pandas",
        )
        .groupby("b")
        .map_groups(sigs_in_bucket, batch_format="pandas")
    )

    def tag_side(col: str, side: int):
        def tag(df: pd.DataFrame) -> pd.DataFrame:
            key = df[col].astype("int64")
            return pd.DataFrame(
                {
                    "key": key,
                    "doc_a": df["doc_a"].astype("int64"),
                    "doc_b": df["doc_b"].astype("int64"),
                    "side": np.full(len(df), side, dtype="int64"),
                    "sig": pd.Series([b""] * len(df), dtype=object, index=df.index),
                    "bucket": bucket_of(key, n_b),
                }
            )

        return tag

    def attach_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        sigs_ = df[df["side"] == 0][["key", "sig"]]
        # exact cross-bucket pair dedup lives here: every copy of a
        # (pair, side) row shares this bucket (function of the side doc)
        sides = df[df["side"] > 0][
            ["key", "doc_a", "doc_b", "side"]
        ].drop_duplicates()
        m = sides.merge(sigs_, on="key", how="inner")
        out = m[["doc_a", "doc_b", "side", "sig"]].copy()
        out["bucket"] = bucket_of(out["doc_a"] * 1_000_003 + out["doc_b"], n_b)
        return out

    def verify_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        a = df[df["side"] == 1][["doc_a", "doc_b", "sig"]].rename(
            columns={"sig": "sig_a"}
        )
        b = df[df["side"] == 2][["doc_a", "doc_b", "sig"]].rename(
            columns={"sig": "sig_b"}
        )
        m = a.merge(b, on=["doc_a", "doc_b"])
        out = []
        for da, db, sa, sb in zip(m["doc_a"], m["doc_b"], m["sig_a"], m["sig_b"]):
            xa = np.frombuffer(sa, dtype=np.uint64)
            xb = np.frombuffer(sb, dtype=np.uint64)
            i = np.intersect1d(xa, xb, assume_unique=True).size
            u = xa.size + xb.size - i
            j = i / u if u else 0.0
            if j >= threshold:
                out.append({"doc_a": int(da), "doc_b": int(db), "jaccard": round(j, 6)})
        return pd.DataFrame(out, columns=["doc_a", "doc_b", "jaccard"])

    tagged = (
        coalesce_blocks(sig_rows)
        .union(distinct_pairs.map_batches(tag_side("doc_a", 1), batch_format="pandas"))
        .union(distinct_pairs.map_batches(tag_side("doc_b", 2), batch_format="pandas"))
    )
    attached = coalesce_blocks(
        tagged.groupby("bucket").map_groups(attach_in_bucket, batch_format="pandas")
    )
    return attached.groupby("bucket").map_groups(
        verify_in_bucket, batch_format="pandas"
    )


def simhash_batch(texts) -> list[str]:
    """Vectorised 64-bit token-weighted SimHash for a sequence of texts.

    One md5 per UNIQUE token in the batch (tokens repeat heavily across a
    corpus batch), then a single ±1 bit-matrix gather-sum per document —
    no per-token × per-bit Python loop. Bit semantics identical to the
    scalar definition: bit b of the signature is 1 iff
    sum over tokens of (±1 where token-hash bit b) > 0."""
    # batch vocabulary
    tok_lists = [t.split() for t in texts]
    vocab: dict[str, int] = {}
    for toks in tok_lists:
        for t in toks:
            if t not in vocab:
                vocab[t] = len(vocab)
    if vocab:
        h = np.fromiter(
            (
                int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
                for t in vocab
            ),
            dtype=np.uint64,
            count=len(vocab),
        )
        # (n_vocab, 64) ±1 matrix: column b = bit b of the token hash
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
            np.int64
        )
        pm = 2 * bits - 1
    weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))
    out = []
    for toks in tok_lists:
        if not toks:
            out.append(f"{0:016x}")
            continue
        idx = np.fromiter((vocab[t] for t in toks), dtype=np.int64, count=len(toks))
        acc = pm[idx].sum(axis=0)
        sig = int((weights * (acc > 0).astype(np.uint64)).sum(dtype=np.uint64))
        out.append(f"{sig:016x}")
    return out


def simhash_signatures(sf_dir: str):
    """64-bit SimHash per document (token-weighted). Columns: doc_id,
    simhash (16-char hex). Deterministic; SQL-oracle-checked."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def simhash(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": df["doc_id"], "simhash": simhash_batch(df["text"])}
        )

    return ds.map_batches(simhash, batch_format="pandas")


def embedding_neardup_pairs(sf_dir: str, threshold: float = 0.25):
    """Embedding-cosine near-dup pairs, label-bucketed (IVF-style).

    ``groupby(label)`` co-locates each coarse bucket; within-bucket pairwise
    cosine runs as one numpy matmul per group. Cross-bucket near-dups are
    missed by construction (documented approximation — the exact variant is
    an all-pairs O(n^2) shuffle). Columns: vec_a, vec_b, cos (rounded 6)."""
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        # tiled upper-triangle matmul: peak memory is one B×B tile, not
        # the full n×n similarity matrix — a hot label stays one task
        # (the group must co-locate) but its memory is bounded
        B = 2048
        ids = df["vec_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        mat = np.stack(df["embedding"].to_numpy()[order]).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        mat = mat / norms[:, None]
        n = len(ids)
        out_a, out_b, out_c = [], [], []
        for i0 in range(0, n, B):
            ai = mat[i0 : i0 + B]
            for j0 in range(i0, n, B):
                sims = ai @ mat[j0 : j0 + B].T
                ia, ib = np.nonzero(sims >= threshold)
                gi, gj = ia + i0, ib + j0
                keep = gi < gj  # upper triangle across tiles
                out_a.append(ids[gi[keep]])
                out_b.append(ids[gj[keep]])
                out_c.append(np.round(sims[ia[keep], ib[keep]], 6))
        return pd.DataFrame(
            {
                "vec_a": np.concatenate(out_a) if out_a else np.array([], np.int64),
                "vec_b": np.concatenate(out_b) if out_b else np.array([], np.int64),
                "cos": np.concatenate(out_c) if out_c else np.array([], np.float64),
            }
        )

    return ds.groupby("label").map_groups(pairs, batch_format="pandas")


def cluster_representatives(clusters_ds, quality_ds):
    """Quality-argmax representative selection per near-dup cluster —
    the fuzzy-dedup keep rule a curation pipeline actually wants (keep
    the BEST document of each duplicate group, not the arbitrary
    min-id): within every cluster from :func:`neardup_clusters`, the
    representative is the doc with the highest ``distinct_ratio``
    (doc_id ascending on ties).

    ``clusters_ds``: (doc_id, cluster_id); ``quality_ds``: (doc_id,
    distinct_ratio). Shape: TWO bucketed grouped passes — attach the
    quality score where doc_id co-locates, then the per-cluster argmax
    where cluster_id co-locates; no broadcast (the cluster set is
    corpus-sized). Columns: doc_id, cluster_id, distinct_ratio, is_rep."""
    from ..functions.bucketing import bucket_of, default_buckets

    n_b = default_buckets()

    def tag_clusters(df: pd.DataFrame) -> pd.DataFrame:
        did = df["doc_id"].astype("int64")
        return pd.DataFrame(
            {
                "doc_id": did,
                "cluster_id": df["cluster_id"].astype("int64"),
                "distinct_ratio": np.zeros(len(df), dtype="float64"),
                "side": np.zeros(len(df), dtype="int64"),
                "bucket": bucket_of(did, n_b),
            }
        )

    def tag_quality(df: pd.DataFrame) -> pd.DataFrame:
        did = df["doc_id"].astype("int64")
        return pd.DataFrame(
            {
                "doc_id": did,
                "cluster_id": np.full(len(df), -1, dtype="int64"),
                "distinct_ratio": df["distinct_ratio"].astype("float64"),
                "side": np.ones(len(df), dtype="int64"),
                "bucket": bucket_of(did, n_b),
            }
        )

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        c = df[df["side"] == 0][["doc_id", "cluster_id"]]
        q = df[df["side"] == 1][["doc_id", "distinct_ratio"]]
        m = c.merge(q, on="doc_id", how="inner")
        m["bucket"] = bucket_of(m["cluster_id"], n_b)
        return m

    def argmax_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(
            ["cluster_id", "distinct_ratio", "doc_id"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        first = ~d["cluster_id"].duplicated()
        return pd.DataFrame(
            {
                "doc_id": d["doc_id"].to_numpy(),
                "cluster_id": d["cluster_id"].to_numpy(),
                "distinct_ratio": d["distinct_ratio"].to_numpy(),
                "is_rep": first.to_numpy(),
            }
        )

    from ..functions.bucketing import coalesce_blocks

    # both sides are narrow id/score streams that inherit the corpus
    # read's block count — re-pin to data size before each exchange
    tagged = coalesce_blocks(
        clusters_ds.map_batches(tag_clusters, batch_format="pandas").union(
            quality_ds.map_batches(tag_quality, batch_format="pandas")
        )
    )
    joined = coalesce_blocks(
        tagged.groupby("bucket").map_groups(attach, batch_format="pandas")
    )
    return joined.groupby("bucket").map_groups(
        argmax_in_bucket, batch_format="pandas"
    )


def neardup_dedup_apply(clusters_ds, docs_ds):
    """APPLY step of MinHash fuzzy dedup — produce the deduplicated
    corpus, not just labels: for every connected component from
    :func:`neardup_clusters`, keep the min-id representative (the
    component's ``cluster_id`` by construction) and emit it with the
    component size and the kept document's content hash, proving the
    corpus surgery end to end (the analogue of
    :func:`exact_substring_dedup_apply` for the fuzzy chain; exact
    dedup's keep rule precedent:
    ``MDXReduplicatingReducer.java:72-153`` exemplar-per-digest).

    ``clusters_ds``: (doc_id, cluster_id); ``docs_ds``: (doc_id, text).
    Shape: one per-batch partial count (cluster sizes combine inside
    ``map_batches``, so the fold exchange carries one row per distinct
    (batch, cluster) not per doc) + one bucketed fold, then one bucketed
    co-group attaching the kept doc's text hash where doc_id co-locates
    — no broadcast (the keep-list is corpus-sized at 100 TB), documents
    shuffle only their md5, never their text. Columns: doc_id,
    n_merged, text_md5. SQL-oracle-checked (recursive-CTE reachability
    over the same materialized pair set + DuckDB ``md5``)."""
    from ..functions.bucketing import (
        bucket_of,
        coalesce_blocks,
        default_buckets,
        typed_empty,
    )

    n_b = default_buckets()

    def size_partials(df: pd.DataFrame) -> pd.DataFrame:
        cid = df["cluster_id"].astype("int64")
        g = cid.value_counts().sort_index()
        out = pd.DataFrame(
            {"cluster_id": g.index.to_numpy(), "n": g.to_numpy().astype("int64")}
        )
        out["bucket"] = bucket_of(out["cluster_id"], n_b)
        return out

    def fold_sizes(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return typed_empty(
                doc_id="int64",
                n_merged="int64",
                side="int64",
                text_md5=str,
                bucket="int32",
            )
        g = df.groupby("cluster_id", sort=False)["n"].sum()
        did = g.index.to_numpy().astype("int64")
        return pd.DataFrame(
            {
                "doc_id": did,
                "n_merged": g.to_numpy().astype("int64"),
                "side": np.zeros(len(g), dtype="int64"),
                "text_md5": np.full(len(g), "", dtype=object),
                "bucket": bucket_of(pd.Series(did), n_b).to_numpy(),
            }
        )

    def tag_docs(df: pd.DataFrame) -> pd.DataFrame:
        md5s = [
            hashlib.md5(t.encode("utf-8")).hexdigest() for t in df["text"].tolist()
        ]
        did = df["doc_id"].astype("int64")
        return pd.DataFrame(
            {
                "doc_id": did.to_numpy(),
                "n_merged": np.full(len(df), -1, dtype="int64"),
                "side": np.ones(len(df), dtype="int64"),
                "text_md5": md5s,
                "bucket": bucket_of(did, n_b).to_numpy(),
            }
        )

    def join_kept(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return typed_empty(doc_id="int64", n_merged="int64", text_md5=str)
        kept = df[df["side"] == 0][["doc_id", "n_merged"]]
        docs = df[df["side"] == 1][["doc_id", "text_md5"]]
        return kept.merge(docs, on="doc_id", how="inner")

    sizes = coalesce_blocks(
        clusters_ds.map_batches(size_partials, batch_format="pandas")
    )
    # fold buckets by cluster_id; fold_sizes re-buckets its output by the
    # kept doc_id (== cluster_id, same hash — the exchange key is reused)
    folded = sizes.groupby("bucket").map_groups(fold_sizes, batch_format="pandas")
    tagged = coalesce_blocks(
        folded.union(docs_ds.map_batches(tag_docs, batch_format="pandas"))
    )
    return (
        tagged.groupby("bucket")
        .map_groups(join_kept, batch_format="pandas")
        .select_columns(["doc_id", "n_merged", "text_md5"])
    )


def semdedup_keep(sf_dir: str, threshold: float = 0.35):
    """SemDeDup-style embedding dedup keep-list (Abbas et al. 2023,
    reduced to the deterministic min-id rule): within each coarse
    cluster (the ``label`` IVF bucket, as :func:`embedding_neardup_pairs`),
    a vector is DROPPED when any lower-id vector in the same cluster has
    cosine similarity >= ``threshold`` — keeping exactly one canonical
    representative per greedy similarity chain. The published variant
    picks the representative by distance-to-centroid; the min-id rule is
    the deterministic equivalent used here so the kept set is
    reproducible and SQL-mirrorable.

    Scale shape: ``groupby(label)`` co-locates each coarse bucket (ONE
    exchange); within-bucket comparison is the same tiled upper-triangle
    matmul as the pair op — peak memory one B x B tile. Cross-cluster
    near-dups are missed by construction (documented IVF approximation).
    Columns: vec_id, label, n_prior_dups, keep."""
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])

    def keep_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        B = 2048
        ids = df["vec_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        label = df["label"].to_numpy()[order]
        mat = np.stack(df["embedding"].to_numpy()[order]).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        mat = mat / norms[:, None]
        n = len(ids)
        n_prior = np.zeros(n, dtype=np.int64)
        for i0 in range(0, n, B):
            ai = mat[i0 : i0 + B]
            for j0 in range(i0, n, B):
                sims = ai @ mat[j0 : j0 + B].T
                ia, ib = np.nonzero(sims >= threshold)
                gi, gj = ia + i0, ib + j0
                hit = gi < gj  # strict upper triangle: prior = lower id
                np.add.at(n_prior, gj[hit], 1)
        return pd.DataFrame(
            {
                "vec_id": ids,
                "label": label,
                "n_prior_dups": n_prior,
                "keep": n_prior == 0,
            }
        )

    return ds.groupby("label").map_groups(keep_in_bucket, batch_format="pandas")


def reduplicate(ds, batch_format: str = "pyarrow"):
    """J3: hash-keyed reduplication — group records by payload digest; the
    first ``response`` (lowest timestamp14, then url — iteration order is
    pinned, where the reference relies on Hadoop value order) is the
    exemplar; each ``revisit`` merges the exemplar's fields under its own
    (its keys win) and becomes record_type=``reduplicated``; unresolved
    revisits pass through. Non-revisit records pass through unchanged.

    Reference: ``MDXReduplicatingReducer.java:72-153``."""

    from ..functions.bucketing import bucket_of, default_buckets

    n_b = default_buckets()

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(bucket=bucket_of(df["digest"], n_b))

    def fix_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized across EVERY digest in the bucket (per-digest
        # map_groups pays one Python call per distinct content hash —
        # functions/bucketing.py): exemplar = first response per digest by
        # (timestamp14, url); revisit fields keep their own values unless
        # null, where the exemplar's fill in via a digest-keyed map
        df = df.drop(columns=["bucket"]).sort_values(
            ["digest", "timestamp14", "url"], kind="mergesort"
        )
        exemplars = df[df["record_type"] == "response"].drop_duplicates(
            "digest", keep="first"
        ).set_index("digest", drop=False)
        rev = df["record_type"] == "revisit"
        fixable = rev & df["digest"].isin(exemplars.index)
        if not fixable.any():
            return df
        out = df.copy()
        dig = out.loc[fixable, "digest"]
        for col in df.columns:
            vals = out.loc[fixable, col]
            out.loc[fixable, col] = vals.where(vals.notna(), dig.map(exemplars[col]))
        out.loc[fixable, "record_type"] = "reduplicated"
        return out

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(fix_bucket, batch_format="pandas")
    )


def neardup_clusters(pairs_ds, nodes_ds, *, max_iters: int = 64, stats: dict | None = None):
    """Connected components over a near-dup pair list: every document gets
    the MINIMUM doc_id reachable through the pair graph (hash-min label
    propagation WITH pointer-doubling shortcutting — the BSP
    connected-components algorithm bounded at O(log n) rounds instead of
    O(component diameter); cf. Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC'14, whose star operations this
    shortcut+min round is equivalent to on a parent-pointer forest).

    ``pairs_ds``: Dataset with (doc_a, doc_b); ``nodes_ds``: Dataset with
    (doc_id) covering every node (unpaired docs become singleton
    clusters). The ITERATION touches only edge ENDPOINTS — labels are
    initialised from the distinct sources of the (bidirected) edge list,
    so per-round data is bounded by the LSH-verified pair set, not the
    corpus; nodes in no pair never enter the loop and are attached as
    singleton clusters by ONE final bucketed anti-join pass. Each
    iteration chains THREE bucketed grouped passes in ONE streaming
    execution — (1) pointer doubling: label[u] <- label[label[u]]
    via a co-group of (label[u] -> u) requests with (doc_id -> label) rows
    (label values are always doc_ids of the same component, so the lookup
    always resolves); (2) a co-grouped edge⨝label merge (edges keyed by
    bucket(src), labels by bucket(doc_id): same hash, so a vectorized
    in-bucket pandas merge routes the labels); (3) a bucketed grouped min.
    Labels are monotone nonincreasing and always
    ids within the component, so at the ``changed == 0`` fixpoint every
    edge is label-uniform and each component carries its min doc_id.
    A path graph of n nodes converges in O(log n) rounds (each round at
    least doubles the hop radius a label has travelled) — see the
    chain-graph pin in tests/test_operators.py. Columns: doc_id, cluster_id.
    ``stats``, when given, records {"iterations": n} for tests/audits."""
    from ..functions.bucketing import bucket_of, default_buckets

    n_b = default_buckets()

    # every per-iteration exchange is a BUCKETED grouped pass
    # (functions/bucketing.py): Dataset.join spins an aggregator actor
    # pool per call, and a raw-key groupby walks every node in Python —
    # at a few-second iteration cadence both dominate the loop. Instead
    # the edge⨝label routing itself runs as a co-group: edges keyed by
    # bucket(src) and labels by bucket(doc_id) share the hash, so a
    # vectorized in-bucket merge emits the propagated labels.

    def both_dirs(batch: pa.Table) -> pa.Table:
        a = batch["doc_a"].cast(pa.int64())
        b = batch["doc_b"].cast(pa.int64())
        src = pa.concat_arrays([a.combine_chunks(), b.combine_chunks()])
        dst = pa.concat_arrays([b.combine_chunks(), a.combine_chunks()])
        t = pd.DataFrame({"key": src.to_numpy(), "dst": dst.to_numpy()})
        t["bucket"] = bucket_of(t["key"], n_b)
        return pa.Table.from_pandas(t, preserve_index=False)

    # edge rows: (key=src, dst, bucket(src)); label rows ride along with
    # dst = -1 (doc ids are non-negative, so the marker needs no nulls
    # and everything stays int64)
    edges = pairs_ds.map_batches(both_dirs, batch_format="pyarrow").materialize()
    # row-aware block pinning: upstream bucketed passes leave the (tiny,
    # candidate-bounded) pair table scattered over dozens of near-empty
    # blocks, and every per-iteration sort would schedule over all of
    # them — size block count to the data (~256k int64 rows per block),
    # never above what the upstream produced
    n_edge_blocks = max(1, min(edges.num_blocks(), -(-edges.count() // 262_144)))
    if n_edge_blocks < edges.num_blocks():
        edges = edges.repartition(n_edge_blocks).materialize()

    def init_labels(df: pd.DataFrame) -> pd.DataFrame:
        # candidate-bounded: only edge endpoints iterate. Local (per-block)
        # distinct is enough — cross-block duplicate (u, u) rows collapse
        # in the first round's grouped min without changing any label.
        u = df["key"].drop_duplicates().to_numpy()
        return pd.DataFrame({"doc_id": u, "label": u})

    labels = edges.map_batches(init_labels, batch_format="pandas").materialize()
    # stable per-iteration block count: unions and bucketed sorts multiply
    # block counts (~2x per round), which compounds across iterations into
    # quadratic sort scheduling — re-pin the label table to the input's
    # block count after every round
    n_label_blocks = max(1, labels.num_blocks())

    def tag_labels(df: pd.DataFrame) -> pd.DataFrame:
        # column order must match edges_l exactly (union aligns schemas)
        key = df["doc_id"].astype("int64")
        return pd.DataFrame(
            {
                "key": key,
                "dst": np.full(len(df), -1, dtype="int64"),
                "bucket": bucket_of(key, n_b),
                "label": df["label"].astype("int64"),
            }
        )

    def propagate_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        lab = df[df["dst"] < 0]
        edg = df[df["dst"] >= 0]
        msgs = edg[["key", "dst"]].merge(lab[["key", "label"]], on="key", how="inner")
        selfs = pd.DataFrame(
            {"doc_id": lab["key"].to_numpy(), "label": lab["label"].astype("int64").to_numpy(),
             "own": lab["label"].astype("int64").to_numpy()}
        )
        out_msgs = pd.DataFrame(
            {"doc_id": msgs["dst"].to_numpy(), "label": msgs["label"].to_numpy(),
             "own": np.full(len(msgs), -1, dtype="int64")}
        )
        return pd.concat([selfs, out_msgs], ignore_index=True)

    def add_doc_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(bucket=bucket_of(df["doc_id"], n_b))

    def minmax_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby("doc_id", sort=False)
            .agg(label=("label", "min"), own=("own", "max"))
            .reset_index()
        )
        g["label"] = g["label"].astype("int64")
        g["own"] = g["own"].astype("int64")
        # per-node changed marker: summed (one tiny execution over the
        # already-materialized output) instead of a separate filter+count
        g["chg"] = (g["label"] < g["own"]).astype("int64")
        return g

    # ---- pointer doubling (label[u] <- label[label[u]]) ------------------
    # requests keyed by bucket(label[u]) meet label rows keyed by
    # bucket(doc_id) — same hash — so the in-bucket merge resolves the
    # double hop; label values are always component-member doc_ids, so
    # every request finds its row.

    def tag_requests(df: pd.DataFrame) -> pd.DataFrame:
        lbl = df["label"].astype("int64")
        return pd.DataFrame(
            {
                "key": lbl,
                "u": df["doc_id"].astype("int64"),
                "lab": np.full(len(df), -1, dtype="int64"),
                "bucket": bucket_of(lbl, n_b),
            }
        )

    def tag_label_rows(df: pd.DataFrame) -> pd.DataFrame:
        key = df["doc_id"].astype("int64")
        return pd.DataFrame(
            {
                "key": key,
                "u": np.full(len(df), -1, dtype="int64"),
                "lab": df["label"].astype("int64"),
                "bucket": bucket_of(key, n_b),
            }
        )

    def shortcut_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        req = df[df["u"] >= 0]
        lab = df[df["lab"] >= 0]
        m = req[["key", "u"]].merge(lab[["key", "lab"]], on="key", how="left")
        return pd.DataFrame(
            {
                "doc_id": m["u"].to_numpy(),
                # belt-and-braces: a missing row (cannot happen — label
                # values are doc_ids) keeps the single-hop label
                "label": m["lab"].fillna(m["key"]).astype("int64").to_numpy(),
            }
        )

    edges_l = edges.map_batches(
        lambda df: df.assign(label=np.int64(-1)), batch_format="pandas"
    )
    n_iters = 0
    for it in range(max_iters):
        n_iters = it + 1
        if it == 0:
            doubled = labels  # labels are identity — the shortcut is a no-op
        else:
            doubled = (
                labels.map_batches(tag_requests, batch_format="pandas")
                .union(labels.map_batches(tag_label_rows, batch_format="pandas"))
                .groupby("bucket")
                .map_groups(shortcut_in_bucket, batch_format="pandas")
            )
        # label columns: edges carry no label — pandas aligns on concat in
        # the grouped pass, so tag label rows with the full column set.
        # The shortcut chains INTO the same streaming execution as the
        # edge pass: three bucketed exchanges, ONE executor launch.
        agg = (
            edges_l.union(doubled.map_batches(tag_labels, batch_format="pandas"))
            .groupby("bucket")
            .map_groups(propagate_in_bucket, batch_format="pandas")
            .map_batches(add_doc_bucket, batch_format="pandas")
            .groupby("bucket")
            .map_groups(minmax_in_bucket, batch_format="pandas")
            .repartition(n_label_blocks)
            .materialize()
        )
        changed = agg.sum("chg")
        labels = agg  # tag_* readers use doc_id/label only; no re-materialize
        if not changed:
            break
    if stats is not None:
        stats["iterations"] = n_iters

    # singleton attach: ONE bucketed anti-join of the corpus node list
    # against the (candidate-bounded) edge-endpoint set — unpaired nodes
    # become their own cluster without ever having entered the loop
    def tag_nodes(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].astype("int64")
        return pd.DataFrame(
            {
                "doc_id": ids,
                "paired": np.zeros(len(df), dtype="int64"),
                "bucket": bucket_of(ids, n_b),
            }
        )

    def tag_paired(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].astype("int64")
        return pd.DataFrame(
            {
                "doc_id": ids,
                "paired": np.ones(len(df), dtype="int64"),
                "bucket": bucket_of(ids, n_b),
            }
        )

    def singles_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("doc_id", sort=False)["paired"].max()
        ids = g[g == 0].index.to_numpy().astype("int64")
        return pd.DataFrame({"doc_id": ids, "cluster_id": ids})

    singles = (
        nodes_ds.map_batches(tag_nodes, batch_format="pandas")
        .union(labels.map_batches(tag_paired, batch_format="pandas"))
        .groupby("bucket")
        .map_groups(singles_in_bucket, batch_format="pandas")
    )
    clusters = labels.map_batches(
        lambda b: pa.table(
            {
                "doc_id": b["doc_id"].combine_chunks().cast(pa.int64()),
                "cluster_id": b["label"].combine_chunks().cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    return clusters.union(singles)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit population count (SWAR; numpy<2 lacks
    bitwise_count)."""
    x = x.astype(np.uint64)
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + (
        (x >> np.uint64(2)) & np.uint64(0x3333333333333333)
    )
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    with np.errstate(over="ignore"):
        return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(
            np.int64
        )


_SIMHASH_BANDS = 4  # 4 x 16-bit bands: hamming <= 3 => >= 1 exact band


def simhash_neardup_pairs(sf_dir: str, max_hamming: int = 3):
    """SimHash near-duplicate pairs — the production web-scale near-dup
    path (Charikar/Manku-style: 64-bit signatures, Hamming radius 3): by
    pigeonhole, two signatures within Hamming ``max_hamming`` (< 4) agree
    exactly on at least one of 4 16-bit bands, so banding finds every
    such pair. Columns: doc_a, doc_b, hamming.

    Shape: signatures per batch (the vectorized :func:`simhash_batch`
    kernel), 4 (band-key, doc_id, sig) rows per doc; ONE bucketed
    grouped self-merge verifies Hamming IN-BAND (signatures ride along —
    no text join-back at all); a second bucketed pass dedupes pairs that
    matched in several bands. SQL-oracle-checked (bit_count(xor) mirror
    over the simhash CTE)."""
    from ..functions.bucketing import bucket_of, default_buckets

    n_b = default_buckets()
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def to_bands(df: pd.DataFrame) -> pd.DataFrame:
        sigs = np.array(
            [int(h, 16) for h in simhash_batch(list(df["text"]))],
            dtype=np.uint64,
        )
        ids = df["doc_id"].to_numpy().astype(np.int64)
        keys, out_ids, out_sigs = [], [], []
        for band in range(_SIMHASH_BANDS):
            chunk = (sigs >> np.uint64(16 * band)) & np.uint64(0xFFFF)
            keys.append((np.int64(band) << np.int64(16)) | chunk.astype(np.int64))
            out_ids.append(ids)
            out_sigs.append(sigs)
        out = pd.DataFrame(
            {
                "key": np.concatenate(keys),
                "doc_id": np.concatenate(out_ids),
                "sig": np.concatenate(out_sigs),
            }
        )
        out["bucket"] = bucket_of(out["key"], n_b)
        return out

    def pairs_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        m = df.merge(df, on="key")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        if not len(m):
            return pd.DataFrame(
                {
                    "doc_a": pd.Series([], dtype="int64"),
                    "doc_b": pd.Series([], dtype="int64"),
                    "hamming": pd.Series([], dtype="int64"),
                }
            )
        ham = _popcount64(
            m["sig_x"].to_numpy().astype(np.uint64)
            ^ m["sig_y"].to_numpy().astype(np.uint64)
        )
        keep = ham <= max_hamming
        return pd.DataFrame(
            {
                "doc_a": m["doc_id_x"].to_numpy()[keep],
                "doc_b": m["doc_id_y"].to_numpy()[keep],
                "hamming": ham[keep],
            }
        )

    def pair_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(
            bucket=bucket_of(df["doc_a"] * 1_000_003 + df["doc_b"], n_b)
        )

    def distinct_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df[["doc_a", "doc_b", "hamming"]].drop_duplicates(
            ["doc_a", "doc_b"]
        )

    return (
        ds.map_batches(to_bands, batch_format="pandas")
        .groupby("bucket")
        .map_groups(pairs_in_bucket, batch_format="pandas")
        .map_batches(pair_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(distinct_in_bucket, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Lee-et-al EXACT substring duplication (character-level, suffix-array
# semantics via the duplicated-L-window lemma)

_ESD_L = 40  # minimum duplicated substring length, in characters


def exact_substring_spans(sf_dir: str, min_len: int = _ESD_L):
    """Character-level EXACT duplicate-substring spans — the suffix-array
    variant of Lee et al., "Deduplicating Training Data Makes Language
    Models Better" (ACL'22): mark every maximal corpus region that is part
    of some substring of length ≥ ``min_len`` occurring at least twice
    anywhere in the corpus (including within the same document). The
    reference implementation builds one corpus-wide suffix array; this
    pipeline computes the IDENTICAL output through the duplicated-window
    lemma: a substring S (|S| ≥ L) is duplicated iff every one of its
    L-char windows is duplicated, so

        union of duplicated substrings of length ≥ L
          == union of duplicated L-char windows,

    and the windows are a plain bucketed exchange — no global index:

    1. map: per doc emit (md5(window), doc_id, pos) for every L-char
       window (md5 pinned by the DuckDB oracle; the exchange ships 16-byte
       digests, never the L-char text);
    2. bucketed group by digest: windows whose digest occurs ≥ 2 times
       anywhere are duplicated (positions re-keyed by bucket(doc_id));
    3. bucketed per-doc island merge: overlapping/adjacent windows
       (gap ≤ L) fold into maximal spans — vectorized gaps-and-islands.

    ``dup_span_fraction`` is the token-window approximation of this op;
    this one is exact at character granularity. Columns: doc_id,
    span_start (0-based inclusive), span_end (exclusive)."""
    from ..functions.bucketing import bucket_of, coalesce_blocks, default_buckets

    L = min_len
    n_b = default_buckets()

    def windows(batch: pa.Table) -> pa.Table:
        md5 = hashlib.md5
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        out_doc: list[np.ndarray] = []
        out_pos: list[np.ndarray] = []
        hashes: list[str] = []
        for d, text in zip(doc_ids, texts):
            n = len(text) - L + 1
            if n <= 0:
                continue
            enc = text.encode("utf-8")  # synthetic corpus is 1 byte/char
            hashes.extend(md5(enc[i : i + L]).hexdigest() for i in range(n))
            out_doc.append(np.full(n, d, dtype=np.int64))
            out_pos.append(np.arange(n, dtype=np.int64))
        h = pd.Series(hashes, dtype=object)
        t = pd.DataFrame(
            {
                "h": h,
                "doc_id": np.concatenate(out_doc) if out_doc else np.array([], np.int64),
                "pos": np.concatenate(out_pos) if out_pos else np.array([], np.int64),
            }
        )
        t["bucket"] = bucket_of(t["h"], n_b)
        return pa.Table.from_pandas(t, preserve_index=False)

    def dup_positions(df: pd.DataFrame) -> pd.DataFrame:
        keep = df[df.duplicated("h", keep=False)]
        out = keep[["doc_id", "pos"]].copy()
        out["bucket"] = bucket_of(out["doc_id"], n_b)
        return out

    def merge_islands(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["doc_id", "pos"], kind="mergesort")
        prev = df.groupby("doc_id", sort=False)["pos"].shift()
        brk = prev.isna() | (df["pos"] - prev > L)
        island = brk.cumsum()
        g = df.groupby([df["doc_id"], island], sort=False)["pos"].agg(["min", "max"])
        return pd.DataFrame(
            {
                "doc_id": g.index.get_level_values(0).to_numpy(),
                "span_start": g["min"].to_numpy().astype("int64"),
                "span_end": (g["max"] + L).to_numpy().astype("int64"),
            }
        )

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return (
        coalesce_blocks(ds.map_batches(windows, batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(dup_positions, batch_format="pandas")
        .groupby("bucket")
        .map_groups(merge_islands, batch_format="pandas")
    )


def exact_substring_dedup_apply(sf_dir: str, min_len: int = _ESD_L):
    """APPLY Lee-et-al exact-substring dedup: cut every duplicated span
    (:func:`exact_substring_spans`) out of its document and emit the
    cleaned result — the step the ACL'22 recipe actually trains on
    (the spans job is the analysis half).

    Shape: ONE tagged-union bucketed co-group by doc_id (document text
    side 0, span rows side 1 — the spans stream is duplication-
    proportional, so the exchange is small on real corpora); inside a
    bucket the cuts are per-doc string surgery over the sorted disjoint
    spans (inherently per-row, bounded by the bucket). Columns: doc_id,
    n_removed, removed_chars, cleaned_len, cleaned_md5 (md5 of the
    concatenated kept segments — the full cleaned text verifiable
    without shipping it). VALUES-oracled vs an independent sequential
    recompute of the whole lemma + surgery."""
    import hashlib as _hl

    from ..functions.bucketing import bucket_of, default_buckets, typed_empty

    n_b = default_buckets()
    spans = exact_substring_spans(sf_dir, min_len)
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def tag_doc(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "text": df["text"],
                "span_start": np.full(len(df), -1, dtype="int64"),
                "span_end": np.full(len(df), -1, dtype="int64"),
                "side": np.zeros(len(df), dtype="int64"),
                "bucket": bucket_of(df["doc_id"], n_b),
            }
        )

    def tag_span(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "text": pd.Series([""] * len(df), dtype=str, index=df.index),
                "span_start": df["span_start"].astype("int64"),
                "span_end": df["span_end"].astype("int64"),
                "side": np.ones(len(df), dtype="int64"),
                "bucket": bucket_of(df["doc_id"], n_b),
            }
        )

    def apply_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return typed_empty(
                doc_id="int64", n_removed="int64", removed_chars="int64",
                cleaned_len="int64", cleaned_md5=str,
            )
        d = df[df["side"] == 0]
        s = df[df["side"] == 1].sort_values(
            ["doc_id", "span_start"], kind="mergesort"
        )
        cuts = {k: list(zip(g["span_start"], g["span_end"]))
                for k, g in s.groupby("doc_id", sort=False)}
        out = {"doc_id": [], "n_removed": [], "removed_chars": [],
               "cleaned_len": [], "cleaned_md5": []}
        for did, text in zip(d["doc_id"], d["text"]):
            sp = cuts.get(did, [])
            kept, pos, removed = [], 0, 0
            for a, b in sp:
                kept.append(text[pos:a])
                removed += b - a
                pos = b
            kept.append(text[pos:])
            cleaned = "".join(kept)
            out["doc_id"].append(did)
            out["n_removed"].append(len(sp))
            out["removed_chars"].append(removed)
            out["cleaned_len"].append(len(cleaned))
            out["cleaned_md5"].append(
                _hl.md5(cleaned.encode("utf-8")).hexdigest()
            )
        r = pd.DataFrame(out)
        r["doc_id"] = r["doc_id"].astype("int64")
        for c in ("n_removed", "removed_chars", "cleaned_len"):
            r[c] = r[c].astype("int64")
        return r

    tagged = docs.map_batches(tag_doc, batch_format="pandas").union(
        spans.map_batches(tag_span, batch_format="pandas")
    )
    return tagged.groupby("bucket").map_groups(
        apply_in_bucket, batch_format="pandas"
    )


_CONTAIN_MAX_DF = 50  # stop-band: grams held by more docs ship no pairs
_CONTAIN_PPM = 500_000  # containment threshold (of the smaller set)


def containment_pairs(
    sf_dir: str,
    threshold_ppm: int = _CONTAIN_PPM,
    max_df: int = _CONTAIN_MAX_DF,
):
    """Asymmetric containment pairs — quote / excerpt / subset detection
    (Broder's containment, the statistic Jaccard misses when a small doc
    is wholly quoted inside a big one): every doc pair whose shared
    3-gram shingles cover >= threshold of the SMALLER doc's shingle set.

    Pinned universe rule (the winnowing-family stop-band, mirrored by
    the SQL oracle): grams with global document frequency > ``max_df``
    are excluded from the universe entirely — from intersections AND
    from each doc's set size — which bounds per-gram pair fan-out at
    C(max_df, 2) and keeps the statistic exact *within the declared
    universe*. containment_ppm = 10⁶·|A∩B| // min(|A|,|B|), exact ints.

    FOUR bucketed exchanges, each gram/pair-bounded: (1) distinct
    shingles keyed by gram — the bucket holds every row of a gram, so
    the in-bucket size IS the global df (the ngram_jaccard df pass) and
    over-df grams drop here; (2) keyed by doc — per-doc capped set size
    attaches to every row; (3) keyed by gram again — per-gram self-merge
    emits pair partials carrying both sizes; (4) pair fold + the
    containment arithmetic + threshold. Columns: doc_a, doc_b, n_shared,
    containment_ppm. SQL-oracle-checked (df-capped self-join mirror)."""
    from ..functions.bucketing import (
        bucket_of,
        coalesce_blocks,
        default_buckets,
        typed_empty,
    )

    n_b = default_buckets()
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def to_grams(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        grams: list[str] = []
        counts = np.empty(len(texts), dtype=np.int64)
        for j, text in enumerate(texts):
            gl = _gram_list(text)
            grams.extend(gl)
            counts[j] = len(gl)
        uniq, inv = np.unique(np.asarray(grams, dtype=object), return_inverse=True)
        hexes = np.asarray(
            [hashlib.md5(g.encode()).hexdigest()[:16] for g in uniq], dtype=object
        )
        doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
        key = np.unique(doc_idx * np.int64(len(uniq)) + inv)
        out = pd.DataFrame(
            {
                "doc_id": ids[key // len(uniq)],
                "g": hexes[key % len(uniq)],
            }
        )
        out["bucket"] = bucket_of(out["g"], n_b)
        return pa.Table.from_pandas(out, preserve_index=False)

    def df_cap(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return typed_empty(doc_id="int64", g=str, bucket="int32")
        keep = df.groupby("g", sort=False)["g"].transform("size") <= max_df
        out = df.loc[keep, ["doc_id", "g"]].copy()
        out["bucket"] = bucket_of(out["doc_id"], n_b)
        return out

    def attach_size(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return typed_empty(doc_id="int64", g=str, sz="int64", bucket="int32")
        out = df[["doc_id", "g"]].copy()
        out["sz"] = (
            df.groupby("doc_id", sort=False)["g"].transform("size").astype("int64")
        )
        out["bucket"] = bucket_of(out["g"], n_b)
        return out

    def pair_partials(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return typed_empty(
                a="int64", b="int64", sa="int64", sb="int64", n="int64",
                bucket="int32",
            )
        m = df.merge(df, on="g")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        if not len(m):
            return typed_empty(
                a="int64", b="int64", sa="int64", sb="int64", n="int64",
                bucket="int32",
            )
        g = (
            m.groupby(["doc_id_x", "doc_id_y", "sz_x", "sz_y"], sort=False)
            .size()
            .reset_index(name="n")
        )
        out = pd.DataFrame(
            {
                "a": g["doc_id_x"].astype("int64"),
                "b": g["doc_id_y"].astype("int64"),
                "sa": g["sz_x"].astype("int64"),
                "sb": g["sz_y"].astype("int64"),
                "n": g["n"].astype("int64"),
            }
        )
        out["bucket"] = bucket_of(out["a"] * np.int64(2654435761) + out["b"], n_b)
        return out

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return typed_empty(
                doc_a="int64", doc_b="int64", n_shared="int64",
                containment_ppm="int64",
            )
        g = (
            df.groupby(["a", "b", "sa", "sb"], sort=False)["n"]
            .sum()
            .reset_index()
        )
        n = g["n"].to_numpy(dtype="int64")
        mn = np.minimum(
            g["sa"].to_numpy(dtype="int64"), g["sb"].to_numpy(dtype="int64")
        )
        ppm = (1_000_000 * n) // mn
        keep = ppm >= threshold_ppm
        return pd.DataFrame(
            {
                "doc_a": g["a"].to_numpy(dtype="int64")[keep],
                "doc_b": g["b"].to_numpy(dtype="int64")[keep],
                "n_shared": n[keep],
                "containment_ppm": ppm[keep],
            }
        )

    chain = coalesce_blocks(
        ds.map_batches(to_grams, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(df_cap, batch_format="pandas")
    )
    sized = coalesce_blocks(
        chain.groupby("bucket").map_groups(attach_size, batch_format="pandas")
    )
    pairs = coalesce_blocks(
        sized.groupby("bucket").map_groups(pair_partials, batch_format="pandas")
    )
    return pairs.groupby("bucket").map_groups(fold, batch_format="pandas")


def lsh_recall_audit(sf_dir: str, threshold: float = 0.3):
    """Sketch-quality audit: MinHash-LSH's recall/precision against the
    EXACT n-gram Jaccard ground truth on the same corpus — the
    measurement a dedup pipeline owner runs before trusting the LSH
    path at scale (the banding theory predicts recall; this measures
    it). Composes the two existing verified chains:
    :func:`minhash_lsh_pairs` (candidates → exact verify, so its output
    is TRUE POSITIVES of the candidate stage) and
    :func:`ngram_jaccard_pairs` (ALL true pairs).

    Because both chains verify with the same exact hashed-shingle
    Jaccard at the same threshold, LSH pairs ⊆ exact pairs and the
    audit reduces to exact integer counts: ``n_exact``, ``n_lsh``
    (= n_both), and ``recall_ppm = n_lsh·10⁶ // n_exact`` (1_000_000 on
    an empty ground truth — vacuous recall). Everything downstream of
    the two chains is two tiny count folds; no new exchange touches
    corpus text. Columns: n_exact, n_lsh, recall_ppm (one row).
    SQL-oracle-checked by composing both chains' mirrors."""
    lsh_n = minhash_lsh_pairs(sf_dir, threshold).count()
    exact_n = ngram_jaccard_pairs(sf_dir, threshold).count()
    recall = 1_000_000 if exact_n == 0 else (lsh_n * 1_000_000) // exact_n
    return pd.DataFrame(
        {
            "n_exact": pd.Series([exact_n], dtype="int64"),
            "n_lsh": pd.Series([lsh_n], dtype="int64"),
            "recall_ppm": pd.Series([recall], dtype="int64"),
        }
    )
