"""Text-analysis operators over the ``documents`` table.

Training-data-pipeline operators (engine extensions beyond the reference's
own set, per the build brief): token counting, quality scoring, corpus-
trained language ID, and document fingerprinting. The reference precedent
for per-document text analysers is the ``AbstractTextAnalyser`` plugin
surface (``warc-indexer/src/main/java/uk/bl/wa/analyser/text/*``, e.g.
LanguageAnalyser.java:64-86 and FuzzyHashAnalyser.java:61-88).

All stages are vectorised ``map_batches`` transforms (pandas string kernels
or numpy); the language-ID model is a *broadcast* profile (``ray.put``) —
train once with a groupby, apply everywhere with no shuffle.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from ..sources.io import read_table

__all__ = ["token_stats", "quality_score", "language_id", "doc_fingerprint"]


# BPE-ish subword pre-tokeniser (GPT-2-style segment classes, ASCII form:
# optionally-space-prefixed letter runs / digit runs / punctuation runs).
# The whitespace class is EXPLICIT ([\t\n\f\r ]) so Python re and the SQL
# oracle's RE2 agree on every input — Python's \s matches Unicode spaces
# (NBSP, \u2028, ...) that RE2's does not
BPE_ISH_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^\t\n\f\r A-Za-z0-9]+"


def token_stats(sf_dir: str):
    """Per-document token statistics (SQL-oracle-checked).

    Columns: doc_id, n_tokens (whitespace tokenisation, identical to
    ``regexp_split_to_array(trim(text), '\\s+')`` with empty -> 0),
    n_tokens_bpe (BPE-ish subword count via BPE_ISH_PATTERN — the
    LLM-pipeline budget proxy), doc_len."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_tokens": df["text"].str.split().str.len().astype("int64"),
                "n_tokens_bpe": df["text"]
                .str.count(BPE_ISH_PATTERN)
                .astype("int64"),
                "doc_len": df["text"].str.len().astype("int64"),
            }
        )

    return ds.map_batches(stats, batch_format="pandas")


# quality-signal vocabularies (brief: length / punct / stopword ratios)
STOPWORDS = ("a", "the", "of", "and", "to", "in", "is", "it")
_PUNCT_CLASS = r"[^\t\n\f\r A-Za-z0-9]"  # explicit ws: Python re == RE2


def quality_score(sf_dir: str):
    """Per-document quality features (SQL-oracle-checked).

    Columns: doc_id, doc_len, n_tokens, n_distinct, distinct_ratio,
    punct_ratio (non-alphanumeric non-space chars / chars),
    stopword_ratio (stopword tokens / tokens). Each ratio is one double
    division of two exact integers, so it is bit-identical to the SQL
    oracle's."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    stop = frozenset(STOPWORDS)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.split()
        n_tokens = toks.str.len().astype("int64")
        n_distinct = toks.map(lambda t: len(set(t))).astype("int64")
        doc_len = df["text"].str.len().astype("int64")
        n_punct = df["text"].str.count(_PUNCT_CLASS).astype("int64")
        n_stop = toks.map(lambda t: sum(1 for w in t if w in stop)).astype("int64")
        safe_tokens = n_tokens.replace(0, 1)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "doc_len": doc_len,
                "n_tokens": n_tokens,
                "n_distinct": n_distinct,
                "distinct_ratio": np.where(n_tokens > 0, n_distinct / safe_tokens, 0.0),
                "punct_ratio": np.where(
                    doc_len > 0, n_punct / doc_len.replace(0, 1), 0.0
                ),
                "stopword_ratio": np.where(n_tokens > 0, n_stop / safe_tokens, 0.0),
            }
        )

    return ds.map_batches(score, batch_format="pandas")


_PROFILE_TOP_K = 40


def language_id(sf_dir: str):
    """Corpus-trained language ID: two-phase train/broadcast/apply.

    Phase 1 (train): per-``lang`` token-frequency profiles via a grouped
    aggregation (small result, materialised). Phase 2 (apply): profiles
    broadcast with ``ray.put``; each batch classifies docs by cosine over
    the shared profile vocabulary. Columns: doc_id, lang, lang_pred.
    Non-SQL-expressible -> rows-only driver check; determinism pinned by
    lexicographic tie-breaks."""
    import ray
    import ray.data as rd

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def partial_profiles(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized per-batch combiner: split -> explode -> one grouped
        # size() (no per-token Python dict loop)
        ex = (
            df[["lang"]]
            .assign(token=df["text"].str.split())
            .explode("token")
            .dropna(subset=["token"])
        )
        return (
            ex.groupby(["lang", "token"], sort=False)
            .size()
            .reset_index(name="n")
        )

    # pre-aggregate per batch, then one small groupby (combiner pattern)
    from ray.data.aggregate import Sum

    def topk_per_lang(df: pd.DataFrame) -> pd.DataFrame:
        # bounded top-k by (-n, token): safe as a per-batch truncation
        # AFTER the Sum aggregate (counts are final), because a token in a
        # lang's global top-k is necessarily in the top-k of whichever
        # batch holds its single (lang, token) row
        df = df.sort_values(["lang", "n", "token"], ascending=[True, False, True])
        return df.groupby("lang", sort=False).head(_PROFILE_TOP_K)

    # distributed truncation: per-output-batch top-k bounds what reaches
    # the driver to ≤ k × langs × blocks rows — the driver never sees the
    # unbounded (lang, token) vocabulary; the final top-k merge is a tiny
    # in-memory pass over that bounded set
    token_totals = (
        ds.map_batches(partial_profiles, batch_format="pandas")
        .groupby(["lang", "token"])
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(topk_per_lang, batch_format="pandas")
        .take_all()
    )
    by_lang: dict[str, list] = {}
    for r in token_totals:
        by_lang.setdefault(r["lang"], []).append((r["token"], r["n"]))
    top_profiles = {
        lang: dict(
            sorted(toks, key=lambda kv: (-kv[1], kv[0]))[:_PROFILE_TOP_K]
        )
        for lang, toks in by_lang.items()
    }
    profiles_ref = ray.put(top_profiles)

    class Classify:
        def __init__(self):
            prof = ray.get(profiles_ref)
            self.langs = sorted(prof)
            vocab = sorted({t for c in prof.values() for t in c})
            self.vocab_ix = {t: i for i, t in enumerate(vocab)}
            mat = np.zeros((len(self.langs), len(vocab)))
            for li, lang in enumerate(self.langs):
                for t, n in prof[lang].items():
                    mat[li, self.vocab_ix[t]] = n
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0] = 1.0
            self.mat = mat / norms[:, None]

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            vecs = np.zeros((len(df), len(self.vocab_ix)))
            for i, toks in enumerate(df["text"].str.split()):
                for t in toks:
                    j = self.vocab_ix.get(t)
                    if j is not None:
                        vecs[i, j] += 1
            norms = np.linalg.norm(vecs, axis=1)
            norms[norms == 0] = 1.0
            sims = (vecs / norms[:, None]) @ self.mat.T
            best = np.argmax(sims, axis=1)  # ties -> lowest index = lexicographic
            return pd.DataFrame(
                {
                    "doc_id": df["doc_id"],
                    "lang": df["lang"],
                    "lang_pred": [self.langs[b] for b in best],
                }
            )

    # autoscaling actor pool (1, cluster CPUs): never pin a fixed actor
    # count — a 32-CPU box would starve at 2 and a 2-CPU box would thrash
    n_cpus = int(ray.cluster_resources().get("CPU", 8))
    return ds.map_batches(
        Classify, batch_format="pandas", concurrency=(1, max(2, n_cpus))
    )


_FP_WINDOW = 4  # winnowing window over 3-token shingle hashes


def doc_fingerprint(sf_dir: str):
    """Winnowing-style rolling-hash fingerprint per document.

    3-token shingles hashed (md5-derived 64-bit); the minimum hash of each
    ``_FP_WINDOW`` window is selected; the fingerprint is the md5 hex of
    the sorted distinct selected-hash sequence. Deterministic; rows-only.
    Columns: doc_id, fingerprint."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    from numpy.lib.stride_tricks import sliding_window_view

    def fp(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for text in df["text"]:
            toks = text.split()
            shingles = [
                " ".join(toks[i : i + 3]) for i in range(max(0, len(toks) - 2))
            ] or [text]
            hashes = np.fromiter(
                (
                    int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")
                    for s in shingles
                ),
                dtype=np.uint64,
                count=len(shingles),
            )
            # winnowing select: per-window minimum, vectorised via a
            # strided view (no per-window Python slice/min)
            if len(hashes) <= _FP_WINDOW:
                selected = np.array([hashes.min()])
            else:
                selected = sliding_window_view(hashes, _FP_WINDOW).min(axis=1)
            digest = hashlib.md5(
                ",".join(str(h) for h in np.unique(selected)).encode()
            ).hexdigest()
            out.append(digest)
        return pd.DataFrame({"doc_id": df["doc_id"], "fingerprint": out})

    return ds.map_batches(fp, batch_format="pandas")
