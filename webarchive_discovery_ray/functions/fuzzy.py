"""ssdeep-style context-triggered piecewise fuzzy hash (spamsum family).

Reference behaviour (``warc-indexer/src/main/java/uk/bl/wa/analyser/text/
FuzzyHashAnalyser.java:61-88``): canonicalise text (whitespace-collapse +
lowercase), compute ssdeep, emit ``ssdeep_hash_bs_<blocksize>`` and
``ssdeep_hash_bs_<2x blocksize>`` fields. This is a from-scratch
deterministic spamsum implementation (rolling Adler-like trigger + FNV
piece hash, base64 alphabet), not a binding of the ssdeep C library —
byte-stable across runs and platforms, which is what the engine needs for
dedup-join keys.
"""

from __future__ import annotations

__all__ = ["canonical_text", "spamsum", "fuzzy_fields", "levenshtein_bytes"]

_B64 = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/"
_SPAMSUM_LENGTH = 64
_MIN_BLOCKSIZE = 3
_WINDOW = 7
_FNV_PRIME = 0x01000193
_FNV_INIT = 0x28021967


def canonical_text(text: str) -> str:
    """Whitespace-collapse + lowercase (FuzzyHashAnalyser.java:64-67)."""
    return " ".join(text.split()).lower()


class _Roll:
    """ssdeep's rolling hash over a 7-byte window."""

    __slots__ = ("win", "h1", "h2", "h3", "n")

    def __init__(self) -> None:
        self.win = [0] * _WINDOW
        self.h1 = self.h2 = self.h3 = 0
        self.n = 0

    def update(self, c: int) -> int:
        self.h2 -= self.h1
        self.h2 += _WINDOW * c
        self.h1 += c
        self.h1 -= self.win[self.n % _WINDOW]
        self.win[self.n % _WINDOW] = c
        self.n += 1
        self.h3 = ((self.h3 << 5) & 0xFFFFFFFF) ^ c
        return (self.h1 + self.h2 + self.h3) & 0xFFFFFFFF


def _blocksize_for(length: int) -> int:
    bs = _MIN_BLOCKSIZE
    while bs * _SPAMSUM_LENGTH < length:
        bs *= 2
    return bs


def _spamsum_pass(data: bytes, blocksize: int) -> tuple[str, str]:
    """One pass producing the blocksize and 2x-blocksize piece strings."""
    roll = _Roll()
    p1 = _FNV_INIT
    p2 = _FNV_INIT
    out1: list[str] = []
    out2: list[str] = []
    for c in data:
        p1 = ((p1 * _FNV_PRIME) ^ c) & 0xFFFFFFFF
        p2 = ((p2 * _FNV_PRIME) ^ c) & 0xFFFFFFFF
        rh = roll.update(c)
        if rh % blocksize == blocksize - 1 and len(out1) < _SPAMSUM_LENGTH - 1:
            out1.append(_B64[p1 % 64])
            p1 = _FNV_INIT
        if rh % (blocksize * 2) == blocksize * 2 - 1 and len(out2) < (_SPAMSUM_LENGTH // 2) - 1:
            out2.append(_B64[p2 % 64])
            p2 = _FNV_INIT
    if roll.h1 + roll.h2 + roll.h3:  # trailing piece
        out1.append(_B64[p1 % 64])
        out2.append(_B64[p2 % 64])
    return "".join(out1), "".join(out2)


def spamsum(text: str) -> tuple[int, str, str]:
    """(blocksize, sig_at_blocksize, sig_at_2x_blocksize) for canonical
    text. Empty input hashes to blocksize 3 with empty signatures."""
    data = canonical_text(text).encode("utf-8")
    blocksize = _blocksize_for(len(data))
    s1, s2 = _spamsum_pass(data, blocksize)
    # ssdeep shrinks blocksize when the signature came out too short
    while blocksize > _MIN_BLOCKSIZE and len(s1) < _SPAMSUM_LENGTH // 2:
        blocksize //= 2
        s1, s2 = _spamsum_pass(data, blocksize)
    return blocksize, s1, s2


def fuzzy_fields(text: str) -> dict[str, str]:
    """The reference's dynamic-field form: ssdeep_hash_bs_<bs> keys."""
    bs, s1, s2 = spamsum(text)
    return {f"ssdeep_hash_bs_{bs}": s1, f"ssdeep_hash_bs_{bs * 2}": s2}


def levenshtein_bytes(a: bytes, b: bytes) -> int:
    """Exact Levenshtein distance over raw BYTES (unit insert / delete /
    substitute), matching DuckDB's byte-based ``levenshtein`` (probe:
    ``levenshtein('héllo','hallo') = 2`` — the 2-byte UTF-8 ``é`` counts
    as two edits).

    One DP row at a time, vectorized with numpy: the deletion and
    substitution candidates are elementwise, and the sequential
    insertion recurrence ``cur[j] = min(m[j], cur[j-1] + 1)`` collapses
    to a prefix scan via ``cur[j] = j + min(i, min_{k<=j}(m[k] - k))``
    (``np.minimum.accumulate``). O(len(a)·len(b)/word) vector work,
    O(min_len) memory."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    import numpy as np

    A = np.frombuffer(a, dtype=np.uint8)
    B = np.frombuffer(b, dtype=np.uint8)
    if len(B) > len(A):  # iterate the longer string, keep rows short
        A, B = B, A
    n = len(B)
    js = np.arange(1, n + 1, dtype=np.int64)
    prev = np.arange(n + 1, dtype=np.int64)
    cur = np.empty(n + 1, dtype=np.int64)
    for i in range(1, len(A) + 1):
        # candidates without the insertion term
        m = np.minimum(prev[1:] + 1, prev[:-1] + (B != A[i - 1]))
        # fold in cur[0] = i and the left-to-right insertion chain
        cur[0] = i
        cur[1:] = js + np.minimum(np.minimum.accumulate(m - js), i)
        prev, cur = cur, prev
    return int(prev[n])
