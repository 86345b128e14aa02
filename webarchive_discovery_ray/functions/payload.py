"""M14/M15: chunked-transfer decode + payload decompression.

Reference: ``warc-indexer/src/main/java/uk/bl/wa/util/InputStreamUtils.java``
— ``maybeDechunk`` (:285-376) probes the stream head for a chunk-size line
(``^[0-9a-f]{1,8}(;…)?\\r?\\n``, lenient bare-LF accepted) and decodes the
chunk framing when it matches, passing the stream through untouched
otherwise; ``decompress`` (:399-447) handles gzip (magic-sniffed or
hinted) and brotli (hint only). The default hash stage is
*after_dechunk_before_decompression* — callers hash the dechunked bytes,
then analyse the decompressed bytes.
"""

from __future__ import annotations

import gzip as _gzip
import re

__all__ = ["maybe_dechunk", "maybe_decompress", "chunk_encode"]

# no leading ^: .match(data, pos) anchors at pos, but ^ would still mean
# position 0 and break mid-stream chunk-head matches
_CHUNK_HEAD = re.compile(rb"([0-9a-fA-F]{1,8})(;[^\r\n]*)?\r?\n")
_GZIP_MAGIC = b"\x1f\x8b"


def maybe_dechunk(data: bytes) -> tuple[bytes, bool]:
    """Decode HTTP chunked framing when the head looks chunked; return
    ``(payload, was_chunked)``. Any framing inconsistency mid-stream
    returns the ORIGINAL bytes untouched (the reference treats a probe
    mismatch as not-chunked rather than erroring)."""
    m = _CHUNK_HEAD.match(data)
    if not m:
        return data, False
    out = bytearray()
    pos = 0
    while True:
        m = _CHUNK_HEAD.match(data, pos)
        if not m:
            return bytes(data), False
        size = int(m.group(1), 16)
        pos = m.end()
        if size == 0:
            return bytes(out), True  # trailer ignored
        if pos + size > len(data):
            return bytes(data), False
        out += data[pos : pos + size]
        pos += size
        # chunk terminator: CRLF or lenient bare LF
        if data[pos : pos + 2] == b"\r\n":
            pos += 2
        elif data[pos : pos + 1] == b"\n":
            pos += 1
        else:
            return bytes(data), False


def maybe_decompress(data: bytes, content_encoding: str | None = None) -> tuple[bytes, str]:
    """Return ``(payload, encoding_applied)``. gzip is applied when the
    magic bytes match OR the header hints gzip; brotli only on hint (and
    only if a brotli module exists — otherwise passed through, matching
    the gate-behind-import rule). Corrupt streams pass through."""
    hint = (content_encoding or "").strip().lower()
    if data[:2] == _GZIP_MAGIC or hint == "gzip":
        try:
            return _gzip.decompress(data), "gzip"
        except Exception:
            return data, ""
    if hint == "br":
        try:  # pragma: no cover - brotli absent in this container
            import brotli  # type: ignore

            return brotli.decompress(data), "br"
        except Exception:
            return data, ""
    return data, ""


def chunk_encode(data: bytes, chunk_size: int = 512) -> bytes:
    """Inverse of :func:`maybe_dechunk` (fixture generation / tests)."""
    out = bytearray()
    for i in range(0, len(data), chunk_size):
        piece = data[i : i + chunk_size]
        out += f"{len(piece):x}".encode() + b"\r\n" + piece + b"\r\n"
    out += b"0\r\n\r\n"
    return bytes(out)
