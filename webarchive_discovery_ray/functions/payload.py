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

import gzip as _gzip  # noqa: F401 - magic constant parity with stdlib path
import re
import zlib as _zlib

__all__ = ["maybe_dechunk", "maybe_decompress", "chunk_encode"]

# no leading ^: .match(data, pos) anchors at pos, but ^ would still mean
# position 0 and break mid-stream chunk-head matches
_CHUNK_HEAD = re.compile(rb"([0-9a-fA-F]{1,8})(;[^\r\n]*)?\r?\n")
_GZIP_MAGIC = b"\x1f\x8b"

# sentinel: probe unconditionally (the reference's 1-arg maybeDechunk);
# callers with an HTTP header should pass the Transfer-Encoding value
_PROBE = object()


def maybe_dechunk(data: bytes, hint: object = _PROBE) -> tuple[bytes, bool]:
    """Decode HTTP chunked framing; return ``(payload, was_chunked)``.

    When ``hint`` is given (the record's Transfer-Encoding header) the
    framing probe runs ONLY when it equals ``chunked`` case-insensitively
    (``InputStreamUtils.java:243-259``: any other value — including absent
    — passes the stream through unmodified). Without a hint the head is
    probed unconditionally (the reference's 1-arg ``maybeDechunk``). Any
    framing inconsistency mid-stream returns the ORIGINAL bytes untouched
    (a probe mismatch is not-chunked, not an error)."""
    if hint is not _PROBE and (str(hint or "")).strip().lower() != "chunked":
        return data, False
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


# decompression-bomb guard: the reference tiers payloads at 50 MB RAM /
# 1000 MB disk and truncates beyond (HashedCachedInputStream.java:129-147);
# an in-task Arrow payload gets one bounded heap allowance and a hostile
# high-ratio stream passes through UNCHANGED like any other decode failure
_MAX_DECODED = 256 << 20


def _gunzip_capped(data: bytes, max_output: int) -> bytes:
    """Multi-member gunzip (``gzip.decompress`` semantics: concatenated
    members decode to concatenated output, incomplete/garbled input
    raises) that enforces ``max_output`` DURING decode."""
    out = bytearray()
    buf = data
    while True:
        d = _zlib.decompressobj(wbits=31)
        chunk = d.decompress(buf, max_output - len(out) + 1)
        if d.unconsumed_tail:
            raise ValueError("gzip output limit exceeded")
        out += chunk + d.flush()
        if len(out) > max_output:
            raise ValueError("gzip output limit exceeded")
        if not d.eof:
            raise EOFError("incomplete gzip member")
        buf = d.unused_data
        if not buf:
            return bytes(out)


def maybe_decompress(
    data: bytes,
    content_encoding: str | None = None,
    max_output: int = _MAX_DECODED,
) -> tuple[bytes, str]:
    """Return ``(payload, encoding_applied)``.

    A present Content-Encoding hint takes precedence over magic sniffing
    (``InputStreamUtils.maybeDecompress``, :399-447): ``''`` passes the
    stream through as-is, ``gzip``/``br`` decompress, anything else passes
    through. Only when the header is ABSENT (``None``) is the gzip magic
    auto-sniffed (brotli is never sniffed — unreliable per the reference's
    own comment). brotli decodes through the from-scratch RFC 7932
    decoder (``functions/brotli_dec.py``); streams that reference the
    appendix-A static dictionary (data unavailable in this container)
    pass through unchanged via its documented gate, as do corrupt
    streams and streams whose decoded size exceeds ``max_output``
    (decompression bombs — both codecs enforce the cap DURING decode,
    so a hostile ratio costs bounded memory, not post-hoc discovery)."""
    if content_encoding is None:
        if data[:2] == _GZIP_MAGIC:
            try:
                return _gunzip_capped(data, max_output), "gzip"
            except Exception:
                return data, ""
        return data, ""
    hint = content_encoding.strip().lower()
    if hint == "gzip":
        try:
            return _gunzip_capped(data, max_output), "gzip"
        except Exception:
            return data, ""
    if hint == "br":
        from .brotli_dec import BrotliError, brotli_decompress

        try:
            return brotli_decompress(data, max_output=max_output), "br"
        except BrotliError:
            # incl. the static-dictionary gate and the output cap: pass
            # through unchanged
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
