"""MIME detection (magic-bytes table) and content-type reconciliation.

* Detection replaces Tika's magic detector (``TikaPayloadAnalyser.java:255-268``)
  with a deterministic first-bytes table + name-hint fallback (SURVEY.md M17,
  M29 — the DROID signature DB is folded into the same table).
* Reconciliation ports the precedence chain of
  ``warc-indexer/src/main/java/uk/bl/wa/analyser/WARCPayloadAnalysers.java:131-231``
  (golden: ``WARCPayloadAnalysersTest.java:45-58`` — octet-stream falls back
  to the served type) and the 10-way normalised-type table (:187-222).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

__all__ = [
    "detect_mime",
    "reconcile_content_type",
    "normalise_content_type",
    "ContentTypeResult",
    "MAGIC_TABLE",
    "EXTENSION_TABLE",
    "PARSE_EXCLUDE_MIMES",
]

# (magic prefix, mime). Order matters: first match wins. Longest-prefix
# entries first where prefixes overlap.
MAGIC_TABLE: tuple[tuple[bytes, str], ...] = (
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"GIF87a", "image/gif"),
    (b"GIF89a", "image/gif"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"%PDF-", "application/pdf"),
    (b"PK\x03\x04", "application/zip"),
    (b"\x1f\x8b", "application/gzip"),
    (b"BM", "image/bmp"),
    (b"ID3", "audio/mpeg"),
    (b"\xff\xfb", "audio/mpeg"),
    (b"OggS", "audio/ogg"),
    (b"fLaC", "audio/x-flac"),
    (b"\x00\x00\x00\x18ftyp", "video/mp4"),
    (b"\x00\x00\x00\x20ftyp", "video/mp4"),
    (b"\x1aE\xdf\xa3", "video/webm"),
    (b"{\\rtf", "application/rtf"),
    (b"<?xml", "application/xml"),
    (b"<!DOCTYPE html", "text/html"),
    (b"<!doctype html", "text/html"),
    (b"<html", "text/html"),
    (b"<HTML", "text/html"),
)

# Name-hint fallback (Tika uses the resource name when magic is inconclusive).
EXTENSION_TABLE: dict[str, str] = {
    "html": "text/html",
    "htm": "text/html",
    "xhtml": "application/xhtml+xml",
    "css": "text/css",
    "js": "application/javascript",
    "json": "application/json",
    "xml": "application/xml",
    "txt": "text/plain",
    "png": "image/png",
    "gif": "image/gif",
    "jpg": "image/jpeg",
    "jpeg": "image/jpeg",
    "bmp": "image/bmp",
    "webp": "image/webp",
    "pdf": "application/pdf",
    "zip": "application/zip",
    "gz": "application/gzip",
    "mp3": "audio/mpeg",
    "ogg": "audio/ogg",
    "wav": "audio/x-wav",
    "mp4": "video/mp4",
    "webm": "video/webm",
    "doc": "application/msword",
    "xls": "application/vnd.ms-excel",
    "ppt": "application/vnd.ms-powerpoint",
    "rtf": "application/rtf",
}

# MIME types excluded from heavy parsing (TikaPayloadAnalyser.java:668-678 /
# reference.conf mime_exclude list).
PARSE_EXCLUDE_MIMES = re.compile(
    r"x-tar|x-gzip|bzip|zip|javascript|css|octet-stream|image|video|audio"
)


def _mostly_printable(head: bytes) -> bool:
    if not head:
        return False
    printable = sum(1 for b in head if 0x20 <= b < 0x7F or b in (0x09, 0x0A, 0x0D))
    return printable / len(head) > 0.95


def detect_mime(first_bytes: bytes, name_hint: str | None = None) -> str:
    """Magic-bytes detection with name-hint fallback; mirrors the Tika
    ``detect(stream, name)`` contract deterministically.

    Empty payload -> ``application/x-empty`` (WARCPayloadAnalysers.java:176).
    """
    if not first_bytes:
        return "application/x-empty"
    for magic, mime in MAGIC_TABLE:
        if first_bytes.startswith(magic):
            return mime
    if name_hint and "." in name_hint:
        ext = name_hint.rsplit(".", 1)[1].lower()
        ext = re.sub(r"[^0-9a-z]", "", ext)
        if ext in EXTENSION_TABLE:
            return EXTENSION_TABLE[ext]
    head = first_bytes[:512]
    if _mostly_printable(head):
        lowered = head.lstrip().lower()
        if lowered.startswith(b"<"):
            return "text/html"
        return "text/plain"
    return "application/octet-stream"


@dataclass(frozen=True)
class ContentTypeResult:
    content_type: str | None  # SOLR_CONTENT_TYPE (parameters stripped)
    content_type_full: str | None  # FULL_CONTENT_TYPE (parameters kept)
    content_type_norm: str | None  # 10-way normalised type
    solr_type: str | None  # "Image" / "Web Page" / ...
    content_type_version: str | None
    strip_text: bool  # drop extracted text (js/css)


_NORM_TABLE: tuple[tuple[str, str, str], ...] = (
    # (regex over the full content type, normalised, solr type) — order matters
    (r"^image/.*$", "image", "Image"),
    (r"^audio/.*$|^application/vnd\.rn-realaudio$", "audio", "Audio"),
    (r"^video/.*$|^application/mp4$|^application/vnd\.rn-realmedia$", "video", "Video"),
    (r"^text/htm.*$|^application/xhtml.*$", "html", "Web Page"),
    (r"^application/pdf.*$", "pdf", "Document"),
    (r"^.*word$", "word", "Document"),
    (r"^.*excel$", "excel", "Data"),
    (r"^.*powerpoint$", "powerpoint", "Presentation"),
    (r"^text/plain.*$", "text", "Document"),
)


def normalise_content_type(content_type: str) -> tuple[str, str]:
    """The 10-way normalised type + display type (WARCPayloadAnalysers.java:187-222)."""
    for pattern, norm, solr_type in _NORM_TABLE:
        if re.match(pattern, content_type):
            return norm, solr_type
    return "other", "Other"


def _parse_media_type(ct: str | None) -> tuple[str | None, dict[str, str]]:
    """``type/subtype; k=v; ...`` -> (base, params)."""
    if ct is None or not ct.strip():
        return None, {}
    parts = ct.split(";")
    base = parts[0].strip().lower()
    params: dict[str, str] = {}
    for p in parts[1:]:
        if "=" in p:
            k, v = p.split("=", 1)
            params[k.strip().lower()] = v.strip().strip('"')
    return base or None, params


def reconcile_content_type(
    tika: str | None,
    droid: str | None = None,
    served: str | None = None,
    warc_identified: str | None = None,
    warc_mimetype: str | None = None,
    content_length: int = 0,
    revisit: bool = False,
) -> ContentTypeResult:
    """Precedence merge of detector results, ported from
    ``WARCPayloadAnalysers.processContentType`` (:131-231).

    Order: start from tika; droid overrides octet-stream/none and contributes
    a version parameter when base types agree; empty/octet-stream falls back
    to WARC-Identified-Payload-Type, then the served type, then the WARC
    header mimetype; zero-length non-revisit forces ``application/x-empty``.
    """
    content_type = tika
    version: str | None = None

    mt_tika, tika_params = _parse_media_type(tika)
    if droid:
        mt_droid, droid_params = _parse_media_type(droid)
        if mt_tika is None or mt_tika == "application/octet-stream":
            content_type = droid
        elif (
            mt_droid is not None
            and mt_droid.split("/")[0] == mt_tika.split("/")[0]
            and mt_droid == mt_tika
            and droid_params.get("version")
        ):
            merged = dict(tika_params)
            merged.update(droid_params)
            content_type = mt_tika + "".join(f"; {k}={v}" for k, v in sorted(merged.items()))
        if droid_params.get("version"):
            version = droid_params["version"]

    if content_type is not None and (
        content_type == "" or content_type == "application/octet-stream"
    ):
        if warc_identified:
            content_type = warc_identified
        elif served:
            content_type = served
        else:
            content_type = warc_mimetype

    content_type_full = content_type if content_type is not None else None

    if content_length == 0 and not revisit:
        content_type = "application/x-empty"

    if content_type is None:
        return ContentTypeResult(None, content_type_full, None, None, version, False)

    stripped = re.sub(r";.*$", "", content_type)
    norm, solr_type = normalise_content_type(content_type)
    strip_text = content_type.startswith(
        ("application/javascript", "text/javascript", "text/css")
    )
    return ContentTypeResult(stripped, content_type_full, norm, solr_type, version, strip_text)
