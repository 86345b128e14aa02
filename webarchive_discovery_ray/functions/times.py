"""M36: multi-format date sniffing for metadata 'created/modified' values.

Reference: ``warc-indexer/src/main/java/uk/bl/wa/extract/Times.java:43-163``
— try a fixed ladder of textual date formats and return the first parse,
normalised to ISO-8601 Zulu. Format ladder order is pinned (first match
wins), covering the shapes Tika metadata and HTTP headers emit.
"""

from __future__ import annotations

from datetime import datetime, timezone

__all__ = ["parse_date_text", "FORMATS"]

# first match wins — ladder order is part of the contract
FORMATS = (
    "%Y-%m-%dT%H:%M:%S%z",      # ISO with offset
    "%Y-%m-%dT%H:%M:%SZ",       # ISO Zulu
    "%Y-%m-%dT%H:%M:%S",        # ISO naive
    "%Y-%m-%d %H:%M:%S",
    "%a, %d %b %Y %H:%M:%S %Z",  # RFC 1123 (HTTP Last-Modified)
    "%a, %d %b %Y %H:%M:%S %z",
    "%d %b %Y %H:%M:%S",
    "%Y:%m:%d %H:%M:%S",        # EXIF
    "%Y-%m-%d",
    "%d/%m/%Y",
    "%b %d, %Y",
    "%Y%m%d%H%M%S",             # wayback 14-digit
    "%Y",
)


def parse_date_text(value: str | None) -> str | None:
    """ISO-8601 Zulu string for the first format that parses ``value``,
    else None. Two-digit-second/zone quirks are normalised by stripping
    surrounding whitespace only — the ladder does the rest."""
    if not value:
        return None
    v = value.strip()
    for fmt in FORMATS:
        try:
            dt = datetime.strptime(v, fmt)
        except ValueError:
            continue
        if dt.tzinfo is not None:
            dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
        if 1 <= dt.year <= 9999:
            return dt.strftime("%Y-%m-%dT%H:%M:%SZ")
    return None
