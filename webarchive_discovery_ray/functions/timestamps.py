"""Wayback timestamp parsing / formatting.

Reference: ``warc-indexer/src/main/java/uk/bl/wa/indexer/WARCIndexer.java:779-838``
(12/14/16/17-digit wayback forms via ``ArchiveUtils``), goldens
``warc-indexer/src/test/java/uk/bl/wa/indexer/WARCIndexerTest.java:67-83``.

Determinism note: the reference falls back to *current time* on unparseable
input (``WARCIndexer.java:793``) — that is non-deterministic, so this engine
pins the failure case to ``None`` and lets callers emit a parse_error field
instead (SURVEY.md §4.2 determinism rule).
"""

from __future__ import annotations

import re
from datetime import datetime, timezone

__all__ = [
    "strip_non_digits",
    "parse_wayback_date",
    "format_iso",
    "parse_crawl_date",
    "extract_year",
    "to_wayback14",
]

_NON_DIGIT = re.compile(r"[^0-9]")


def strip_non_digits(timestamp: str) -> str:
    """``header.getDate().replaceAll("[^0-9]", "")`` (WARCIndexer.java:540)."""
    return _NON_DIGIT.sub("", timestamp)


def parse_wayback_date(timestamp: str) -> datetime | None:
    """12/14/16/17-digit wayback timestamp -> naive-UTC datetime.

    12: yyyyMMddHHmm; 14: +ss; 16: +cs (a '0' is appended to make 17);
    >=17: yyyyMMddHHmmssSSS (first 17 digits). Other lengths -> None.
    """
    # manual slice-parse (strptime here measured ~4% of the extraction
    # chain); the ASCII-digits guard matches strptime's strictness (int()
    # alone would accept '+1' / unicode digits) and the datetime
    # constructor enforces the same field ranges strptime did
    if not (timestamp.isascii() and timestamp.isdigit()):
        return None
    try:
        n = len(timestamp)
        if n == 12:
            return datetime(
                int(timestamp[0:4]), int(timestamp[4:6]), int(timestamp[6:8]),
                int(timestamp[8:10]), int(timestamp[10:12]),
            )
        if n == 14:
            return datetime(
                int(timestamp[0:4]), int(timestamp[4:6]), int(timestamp[6:8]),
                int(timestamp[8:10]), int(timestamp[10:12]), int(timestamp[12:14]),
            )
        if n == 16:
            timestamp = timestamp + "0"
            n = 17
        if n >= 17:
            return datetime(
                int(timestamp[0:4]), int(timestamp[4:6]), int(timestamp[6:8]),
                int(timestamp[8:10]), int(timestamp[10:12]), int(timestamp[12:14]),
                int(timestamp[14:17]) * 1000,
            )
    except ValueError:
        return None
    return None


def format_iso(dt: datetime) -> str:
    """``yyyy-MM-dd'T'HH:mm:ss'Z'`` (WARCIndexer.java:782-787)."""
    if dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
    return dt.strftime("%Y-%m-%dT%H:%M:%SZ")


def parse_crawl_date(wayback_date: str) -> str | None:
    """Wayback digits -> ISO-8601 no-millis string (WARCIndexer.java:815-820)."""
    dt = parse_wayback_date(wayback_date)
    return None if dt is None else format_iso(dt)


def extract_year(timestamp: str) -> str:
    """First four digits, or ``unknown`` (WARCIndexer.java:827-838)."""
    digits = strip_non_digits(timestamp)
    if len(digits) < 4:
        return "unknown"
    year = digits[:4]
    return "unknown" if year == "0000" else year


def to_wayback14(dt: datetime) -> str:
    """datetime -> 14-digit wayback form (the WAYBACK_DATE field)."""
    if dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
    return dt.strftime("%Y%m%d%H%M%S")
