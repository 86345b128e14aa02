"""URL decomposition: resource name, extension, path, url_type.

Reference: ``warc-indexer/src/main/java/uk/bl/wa/indexer/WARCIndexer.java``
— ``parseResourceName`` (:748-760), ``parseExtension`` (:762-773),
``parseURL`` url_path/url_type rules (:593-639). Goldens:
``WARCIndexerTest.java:100-105``.
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit

__all__ = [
    "parse_resource_name",
    "parse_extension",
    "url_path",
    "url_type",
    "URL_TYPE_SLASHPAGE",
    "URL_TYPE_ROBOTS_TXT",
    "URL_TYPE_NORMAL",
]

URL_TYPE_SLASHPAGE = "slashpage"
URL_TYPE_ROBOTS_TXT = "robots.txt"
URL_TYPE_NORMAL = "normal"

_INDEX_PAGE = re.compile(r"/index\.[a-z]+")
_NON_ALNUM = re.compile(r"[^0-9a-z]")


def parse_resource_name(full_url: str) -> str | None:
    """Last path segment, cut at ``?`` then ``&``; None when no ``/``."""
    if "/" not in full_url:
        return None
    path = full_url.rsplit("/", 1)[1]
    if "?" in path:
        path = path.split("?", 1)[0]
    if "&" in path:
        path = path.split("&", 1)[0]
    return path


def parse_extension(path: str | None) -> str | None:
    """Lowercased alnum-only extension after the last dot; None when no dot."""
    if path is None or "." not in path:
        return None
    ext = path[path.rindex(".") :].lower()
    ext = _NON_ALNUM.sub("", ext)
    return ext


def url_path(url: str) -> str:
    """The path component of the URL (UsableURI.getPath analogue)."""
    try:
        return urlsplit(url).path
    except ValueError:
        return ""


def url_type(path: str) -> str:
    """slashpage / robots.txt / normal per WARCIndexer.java:598-612."""
    if path == "/" or path == "" or _INDEX_PAGE.fullmatch(path):
        return URL_TYPE_SLASHPAGE
    if path.lower() == "/robots.txt":
        return URL_TYPE_ROBOTS_TXT
    return URL_TYPE_NORMAL
