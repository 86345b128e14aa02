"""Host decomposition: public/private suffix + host-level expansion.

Reimplements the semantics of the reference's
``warc-indexer/src/main/java/uk/bl/wa/extract/LinkExtractor.java:58-234``
(which uses Guava ``InternetDomainName`` over the Mozilla Public Suffix List,
with a hard-coded ``.uk`` override) pinned by
``warc-indexer/src/test/java/uk/bl/wa/extract/LinkExtractorTest.java``.

The full PSL is not shipped in this sandbox; ``_SUFFIXES`` embeds a compact
deterministic subset (ICANN TLDs + second-level rules + the private-domain
entries the reference tests exercise). At production scale the set would be
loaded from a PSL snapshot file broadcast once per worker (``ray.put``); the
lookup logic is identical.
"""

from __future__ import annotations

from functools import lru_cache

import re

__all__ = [
    "MALFORMED_HOST",
    "extract_host",
    "extract_public_suffix_from_host",
    "extract_private_suffix_from_host",
    "all_levels",
]

MALFORMED_HOST = "malformed.host"

# RFC-952/RFC-1123-ish host label validation, per LinkExtractor.java:78-80.
# The reference's pattern allows \p{L} broadly, but its Apache URI handler
# replaces non-ASCII characters with '?' BEFORE the pattern runs
# (LinkExtractor.java:77 comment), so the EFFECTIVE acceptance is
# ASCII-only — pinned by HTMLAnalyserTest.java:96-110 (æblegrød.dk must
# be rejected as a host/domain).
_HOST_LABEL = r"(?:[a-zA-Z0-9]|[a-zA-Z0-9][a-zA-Z0-9-]{0,61}[a-zA-Z0-9])"
_HOST_PATTERN = re.compile(rf"{_HOST_LABEL}(?:[.]{_HOST_LABEL})*$")

_SCHEME_AUTHORITY = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)")

# Compact deterministic PSL subset. Multi-label entries listed explicitly;
# matching picks the LONGEST suffix (Guava semantics). Includes the
# "private domain" section entries used by the reference tests
# (LinkExtractorTest.java:83-99: googleapis.com, cloudfront.net, blogspot.dk).
_SUFFIXES = frozenset(
    """
    com org net edu gov mil int info biz name io co ai dev app uk us eu
    de fr nl se no fi dk it es pt pl ru cn jp kr au ca nz br mx in ch at be ie
    cz sk hu ro gr tr il za ar cl pe ve ua lt lv ee is lu mt cy example test invalid local
    co.uk org.uk gov.uk ac.uk sch.uk net.uk me.uk ltd.uk plc.uk nhs.uk police.uk mod.uk
    com.au net.au org.au edu.au gov.au
    co.nz org.nz net.nz govt.nz ac.nz
    co.jp ne.jp or.jp ac.jp go.jp
    com.br net.br org.br gov.br
    com.mx org.mx gob.mx
    com.cn net.cn org.cn gov.cn edu.cn
    com.ar com.tr com.ua co.za org.za gov.za co.il org.il co.in net.in org.in gov.in
    googleapis.com cloudfront.net amazonaws.com s3.amazonaws.com herokuapp.com
    github.io gitlab.io netlify.app pages.dev web.app firebaseapp.com
    blogspot.com blogspot.co.uk blogspot.dk blogspot.de blogspot.fr blogspot.com.au
    wordpress.com tumblr.com azurewebsites.net appspot.com
    """.split()
)


_LABEL_RX = re.compile(r"[\w-]+", re.UNICODE)


def _valid_domain_parts(host: str) -> list[str] | None:
    """Guava ``InternetDomainName.from`` validation: syntactically valid
    domain, not an IP address (final label all-digits => invalid)."""
    if not host:
        return None
    host = host.rstrip(".")
    parts = host.split(".")
    if not parts or any(not p for p in parts):
        return None
    if len(host) > 253:
        return None
    for p in parts:
        if len(p) > 63:
            return None
        if not _LABEL_RX.fullmatch(p):
            return None
        if p.startswith("-") or p.endswith("-"):
            return None
    if parts[-1].isdigit():  # looks like an IPv4 address / numeric TLD
        return None
    return parts


def extract_host(url: str) -> str:
    """Parse the host out of an arbitrary string; ``malformed.host`` when the
    host is absent, invalid or over 255 chars.

    Reference: ``LinkExtractor.java:58-80``; goldens
    ``LinkExtractorTest.java:testExtractHost``.
    """
    try:
        m = _SCHEME_AUTHORITY.match(url)
        if not m:
            return MALFORMED_HOST
        authority = m.group(1)
        if "@" in authority:
            authority = authority.rsplit("@", 1)[1]
        host = authority
        if ":" in host and not host.startswith("["):
            host = host.split(":", 1)[0]
        if not host or not _HOST_PATTERN.fullmatch(host) or len(host) > 255:
            return MALFORMED_HOST
        return host
    except Exception:
        return MALFORMED_HOST


def _longest_suffix(parts: list[str]) -> str | None:
    """Longest matching entry of ``_SUFFIXES`` that is a proper suffix chain
    of ``parts`` (Guava ``publicSuffix()``, incl. private-section entries)."""
    for i in range(len(parts)):
        cand = ".".join(parts[i:])
        if cand in _SUFFIXES:
            return cand
    return None


@lru_cache(maxsize=65536)  # hosts repeat heavily per batch
def extract_public_suffix_from_host(host: str | None) -> str | None:
    """Public suffix with the reference's ``.uk`` 2-level override.

    Reference: ``LinkExtractor.java:120-142``.
    """
    if host is None:
        return None
    parts = _valid_domain_parts(host.lower())
    if parts is None:
        return None
    if host.endswith(".uk"):
        if len(parts) >= 2:
            return ".".join(parts[-2:])
        return None
    return _longest_suffix(parts)


@lru_cache(maxsize=65536)  # hosts repeat heavily per batch
def extract_private_suffix_from_host(host: str | None) -> str | None:
    """Private (registrable) domain; ``.uk`` treated as three levels;
    falls back to the host itself on parse trouble.

    Reference: ``LinkExtractor.java:161-194``; goldens
    ``LinkExtractorTest.java`` (bbc.co.uk, place.nhs.uk, whatever.googleapis.com...).
    """
    if host is None:
        return None
    lower = host.lower()
    parts = _valid_domain_parts(lower)
    if parts is None:
        return host
    if lower.endswith(".uk"):
        if len(parts) >= 3:
            return ".".join(parts[-3:])
        return lower  # suffix == null -> fall back on the host value
    suffix = _longest_suffix(parts)
    if suffix is None:
        return lower  # no recognised public suffix -> the domain name itself
    n_suffix = suffix.count(".") + 1
    if len(parts) > n_suffix:
        return ".".join(parts[-(n_suffix + 1) :])  # topPrivateDomain
    return lower  # the host IS a public suffix -> fall back on host


@lru_cache(maxsize=65536)  # hosts repeat heavily per batch
def all_levels(host: str | None) -> list[str]:
    """Every ancestor level of the host, root-first.

    ``news.bbc.co.uk`` -> ``["uk", "co.uk", "bbc.co.uk", "news.bbc.co.uk"]``.
    IP-based or invalid hosts yield ``[]``
    (reference: ``LinkExtractor.java:203-234``).
    """
    if host is None:
        return []
    parts = _valid_domain_parts(host.lower())
    if parts is None:
        return []
    return [".".join(parts[i:]) for i in range(len(parts) - 1, -1, -1)]
