"""URL / WARC-header normalisation kernels.

From-scratch Python reimplementation of the *semantics* of the reference's
normalisation layer (ukwa/webarchive-discovery,
``warc-indexer/src/main/java/uk/bl/wa/util/Normalisation.java:58-331``),
pinned by the golden tables in
``warc-indexer/src/test/java/uk/bl/wa/util/NormalisationTest.java:30-244``.

These are the *critical shared scalar functions*: the crawl frontier (SURT
keys, URL-seen hashing), link post-processing and the ``url_norm`` field all
flow through :func:`canonicalise_url`, so this module must be byte-exact per
the golden tests.

Pipeline of :func:`canonicalise_url` (mirrors ``Normalisation.java:136-173``):

1. wayback-style aggressive canonicalisation (trim, lowercase, session-id
   strip, ``www\\d*.`` strip *when a path part follows* — the archive.org
   canonicalizer keeps ``www`` on domain-only URLs);
2. ``https`` -> ``http``;
3. (unambiguous mode) strip ``www\\d*`` / ``ww2`` / ``ww`` host prefixes;
4. %-escape error fixing + high-order UTF-8 unescaping to raw bytes
   (``Normalisation.java:178-203``);
5. re-escape pass over the byte stream (``Normalisation.java:206-275``):
   space/%/backslash always escaped, ``#`` keeps existing escapes, space in
   the query becomes ``+``, lone UTF-8 continuation bytes and 3/4-byte UTF-8
   sequences are %-escaped (lowercase hex), 2-byte sequences pass raw when
   ``allow_high_order``;
6. strip all trailing slashes; re-add one if the URL is domain-only.
"""

from __future__ import annotations

import base64
import re
from urllib.parse import urljoin

__all__ = [
    "sanitise_warc_header_value",
    "canonicalise_url",
    "fix_url_errors",
    "resolve_relative",
    "canonicalise_host",
    "sha1_hash_as_base32",
]

# Reference: Normalisation.java:175 (reference's own unambiguous www-strip).
_WWW_PREFIX = re.compile(r"([a-z]+://)(?:www[0-9]*|ww2|ww)\.(.+)", re.DOTALL)
# Reference: Normalisation.java:174.
_DOMAIN_ONLY = re.compile(r"https?://[^/]+")
# wayback AggressiveUrlCanonicalizer behaviour: www stripped only when a
# non-empty path part follows the host (NormalisationTest.java:93 comment and
# the testEscapeFix golden `http://www.example.com/foo|bar`).
_WWW_CANON = re.compile(r"^([a-z]+://)(?:www[0-9]*)\.([^/]+/.+)$", re.DOTALL)

# wayback aggressive session-id stripping (no golden tests pin these; they
# follow the publicly documented archive.org aggressive rules and are shared
# verbatim by the sequential oracle, which is the conformance target here).
_PATH_SESSIONID_RES = (
    re.compile(r";jsessionid=[0-9a-z]{32}(?=[/?]|$)"),
)
_QUERY_SESSIONID_RES = (
    re.compile(r"(?:^|(?<=&))jsessionid=[0-9a-z]{10,}(?:&|$)"),
    re.compile(r"(?:^|(?<=&))phpsessid=[0-9a-z]{10,}(?:&|$)"),
    re.compile(r"(?:^|(?<=&))aspsessionid[a-z]{8}=[a-z0-9]{10,}(?:&|$)"),
    re.compile(r"(?:^|(?<=&))cfid=[0-9]+&cftoken=[0-9a-z-]+(?:&|$)"),
    re.compile(r"(?:^|(?<=&))sid=[0-9a-f]{32}(?:&|$)"),
)

_HEX = b"0123456789abcdef"


def sanitise_warc_header_value(value: str | None) -> str | None:
    """``<foo bar>`` -> ``foo bar``; single-sided brackets untouched.

    Reference: ``Normalisation.java:58-71`` / goldens
    ``NormalisationTest.java:33-48``.
    """
    if value is None:
        return None
    if value.startswith("<") and value.endswith(">"):
        return value[1:-1]
    return value


def _strip_session_ids(url: str) -> str:
    qpos = url.find("?")
    path, query = (url, None) if qpos < 0 else (url[:qpos], url[qpos + 1 :])
    for pat in _PATH_SESSIONID_RES:
        path = pat.sub("", path)
    if query is None:
        return path
    for pat in _QUERY_SESSIONID_RES:
        query = pat.sub("", query)
    query = query.strip("&")
    return path + "?" + query if query else path


def _wayback_canonicalize(url: str) -> str:
    """Approximation of org.archive.wayback AggressiveUrlCanonicalizer
    ``canonicalize(String)``: trim + lowercase + session-id strip + www-strip
    when a path part is present. Scheme, fragment and surrounding whitespace
    are preserved (golden: a trailing query space becomes ``+``)."""
    url = url.lower()
    url = _strip_session_ids(url)
    m = _WWW_CANON.match(url)
    if m:
        url = m.group(1) + m.group(2)
    return url


def _is_hex_byte(b: int) -> bool:
    return 0x30 <= b <= 0x39 or 0x61 <= b <= 0x66 or 0x41 <= b <= 0x46


def _fix_escape_errors_and_unescape_high_order(url: str) -> bytes:
    """Port of ``Normalisation.java:178-203``: faulty ``%`` -> ``%25``; valid
    high-order escapes (>0x7F) become raw bytes; ASCII escapes kept."""
    utf8 = url.encode("utf-8")
    out = bytearray()
    i, n = 0, len(utf8)
    while i < n:
        c = utf8[i]
        if c == 0x25:  # '%'
            if i < n - 2 and _is_hex_byte(utf8[i + 1]) and _is_hex_byte(utf8[i + 2]):
                u = int(utf8[i + 1 : i + 3].decode("ascii"), 16)
                if u & 0x80 == 0:  # ASCII -> keep escaped, original hex case
                    out.append(0x25)
                    out.append(utf8[i + 1])
                    out.append(utf8[i + 2])
                else:  # high-order -> raw byte
                    out.append(u)
                i += 3
            else:  # faulty escape -> escape the percent itself
                out.extend(b"%25")
                i += 1
        else:
            out.append(c)
            i += 1
    return bytes(out)


def _hex_escape(cp: int, out: bytearray) -> None:
    out.append(0x25)
    out.append(_HEX[cp >> 4])
    out.append(_HEX[cp & 0xF])


def _must_escape(cp: int) -> bool:  # space, '%', '\\'
    return cp in (0x20, 0x25, 0x5C)


def _keep_escape(cp: int) -> bool:  # '#'
    return cp == 0x23


def _escape_utf8(utf8: bytes, escape_high_order: bool, normalise_low_order: bool) -> str:
    """Port of ``Normalisation.java:206-275``. Requires well-formed escapes
    (as produced by :func:`_fix_escape_errors_and_unescape_high_order`)."""
    out = bytearray()
    i, n = 0, len(utf8)
    param_section = False
    while i < n:
        c = utf8[i]
        param_section = param_section or c == 0x3F  # '?'
        if param_section and c == 0x20:  # space in query -> '+'
            out.append(0x2B)
        elif c == 0x25:  # '%', guaranteed two hex bytes follow
            cp = int(utf8[i + 1 : i + 3].decode("ascii"), 16)
            if param_section and cp == 0x20:
                out.append(0x2B)
            elif _must_escape(cp) or _keep_escape(cp) or not normalise_low_order:
                _hex_escape(cp, out)
            else:  # normalise non-essential escape back to the raw ASCII char
                out.append(cp)
            i += 2
        elif c & 0x80 == 0:  # ASCII
            if _must_escape(c):
                _hex_escape(c, out)
            else:
                out.append(c)
        elif c & 0xC0 == 0x80:  # stray UTF-8 continuation byte
            _hex_escape(c, out)
        elif c & 0xE0 == 0xC0:  # 2-byte UTF-8
            if i >= n - 1 or (utf8[i + 1] & 0xC0) != 0x80:
                _hex_escape(c, out)
            elif escape_high_order:
                _hex_escape(utf8[i], out)
                i += 1
                _hex_escape(utf8[i], out)
            else:
                out.append(utf8[i])
                i += 1
                out.append(utf8[i])
        elif c & 0xF0 == 0xE0:  # 3-byte UTF-8: always escaped
            if i >= n - 2 or (utf8[i + 1] & 0xC0) != 0x80 or (utf8[i + 2] & 0xC0) != 0x80:
                _hex_escape(c, out)
            else:
                _hex_escape(utf8[i], out)
                _hex_escape(utf8[i + 1], out)
                _hex_escape(utf8[i + 2], out)
                i += 2
        elif c & 0xF8 == 0xF0:  # 4-byte UTF-8: always escaped
            if (
                i >= n - 3
                or (utf8[i + 1] & 0xC0) != 0x80
                or (utf8[i + 2] & 0xC0) != 0x80
                or (utf8[i + 3] & 0xC0) != 0x80
            ):
                _hex_escape(c, out)
            else:
                _hex_escape(utf8[i], out)
                _hex_escape(utf8[i + 1], out)
                _hex_escape(utf8[i + 2], out)
                _hex_escape(utf8[i + 3], out)
                i += 3
        else:  # illegal first byte
            _hex_escape(c, out)
        i += 1
    return out.decode("utf-8")


def canonicalise_url(url: str, allow_high_order: bool = True, create_unambiguous: bool = True) -> str:
    """Multi-step aggressive URL canonicalisation.

    Reference: ``Normalisation.java:136-173``; goldens
    ``NormalisationTest.java:102-220``.
    """
    url = _wayback_canonicalize(url)
    if url.startswith("https://"):
        url = "http://" + url[8:]
    if create_unambiguous:
        m = _WWW_PREFIX.fullmatch(url)
        if m:
            url = m.group(1) + m.group(2)
    # fast path: pure-ASCII URLs with no '%'/' '/'\\' pass the escape
    # state machine unchanged (the common case; the slow path below is the
    # byte-exact port and remains the source of truth)
    if not (url.isascii() and "%" not in url and " " not in url and "\\" not in url):
        raw = _fix_escape_errors_and_unescape_high_order(url)
        url = _escape_utf8(raw, escape_high_order=not allow_high_order, normalise_low_order=create_unambiguous)
    while url.endswith("/"):
        url = url[:-1]
    if _DOMAIN_ONLY.fullmatch(url):
        url += "/"
    return url


def fix_url_errors(url: str) -> str:
    """Only fix faulty escapes; keep valid escapes as-is.

    Reference: ``Normalisation.java:87-89``.
    """
    return canonicalise_url(url, allow_high_order=False, create_unambiguous=False)


from functools import lru_cache


@lru_cache(maxsize=256)
def _scheme_netloc(base: str) -> str | None:
    """``scheme://netloc`` of a base URL (cached: one parse per page, not
    one per link)."""
    from urllib.parse import urlsplit

    try:
        sp = urlsplit(base)
    except Exception:  # pragma: no cover
        return None
    if not sp.scheme or not sp.netloc:
        return None
    return f"{sp.scheme}://{sp.netloc}"


def resolve_relative(url: str, relative: str, normalise: bool = True) -> str:
    """Resolve ``relative`` against ``url``; optionally canonicalise.

    Reference: ``Normalisation.java:100-121``; goldens
    ``NormalisationTest.java:68-93``.

    Fast paths (urljoin measured ~14% of the extraction chain) cover only
    cases verified byte-identical to ``urljoin``: a lowercase-scheme
    absolute ref returns as-is (urljoin does NOT resolve dot segments
    inside absolute refs, only lowercases the scheme), and a
    root-relative ref without dot segments concatenates onto the cached
    ``scheme://netloc``. Everything else (protocol-relative, dotted,
    query/fragment-relative, uppercase schemes) takes the stdlib path.
    """
    resolved = None
    if relative.startswith(("http://", "https://")):
        resolved = relative
    elif (
        relative.startswith("/")
        and not relative.startswith("//")
        and "/." not in relative  # any dot segment: /./ /../ trailing /. /..
    ):
        prefix = _scheme_netloc(url)
        if prefix is not None:
            resolved = prefix + relative
    if resolved is None:
        try:
            resolved = urljoin(url, relative)
        except Exception as exc:  # pragma: no cover - urljoin rarely raises
            raise ValueError(
                f"Unable to resolve '{relative}' relative to '{url}'"
            ) from exc
    if not resolved:
        raise ValueError(f"Unable to resolve '{relative}' relative to '{url}'")
    return canonicalise_url(resolved) if normalise else resolved


def canonicalise_host(host_or_url: str) -> str:
    """Reduce a URL or bare host to a canonical host.

    Mirrors wayback ``urlStringToKey(...).replace("/", "")`` as used at
    ``Normalisation.java:73-75``: trim, lowercase, drop scheme / userinfo /
    port / path, strip leading ``www\\d*.``.
    Goldens: ``NormalisationTest.java:222-237``, ``LinkExtractorTest.java``.
    """
    s = host_or_url.strip().lower()
    s = re.sub(r"^[a-z][a-z0-9+.-]*://", "", s)
    s = s.split("?", 1)[0].split("#", 1)[0]
    host = s.split("/", 1)[0]
    if "@" in host:
        host = host.rsplit("@", 1)[1]
    if ":" in host and not host.startswith("["):
        host = host.split(":", 1)[0]
    host = re.sub(r"^www[0-9]*\.", "", host)
    return host


_SHA1_BASE16 = re.compile(r"([sS][hH][aA]1:)([0-9A-Fa-f]{40})")


def sha1_hash_as_base32(hash_str: str | None) -> str | None:
    """``sha1:<base16>`` -> ``sha1:<base32>``; anything else unchanged.

    Reference: ``Normalisation.java:309-331`` (brozzler base16 digests).
    """
    if hash_str is None or len(hash_str) != 45:
        return hash_str
    m = _SHA1_BASE16.fullmatch(hash_str)
    if not m:
        return hash_str
    return m.group(1) + base64.b32encode(bytes.fromhex(m.group(2))).decode("ascii")
