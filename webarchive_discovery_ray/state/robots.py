"""robots.txt parsing + politeness rules (crawl-plane state).

New construction (the reference delegates crawling to Heritrix and only
classifies robots.txt as a url_type at ``WARCIndexer.java:604-606``). The
politeness *budget* itself is stateless per wave (a take-K inside the
per-host drain); this module holds the robots rule cache semantics shared
by the Ray frontier and the sequential oracle.

Pinned timing rule (documented in CrawlConfig): a host's robots.txt is
scheduled as an implicit priority=-1 fetch in the first wave the host
appears; its Disallow prefixes take effect for drains in *later* waves.
"""

from __future__ import annotations

__all__ = [
    "parse_robots",
    "is_disallowed",
    "robots_url_for_host",
    "crawl_delay_of",
    "effective_budget",
    "sitemap_urls_of",
    "parse_sitemap_locs",
    "is_sitemap_index",
    "CRAWL_DELAY_PREFIX",
    "SITEMAP_PREFIX",
    "ALLOW_PREFIX",
    "nofollow_scan",
    "fetch_duration_ms",
    "adaptive_budget_cap",
]

# Crawl-delay rides the same rules list as the Disallow prefixes (one
# sentinel entry) so every existing transport — checkpoint robots.json,
# the broadcast rules dict, the oracle's dict — carries it unchanged.
# The sentinel can never collide with a Disallow prefix match: URL paths
# always start with "/".
CRAWL_DELAY_PREFIX = "crawl-delay:"

# Sitemap URLs ride the rules list the same way (sentinel entries).
# Neither sentinel can prefix-match a Disallow check: URL paths always
# start with "/".
SITEMAP_PREFIX = "sitemap:"

# Allow rules (RFC 9309 §2.2.2) ride as ``allow:/path`` sentinels — the
# prefix keeps them out of any plain startswith-Disallow scan (paths
# start with "/", sentinels don't).
ALLOW_PREFIX = "allow:"


def robots_url_for_host(host: str) -> str:
    return f"http://{host}/robots.txt"


def parse_robots(text: str) -> list[str]:
    """Disallow prefixes + optional Crawl-delay from the
    ``User-agent: *`` group(s).

    Minimal deterministic subset of the robots exclusion protocol: groups
    start at ``User-agent:`` lines; only ``*`` groups contribute; empty
    ``Disallow:`` means allow-all and contributes nothing; the FIRST
    integer ``Crawl-delay:`` in a ``*`` group is recorded as the
    ``crawl-delay:N`` sentinel entry. ``Allow:`` lines in a ``*`` group
    (RFC 9309 §2.2.2) are recorded as ``allow:<path>`` sentinels — they
    participate in :func:`is_disallowed`'s longest-match rule.
    ``Sitemap:`` lines are GLOBAL per the protocol (not part of any
    user-agent group) — each is recorded as a ``sitemap:<url>`` sentinel
    in document order, after the others."""
    disallows: list[str] = []
    allows: list[str] = []
    sitemaps: list[str] = []
    delay: int | None = None
    applies = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            applies = value == "*"
        elif field == "disallow" and applies and value:
            disallows.append(value)
        elif field == "allow" and applies and value:
            allows.append(f"{ALLOW_PREFIX}{value}")
        elif field == "crawl-delay" and applies and delay is None and value.isdigit():
            delay = int(value)
        elif field == "sitemap" and value:
            sitemaps.append(f"{SITEMAP_PREFIX}{value}")
    if delay is not None:
        disallows.append(f"{CRAWL_DELAY_PREFIX}{delay}")
    return disallows + allows + sitemaps


def crawl_delay_of(rules: list[str]) -> int | None:
    """The Crawl-delay sentinel carried in a host's rules list, if any."""
    for r in rules:
        if r.startswith(CRAWL_DELAY_PREFIX):
            try:
                return int(r[len(CRAWL_DELAY_PREFIX):])
            except ValueError:
                return None
    return None


def effective_budget(budget: int, rules: list[str] | None) -> int:
    """Pinned politeness rule shared by the Ray drain and the sequential
    oracle: a host with ``Crawl-delay: d`` (d > 1) refills its per-wave
    token bucket ``d``-times slower — effective budget
    ``max(1, budget // d)``. Takes effect from the wave after the robots
    fetch, exactly like the Disallow prefixes."""
    if not rules:
        return budget
    d = crawl_delay_of(rules)
    if d is None or d <= 1:
        return budget
    return max(1, budget // d)


def fetch_duration_ms(status: int, payload_len: int) -> int:
    """Deterministic modeled fetch duration — the synthetic world's
    clock, shared by the Ray fetch stage and the sequential oracle:
    80 ms connection/header base + 1 ms per 50 payload bytes. Real
    deployments replace this with the fetcher's measured wall time; the
    adaptive rule below is agnostic to where the number comes from."""
    return 80 + int(payload_len) // 50


def adaptive_budget_cap(
    last_dur_ms: int,
    delay_factor_permil: int,
    min_delay_ms: int,
    max_delay_ms: int,
    wave_window_ms: int,
) -> int:
    """Heritrix adaptive politeness (the ``delayFactor`` /
    ``minDelayMs`` / ``maxDelayMs`` knobs of Heritrix's
    DispositionProcessor) mapped onto the wave model: the delay a host
    has earned is ``clamp(delay_factor x last_fetch_duration, min,
    max)`` and the wave is a fixed ``wave_window_ms`` time window, so
    the host can sustain at most ``window // delay`` fetches next wave
    (floor, but never below 1 — the queue must drain). Exact integer
    arithmetic throughout: the factor ships as permil (5000 = Heritrix's
    default delayFactor 5.0)."""
    delay = last_dur_ms * delay_factor_permil // 1000
    delay = min(max(delay, min_delay_ms), max_delay_ms)
    return max(1, wave_window_ms // max(delay, 1))


def is_disallowed(url_path: str, rules: list[str]) -> bool:
    """RFC 9309 §2.2.2 longest-match: among all Allow/Disallow prefixes
    matching the URL path, the longest wins; on a tie Allow wins; no
    match means allowed. With no Allow rules this reduces to the plain
    any-Disallow-prefix rule (all pre-Allow fixtures byte-identical).
    Sentinel entries (``crawl-delay:``/``sitemap:``) never match: paths
    always start with "/"."""
    dmax = amax = 0
    for p in rules:
        if p.startswith("/"):
            if url_path.startswith(p) and len(p) > dmax:
                dmax = len(p)
        elif p.startswith(ALLOW_PREFIX):
            q = p[len(ALLOW_PREFIX):]
            if q and url_path.startswith(q) and len(q) > amax:
                amax = len(q)
    return dmax > amax


def sitemap_urls_of(rules: list[str]) -> list[str]:
    """The Sitemap sentinels carried in a host's rules list, in document
    order."""
    return [
        r[len(SITEMAP_PREFIX):]
        for r in rules
        if r.startswith(SITEMAP_PREFIX)
    ]


import re as _re

_LOC_RE = _re.compile(r"<loc>\s*([^<]*?)\s*</loc>")


_INDEX_RE = _re.compile(r"<sitemapindex[\s>]")


def is_sitemap_index(text: str) -> bool:
    """True when a sitemap body is a ``<sitemapindex>`` (its ``<loc>``
    URLs are CHILD SITEMAPS, not pages — sitemaps.org index files)."""
    return bool(_INDEX_RE.search(text))


def parse_sitemap_locs(text: str) -> list[str]:
    """``<loc>`` URLs from a sitemap XML body, in document order
    (minimal deterministic subset of sitemaps.org: no index recursion,
    no entity decoding beyond the five XML predefineds)."""
    out = []
    for m in _LOC_RE.finditer(text):
        u = (
            m.group(1)
            .replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">")
            .replace("&quot;", '"').replace("&apos;", "'")
        )
        if u:
            out.append(u)
    return out


def nofollow_scan(html: str, base_url: str, normalise: bool = True):
    """Scan an HTML page for link-level crawl directives: returns
    ``(meta_nofollow, dropped)`` where ``meta_nofollow`` is True when a
    ``<meta name="robots">`` content token list contains ``nofollow``
    (whole page's links must not be followed), and ``dropped`` is the
    set of RESOLVED link targets of anchors carrying a ``rel`` token
    ``nofollow`` (RFC-less but universal microformat; Google 2005).

    Resolution matches the extraction chain's link rule exactly
    (``resolve_relative(base, href, normalise)`` — the same helper
    ``stages/extract.py:107`` uses), so subtracting ``dropped`` from a
    fetched page's candidate links is string-exact. Pinned conservative
    rule: a URL is dropped if ANY anchor to it on the page is
    rel=nofollow (set subtraction, not per-anchor). Shared verbatim by
    ``pipelines/crawl.py`` and ``oracle/crawl_oracle.py`` (the
    crawl-plane-shared-helper convention of parse_robots /
    is_disallowed)."""
    from ..functions.htmlscan import tokenize_html
    from ..functions.normalisation import resolve_relative

    meta_nofollow = False
    dropped: set[str] = set()
    for tok in tokenize_html(html):
        if tok.kind != "start":
            continue
        if tok.name == "meta":
            if tok.attrs.get("name", "").lower() == "robots" and "nofollow" in [
                t.strip() for t in tok.attrs.get("content", "").lower().split(",")
            ]:
                meta_nofollow = True
        elif tok.name == "a":
            rel = tok.attrs.get("rel", "").lower().split()
            href = tok.attrs.get("href")
            if "nofollow" in rel and href is not None:
                try:
                    resolved = resolve_relative(base_url, href, normalise)
                except Exception:
                    continue
                if resolved:
                    dropped.add(resolved)
    return meta_nofollow, dropped
