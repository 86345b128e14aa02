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

__all__ = ["parse_robots", "is_disallowed", "robots_url_for_host"]


def robots_url_for_host(host: str) -> str:
    return f"http://{host}/robots.txt"


def parse_robots(text: str) -> list[str]:
    """Disallow prefixes from the ``User-agent: *`` group(s).

    Minimal deterministic subset of the robots exclusion protocol: groups
    start at ``User-agent:`` lines; only ``*`` groups contribute; empty
    ``Disallow:`` means allow-all and contributes nothing."""
    disallows: list[str] = []
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
    return disallows


def is_disallowed(url_path: str, disallow_prefixes: list[str]) -> bool:
    """Prefix match of the URL path against the host's Disallow rules."""
    return any(url_path.startswith(p) for p in disallow_prefixes)
