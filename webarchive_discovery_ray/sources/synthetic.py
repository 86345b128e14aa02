"""Deterministic synthetic pseudo-web: page generator + fixture tables.

Replaces the reference's binary WARC fixture corpus
(``warc-indexer/src/test/resources/`` — IAH blackbook, wikipedia-mona-lisa,
gov.uk-revisit-warcs) with a seeded generator per FIXTURES.md §2-3. Every
page is a pure function of ``(url, SyntheticConfig)`` via sha1-based hashing
(:func:`stable_hash64`), so the distributed fetch simulator and the
sequential oracle regenerate identical bytes with no shared state.

The link graph is implicit: ``page(url)`` links to ``outlink(url, i)`` for
``i < fanout(url)``. It includes a hot host (~30% of targets), https/www
variants that canonicalise onto already-seen URLs, relative links, malformed
links, per-host robots.txt, and media objects with magic-byte payloads.
"""

from __future__ import annotations

from ..config import SyntheticConfig
from ..functions.hashing import sha1_b32, stable_hash64

__all__ = [
    "hosts",
    "make_url",
    "outlinks",
    "page_for_url",
    "fixture_pages",
    "seed_urls",
]

_MAGIC = {
    "png": b"\x89PNG\r\n\x1a\n",
    "jpg": b"\xff\xd8\xff\xe0",
    "gif": b"GIF89a",
    "mp3": b"ID3\x03\x00",
    "mp4": b"\x00\x00\x00\x18ftypisom",
    "pdf": b"%PDF-1.4\n",
}


def hosts(cfg: SyntheticConfig) -> list[str]:
    """Deterministic host universe. Host 0 is the hot host. Cached per
    config — callers hit this once per generated page, and rebuilding a
    100k-entry list per page dominates wide-crawl profiles."""
    return _hosts_cached(cfg.n_hosts, cfg.uk_host_ratio)


from functools import lru_cache  # noqa: E402


@lru_cache(maxsize=16)
def _hosts_cached(n_hosts: int, uk_host_ratio: float) -> list[str]:
    out = ["hot.example.com"]
    n_uk = int((n_hosts - 1) * uk_host_ratio)
    for i in range(1, n_hosts):
        if i <= n_uk:
            out.append(f"news{i}.example.co.uk")
        else:
            out.append(f"site{i}.example.com")
    return out


def _path_for(host: str, pid: int, cfg: SyntheticConfig) -> str:
    if pid == 0:
        return "/"
    if pid == 1:
        return "/robots.txt"
    h = stable_hash64(f"path:{host}:{pid}", cfg.seed)
    if (h % 1000) / 1000.0 < cfg.media_ratio:
        ext = ("png", "jpg", "gif", "mp3", "mp4", "pdf")[h % 6]
        return f"/media/{pid}.{ext}"
    style = h % 4
    if style == 0:
        return f"/page/{pid}.html"
    if style == 1:
        return f"/articles/{pid}"
    if style == 2:
        return f"/section{h % 7}/item{pid}.html"
    return f"/page/{pid}.html?cat={h % 5}"


def make_url(host: str, pid: int, cfg: SyntheticConfig) -> str:
    return f"http://{host}{_path_for(host, pid, cfg)}"


def _is_media(url: str) -> bool:
    path = url.split("?", 1)[0]
    return path.rsplit("/", 1)[-1].rpartition(".")[2] in _MAGIC


def outlinks(url: str, cfg: SyntheticConfig) -> list[str]:
    """The raw (pre-resolution) hrefs page(url) embeds, in emission order."""
    if _is_media(url) or url.endswith("/robots.txt"):
        return []
    all_hosts = hosts(cfg)
    h = stable_hash64(f"fanout:{url}", cfg.seed)
    fanout = h % (cfg.max_fanout + 1)
    links: list[str] = []
    for i in range(fanout):
        hi = stable_hash64(f"out:{url}:{i}", cfg.seed)
        if (hi % 100) / 100.0 < cfg.hot_host_share:
            host = all_hosts[0]
        else:
            host = all_hosts[(hi >> 8) % len(all_hosts)]
        pid = (hi >> 24) % cfg.pages_per_host
        target = make_url(host, pid, cfg)
        form = hi % 6
        if form == 0:
            links.append(target)
        elif form == 1:  # https + www variant -> canonicalises to target
            links.append("https://www." + target[len("http://") :])
        elif form == 2:  # absolute-path relative link (same doc host resolves it)
            links.append(_path_for(host, pid, cfg) if host == _host_of(url) else target)
        elif form == 3:  # query-string variant (a distinct URL)
            sep = "&" if "?" in target else "?"
            links.append(f"{target}{sep}ref={i}")
        elif form == 4:  # uppercase/trailing-slash noise -> canonicalises back
            base = target.split("?", 1)[0]
            links.append((base + "/").replace("http://", "HTTP://", 1) if "?" not in target else target)
        else:  # malformed
            links.append(f"http://-bad-host-{i}/x")
    return links


def _host_of(url: str) -> str:
    return url.split("://", 1)[1].split("/", 1)[0]


def _image_links(url: str, cfg: SyntheticConfig) -> tuple[list[str], list[str]]:
    """(img src list, srcset candidates) for page(url)."""
    if _is_media(url) or url.endswith("/robots.txt"):
        return [], []
    h = stable_hash64(f"imgs:{url}", cfg.seed)
    n_imgs = h % 3
    srcs = []
    for i in range(n_imgs):
        hi = stable_hash64(f"img:{url}:{i}", cfg.seed)
        host = hosts(cfg)[(hi >> 4) % cfg.n_hosts]
        srcs.append(f"http://{host}/media/{(hi >> 16) % cfg.pages_per_host}.png")
    srcset = []
    if h % 5 == 0:
        hi = stable_hash64(f"srcset:{url}", cfg.seed)
        srcset = [f"/media/{(hi >> 3) % cfg.pages_per_host}.jpg",
                  f"/media/{(hi >> 13) % cfg.pages_per_host}.jpg"]
    return srcs, srcset


def robots_disallows(host: str, cfg: SyntheticConfig) -> list[str]:
    """Disallow prefixes served by http://host/robots.txt (possibly empty)."""
    h = stable_hash64(f"robots:{host}", cfg.seed)
    if (h % 100) / 100.0 < cfg.robots_disallow_ratio:
        section = h % 7
        return [f"/section{section}/", "/private/"]
    return []


def robots_allows(host: str, cfg: SyntheticConfig) -> list[str]:
    """Allow prefixes served by http://host/robots.txt — carve-outs
    UNDER the host's first Disallow prefix (``Allow: /sectionN/item1``
    re-admits item1, item1*.html, item10… via RFC 9309 longest-match).
    Opt-in via ``robots_allow_ratio`` (default 0.0 keeps every
    pre-existing fixture byte-identical); only hosts WITH disallows can
    carry allows."""
    if cfg.robots_allow_ratio <= 0.0:
        return []
    dis = robots_disallows(host, cfg)
    if not dis:
        return []
    h = stable_hash64(f"rallow:{host}", cfg.seed)
    if (h % 100) / 100.0 < cfg.robots_allow_ratio:
        return [f"{dis[0]}item1"]
    return []


def robots_crawl_delay(host: str, cfg: SyntheticConfig) -> int | None:
    """Crawl-delay served by http://host/robots.txt (None = no line).
    Opt-in via ``robots_crawl_delay_ratio`` (default 0.0 keeps every
    pre-existing fixture byte-identical)."""
    if cfg.robots_crawl_delay_ratio <= 0.0:
        return None
    h = stable_hash64(f"cdelay:{host}", cfg.seed)
    if (h % 100) / 100.0 < cfg.robots_crawl_delay_ratio:
        return 2 + h % 3  # 2..4 seconds
    return None


def host_sitemaps(host: str, cfg: SyntheticConfig) -> list[str]:
    """Sitemap URLs advertised by http://host/robots.txt (possibly none;
    1-2 when the ``robots_sitemap_ratio`` gate passes — two exercises the
    multi-Sitemap injection tie-break). Opt-in via the ratio (default 0.0
    keeps every pre-existing fixture byte-identical)."""
    if cfg.robots_sitemap_ratio <= 0.0:
        return []
    h = stable_hash64(f"sitemap:{host}", cfg.seed)
    if (h % 100) / 100.0 < cfg.robots_sitemap_ratio:
        out = [f"http://{host}/sitemap.xml"]
        if h % 2:
            out.append(f"http://{host}/sitemap2.xml")
        return out
    return []


def sitemap_is_index(url: str, cfg: SyntheticConfig) -> bool:
    """True when an ADVERTISED sitemap URL serves a ``<sitemapindex>``
    (children via :func:`sitemap_children`) instead of a ``<urlset>``."""
    if cfg.sitemap_index_ratio <= 0.0:
        return False
    h = stable_hash64(f"smindex:{url}", cfg.seed)
    return (h % 100) / 100.0 < cfg.sitemap_index_ratio


def sitemap_children(url: str, cfg: SyntheticConfig) -> list[str]:
    """Child sitemap URLs served by an index sitemap (2-3, same host)."""
    host = _host_of(url)
    stem = url.rsplit("/", 1)[1].removesuffix(".xml")
    h = stable_hash64(f"smkids:{url}", cfg.seed)
    return [
        f"http://{host}/{stem}_c{i}.xml" for i in range(2 + h % 2)
    ]


def _host_sitemap_urls(host: str, cfg: SyntheticConfig) -> set[str]:
    """Every URL on this host that serves sitemap XML: the advertised
    set plus the children of advertised index sitemaps."""
    out: set[str] = set()
    for sm in host_sitemaps(host, cfg):
        out.add(sm)
        if sitemap_is_index(sm, cfg):
            out.update(sitemap_children(sm, cfg))
    return out


def sitemap_locs(url: str, cfg: SyntheticConfig) -> list[str]:
    """``<loc>`` URLs served by a sitemap URL: mostly fresh same-host
    pages outside the organic link space plus one organic page (the
    dedupe path)."""
    host = _host_of(url)
    h = stable_hash64(f"smlocs:{url}", cfg.seed)
    locs = [make_url(host, (h >> 8) % cfg.pages_per_host, cfg)]
    for i in range(2 + h % 3):
        hi = stable_hash64(f"smloc:{url}:{i}", cfg.seed)
        locs.append(f"http://{host}/articles/sm{(hi >> 4) % 100000}")
    return locs


def _html_payload(url: str, cfg: SyntheticConfig) -> bytes:
    if cfg.duplicate_content_ratio:
        # mirror/alias content: some pages serve ONE GLOBAL mirror body
        # verbatim (identical bytes on every such URL — the
        # duplicate-content-gate fixture). Its links are RELATIVE, so
        # they resolve against each mirroring page's OWN host: without
        # the gate every duplicate discovers /mirror/* URLs on its host,
        # with the gate only the first fetch of the bytes does.
        if (
            stable_hash64(f"dupcontent:{url}", cfg.seed) % 1000
            < int(cfg.duplicate_content_ratio * 1000)
        ):
            return (
                "<!DOCTYPE html>\n<html>\n<head><title>Mirrored body</title>"
                "</head>\n<body>\n<p>Canonical mirror content.</p>\n"
                '<a href="/mirror/about.html">about</a>\n'
                '<a href="/mirror/faq.html">faq</a>\n'
                "</body></html>"
            ).encode("utf-8")
    h = stable_hash64(f"page:{url}", cfg.seed)
    host = _host_of(url)
    title = f"Title {h % 10000} of {host}"
    parts = [
        "<!DOCTYPE html>\n<html>\n<head>",
        f"<title>{title}</title>",
        f'<meta name="keywords" content="k{h % 50} k{(h >> 6) % 50}">',
    ]
    if h % 11 == 0:
        parts.append('<meta name="OriginalPublicationDate" content="2005-03-02">')
    if cfg.meta_nofollow_ratio and (
        stable_hash64(f"metanofollow:{url}", cfg.seed) % 1000
        < int(cfg.meta_nofollow_ratio * 1000)
    ):
        parts.append('<meta name="robots" content="noindex, nofollow">')
    parts.append('<link rel="stylesheet" href="/css/main.css">')
    parts.append("</head>\n<body>")
    if h % 13 == 0:
        parts.append("<p>   </p>")  # empty first paragraph (whitespace only)
    parts.append(
        f"<p>Paragraph one about topic {h % 97} with   extra\n spaces and "
        f"words number {(h >> 8) % 1000}.</p>"
    )
    for i, link in enumerate(outlinks(url, cfg)):
        rel = ""
        if cfg.link_nofollow_ratio and (
            stable_hash64(f"nofollow:{url}:{i}", cfg.seed) % 1000
            < int(cfg.link_nofollow_ratio * 1000)
        ):
            rel = ' rel="nofollow"'
        parts.append(f'<a{rel} href="{link}">anchor text {i}</a>')
    srcs, srcset = _image_links(url, cfg)
    for src in srcs:
        parts.append(f'<img src="{src}">')
    if srcset:
        parts.append(f'<img srcset="{srcset[0]} 1x, {srcset[1]} 2x">')
    if h % 17 == 0:
        parts.append('<a rel="license" href="http://creativecommons.org/licenses/by/4.0/">CC</a>')
    parts.append(f"<p>Closing paragraph with serial {(h >> 16) % 100000}.</p>")
    if h % 7 == 0:
        parts.append('<script> if (3<a) console.log("x");</script>')
    parts.append("</body></html>")
    return "\n".join(parts).encode("utf-8")


def _media_payload(url: str, cfg: SyntheticConfig) -> tuple[bytes, str]:
    path = url.split("?", 1)[0]
    ext = path.rsplit(".", 1)[1]
    magic = _MAGIC[ext]
    h = stable_hash64(f"media:{url}", cfg.seed)
    size = 64 + h % 512
    filler = (h.to_bytes(8, "big") * ((size // 8) + 1))[:size]
    mime = {
        "png": "image/png", "jpg": "image/jpeg", "gif": "image/gif",
        "mp3": "audio/mpeg", "mp4": "video/mp4", "pdf": "application/pdf",
    }[ext]
    return magic + filler, mime


def _timestamp14(url: str, cfg: SyntheticConfig) -> str:
    h = stable_hash64(f"ts:{url}", cfg.seed)
    return (
        f"{1996 + h % 25:04d}{1 + (h >> 5) % 12:02d}{1 + (h >> 9) % 28:02d}"
        f"{(h >> 14) % 24:02d}{(h >> 19) % 60:02d}{(h >> 25) % 60:02d}"
    )


def page_for_url(url: str, cfg: SyntheticConfig) -> dict:
    """The fetch simulator: url -> full capture record (deterministic).

    Stands in for an HTTP fetch + WARC write; keys mirror the ``pages``
    fixture schema in FIXTURES.md §2.
    """
    h = stable_hash64(f"rec:{url}", cfg.seed)
    path = url.split("://", 1)[1].partition("/")[2]
    is_robots = url.endswith("/robots.txt")
    is_sitemap = url in _host_sitemap_urls(_host_of(url), cfg)
    if is_robots:
        lines = ["User-agent: *"] + [f"Disallow: {p}" for p in robots_disallows(_host_of(url), cfg)]
        lines += [f"Allow: {p}" for p in robots_allows(_host_of(url), cfg)]
        if (cd := robots_crawl_delay(_host_of(url), cfg)) is not None:
            lines.append(f"Crawl-delay: {cd}")
        lines += [f"Sitemap: {s}" for s in host_sitemaps(_host_of(url), cfg)]
        payload, mime = ("\n".join(lines) + "\n").encode("ascii"), "text/plain"
        status = 200
    elif is_sitemap:
        if sitemap_is_index(url, cfg) and url in host_sitemaps(_host_of(url), cfg):
            body = (
                '<?xml version="1.0" encoding="UTF-8"?>\n'
                '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
                + "".join(
                    f"  <sitemap><loc>{c}</loc></sitemap>\n"
                    for c in sitemap_children(url, cfg)
                )
                + "</sitemapindex>\n"
            )
        else:
            body = (
                '<?xml version="1.0" encoding="UTF-8"?>\n'
                '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
                + "".join(
                    f"  <url><loc>{l}</loc></url>\n" for l in sitemap_locs(url, cfg)
                )
                + "</urlset>\n"
            )
        payload, mime = body.encode("utf-8"), "application/xml"
        status = 200
    elif _is_media(url):
        payload, mime = _media_payload(url, cfg)
        status = 200 if h % 20 else 404
    else:
        payload = _html_payload(url, cfg)
        mime = "text/html; charset=utf-8"
        r = h % 100
        status = 200 if r < 90 else (301 if r < 95 else (404 if r < 98 else 503))
    # Serve wrong/empty/octet-stream content types sometimes (M17/M20 paths):
    if status == 200 and not is_robots and not is_sitemap:
        if h % 31 == 0:
            mime = "application/octet-stream"
        elif h % 37 == 0:
            mime = ""
    location = ""
    if status == 301:
        hi = stable_hash64(f"redir:{url}", cfg.seed)
        location = make_url(_host_of(url), (hi >> 3) % cfg.pages_per_host, cfg)
        payload = b""
    if status in (404, 503):
        payload = f"<html><body><p>Error {status}.</p></body></html>".encode()
        mime = "text/html"
    shard = stable_hash64(f"shard:{_host_of(url)}", cfg.seed) % 100
    ts = _timestamp14(url, cfg)
    return {
        "url": url,
        "timestamp14": ts,
        "record_type": "response",
        "status": status,
        "mime_served": mime,
        "location": location,
        "content_encoding": "",
        "transfer_encoding": "",
        "payload": payload,
        "payload_sha1": sha1_b32(payload),
        "source_file": f"synth-{shard:05d}-{ts}-{shard:05d}.warc.gz",
        "source_offset": h % 1_000_000_000,
    }


def seed_urls(cfg: SyntheticConfig, n_seeds: int = 8) -> list[tuple[str, int]]:
    """Ordered seed list [(url, priority)]: the front page of the first
    ``n_seeds`` hosts (hot host first). Ordering matters — the frontier
    oracle consumes seeds in order."""
    hs = hosts(cfg)
    return [(make_url(hs[i % len(hs)], 0, cfg), i % 3) for i in range(n_seeds)]


def fixture_pages(n: int, cfg: SyntheticConfig) -> list[dict]:
    """Static ``pages`` fixture with edge-case mutations layered on the
    generator output (FIXTURES.md §2): wrapped URLs, over-long URLs, ftp
    protocol, request/metadata record types, digest mismatches, revisit
    pairs, 12/16/17-digit timestamps."""
    return fixture_pages_for_ids(range(n), cfg)


def fixture_pages_for_ids(ids, cfg: SyntheticConfig) -> list[dict]:
    """Rows of the pages fixture for arbitrary indices — each index is
    independent (pure function of (i, seed)), so generation distributes:
    see :func:`fixture_pages_ds`."""
    all_hosts = hosts(cfg)
    rows: list[dict] = []
    for i in ids:
        h = stable_hash64(f"fixture:{i}", cfg.seed)
        host = all_hosts[h % len(all_hosts)]
        pid = (h >> 8) % cfg.pages_per_host
        url = make_url(host, pid, cfg)
        rec = page_for_url(url, cfg)
        if i % 37 == 0:
            rec["record_type"] = "request"
            rec["payload"] = b"GET / HTTP/1.1"
            rec["payload_sha1"] = sha1_b32(rec["payload"])
        elif i % 41 == 0:
            rec["record_type"] = "metadata"
        if i % 43 == 0:
            rec["url"] = "<" + rec["url"] + ">"  # sanitise path (M7)
        if i % 53 == 0:
            sep = "&" if "?" in rec["url"] else "?"
            rec["url"] = rec["url"] + sep + "pad=" + "x" * 2100  # truncation (M6)
        if i % 31 == 0:
            rec["url"] = "ftp://" + rec["url"].split("://", 1)[1]  # protocol filter (M2)
        if i % 29 == 0:
            rec["payload_sha1"] = "sha1:" + "A" * 32  # digest mismatch (M16)
        elif i % 47 == 0 and rec["payload"]:
            # M14: chunked transfer framing; the header digest covers the
            # DECHUNKED payload (hash stage after_dechunk)
            from ..functions.payload import chunk_encode

            rec["transfer_encoding"] = "chunked"
            rec["payload"] = chunk_encode(rec["payload"], 256)
        elif i % 59 == 0 and rec["payload"]:
            # M15: gzip content encoding; header digest covers the
            # COMPRESSED payload (hash before decompression)
            import gzip as _gz

            rec["content_encoding"] = "gzip"
            rec["payload"] = _gz.compress(rec["payload"], mtime=0)
            rec["payload_sha1"] = sha1_b32(rec["payload"])
        if i % 19 == 0:
            ts = rec["timestamp14"]
            rec["timestamp14"] = (ts[:12], ts + "43", ts + "439")[i % 3]
        rows.append(rec)
        if i % 23 == 0 and rec["record_type"] == "response" and rec["status"] == 200:
            revisit = dict(rec)
            revisit["record_type"] = "revisit"
            revisit["payload"] = b""
            # revisit keeps the original payload digest (gov.uk-revisit-warcs)
            revisit["timestamp14"] = str(int(rec["timestamp14"][:8]) + 1).zfill(8) + rec["timestamp14"][8:]
            rows.append(revisit)
    return rows


def fixture_pages_ds(n: int, cfg: SyntheticConfig, num_blocks: int = 32):
    """Distributed pages fixture: ``ray.data.range(n)`` -> per-block
    deterministic generation (no driver-side row loop, one block per read
    task — the Ray Data shape of S1/S2's one-task-per-WARC-file model)."""
    import pyarrow as pa
    import ray.data as rd

    from ..schema import PAGES_SCHEMA

    def gen(batch: pa.Table) -> pa.Table:
        rows = fixture_pages_for_ids(batch["id"].to_pylist(), cfg)
        return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)

    return rd.range(n, override_num_blocks=num_blocks).map_batches(
        gen, batch_format="pyarrow", batch_size=None
    )


def pages_from_documents(batch, cfg: SyntheticConfig | None = None):
    """documents-table batch (doc_id:int64, text, lang, source) -> pages
    batch: deterministic HTML wrapping each text with title/paragraphs and
    hash-derived cross-links, so the testdata corpus can drive the full
    extraction chain (the flagship ``entry()`` pipeline).

    Accepts and returns ``pyarrow.Table`` (PAGES_SCHEMA)."""
    import pyarrow as pa

    from ..schema import PAGES_SCHEMA

    cfg = cfg or SyntheticConfig()
    rows = []
    for r in batch.to_pylist():
        doc_id = r["doc_id"]
        host = f"{r['source']}.example.com"
        url = f"http://{host}/doc/{doc_id}.html"
        h = stable_hash64(f"docpage:{doc_id}", cfg.seed)
        text = r["text"]
        words = text.split()
        mid = len(words) // 2
        links = [
            f'<a href="/doc/{(h >> (4 * i)) % 100000}.html">ref {i}</a>'
            for i in range(h % 4)
        ]
        html = (
            "<!DOCTYPE html>\n<html><head>"
            f"<title>Doc {doc_id} [{r['lang']}]</title></head>\n<body>"
            f"<p>{' '.join(words[:mid])}</p>\n"
            + "\n".join(links)
            + f"\n<p>{' '.join(words[mid:])}</p>"
            "</body></html>"
        ).encode("utf-8")
        rows.append(
            {
                "url": url,
                "timestamp14": _timestamp14(url, cfg),
                "record_type": "response",
                "status": 200,
                "mime_served": "text/html; charset=utf-8",
                "location": "",
                "content_encoding": "",
                "transfer_encoding": "",
                "payload": html,
                "payload_sha1": sha1_b32(html),
                "source_file": f"docs-{r['source']}.warc.gz",
                "source_offset": h % 1_000_000_000,
            }
        )
    return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)
