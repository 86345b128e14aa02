"""Sequential, regex-driven WARC/ARC parsing oracle.

Independent implementation of the archive-record contract implemented by
``sources/warc.py`` — deliberately different construction (regex scans over
a fully materialised record list instead of a streaming cursor; HTTP blocks
split with ``str.partition`` instead of compiled status regex) so the
parity tests exercise duplicated logic, mirroring how
``oracle/extract_oracle.py`` duplicates the extraction spec.

Models the reference's sequential reader loop
(warc-indexer/src/main/java/uk/bl/wa/indexer/WARCIndexerCommand.java:202-221:
``ArchiveReaderFactory.get`` + iterate records in file order).
"""

from __future__ import annotations

import re
import zlib

__all__ = ["oracle_parse_archive", "build_synthetic_warc_gz"]

_VERSION = re.compile(rb"WARC/\d+\.\d+\r?\n")


def _members(data: bytes) -> list[tuple[int, bytes]]:
    """(offset, plain bytes) per gzip member; whole buffer when plain."""
    if data[:2] != b"\x1f\x8b":
        return [(0, data)]
    out: list[tuple[int, bytes]] = []
    pos = 0
    while pos < len(data):
        obj = zlib.decompressobj(wbits=47)  # auto-detect zlib/gzip wrapper
        plain = obj.decompress(data[pos:]) + obj.flush()
        used = len(data) - pos - len(obj.unused_data)
        out.append((pos, plain))
        pos += used
    return out


def _headers_of(block: str) -> dict[str, str]:
    headers: dict[str, str] = {}
    key = None
    for line in block.splitlines():
        if line[:1] in (" ", "\t") and key:
            headers[key] += " " + line.strip()
        elif ":" in line:
            key, _, val = line.partition(":")
            key = key.strip().lower()
            headers[key] = val.strip()
    return headers


def _http_split(block: bytes) -> tuple[int | None, dict[str, str], bytes]:
    if not block.startswith(b"HTTP"):
        return None, {}, block
    head, _, _ = block.partition(b"\r\n\r\n")
    if len(head) == len(block):  # no CRLFCRLF; try bare LF
        head, _, _ = block.partition(b"\n\n")
    body = block[len(head) + (4 if block[len(head):len(head) + 4] == b"\r\n\r\n" else 2):]
    if len(head) == len(block):
        body = b""
    lines = head.decode("latin1").splitlines()
    status_parts = lines[0].split()
    status = None
    if len(status_parts) > 1 and status_parts[1][:3].isdigit():
        status = int(status_parts[1][:3])
    return status, _headers_of("\n".join(lines[1:])), body


def _warc_records(plain: bytes, base: int) -> list[tuple[int, dict[str, str], bytes]]:
    records = []
    pos = 0
    while True:
        m = _VERSION.search(plain, pos)
        if not m:
            break
        start = m.start()
        end_crlf = plain.find(b"\r\n\r\n", start)
        end_lf = plain.find(b"\n\n", start)
        candidates = [(e, s) for e, s in ((end_crlf, 4), (end_lf, 2)) if e != -1]
        if not candidates:
            break
        end, sep = min(candidates)
        headers = _headers_of(plain[start:end].decode("latin1"))
        length = int(headers.get("content-length", "0"))
        body_at = end + sep
        records.append((base + start, headers, plain[body_at : body_at + length]))
        pos = body_at + length
    return records


def _arc_records(plain: bytes, base: int) -> list[tuple[int, dict[str, str], bytes]]:
    records = []
    pos = 0
    while pos < len(plain):
        if plain[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
            continue
        start = pos
        eol = plain.find(b"\n", pos)
        if eol == -1:
            break
        fields = plain[pos:eol].rstrip(b"\r").decode("latin1").split(" ")
        if len(fields) < 5 or not re.fullmatch(r"\d{14}", fields[2]):
            break
        length = int(fields[-1])
        headers = {
            "arc": "1",
            "warc-target-uri": fields[0],
            "warc-date": fields[2],
            "content-type": fields[3],
            "content-length": fields[-1],
        }
        records.append((base + start, headers, plain[eol + 1 : eol + 1 + length]))
        pos = eol + 1 + length
    return records


def oracle_parse_archive(data: bytes, source_file: str) -> list[dict]:
    """Independent (W)ARC -> PAGES-rows parse (same row contract as
    ``sources.warc.parse_archive_bytes``)."""
    segments = _members(data)
    is_arc = segments[0][1].startswith(b"filedesc://")
    rows: list[dict] = []
    for base, plain in segments:
        recs = _arc_records(plain, base) if is_arc else _warc_records(plain, base)
        for offset, headers, block in recs:
            rtype = "response" if "arc" in headers else headers.get("warc-type", "")
            url = headers.get("warc-target-uri")
            # Normalisation.sanitiseWARCHeaderValue: strip one enclosing
            # <> pair (only when both ends are bracketed)
            if url and url[:1] == "<" and url[-1:] == ">":
                url = url[1:-1]
            status = None
            http_headers: dict[str, str] = {}
            payload = block
            if rtype == "resource":
                status = 200 if url and url.startswith("http") else None
                http_headers = {"content-type": headers.get("content-type", "")}
            elif rtype in ("response", "revisit") and url and url.startswith("http"):
                status, http_headers, payload = _http_split(block)
            elif rtype == "warcinfo":
                http_headers = {"content-type": headers.get("content-type", "")}
            digest = headers.get("warc-payload-digest", "")
            rows.append(
                {
                    "url": url,
                    "timestamp14": re.sub(r"\D", "", headers.get("warc-date", ""))[:14],
                    "record_type": rtype,
                    "status": status,
                    "mime_served": http_headers.get("content-type", "") or "",
                    "location": http_headers.get("location", "") or "",
                    "content_encoding": http_headers.get("content-encoding", "") or "",
                    "transfer_encoding": http_headers.get("transfer-encoding", "") or "",
                    "payload": payload,
                    "payload_sha1": digest.split(":", 1)[-1] if digest else "",
                    "source_file": source_file,
                    "source_offset": offset,
                }
            )
    return rows


def oracle_stats_items(data: bytes, source_file: str) -> list[tuple[str, str]]:
    """Independent WARCStatsMapper emission sequence (category, item) per
    record — transcribed straight from WARCStatsMapper.java:57-104,
    including the Java quirks (missing WARC-Type concats as "null";
    the host row fires when ``"https".contains(scheme)``)."""
    from urllib.parse import urlsplit

    segments = _members(data)
    is_arc = segments[0][1].startswith(b"filedesc://")
    out: list[tuple[str, str]] = []
    for base, plain in segments:
        recs = _arc_records(plain, base) if is_arc else _warc_records(plain, base)
        for _, headers, _ in recs:
            arc = "arc" in headers
            wt = None if arc else headers.get("warc-type")
            out.append(("record-total", "RECORD-TOTAL"))
            out.append(
                ("record-type", "WARC-RECORD-TYPE\t" + ("null" if wt is None else wt))
            )
            out.append(
                ("record-type", "RECORD-TYPE-ARC" if arc else "RECORD-TYPE-WARC")
            )
            out.append(
                ("content-types", "CONTENT-TYPE\t" + (headers.get("content-type") or "null"))
            )
            date = headers.get("warc-date")
            if date is not None and len(date) > 4:
                out.append(("content-types", "YEAR\t" + date[:4]))
            else:
                out.append(("malformed-date", "MALFORMED-DATE"))
            url = headers.get("warc-target-uri")
            if url is None:
                out.append(("record-hosts", "NULL-URI-TOTAL"))
            else:
                try:
                    parts = urlsplit(url)
                    scheme, authority = parts.scheme, parts.netloc
                except ValueError:
                    scheme, authority = "", ""
                if scheme and scheme in "https":
                    out.append(("record-hosts", "HOSTS\t" + authority))
    return out


def build_synthetic_warc_gz(n_pages: int = 12, seed: int = 42) -> bytes:
    """Deterministic multi-member WARC.gz for environments without the
    reference fixture tree: n_pages response records (HTML with title,
    paragraphs, links), one warcinfo, one request, one 301, one revisit.
    Construction is format-knowledge only (ISO 28500)."""
    import gzip
    import hashlib
    import base64

    def rec(warc_type: str, url: str | None, block: bytes, extra: dict | None = None) -> bytes:
        head = [b"WARC/1.0", b"WARC-Type: " + warc_type.encode()]
        if url:
            head.append(b"WARC-Target-URI: " + url.encode())
        head.append(b"WARC-Date: 2016-01-02T03:04:05Z")
        for k, v in (extra or {}).items():
            head.append(f"{k}: {v}".encode())
        head.append(b"Content-Length: " + str(len(block)).encode())
        raw = b"\r\n".join(head) + b"\r\n\r\n" + block + b"\r\n\r\n"
        return gzip.compress(raw, mtime=0)

    out = [rec("warcinfo", None, b"software: synthetic\r\n",
               {"Content-Type": "application/warc-fields"})]
    for i in range(n_pages):
        url = f"http://site{(seed + i) % 5}.example.org/page/{i}"
        html = (
            f"<html><head><title>Page {i}</title></head><body>"
            f"<p>Paragraph one of page {i}.</p>"
            f'<a href="/next/{i + 1}">next</a>'
            f'<img src="/img/{i}.png"></body></html>'
        ).encode()
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=UTF-8\r\n\r\n" + html
        )
        b32 = base64.b32encode(hashlib.sha1(html).digest()).decode()
        out.append(rec("response", url, http,
                       {"Content-Type": "application/http; msgtype=response",
                        "WARC-Payload-Digest": f"sha1:{b32}"}))
        out.append(rec("request", url, b"GET / HTTP/1.0\r\n\r\n",
                       {"Content-Type": "application/http; msgtype=request"}))
    out.append(rec("response", "http://site0.example.org/moved",
                   b"HTTP/1.1 301 Moved\r\nLocation: http://site0.example.org/\r\n\r\n",
                   {"Content-Type": "application/http; msgtype=response"}))
    out.append(rec("revisit", "http://site0.example.org/page/0",
                   b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n",
                   {"Content-Type": "application/http; msgtype=response",
                    "WARC-Payload-Digest": "sha1:REVISITDIGESTPLACEHOLDER32CHARS0"}))
    return b"".join(out)
