"""Minimal deterministic HTML tokenizer shared by the extraction stage and
the sequential oracle.

This replaces the reference's JSoup parse (``HtmlFeatureParser.java:154-250``)
with a pinned, dependency-free scan. The *tokenizer* is shared (and golden-
tested here); the span/link **assembly** logic is implemented independently
in ``stages/extract.py`` and ``oracle/extract_oracle.py`` so parity tests
exercise real duplicated logic (SURVEY.md §5 test plan).

Pinned tokenization rules:
* a tag starts at ``<`` immediately followed by a letter or ``/`` + letter,
  and ends at the next ``>``; anything else (``<3``, ``< a``) is text —
  matching the reference's ELEMENT_NAME false-positive rule
  (``HtmlFeatureParser.java:215-222``);
* ``<script>``/``<style>`` content is skipped up to the matching close tag;
* comments and doctypes are skipped;
* attribute values may be double-quoted, single-quoted or bare.
"""

from __future__ import annotations

import re
from typing import Iterator, NamedTuple

__all__ = ["Token", "tokenize_html", "parse_srcset", "anchor_texts"]


class Token(NamedTuple):
    kind: str  # "start" | "end" | "text"
    name: str  # tag name (lowercase) for start/end; "" for text
    attrs: dict[str, str]  # {} for end/text
    text: str  # raw text for text tokens; "" otherwise
    offset: int  # char offset in the source document


_TAG = re.compile(r"<(/?)([a-zA-Z][a-zA-Z0-9]*)((?:[^>\"']|\"[^\"]*\"|'[^']*')*)>")
_ATTR = re.compile(r"([a-zA-Z_][\w:-]*)\s*(?:=\s*(\"[^\"]*\"|'[^']*'|[^\s\"'>]+))?")
_COMMENT = re.compile(r"<!--.*?-->", re.DOTALL)
_DOCTYPE = re.compile(r"<![^>]*>")
_RAWTEXT_CLOSE = {"script": re.compile(r"</script\s*>", re.IGNORECASE),
                  "style": re.compile(r"</style\s*>", re.IGNORECASE)}


def _parse_attrs(raw: str) -> dict[str, str]:
    attrs: dict[str, str] = {}
    for m in _ATTR.finditer(raw):
        name = m.group(1).lower()
        value = m.group(2)
        if value is None:
            value = ""
        elif value[:1] in ("'", '"'):
            value = value[1:-1]
        if name not in attrs:  # first occurrence wins
            attrs[name] = value
    return attrs


def tokenize_html(html: str) -> Iterator[Token]:
    """Yield tokens in document order with character offsets."""
    i, n = 0, len(html)
    text_start = -1

    def flush_text(end: int) -> Iterator[Token]:
        nonlocal text_start
        if text_start >= 0 and end > text_start:
            chunk = html[text_start:end]
            if chunk:
                yield Token("text", "", {}, chunk, text_start)
        text_start = -1

    while i < n:
        lt = html.find("<", i)
        if lt < 0:
            if text_start < 0:
                text_start = i
            yield from flush_text(n)
            return
        if text_start < 0 and lt > i:
            text_start = i
        elif text_start < 0:
            text_start = i
        # comment / doctype?
        if html.startswith("<!--", lt):
            m = _COMMENT.match(html, lt)
            yield from flush_text(lt)
            i = m.end() if m else lt + 4
            continue
        if html.startswith("<!", lt):
            m = _DOCTYPE.match(html, lt)
            yield from flush_text(lt)
            i = m.end() if m else lt + 2
            continue
        m = _TAG.match(html, lt)
        if not m:
            # not a real tag ("<3", "< a", stray '<'): treat as text
            i = lt + 1
            continue
        yield from flush_text(lt)
        closing, name, rawattrs = m.group(1), m.group(2).lower(), m.group(3)
        if closing:
            yield Token("end", name, {}, "", lt)
        else:
            attrs = _parse_attrs(rawattrs) if rawattrs.strip(" /") else {}
            yield Token("start", name, attrs, "", lt)
            if name in _RAWTEXT_CLOSE and not rawattrs.rstrip().endswith("/"):
                close = _RAWTEXT_CLOSE[name].search(html, m.end())
                if close:
                    yield Token("end", name, {}, "", close.start())
                    i = close.end()
                    continue
                i = n
                continue
        i = m.end()
    yield from flush_text(n)


def parse_srcset(srcset: str) -> list[str]:
    """``"a.jpg 1x, b.jpg 2x"`` -> ``["a.jpg", "b.jpg"]``
    (HtmlFeatureParser.normaliseSrcsetLinks semantics: first token of each
    comma-separated candidate)."""
    out = []
    for cand in srcset.split(","):
        cand = cand.strip()
        if cand:
            out.append(cand.split()[0])
    return out


_WS_RUN = re.compile(r"\s+")


def anchor_texts(html: str) -> list[tuple[str, str]]:
    """(href, anchor text) per ``<a href=...>`` element, in document
    order — the anchor-text signal web-corpus pipelines aggregate per
    target URL (the reference exposes the link itself via
    ``HtmlFeatureParser.java:154-250``; the enclosed text is this
    engine's addition).

    Pinned assembly rules (deterministic, mirrored by the pytest
    recompute): a ``start a`` with a non-empty ``href`` opens an anchor;
    text tokens inside accumulate; ``end a`` emits; a new ``start a``
    closes any open anchor first (HTML forbids nesting); an anchor still
    open at document end emits. The emitted text is
    whitespace-collapsed (runs -> one space) and stripped; empty text
    emits as ''."""
    out: list[tuple[str, str]] = []
    href: str | None = None
    buf: list[str] = []

    def flush() -> None:
        nonlocal href, buf
        if href is not None:
            out.append((href, _WS_RUN.sub(" ", "".join(buf)).strip()))
        href, buf = None, []

    for tok in tokenize_html(html):
        if tok.kind == "start" and tok.name == "a":
            flush()
            h = tok.attrs.get("href", "")
            if h:
                href = h
        elif tok.kind == "end" and tok.name == "a":
            flush()
        elif tok.kind == "text" and href is not None:
            buf.append(tok.text)
    flush()
    return out
