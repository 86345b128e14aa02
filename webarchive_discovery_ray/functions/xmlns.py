"""M25: XML root-element namespace extraction.

Reference: ``warc-indexer/src/main/java/uk/bl/wa/analyser/payload/
XMLAnalyser.java:77-93`` + ``warc-indexer/src/main/java/uk/bl/wa/parsers/
XMLRootNamespaceParser.java`` — a cheap SAX-style scan that stops at the
first start element and reports its namespace URI (plus the root local
name, which the Solr field folds in as ``ns#root``).
"""

from __future__ import annotations

import re

__all__ = ["xml_root_namespace", "is_xml_type"]


def is_xml_type(content_type: str | None) -> bool:
    """XMLAnalyser.shouldProcess (``XMLAnalyser.java:61-63``): mime starts
    with application/xml or text/xml."""
    return bool(content_type) and (
        content_type.startswith("application/xml") or content_type.startswith("text/xml")
    )

_DECL_OR_COMMENT = re.compile(rb"^\s*(<\?[^?]*\?>|<!--.*?-->|<!DOCTYPE[^>]*>)\s*", re.S)
_ROOT = re.compile(rb"<\s*(?:([A-Za-z_][\w.-]*):)?([A-Za-z_][\w.-]*)([^>]*)>", re.S)
_XMLNS = re.compile(
    rb"""xmlns(?::([\w.-]+))?\s*=\s*["']([^"']*)["']""",
)


def xml_root_namespace(payload: bytes, max_scan: int = 4096) -> str | None:
    """Namespace URI + ``#root`` local name of the root element, or None
    for non-XML / namespace-less documents. Only the first ``max_scan``
    bytes are examined (the root element is at the top by definition)."""
    head = payload[:max_scan]
    while True:
        m = _DECL_OR_COMMENT.match(head)
        if not m:
            break
        head = head[m.end():]
    m = _ROOT.match(head.lstrip())
    if not m:
        return None
    prefix, local, attrs = m.group(1), m.group(2), m.group(3) or b""
    ns_by_prefix: dict[bytes | None, bytes] = {}
    for nm in _XMLNS.finditer(attrs):
        ns_by_prefix[nm.group(1)] = nm.group(2)
    uri = ns_by_prefix.get(prefix)  # prefix may be None -> default xmlns
    if uri is None:
        return None
    return uri.decode("utf-8", "replace") + "#" + local.decode("utf-8", "replace")
