"""M-field policy: per-field value adjustment applied on every field add.

Reimplements the reference's ``FieldAdjuster`` pipeline semantics —
``warc-indexer/src/main/java/uk/bl/wa/solr/SolrRecord.java:135-188``
(``addField``/``setField`` -> ``adjust`` -> ``isAllowedtoAdd``) and
``SolrRecordFactory.java:54-100,185-259`` (``createContentAdjuster``) —
pinned by ``SolrRecordFactoryTest.java``:

pipeline per field (in order):

1. ``max_values == 0`` or ``max_length == 0``  -> value always discarded;
2. null -> ``""``;
3. ``remove_control_characters`` (default on): strip ``\\p{Cntrl}``
   (POSIX: ``[\\x00-\\x1f\\x7f]``);
4. ``sanitize_utf8`` (default on): UTF-8 encode/decode with REPLACE on
   malformed/unmappable input;
5. ``normalise_whitespace`` (default on): trim, collapse ``\\p{Space}+``
   (POSIX: ``[ \\t\\n\\x0b\\f\\r]+``) to one space;
6. ``rewrites``: ordered (pattern, replacement) regex substitutions
   (Java ``$n`` group references accepted);
7. ``max_length`` truncation — applied AFTER whitespace collapsing;
8. empty result -> ``None`` (the field is dropped, not stored empty).

Multi-valued fields with ``max_values = k``: the first ``k`` values are
kept and duplicates rejected (``SolrRecord.isAllowedtoAdd:196-205``);
``-1`` = unlimited (duplicates allowed).

The DEFAULT_POLICY mirrors ``reference.conf`` (warc.solr.field_setup):
url / url_norm / links capped at 2000 chars, the ``url_norm`` srcset
rewrite (``^(.*)(%20[0-9.]+[wx])$`` -> ``$1``), content capped at 512 KiB.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

__all__ = ["FieldRule", "FieldPolicy", "DEFAULT_POLICY"]

_CNTRL = re.compile(r"[\x00-\x1f\x7f]")
_SPACE = re.compile(r"[ \t\n\x0b\f\r]+")
_JAVA_GROUP = re.compile(r"\$(\d+)")

from functools import lru_cache  # noqa: E402


@lru_cache(maxsize=256)
def _compiled_rewrites(rewrites: tuple) -> tuple:
    """Pattern compile + Java '$n' -> Python '\\\\n' conversion, once per
    distinct rewrite tuple (re.sub with a string pattern recompiles on
    every call — measurable on per-record hot paths)."""
    return tuple(
        (re.compile(p), _JAVA_GROUP.sub(r"\\\1", r)) for p, r in rewrites
    )


@dataclass(frozen=True)
class FieldRule:
    """One field's adjustment config (SolrRecordFactory KEY_* semantics)."""

    max_length: int = -1  # -1 = no limit; 0 = always discard
    max_values: int = -1  # -1 = no limit; 0 = field disabled
    sanitize_utf8: bool = True
    remove_control_characters: bool = True
    normalise_whitespace: bool = True
    rewrites: tuple[tuple[str, str], ...] = ()


@dataclass
class FieldPolicy:
    """default rule + per-field overrides; ``adjust`` is the addField path."""

    default: FieldRule = field(default_factory=FieldRule)
    fields: dict[str, FieldRule] = field(default_factory=dict)

    def rule_for(self, field_name: str) -> FieldRule:
        return self.fields.get(field_name, self.default)

    def adjust(self, field_name: str, value: str | None) -> str | None:
        """SolrRecord.adjust: the full pipeline; None = drop the value."""
        rule = self.rule_for(field_name)
        if rule.max_values == 0 or rule.max_length == 0:
            return None
        if value is None:
            return None  # null -> '' -> dropped; skip the pipeline
        s = value
        # fast path (measured 3.4x on clean strings, the common case):
        # printable ASCII with no space runs/edge spaces makes EVERY
        # sanitize step a no-op regardless of rule flags — control chars
        # and \t\n\x0b\f\r are non-printable, ASCII needs no UTF-8
        # repair, and the only whitespace left is single interior ' '
        if not (
            s.isascii()
            and s.isprintable()
            and "  " not in s
            and not s.startswith(" ")
            and not s.endswith(" ")
        ):
            if rule.remove_control_characters:
                s = _CNTRL.sub("", s)
            # ASCII strings are valid UTF-8 and roundtrip unchanged — skip
            # the two-copy encode/decode (str.isascii is one C scan)
            if rule.sanitize_utf8 and not s.isascii():
                s = s.encode("utf-8", "replace").decode("utf-8", "replace")
            if rule.normalise_whitespace:
                s = _SPACE.sub(" ", s.strip())
        for rx, repl in _compiled_rewrites(rule.rewrites):
            s = rx.sub(repl, s)
        if rule.max_length != -1 and len(s) > rule.max_length:
            s = s[: rule.max_length]
        return s if s else None

    def adjust_many(self, field_name: str, values) -> list[str]:
        """Multi-valued addField loop: adjust each value; honour
        ``max_values`` (first k kept, duplicates rejected when capped).
        The pipeline is inlined (rule + compiled rewrites hoisted out of
        the per-element loop — list fields dominate the per-record cost)."""
        rule = self.rule_for(field_name)
        if rule.max_values == 0 or rule.max_length == 0:
            return []
        rewrites = _compiled_rewrites(rule.rewrites)
        capped = rule.max_values != -1
        max_len = rule.max_length
        out: list[str] = []
        for s in values or []:
            if s is None:
                continue
            # same provable-no-op fast path as adjust()
            if not (
                s.isascii()
                and s.isprintable()
                and "  " not in s
                and not s.startswith(" ")
                and not s.endswith(" ")
            ):
                if rule.remove_control_characters:
                    s = _CNTRL.sub("", s)
                if rule.sanitize_utf8 and not s.isascii():
                    s = s.encode("utf-8", "replace").decode("utf-8", "replace")
                if rule.normalise_whitespace:
                    s = _SPACE.sub(" ", s.strip())
            for rx, repl in rewrites:
                s = rx.sub(repl, s)
            if max_len != -1 and len(s) > max_len:
                s = s[:max_len]
            if not s:
                continue
            if capped and (len(out) >= rule.max_values or s in out):
                continue
            out.append(s)
        return out


# Output fields whose values are DERIVED by our own kernels from already-
# sanitised inputs (digests, SURTs, canonical hosts, fixed-vocabulary
# normalised types, ISO timestamps, hex byte dumps): the default pipeline
# is provably the identity on them — no control chars, valid UTF-8, no
# collapsible whitespace — so the per-record policy pass skips them. The
# identity claim is asserted over the fixture corpus in
# tests/test_kernels.py::TestFieldPolicy. External-content fields (URLs,
# titles, text, links, HTML-derived metadata) always pass through the
# policy.
DERIVED_IDENTITY_FIELDS = frozenset(
    {
        "doc_id", "surt", "host_surt", "url_path", "url_type",
        "resource_name", "content_type_ext", "host", "domain",
        "public_suffix", "crawl_date", "crawl_year", "wayback_date",
        "record_type", "solr_type", "content_type_norm", "content_ffb",
        "content_first_bytes", "hash", "links_hosts", "links_domains",
        "links_public_suffixes", "links_hosts_surts",
    }
)

# reference.conf warc.solr.field_setup defaults
_URL_RULE = FieldRule(max_length=2000)
DEFAULT_POLICY = FieldPolicy(
    default=FieldRule(),
    fields={
        "url": _URL_RULE,
        "links": _URL_RULE,
        "url_norm": FieldRule(
            max_length=2000,
            rewrites=(("^(.*)(%20[0-9.]+[wx])$", "$1"),),
        ),
        "content": FieldRule(max_length=512 * 1024),
    },
)
