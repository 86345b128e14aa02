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
        s = "" if value is None else value
        if rule.remove_control_characters:
            s = _CNTRL.sub("", s)
        if rule.sanitize_utf8:
            s = s.encode("utf-8", "replace").decode("utf-8", "replace")
        if rule.normalise_whitespace:
            s = _SPACE.sub(" ", s.strip())
        for pattern, replacement in rule.rewrites:
            s = re.sub(pattern, _JAVA_GROUP.sub(r"\\\1", replacement), s)
        if rule.max_length != -1 and len(s) > rule.max_length:
            s = s[: rule.max_length]
        return s if s else None

    def adjust_many(self, field_name: str, values) -> list[str]:
        """Multi-valued addField loop: adjust each value; honour
        ``max_values`` (first k kept, duplicates rejected when capped)."""
        rule = self.rule_for(field_name)
        out: list[str] = []
        for v in values or []:
            adjusted = self.adjust(field_name, v)
            if adjusted is None:
                continue
            if rule.max_values != -1:
                if len(out) >= rule.max_values or adjusted in out:
                    continue
            out.append(adjusted)
        return out


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
