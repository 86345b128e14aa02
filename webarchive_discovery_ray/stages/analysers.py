"""User-extension surface: payload / text analyser plugins (§2.10).

Reimplements the reference's ServiceLoader plugin contracts —
``warc-indexer/src/main/java/uk/bl/wa/analyser/payload/
AbstractPayloadAnalyser.java:48-108`` (``shouldProcess(mime)`` +
``analyse(source, header, stream, solr)``) and ``.../text/
AbstractTextAnalyser.java:108`` — as a name registry of callable classes.
Registered analysers are named in ``IndexConfig.payload_analysers`` /
``IndexConfig.text_analysers`` and instantiated ONCE PER ACTOR (resolved
through an lru-cached builder), exactly like the reference instantiates
its plugin set once per JVM from config.

Plugin outputs land in the document's ``plugin_fields`` map column
(string -> string) — the analogue of the reference's free-form Solr field
adds — so the core DOCUMENTS_SCHEMA stays fixed.

Out-of-tree reference analysers re-expressed as examples below:
face detection (``warc-openimaj/.../FaceDetectionParser.java``, decode
gated — no image library here), sentiment (``warc-indexer/.../text/
SentimentJTextAnalyser.java:63-87``), ssdeep (``.../text/
FuzzyHashAnalyser.java:61-88``).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Protocol

__all__ = [
    "PayloadAnalyser",
    "TextAnalyser",
    "payload_analyser",
    "text_analyser",
    "build_analysers",
    "registered_analysers",
]


class PayloadAnalyser(Protocol):
    def should_process(self, mime: str) -> bool: ...

    def analyse(self, rec: dict, payload: bytes, doc: dict) -> None: ...


class TextAnalyser(Protocol):
    def analyse_text(self, text: str, doc: dict) -> None: ...


_PAYLOAD_REGISTRY: dict[str, type] = {}
_TEXT_REGISTRY: dict[str, type] = {}


def payload_analyser(name: str):
    """Class decorator: register a payload analyser under ``name``."""

    def deco(cls: type) -> type:
        _PAYLOAD_REGISTRY[name] = cls
        return cls

    return deco


def text_analyser(name: str):
    """Class decorator: register a text analyser under ``name``."""

    def deco(cls: type) -> type:
        _TEXT_REGISTRY[name] = cls
        return cls

    return deco


def registered_analysers() -> tuple[list[str], list[str]]:
    return sorted(_PAYLOAD_REGISTRY), sorted(_TEXT_REGISTRY)


@lru_cache(maxsize=64)
def build_analysers(
    payload_names: tuple[str, ...], text_names: tuple[str, ...]
) -> tuple[list, list]:
    """Instantiate the named analysers once per process (the per-actor
    setup rule: extraction actors resolve this cache in ``__init__``-time
    code paths, not per record). Unknown names fail loudly."""
    try:
        pas = [_PAYLOAD_REGISTRY[n]() for n in payload_names]
        tas = [_TEXT_REGISTRY[n]() for n in text_names]
    except KeyError as e:  # pragma: no cover - config error path
        raise KeyError(
            f"unknown analyser {e.args[0]!r}; registered: {registered_analysers()}"
        ) from None
    return pas, tas


def _set(doc: dict, key: str, value: str) -> None:
    bag = doc.get("plugin_fields") or {}
    bag[key] = value
    doc["plugin_fields"] = bag


# --- example plugins (the reference's out-of-tree analyser family) -----------


@payload_analyser("face_detection")
class FaceDetectionAnalyser:
    """warc-openimaj's FaceDetectionParser analogue: counts faces in image
    payloads. The pixel decode is gated (no image library in this
    container); the fake emits a deterministic content-keyed count so the
    plumbing (mime gate, per-actor init, plugin_fields output) is real."""

    def __init__(self, real: bool = False):
        if real:  # pragma: no cover
            raise NotImplementedError("face detection needs an image library")

    def should_process(self, mime: str) -> bool:
        return mime.startswith("image/")

    def analyse(self, rec: dict, payload: bytes, doc: dict) -> None:
        import hashlib

        h = int.from_bytes(hashlib.sha1(payload).digest()[:4], "big")
        _set(doc, "image_faces", str(h % 4))


@text_analyser("sentiment")
class SentimentTextAnalyser:
    """SentimentJTextAnalyser analogue over the extracted text (the same
    corpus-matched lexicon as pipelines/enrich.sentiment_score)."""

    def analyse_text(self, text: str, doc: dict) -> None:
        from ..pipelines.enrich import SENTIMENT_LEXICON, SENTIMENT_PREFIX

        score = sum(
            SENTIMENT_LEXICON.get(w, 0) for w in text[:SENTIMENT_PREFIX].split()
        )
        label = "negative" if score < -1 else ("positive" if score > 1 else "neutral")
        _set(doc, "sentiment_score", str(score))
        _set(doc, "sentiment", label)


@text_analyser("fuzzy_hash")
class FuzzyHashTextAnalyser:
    """FuzzyHashAnalyser analogue: ssdeep-style spamsum fields."""

    def analyse_text(self, text: str, doc: dict) -> None:
        from ..functions.fuzzy import fuzzy_fields

        for k, v in fuzzy_fields(text).items():
            _set(doc, k, v)
