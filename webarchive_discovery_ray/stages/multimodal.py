"""Multimodal (image/audio/video) stages: opaque binary columns + typed
metadata, decoded/feature-extracted in actor-pool map_batches stages.

The real decode libraries (PIL/ffmpeg/librosa) are NOT in this container,
so the decode kernels are deterministic fakes behind ``FAKE_DECODE`` (the
Ray-side plumbing — schema, batch sizing, actor signature, output layout —
is real and tested). Swap ``_fake_decode_*`` for real decoders by setting
``MediaFeatureStage(real=True)``, which raises NotImplementedError until
the libraries exist.

Batch sizing note: media payloads are large binaries — callers should pass
``batch_size`` small (32-128) so batch x concurrency stays under the worker
heap (SURVEY.md memory rule).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

__all__ = [
    "MediaFeatureStage",
    "MEDIA_FEATURES_SCHEMA",
    "ImageResizeStage",
    "FrameSampleStage",
    "PdfPreflightStage",
    "RESIZED_SCHEMA",
    "FRAMES_SCHEMA",
    "PDF_PREFLIGHT_SCHEMA",
]

MEDIA_FEATURES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("mime", pa.string()),
        ("media_kind", pa.string()),  # image | audio | video | pdf | other
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_frames", pa.int32()),
        ("duration_s", pa.float64()),
        ("feature", pa.list_(pa.float32(), 8)),
    ]
)

_KIND_BY_PREFIX = (
    (b"\x89PNG", "image"),
    (b"\xff\xd8\xff", "image"),
    (b"GIF8", "image"),
    (b"BM", "image"),
    (b"ID3", "audio"),
    (b"\xff\xfb", "audio"),
    (b"OggS", "audio"),
    (b"fLaC", "audio"),
    (b"\x00\x00\x00\x18ftyp", "video"),
    (b"\x00\x00\x00\x20ftyp", "video"),
    (b"\x1aE\xdf\xa3", "video"),
    (b"%PDF", "pdf"),
)


def _kind(payload: bytes) -> str:
    for prefix, kind in _KIND_BY_PREFIX:
        if payload.startswith(prefix):
            return kind
    return "other"


def _fake_decode(payload: bytes, kind: str) -> dict:
    """Dimensions + an 8-dim feature vector. Image WIDTH/HEIGHT are REAL —
    parsed from the format header without any decode library
    (``functions/imagemeta.py``, the reference's fast path:
    ImageAnalyser.java:112-133 reads dimensions without full decode).
    Pixel-derived features and video/audio decode remain deterministic
    hash-based stand-ins (PIL/av/librosa absent in this container)."""
    from ..functions.imagemeta import image_dimensions

    d = hashlib.sha1(payload).digest()
    h = int.from_bytes(d[:8], "big")
    width = 16 + h % 2048 if kind in ("image", "video") else 0
    height = 16 + (h >> 16) % 2048 if kind in ("image", "video") else 0
    if kind == "image":
        dims = image_dimensions(payload)
        if dims is not None:
            width, height = dims
    n_frames = 1 if kind == "image" else (h % 500 if kind == "video" else 0)
    duration = round((h % 36000) / 100.0, 2) if kind in ("audio", "video") else 0.0
    if kind == "audio":
        from ..functions.audiometa import audio_metadata

        meta = audio_metadata(payload)
        if meta is not None:
            duration = meta["duration_s"]
    feat = np.frombuffer(d[:16], dtype=np.uint8)[:8].astype(np.float32) / 255.0
    return {
        "width": width,
        "height": height,
        "n_frames": n_frames,
        "duration_s": duration,
        "feature": feat.tolist(),
    }


class MediaFeatureStage:
    """Actor-pool stage: (url, mime, payload) batches -> media features.

    Reference precedent: ImageAnalyser (dimensions without full decode,
    ``warc-indexer/.../payload/ImageAnalyser.java:92-143``) and the
    out-of-tree face-detection analyser plugin (warc-openimaj)."""

    def __init__(self, real: bool = False, sample_one_in: int = 1):
        if real:  # pragma: no cover - decode libs absent in this sandbox
            raise NotImplementedError(
                "real media decode requires PIL/av/librosa; this container "
                "ships none — use the deterministic fake (real=False)"
            )
        # O3: the reference gates image analysis 1-in-N via Math.random()
        # (ImageAnalyser.java:105-110) — here a seeded URL-keyed gate so
        # distributed runs replay identically (SURVEY.md §4.2(7))
        self.sample_one_in = sample_one_in

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.sampling import seeded_gate

        rows = []
        for r in batch.to_pylist():
            if not seeded_gate(r["url"], self.sample_one_in):
                continue
            payload = r.get("payload") or b""
            kind = _kind(payload)
            decoded = _fake_decode(payload, kind)
            rows.append(
                {
                    "url": r["url"],
                    "mime": r.get("mime_served") or "",
                    "media_kind": kind,
                    **decoded,
                }
            )
        if not rows:
            return MEDIA_FEATURES_SCHEMA.empty_table()
        return pa.Table.from_pylist(rows, schema=MEDIA_FEATURES_SCHEMA)


PDF_PREFLIGHT_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("pdf_pdfa_is_valid", pa.string()),  # 'false' | None (=unknown)
        ("pdf_pdfa_errors", pa.list_(pa.string())),  # unique codes
    ]
)

# structural-check error codes, modelled on Apache Preflight's syntax
# family ("1.x" = syntax errors); full PDF/A profile codes need the real
# validator (real=True)
_PDF_ERR_NOT_PDF = "1.0.0"  # missing/invalid %PDF header
_PDF_ERR_BAD_VERSION = "1.0.1"  # unparsable header version
_PDF_ERR_NO_EOF = "1.0.2"  # missing %%EOF trailer marker
_PDF_ERR_NO_STARTXREF = "1.0.3"  # missing startxref


def pdf_preflight_record(payload: bytes) -> tuple[str | None, list[str]]:
    """M26 structural preflight over raw PDF bytes (no external library):
    header + version, ``%%EOF`` trailer, ``startxref`` presence. Returns
    ``(is_valid, errors)`` where structural failures yield ``('false',
    codes)`` and a structurally sound file yields ``(None, [])`` — the
    full PDF/A profile verdict needs the real validator.

    Reference: ``warc-indexer/src/main/java/uk/bl/wa/analyser/payload/
    PDFAnalyser.java:82-123`` (pdf_pdfa_is_valid + deduped
    pdf_pdfa_errors via Apache Preflight; off by default in
    reference.conf)."""
    errors: list[str] = []
    if not payload.startswith(b"%PDF-"):
        errors.append(_PDF_ERR_NOT_PDF)
    else:
        ver = payload[5:8]
        if not (len(ver) >= 3 and ver[0:1].isdigit() and ver[1:2] == b"."):
            errors.append(_PDF_ERR_BAD_VERSION)
    tail = payload[-2048:]
    if b"%%EOF" not in tail:
        errors.append(_PDF_ERR_NO_EOF)
    if b"startxref" not in tail:
        errors.append(_PDF_ERR_NO_STARTXREF)
    return ("false", errors) if errors else (None, [])


class PdfPreflightStage:
    """Actor-pool stage: (url, payload) batches -> PDF/A preflight fields.

    The structural layer (header/version/EOF/startxref) runs for real on
    the raw bytes; the full Apache-Preflight-equivalent PDF/A profile
    validation is gated behind ``real=True`` (no PDF library in this
    container). Error codes are deduped, as the reference dedupes the
    preflight error list."""

    def __init__(self, real: bool = False):
        if real:  # pragma: no cover - no PDF validator in this sandbox
            raise NotImplementedError(
                "full PDF/A profile validation requires a preflight "
                "library (pdfbox-preflight / verapdf); the structural "
                "layer (real=False) has no such dependency"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for r in batch.to_pylist():
            payload = r.get("payload") or b""
            is_valid, errors = pdf_preflight_record(payload)
            rows.append(
                {
                    "url": r["url"],
                    "pdf_pdfa_is_valid": is_valid,
                    "pdf_pdfa_errors": errors,
                }
            )
        if not rows:
            return PDF_PREFLIGHT_SCHEMA.empty_table()
        return pa.Table.from_pylist(rows, schema=PDF_PREFLIGHT_SCHEMA)


RESIZED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("thumb", pa.large_binary()),  # resized pixels (opaque bytes)
    ]
)


class ImageResizeStage:
    """Actor-pool stage: image payload -> fixed-size thumbnail bytes.

    The pixel decode+resample is a deterministic fake (the container has
    no PIL); the plumbing — large_binary output column, small-batch
    contract, per-actor init — is the production shape. ``real=True``
    raises until an image library exists."""

    def __init__(self, target: int = 64, real: bool = False):
        if real:  # pragma: no cover
            raise NotImplementedError("image resize requires PIL/opencv")
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for r in batch.to_pylist():
            payload = r.get("payload") or b""
            # fake resample: content-keyed bytes of target*target/8 size
            seed = hashlib.sha1(payload).digest()
            reps = (self.target * self.target) // (8 * len(seed)) + 1
            rows.append(
                {
                    "url": r["url"],
                    "width": self.target,
                    "height": self.target,
                    "thumb": (seed * reps)[: self.target * self.target // 8],
                }
            )
        if not rows:
            return RESIZED_SCHEMA.empty_table()
        return pa.Table.from_pylist(rows, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("frame_idx", pa.int32()),
        ("ts_s", pa.float64()),
        ("frame", pa.large_binary()),
    ]
)


class FrameSampleStage:
    """Actor-pool flat-map stage: video payload -> every Nth frame row
    (one input row fans out to k output rows — list the frames, don't
    materialise the video). Deterministic fake decode; real=True raises
    until ffmpeg/av exists."""

    def __init__(self, every_n: int = 25, max_frames: int = 8, real: bool = False):
        if real:  # pragma: no cover
            raise NotImplementedError("frame sampling requires av/ffmpeg")
        self.every_n = every_n
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for r in batch.to_pylist():
            payload = r.get("payload") or b""
            meta = _fake_decode(payload, "video")
            n = min(self.max_frames, max(1, meta["n_frames"] // self.every_n))
            for i in range(n):
                d = hashlib.sha1(payload + i.to_bytes(4, "big")).digest()
                rows.append(
                    {
                        "url": r["url"],
                        "frame_idx": i * self.every_n,
                        "ts_s": round(i * self.every_n / 25.0, 3),
                        "frame": d * 4,
                    }
                )
        if not rows:
            return FRAMES_SCHEMA.empty_table()
        return pa.Table.from_pylist(rows, schema=FRAMES_SCHEMA)
