"""Header-only image dimension parsing — no decode library.

The reference extracts image width/height WITHOUT a full pixel decode
(``ImageAnalyser.java:112-133`` — "images are enabled, we still want to
extract image width/height (fast)" via ImageIO header readers). This
module implements the same fast path from the public byte formats:

* PNG  — IHDR chunk (big-endian u32 pair right after the 8-byte magic
  and the first chunk header; ISO 15948 §11.2.2);
* JPEG — scan markers to the first frame header SOF0/1/2/3/5/6/7/9/
  10/11/13/14/15 (height, width big-endian u16 at offsets 3/5 of the
  segment payload; ITU-T T.81 §B.2.2);
* GIF  — logical screen descriptor (little-endian u16 pair at offset 6;
  GIF89a spec §18);
* BMP  — BITMAPINFOHEADER (little-endian i32 pair at offset 18; height
  may be negative for top-down rows — absolute value reported).

Returns ``None`` for unknown/truncated formats — callers fall back to
their stub behaviour, mirroring the reference's catch-and-skip
(``ImageAnalyser.java:130-133``).
"""

from __future__ import annotations

import struct

__all__ = ["image_dimensions"]

_JPEG_SOF = frozenset(
    [0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF]
)


def _png(data: bytes) -> tuple[int, int] | None:
    # magic(8) + length(4) + b"IHDR"(4) + width(4) + height(4)
    if len(data) < 24 or data[12:16] != b"IHDR":
        return None
    w, h = struct.unpack(">II", data[16:24])
    return (w, h) if w and h else None


def _jpeg(data: bytes) -> tuple[int, int] | None:
    pos = 2
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            # tolerate fill bytes only between markers
            pos += 1
            continue
        marker = data[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2  # standalone markers carry no length
            continue
        if pos + 4 > n:
            return None
        seg_len = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        if seg_len < 2:
            return None
        if marker in _JPEG_SOF:
            if pos + 9 > n:
                return None
            h, w = struct.unpack(">HH", data[pos + 5 : pos + 9])
            return (w, h) if w and h else None
        if marker == 0xD9:  # EOI before any SOF
            return None
        pos += 2 + seg_len
    return None


def _gif(data: bytes) -> tuple[int, int] | None:
    if len(data) < 10:
        return None
    w, h = struct.unpack("<HH", data[6:10])
    return (w, h) if w and h else None


def _bmp(data: bytes) -> tuple[int, int] | None:
    if len(data) < 26:
        return None
    header_size = struct.unpack("<I", data[14:18])[0]
    if header_size >= 40:  # BITMAPINFOHEADER and later
        w, h = struct.unpack("<ii", data[18:26])
    elif header_size == 12:  # BITMAPCOREHEADER: u16 pair
        w, h = struct.unpack("<HH", data[18:22])
    else:
        return None
    w, h = abs(w), abs(h)
    return (w, h) if w and h else None


def image_dimensions(data: bytes) -> tuple[int, int] | None:
    """(width, height) from the image header, or None when unknown."""
    try:
        if data.startswith(b"\x89PNG\r\n\x1a\n"):
            return _png(data)
        if data.startswith(b"\xff\xd8"):
            return _jpeg(data)
        if data.startswith((b"GIF87a", b"GIF89a")):
            return _gif(data)
        if data.startswith(b"BM"):
            return _bmp(data)
    except Exception:
        return None
    return None
