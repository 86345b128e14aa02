"""Header-only audio metadata (duration / sample rate) — no decode library.

Same fast-path philosophy as ``imagemeta.py`` (the reference reads media
properties without full decode wherever its toolchain allows): public
byte formats only.

* MP4/M4A — walk the ISO BMFF box tree to ``moov/mvhd`` and read the
  movie timescale + duration (ISO 14496-12 §8.2.2; version 0 u32 pair,
  version 1 u64 duration).
* MP3 — skip an ID3v2 tag, sync to the first MPEG audio frame header,
  decode version/layer/bitrate/samplerate from the public tables
  (ISO 11172-3). A Xing/Info VBR header (frame count × samples-per-frame
  ÷ samplerate) gives the exact duration; otherwise the CBR estimate
  ``audio_bytes * 8 / bitrate``.

Returns ``None`` on unknown/truncated input — callers keep their stub.
"""

from __future__ import annotations

import struct

__all__ = ["audio_metadata"]

# MPEG-1 Layer III bitrates (kbps), index 1..14
_MP3_BITRATES_V1L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
_MP3_BITRATES_V2L3 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160]
_MP3_RATES = {0: (44100, 22050, 11025), 2: (22050,), 3: (44100,)}  # keyed below


def _mp4(data: bytes) -> dict | None:
    def boxes(buf: bytes, start: int, end: int):
        pos = start
        while pos + 8 <= end:
            size, typ = struct.unpack(">I4s", buf[pos : pos + 8])
            hdr = 8
            if size == 1:
                if pos + 16 > end:
                    return
                size = struct.unpack(">Q", buf[pos + 8 : pos + 16])[0]
                hdr = 16
            elif size == 0:
                size = end - pos
            if size < hdr or pos + size > end:
                return
            yield typ, pos + hdr, pos + size
            pos += size

    for typ, a, b in boxes(data, 0, len(data)):
        if typ == b"moov":
            for t2, c, d in boxes(data, a, b):
                if t2 == b"mvhd":
                    version = data[c]
                    if version == 1:
                        timescale, duration = struct.unpack(
                            ">IQ", data[c + 20 : c + 32]
                        )
                    else:
                        timescale, duration = struct.unpack(
                            ">II", data[c + 12 : c + 20]
                        )
                    if not timescale:
                        return None
                    return {
                        "duration_s": round(duration / timescale, 2),
                        "sample_rate": 0,  # movie timescale != audio rate
                        "container": "mp4",
                    }
    return None


def _mp3(data: bytes) -> dict | None:
    pos = 0
    if data[:3] == b"ID3" and len(data) >= 10:
        # syncsafe 28-bit tag size
        sz = (
            (data[6] & 0x7F) << 21 | (data[7] & 0x7F) << 14
            | (data[8] & 0x7F) << 7 | (data[9] & 0x7F)
        )
        pos = 10 + sz
    n = len(data)
    while pos + 4 <= n:
        if data[pos] == 0xFF and (data[pos + 1] & 0xE0) == 0xE0:
            b1, b2 = data[pos + 1], data[pos + 2]
            version_bits = (b1 >> 3) & 3  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
            layer_bits = (b1 >> 1) & 3  # 1 = Layer III
            bitrate_ix = (b2 >> 4) & 0xF
            rate_ix = (b2 >> 2) & 3
            if version_bits == 1 or layer_bits != 1 or bitrate_ix in (0, 15) or rate_ix == 3:
                pos += 1
                continue
            if version_bits == 3:  # MPEG-1
                bitrate = _MP3_BITRATES_V1L3[bitrate_ix] * 1000
                sample_rate = (44100, 48000, 32000)[rate_ix]
                samples_per_frame = 1152
            else:  # MPEG-2 / 2.5
                bitrate = _MP3_BITRATES_V2L3[bitrate_ix] * 1000
                base = (22050, 24000, 16000)[rate_ix]
                sample_rate = base if version_bits == 2 else base // 2
                samples_per_frame = 576
            if not bitrate:
                pos += 1
                continue
            # Xing/Info VBR header: offset past the side information
            chan_mode = (data[pos + 3] >> 6) & 3
            if version_bits == 3:
                side = 17 if chan_mode == 3 else 32
            else:
                side = 9 if chan_mode == 3 else 17
            tag_at = pos + 4 + side
            duration = None
            if data[tag_at : tag_at + 4] in (b"Xing", b"Info"):
                flags = struct.unpack(">I", data[tag_at + 4 : tag_at + 8])[0]
                if flags & 1:  # frame count present
                    frames = struct.unpack(">I", data[tag_at + 8 : tag_at + 12])[0]
                    duration = frames * samples_per_frame / sample_rate
            if duration is None:
                duration = (n - pos) * 8 / bitrate  # CBR estimate
            return {
                "duration_s": round(duration, 2),
                "sample_rate": sample_rate,
                "container": "mp3",
            }
        pos += 1
    return None


def audio_metadata(data: bytes) -> dict | None:
    """{duration_s, sample_rate, container} from the header, else None."""
    try:
        if len(data) >= 12 and data[4:8] == b"ftyp":
            return _mp4(data)
        if data[:3] == b"ID3" or (
            len(data) >= 2 and data[0] == 0xFF and (data[1] & 0xE0) == 0xE0
        ):
            return _mp3(data)
    except Exception:
        return None
    return None
