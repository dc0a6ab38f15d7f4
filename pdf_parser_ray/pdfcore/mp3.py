"""MPEG audio (MP3) container metadata codec — frame-header parse.

Built from the public ISO/IEC 11172-3 frame-header layout and the
ID3v2.3 tag spec (id3.org); no media library exists in this container.
This closes the engine's last audio arm the same way the reference
extends its closed filter enum (reference src/image.rs:32-40 — adding
a media type = adding a variant with its own parser): `audio/mpeg`
payloads get a REAL header walk instead of a stub.

Scope: metadata, not samples. An MP3 FRAME DECODER (huffman + IMDCT +
synthesis filterbank) is out of scope; what a data pipeline needs from
an audio column at curation time is (sample rate, channels, frame
count, duration), all of which live in the 4-byte frame headers. The
walk is strict: every frame header is validated (sync, version, layer,
bitrate/samplerate indices, cross-frame consistency) and the frame
length arithmetic must be exact or the walk desyncs and raises.

Supported: MPEG-1 Layer III, CBR, no CRC; optional leading ID3v2 tag
(syncsafe size, footer flag honored) and trailing 128-byte ID3v1 tag.
Everything else raises :class:`Mp3Error`.
"""

from __future__ import annotations

import struct

__all__ = ["Mp3Error", "encode_mp3", "decode_mp3_meta", "SAMPLES_PER_FRAME"]


class Mp3Error(Exception):
    """Raised for any malformed or unsupported MPEG audio payload."""


# MPEG-1 Layer III tables (ISO 11172-3 §2.4.2.3)
BITRATES_KBPS = (
    None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, None
)
SAMPLE_RATES = (44100, 48000, 32000, None)
SAMPLES_PER_FRAME = 1152  # MPEG-1 Layer III


def _frame_len(bitrate_kbps: int, sample_rate: int, padding: int) -> int:
    # ISO 11172-3: Layer II/III frame length in bytes (header included)
    return 144 * bitrate_kbps * 1000 // sample_rate + padding


def _syncsafe(n: int) -> bytes:
    if n >= 1 << 28:
        raise Mp3Error("ID3v2 size too large for syncsafe encoding")
    return bytes(((n >> s) & 0x7F) for s in (21, 14, 7, 0))


def _read_syncsafe(b: bytes) -> int:
    if any(x & 0x80 for x in b):
        raise Mp3Error("non-syncsafe byte in ID3v2 size")
    return (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]


def encode_mp3(
    n_frames: int,
    bitrate_kbps: int,
    sample_rate: int,
    channels: int,
    seed: int = 0,
    pad_odd: bool = True,
    id3_payload: bytes = b"",
) -> bytes:
    """Deterministic CBR MPEG-1 Layer III stream: an ID3v2.3 tag (so
    mime sniffing sees ``ID3``) followed by ``n_frames`` frames whose
    main-data bytes are a seeded counter pattern. ``pad_odd`` sets the
    padding bit on odd frames, exercising the +1 length arithmetic a
    lazy walker gets wrong."""
    if bitrate_kbps not in BITRATES_KBPS[1:15]:
        raise Mp3Error(f"unsupported bitrate {bitrate_kbps}")
    if sample_rate not in SAMPLE_RATES[:3]:
        raise Mp3Error(f"unsupported sample rate {sample_rate}")
    if channels not in (1, 2):
        raise Mp3Error("channels must be 1 or 2")
    if n_frames < 1:
        raise Mp3Error("need at least one frame")
    br_idx = BITRATES_KBPS.index(bitrate_kbps)
    sr_idx = SAMPLE_RATES.index(sample_rate)
    mode = 3 if channels == 1 else 0  # 11 = single channel, 00 = stereo
    out = bytearray()
    out += b"ID3" + bytes((3, 0, 0)) + _syncsafe(len(id3_payload))
    out += id3_payload
    for f in range(n_frames):
        pad = 1 if (pad_odd and f % 2 == 1) else 0
        h = (
            (0x7FF << 21)
            | (3 << 19)      # MPEG-1
            | (1 << 17)      # Layer III
            | (1 << 16)      # no CRC
            | (br_idx << 12)
            | (sr_idx << 10)
            | (pad << 9)
            | (mode << 6)
        )
        out += struct.pack(">I", h)
        body = _frame_len(bitrate_kbps, sample_rate, pad) - 4
        out += bytes((seed * 31 + f * 17 + j * 7) % 251 for j in range(body))
    return bytes(out)


def decode_mp3_meta(data: bytes) -> dict:
    """Walk an MPEG-1 Layer III stream and return its metadata:
    ``{"sample_rate", "channels", "bitrate_kbps", "n_frames",
    "duration_ms", "stream_bytes"}`` (``stream_bytes`` = total frame
    bytes walked, tags excluded). Raises :class:`Mp3Error` on anything
    malformed, truncated, or outside the supported profile — the
    frame-length formula must be exact or the walk desyncs onto
    non-sync bytes and fails loudly."""
    pos = 0
    if data[:3] == b"ID3":
        if len(data) < 10:
            raise Mp3Error("truncated ID3v2 header")
        flags = data[5]
        size = _read_syncsafe(data[6:10])
        pos = 10 + size + (10 if flags & 0x10 else 0)  # footer flag
        if pos > len(data):
            raise Mp3Error("ID3v2 tag size exceeds payload")
    end = len(data)
    # optional trailing ID3v1 tag
    if end - pos >= 128 and data[end - 128 : end - 125] == b"TAG":
        end -= 128
    sample_rate = channels = bitrate = None
    n_frames = 0
    stream_bytes = 0
    while pos < end:
        if pos + 4 > end:
            raise Mp3Error("truncated frame header")
        h = struct.unpack_from(">I", data, pos)[0]
        if (h >> 21) & 0x7FF != 0x7FF:
            raise Mp3Error(f"lost frame sync at byte {pos}")
        if (h >> 19) & 3 != 3:
            raise Mp3Error("only MPEG-1 is supported")
        if (h >> 17) & 3 != 1:
            raise Mp3Error("only Layer III is supported")
        if not (h >> 16) & 1:
            raise Mp3Error("CRC-protected frames unsupported")
        br = BITRATES_KBPS[(h >> 12) & 0xF]
        sr = SAMPLE_RATES[(h >> 10) & 3]
        if br is None:
            raise Mp3Error("free-format/bad bitrate index")
        if sr is None:
            raise Mp3Error("bad sample-rate index")
        pad = (h >> 9) & 1
        ch = 1 if (h >> 6) & 3 == 3 else 2
        if sample_rate is None:
            sample_rate, channels, bitrate = sr, ch, br
        elif (sr, ch, br) != (sample_rate, channels, bitrate):
            raise Mp3Error(
                f"inconsistent stream parameters at frame {n_frames}"
            )
        flen = _frame_len(br, sr, pad)
        if pos + flen > end:
            raise Mp3Error(f"truncated frame {n_frames}")
        pos += flen
        stream_bytes += flen
        n_frames += 1
    if n_frames == 0:
        raise Mp3Error("no MPEG frames")
    return {
        "sample_rate": sample_rate,
        "channels": channels,
        "bitrate_kbps": bitrate,
        "n_frames": n_frames,
        "duration_ms": n_frames * SAMPLES_PER_FRAME * 1000 // sample_rate,
        "stream_bytes": stream_bytes,
    }
