"""MPEG audio (MP3) container metadata codec — frame-header parse.

Built from the public ISO/IEC 11172-3 (MPEG-1) and ISO/IEC 13818-3
(MPEG-2, plus the de-facto MPEG-2.5 extension) frame-header layouts and
the ID3v2.3 tag spec (id3.org); no media library exists in this
container. This closes the engine's last audio arm the same way the
reference extends its closed filter enum (reference src/image.rs:32-40
— adding a media type = adding a variant with its own parser):
`audio/mpeg` payloads get a REAL header walk instead of a stub.

Scope: metadata, not samples. An MPEG FRAME DECODER (huffman + IMDCT +
synthesis filterbank) is out of scope; what a data pipeline needs from
an audio column at curation time is (sample rate, channels, frame
count, duration), all of which live in the 4-byte frame headers. The
walk is strict: every frame header is validated (sync, version, layer,
bitrate/samplerate indices, cross-frame consistency) and the frame
length arithmetic must be exact or the walk desyncs and raises.

Supported: MPEG-1 / MPEG-2 / MPEG-2.5, Layers I/II/III, CBR, no CRC;
optional leading ID3v2 tag (syncsafe size, footer flag honored) and
trailing 128-byte ID3v1 tag. Everything else raises :class:`Mp3Error`.
"""

from __future__ import annotations

import struct

__all__ = ["Mp3Error", "encode_mp3", "decode_mp3_meta", "SAMPLES_PER_FRAME"]


class Mp3Error(Exception):
    """Raised for any malformed or unsupported MPEG audio payload."""


# header version bits (19-20) -> version key; 0b01 is reserved
_VERSIONS = {0: "2.5", 2: "2", 3: "1"}
_VERSION_BITS = {v: k for k, v in _VERSIONS.items()}
# header layer bits (17-18) -> layer number; 0b00 is reserved
_LAYERS = {3: 1, 2: 2, 1: 3}
_LAYER_BITS = {v: k for k, v in _LAYERS.items()}

# sample-rate tables, index = header bits 10-11 (ISO 11172-3 /
# 13818-3 §2.4.2.3; MPEG-2.5 halves the MPEG-2 rates again)
SAMPLE_RATES_BY_VERSION = {
    "1": (44100, 48000, 32000, None),
    "2": (22050, 24000, 16000, None),
    "2.5": (11025, 12000, 8000, None),
}
SAMPLE_RATES = SAMPLE_RATES_BY_VERSION["1"]  # back-compat alias

# bitrate tables (kbps), index 1-14; 0 = free format, 15 = bad.
# MPEG-2 and 2.5 share one table per layer, and Layers II/III share
# theirs (ISO 13818-3 Table 1).
_BR_V1_L1 = (None, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448, None)
_BR_V1_L2 = (None, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384, None)
_BR_V1_L3 = (None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, None)
_BR_V2_L1 = (None, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256, None)
_BR_V2_L23 = (None, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, None)

BITRATES_KBPS = _BR_V1_L3  # back-compat alias (MPEG-1 Layer III)


def _bitrate_table(version: str, layer: int):
    if version == "1":
        return (_BR_V1_L1, _BR_V1_L2, _BR_V1_L3)[layer - 1]
    return _BR_V2_L1 if layer == 1 else _BR_V2_L23


def samples_per_frame(version: str, layer: int) -> int:
    if layer == 1:
        return 384
    if layer == 2:
        return 1152
    return 1152 if version == "1" else 576  # Layer III halves in MPEG-2/2.5


SAMPLES_PER_FRAME = 1152  # back-compat alias (MPEG-1 Layer III)


def _frame_len(version: str, layer: int, bitrate_kbps: int, sample_rate: int, padding: int) -> int:
    """Frame length in bytes, header included (ISO 11172-3 §2.4.3.1 /
    ISO 13818-3): Layer I counts in 4-byte slots; Layer III's
    coefficient halves with the MPEG-2/2.5 frame size."""
    if layer == 1:
        return (12 * bitrate_kbps * 1000 // sample_rate + padding) * 4
    coef = 144 if (layer == 2 or version == "1") else 72
    return coef * bitrate_kbps * 1000 // sample_rate + padding


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
    version: str = "1",
    layer: int = 3,
) -> bytes:
    """Deterministic CBR MPEG stream: an ID3v2.3 tag (so mime sniffing
    sees ``ID3``) followed by ``n_frames`` frames whose main-data bytes
    are a seeded counter pattern. ``pad_odd`` sets the padding bit on
    odd frames, exercising the padding length arithmetic (one BYTE for
    Layers II/III, one 4-byte SLOT for Layer I) a lazy walker gets
    wrong. ``version`` in {"1", "2", "2.5"}, ``layer`` in {1, 2, 3};
    defaults preserve the original MPEG-1 Layer III profile."""
    if version not in _VERSION_BITS:
        raise Mp3Error(f"unsupported MPEG version {version!r}")
    if layer not in (1, 2, 3):
        raise Mp3Error(f"unsupported layer {layer}")
    table = _bitrate_table(version, layer)
    if bitrate_kbps not in table[1:15]:
        raise Mp3Error(f"unsupported bitrate {bitrate_kbps}")
    rates = SAMPLE_RATES_BY_VERSION[version]
    if sample_rate not in rates[:3]:
        raise Mp3Error(f"unsupported sample rate {sample_rate}")
    if channels not in (1, 2):
        raise Mp3Error("channels must be 1 or 2")
    if n_frames < 1:
        raise Mp3Error("need at least one frame")
    br_idx = table.index(bitrate_kbps)
    sr_idx = rates.index(sample_rate)
    mode = 3 if channels == 1 else 0  # 11 = single channel, 00 = stereo
    out = bytearray()
    out += b"ID3" + bytes((3, 0, 0)) + _syncsafe(len(id3_payload))
    out += id3_payload
    for f in range(n_frames):
        pad = 1 if (pad_odd and f % 2 == 1) else 0
        h = (
            (0x7FF << 21)
            | (_VERSION_BITS[version] << 19)
            | (_LAYER_BITS[layer] << 17)
            | (1 << 16)      # no CRC
            | (br_idx << 12)
            | (sr_idx << 10)
            | (pad << 9)
            | (mode << 6)
        )
        out += struct.pack(">I", h)
        body = _frame_len(version, layer, bitrate_kbps, sample_rate, pad) - 4
        out += bytes((seed * 31 + f * 17 + j * 7) % 251 for j in range(body))
    return bytes(out)


def decode_mp3_meta(data: bytes) -> dict:
    """Walk an MPEG audio stream and return its metadata:
    ``{"version", "layer", "sample_rate", "channels", "bitrate_kbps",
    "n_frames", "duration_ms", "stream_bytes"}`` (``stream_bytes`` =
    total frame bytes walked, tags excluded). Raises :class:`Mp3Error`
    on anything malformed, truncated, or outside the supported profile
    — the frame-length formula must be exact or the walk desyncs onto
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
    version = layer = sample_rate = channels = bitrate = None
    n_frames = 0
    stream_bytes = 0
    while pos < end:
        if pos + 4 > end:
            raise Mp3Error("truncated frame header")
        h = struct.unpack_from(">I", data, pos)[0]
        if (h >> 21) & 0x7FF != 0x7FF:
            raise Mp3Error(f"lost frame sync at byte {pos}")
        ver = _VERSIONS.get((h >> 19) & 3)
        if ver is None:
            raise Mp3Error("reserved MPEG version bits")
        lay = _LAYERS.get((h >> 17) & 3)
        if lay is None:
            raise Mp3Error("reserved layer bits")
        if not (h >> 16) & 1:
            raise Mp3Error("CRC-protected frames unsupported")
        br = _bitrate_table(ver, lay)[(h >> 12) & 0xF]
        sr = SAMPLE_RATES_BY_VERSION[ver][(h >> 10) & 3]
        if br is None:
            raise Mp3Error("free-format/bad bitrate index")
        if sr is None:
            raise Mp3Error("bad sample-rate index")
        pad = (h >> 9) & 1
        ch = 1 if (h >> 6) & 3 == 3 else 2
        if sample_rate is None:
            version, layer = ver, lay
            sample_rate, channels, bitrate = sr, ch, br
        elif (ver, lay, sr, ch, br) != (version, layer, sample_rate, channels, bitrate):
            raise Mp3Error(
                f"inconsistent stream parameters at frame {n_frames}"
            )
        flen = _frame_len(ver, lay, br, sr, pad)
        if pos + flen > end:
            raise Mp3Error(f"truncated frame {n_frames}")
        pos += flen
        stream_bytes += flen
        n_frames += 1
    if n_frames == 0:
        raise Mp3Error("no MPEG frames")
    spf = samples_per_frame(version, layer)
    return {
        "version": version,
        "layer": layer,
        "sample_rate": sample_rate,
        "channels": channels,
        "bitrate_kbps": bitrate,
        "n_frames": n_frames,
        "duration_ms": n_frames * spf * 1000 // sample_rate,
        "stream_bytes": stream_bytes,
    }
