"""Extended codec fuzz campaign: WAV / PNG / GIF (single + animated) /
MP3 / PDF stream-filter (ASCIIHex, ASCII85, RunLength) encode->decode
roundtrips over seeded random payloads, plus truncation probes that
must raise the codec's own error type and nothing else.

Complements the per-codec pytest suites (bounded example counts) with
a large-N evidence run, the same role scripts/differential_campaign.py
plays for the lexer/parser.

Usage: python scripts/codec_fuzz.py [n_rounds] [seed]
Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_parser_ray.pdfcore.gif import (  # noqa: E402
    GifError,
    decode_gif,
    decode_gif_frames,
    encode_gif,
    encode_gif_animation,
)
from pdf_parser_ray.pdfcore.mp3 import (  # noqa: E402
    SAMPLE_RATES_BY_VERSION,
    Mp3Error,
    _bitrate_table,
    decode_mp3_meta,
    encode_mp3,
)
from pdf_parser_ray.pdfcore.filters import (  # noqa: E402
    FilterError,
    ascii85_decode,
    ascii85_encode,
    ascii_hex_decode,
    ascii_hex_encode,
    run_length_decode,
    run_length_encode,
)
from pdf_parser_ray.pdfcore.png import PngError, decode_png, encode_png  # noqa: E402
from pdf_parser_ray.pdfcore.wav import (  # noqa: E402
    WavError,
    decode_wav,
    decode_wav_samples,
    encode_wav,
)


def main() -> int:
    n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 20260817
    rng = random.Random(seed)
    t0 = time.time()
    counts = {
        "wav": 0, "png": 0, "gif": 0, "gif_anim": 0, "mp3": 0,
        "filters": 0, "truncation": 0,
    }

    for i in range(n_rounds):
        kind = i % 6
        if kind == 0:
            ch = rng.randint(1, 3)
            width = rng.choice((1, 2))
            nf = rng.randint(0, 64)
            if width == 2:
                vals = [rng.randint(-32768, 32767) for _ in range(nf * ch)]
            else:
                vals = [rng.randint(0, 255) for _ in range(nf * ch)]
            rate = rng.randint(1, 192000)
            wav = encode_wav(vals, ch, rate, sampwidth=width)
            got = decode_wav_samples(wav)
            assert got == (rate, ch, width, vals), f"wav mismatch seed={seed} i={i}"
            counts["wav"] += 1
            payload, err = wav, WavError
            decode = decode_wav
        elif kind == 1:
            w, h = rng.randint(1, 12), rng.randint(1, 12)
            chans = rng.choice((1, 3))
            px = bytes(rng.randrange(256) for _ in range(w * h * chans))
            png = encode_png(px, w, h, chans)
            gw, gh, gc, gpx = decode_png(png)
            assert (gw, gh, gc, gpx) == (w, h, chans, px), f"png mismatch i={i}"
            counts["png"] += 1
            payload, err = png, PngError
            decode = decode_png
        elif kind == 2:
            w, h = rng.randint(1, 12), rng.randint(1, 12)
            idx = bytes(rng.randrange(256) for _ in range(w * h))
            palette = bytes(rng.randrange(256) for _ in range(768))
            gif = encode_gif(idx, w, h, palette, interlace=rng.random() < 0.5)
            gw, gh, gpal, gidx = decode_gif(gif)
            assert (gw, gh, bytes(gidx)) == (w, h, idx), f"gif mismatch i={i}"
            counts["gif"] += 1
            payload, err = gif, GifError
            decode = decode_gif
        elif kind == 4:
            nf = rng.randint(1, 24)
            version = rng.choice(("1", "2", "2.5"))
            layer = rng.randint(1, 3)
            br = rng.choice([b for b in _bitrate_table(version, layer) if b])
            rate = rng.choice(SAMPLE_RATES_BY_VERSION[version][:3])
            ch = rng.choice((1, 2))
            tag = bytes(rng.randrange(256) & 0x7F for _ in range(rng.randint(0, 32)))
            m = encode_mp3(
                nf, br, rate, ch, seed=i, id3_payload=tag,
                version=version, layer=layer,
            )
            meta = decode_mp3_meta(m)
            assert (
                meta["version"], meta["layer"],
                meta["sample_rate"], meta["channels"],
                meta["bitrate_kbps"], meta["n_frames"],
            ) == (version, layer, rate, ch, br, nf), f"mp3 mismatch i={i}"
            counts["mp3"] += 1
            payload, err = m, Mp3Error
            decode = decode_mp3_meta
        elif kind == 5:
            # PDF transport filters: roundtrip each, then truncate one.
            # A truncated prefix must decode (both EODs are optional /
            # lenient) or raise FilterError — nothing else.
            raw = bytes(rng.randrange(256) for _ in range(rng.randint(0, 96)))
            assert ascii_hex_decode(ascii_hex_encode(raw)) == raw, f"ahx i={i}"
            assert ascii85_decode(ascii85_encode(raw)) == raw, f"a85 i={i}"
            assert run_length_decode(run_length_encode(raw)) == raw, f"rl i={i}"
            counts["filters"] += 1
            enc, dec = rng.choice(
                (
                    (ascii_hex_encode, ascii_hex_decode),
                    (ascii85_encode, ascii85_decode),
                    (run_length_encode, run_length_decode),
                )
            )
            payload, err = enc(raw), FilterError
            decode = dec
        else:
            w, h = rng.randint(1, 8), rng.randint(1, 8)
            nfr = rng.randint(1, 5)
            palette = bytes(rng.randrange(256) for _ in range(768))
            frames = [
                bytes(rng.randrange(256) for _ in range(w * h))
                for _ in range(nfr)
            ]
            gif = encode_gif_animation(frames, w, h, palette)
            gw, gh, _p, got_frames = decode_gif_frames(gif)
            assert (gw, gh) == (w, h) and [
                bytes(f) for f in got_frames
            ] == frames, f"gif_anim mismatch i={i}"
            counts["gif_anim"] += 1
            payload, err = gif, GifError
            decode = decode_gif_frames

        # truncation probe: any prefix must decode or raise the codec's
        # own error — never IndexError/struct.error/etc.
        cut = rng.randint(0, len(payload))
        try:
            decode(payload[:cut])
        except err:
            pass
        counts["truncation"] += 1

    print(
        json.dumps(
            {
                "rounds": n_rounds,
                "seed": seed,
                "counts": counts,
                "mismatches": 0,
                "wall_sec": round(time.time() - t0, 1),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
