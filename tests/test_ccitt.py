"""CCITTFaxDecode codec (pdfcore/ccitt.py): table integrity, spec
codeword pins, G3-1D/G4 roundtrips, PDF image-path integration.

The code tables are transcribed from ITU-T T.4/T.6 — the one step
that cannot be generated — so this file (a) verifies each decode
alphabet is duplicate-free and prefix-free (a transcription typo
almost always breaks one of these), and (b) pins well-known codewords
against their published values."""

from __future__ import annotations

import random

import pytest

from pdf_parser_ray.pdfcore.ccitt import (
    BLACK_CODES,
    EXT_MAKEUP,
    MODE_HORIZ,
    MODE_PASS,
    MODE_V,
    WHITE_CODES,
    _pack_rows,
    ccitt_decode,
    ccitt_encode,
)
from pdf_parser_ray.pdfcore.errors import FilterError


def _assert_prefix_free(codes: list[str]) -> None:
    assert len(set(codes)) == len(codes)
    codes = sorted(codes)
    for a, b in zip(codes, codes[1:]):
        assert not b.startswith(a), f"{a!r} is a prefix of {b!r}"


def test_alphabets_complete_and_prefix_free():
    for table in (WHITE_CODES, BLACK_CODES):
        assert sorted(k for k in table if k < 64) == list(range(64))
        assert sorted(k for k in table if k >= 64) == list(range(64, 1729, 64))
        _assert_prefix_free(list(table.values()) + list(EXT_MAKEUP.values()))
    assert sorted(EXT_MAKEUP) == list(range(1792, 2561, 64))
    _assert_prefix_free(list(MODE_V.values()) + [MODE_PASS, MODE_HORIZ])


def test_spec_codeword_pins():
    # ITU-T T.4 tables 2/3 and T.6 §2.2.3 — transcription spot checks
    assert WHITE_CODES[0] == "00110101"
    assert WHITE_CODES[1] == "000111"
    assert WHITE_CODES[2] == "0111"
    assert WHITE_CODES[63] == "00110100"
    assert WHITE_CODES[64] == "11011"
    assert WHITE_CODES[1664] == "011000"
    assert WHITE_CODES[1728] == "010011011"
    assert BLACK_CODES[0] == "0000110111"
    assert BLACK_CODES[1] == "010"
    assert BLACK_CODES[2] == "11"
    assert BLACK_CODES[3] == "10"
    assert BLACK_CODES[4] == "011"
    assert BLACK_CODES[64] == "0000001111"
    assert EXT_MAKEUP[1792] == "00000001000"
    assert EXT_MAKEUP[2560] == "000000011111"
    assert MODE_V[0] == "1" and MODE_V[1] == "011" and MODE_V[-1] == "010"
    assert MODE_PASS == "0001" and MODE_HORIZ == "001"


@pytest.mark.parametrize("k", [-1, 0])
def test_roundtrip_shapes(k):
    rng = random.Random(7)
    for trial in range(120):
        cols = rng.randint(1, 80)
        rows = rng.randint(1, 16)
        style = trial % 4
        if style == 0:
            px = bytes(rng.randint(0, 1) for _ in range(cols * rows))
        elif style == 1:
            px = bytes(
                1 if (i // cols + i % cols) % 7 < 4 else 0
                for i in range(cols * rows)
            )
        elif style == 2:
            px = bytes([1]) * (cols * rows)
        else:
            px = bytes(cols * rows)
        got = ccitt_decode(ccitt_encode(px, cols, rows, k), k, cols, rows)
        want = _pack_rows(
            [px[r * cols : (r + 1) * cols] for r in range(rows)], cols, False
        )
        assert got == want, (trial, cols, rows)


def test_wide_runs_use_extended_makeups():
    cols = 6000
    rows = [
        bytes([1]) * cols,
        bytes(cols),
        bytes([1]) * 3000 + bytes(3000),
        bytes(2999) + bytes([1]) * 3001,
    ]
    px = b"".join(rows)
    for k in (-1, 0):
        got = ccitt_decode(ccitt_encode(px, cols, 4, k), k, cols, 4)
        assert got == _pack_rows(rows, cols, False)


def test_black_is_1_inverts():
    px = bytes([0, 1, 1, 0, 1, 0])
    enc = ccitt_encode(px, 6, 1, -1)
    a = ccitt_decode(enc, -1, 6, 1, black_is_1=False)
    b = ccitt_decode(enc, -1, 6, 1, black_is_1=True)
    assert a[0] >> 2 == 0b011010 and (a[0] ^ b[0]) >> 2 == 0b111111


def test_errors_and_fuzz():
    with pytest.raises(FilterError, match="Rows"):
        ccitt_decode(b"\x00", -1, 8, None)
    with pytest.raises(FilterError, match="K > 0"):
        ccitt_decode(b"\x00", 1, 8, 2)
    rng = random.Random(3)
    for _ in range(800):
        b = bytes(rng.randrange(256) for _ in range(rng.randrange(30)))
        for k in (-1, 0):
            try:
                ccitt_decode(b, k, 32, 4)
            except FilterError:
                pass


def test_ccitt_image_in_pdf_pipeline():
    from pdf_parser_ray.pdfcore import PdfDocument
    from pdf_parser_ray.pdfcore.pdfbuild import build_text_pdf

    px = bytes(1 if (x // 2 + y) % 2 else 0 for y in range(5) for x in range(13))
    for k in (-1, 0):
        pdf = build_text_pdf(
            "some text",
            image={"width": 13, "height": 5, "pixels": px, "filter": "ccitt",
                   "ccitt_k": k},
        )
        img = PdfDocument(pdf).extract_images([1])[0][0]
        assert img["filter"] == "CCITTFaxDecode"
        want = bytes(v for p in px for v in ((255, 255, 255) if p else (0, 0, 0)))
        assert img["rgb"] == want


def test_ccitt_via_generic_filter_chain():
    """CCITTFaxDecode also works through decode_stream (content-stream
    style /Filter + /DecodeParms plumbing)."""
    from pdf_parser_ray.pdfcore.filters import decode_stream

    px = bytes(1 if i % 3 else 0 for i in range(40))
    enc = ccitt_encode(px, 10, 4, -1)
    out = decode_stream(
        enc, ["CCITTFaxDecode"], [{"K": -1, "Columns": 10, "Rows": 4}]
    )
    assert out == _pack_rows([px[r * 10 : (r + 1) * 10] for r in range(4)], 10, False)
