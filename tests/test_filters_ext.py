"""ASCIIHex / ASCII85 / RunLength filters (PDF spec §7.4.2/3/5).

These are engine extensions past the reference's closed filter enum
(src/image.rs:126-130 supports only Flate and DCT) — spec examples,
property roundtrips, malformed-input probes, and the end-to-end path
(content stream filtered through each variant must extract the same
text as the unfiltered build).
"""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_parser_ray.pdfcore.filters import (
    FilterError,
    ascii85_decode,
    ascii85_encode,
    ascii_hex_decode,
    ascii_hex_encode,
    run_length_decode,
    run_length_encode,
)


# -- ASCIIHexDecode -----------------------------------------------------------


def test_hex_basic():
    assert ascii_hex_decode(b"48656C6C6F>") == b"Hello"
    # whitespace ignored, lowercase accepted
    assert ascii_hex_decode(b"48 65\n6c\t6C 6f>") == b"Hello"
    # odd trailing digit padded with 0
    assert ascii_hex_decode(b"7>") == b"\x70"
    # data after EOD ignored
    assert ascii_hex_decode(b"41>zz-not-hex") == b"A"
    # empty
    assert ascii_hex_decode(b">") == b""


def test_hex_invalid():
    with pytest.raises(FilterError):
        ascii_hex_decode(b"4G>")


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=512))
def test_hex_roundtrip(data):
    assert ascii_hex_decode(ascii_hex_encode(data)) == data


# -- ASCII85Decode ------------------------------------------------------------


def test_a85_basic():
    # 'Hello' -> 87cURDZ (partial final group of 2 chars -> 1 byte)
    assert ascii85_decode(ascii85_encode(b"Hello")) == b"Hello"
    # z shorthand
    assert ascii85_decode(b"z~>") == b"\x00\x00\x00\x00"
    assert ascii85_encode(b"\x00\x00\x00\x00") == b"z~>"
    # whitespace ignored mid-stream
    enc = ascii85_encode(b"sure.")
    spaced = b" ".join(enc[i : i + 1] for i in range(len(enc)))
    assert ascii85_decode(spaced) == b"sure."
    # empty
    assert ascii85_decode(b"~>") == b""


def test_a85_known_vector():
    # the canonical external vector (independent of our encoder)
    assert ascii85_decode(b"87cURD]i,\"Ebo80~>") == b"Hello World!"
    assert ascii85_encode(b"Hello World!") == b"87cURD]i,\"Ebo80~>"


def test_a85_invalid():
    with pytest.raises(FilterError):
        ascii85_decode(b"ab z~>")  # z inside a group
    with pytest.raises(FilterError):
        ascii85_decode(b"a~>")  # lone trailing char
    with pytest.raises(FilterError):
        ascii85_decode(b"abc{~>")  # char out of range ('{' = 0x7B)
    with pytest.raises(FilterError):
        ascii85_decode(b"s8W-\"~>")  # group value > 2^32-1


def test_a85_partial_group_no_eod():
    # a 5-char final group without ~> is accepted (lenient EOD)
    data = b"\x01\x02\x03\x04"
    enc = ascii85_encode(data)
    assert enc.endswith(b"~>")
    assert ascii85_decode(enc[:-2]) == data


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=512))
def test_a85_roundtrip(data):
    assert ascii85_decode(ascii85_encode(data)) == data


# -- RunLengthDecode ----------------------------------------------------------


def test_rl_basic():
    # literal run: L=2 -> copy 3 bytes; EOD=128
    assert run_length_decode(bytes([2]) + b"abc" + bytes([128])) == b"abc"
    # repeat run: L=254 -> 257-254=3 copies
    assert run_length_decode(bytes([254]) + b"x" + bytes([128])) == b"xxx"
    # max repeat: L=129 -> 128 copies
    assert run_length_decode(bytes([129]) + b"y" + bytes([128])) == b"y" * 128
    assert run_length_decode(bytes([128])) == b""


def test_rl_errors():
    with pytest.raises(FilterError):
        run_length_decode(bytes([5]) + b"ab")  # truncated literal
    with pytest.raises(FilterError):
        run_length_decode(bytes([200]))  # truncated repeat
    with pytest.raises(FilterError):
        run_length_decode(bytes([0]) + b"a")  # missing EOD


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=512))
def test_rl_roundtrip(data):
    assert run_length_decode(run_length_encode(data)) == data


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 255), st.integers(1, 300)), max_size=8
    )
)
def test_rl_roundtrip_runs(runs):
    # run-heavy payloads exercise the repeat-run arm + the 128 cap
    data = b"".join(bytes([v]) * n for v, n in runs)
    assert run_length_decode(run_length_encode(data)) == data


# -- end-to-end through the PDF text path -------------------------------------


@pytest.mark.parametrize("variant", ["ahx", "a85+flate", "rl"])
def test_extract_text_through_new_filters(variant):
    from pdf_parser_ray.pdfcore import PdfDocument, extract_text
    from pdf_parser_ray.pdfcore.pdfbuild import build_text_pdf

    text = "filter parity\nsecond line"
    plain = extract_text(PdfDocument(build_text_pdf(text)))
    filtered = extract_text(
        PdfDocument(build_text_pdf(text, stream_filter=variant))
    )
    assert filtered == plain
