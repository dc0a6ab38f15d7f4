"""Lexer tests — token vectors ported 1:1 from
/root/reference/src/lexer/test.rs:17-208, plus quirk tests Q1-Q14
(SURVEY.md §2.9) derived from the reference code."""

import pytest

from pdf_parser_ray.pdfcore.errors import LexerError
from pdf_parser_ray.pdfcore.lexer import (
    Lexer,
    parse_hex_string,
    parse_string,
)


def tokens_of(buf: bytes):
    lx = Lexer(buf, 0)
    lx.tokenize()
    return lx.tokens


def test_tokenize_space_eol():
    assert tokens_of(b"\0\t\n\x0c\r \r\n \n\r") == []


def test_tokenize_integer():
    assert tokens_of(b" +123 -123\r") == [
        ("int", 123, 1),
        ("int", -123, 6),
    ]


def test_tokenize_float():
    assert tokens_of(b"1.5 -23.4 +110.0 .5 4. -.002 0.0") == [
        ("real", 1.5, 0),
        ("real", -23.4, 4),
        ("real", 110.0, 10),
        ("real", 0.5, 17),
        ("real", 4.0, 20),
        ("real", -0.002, 23),
        ("real", 0.0, 29),
    ]


def test_tokenize_hex_str():
    assert tokens_of(b"<a0e0f>") == [("hexstr", bytes([160, 224, 240]), 0)]


def test_tokenize_string():
    # "(hoge \t \\ \053 (\0053))" where \t is a raw TAB byte
    buf = b"(hoge \t \\\\ \\053 (\\0053))"
    assert tokens_of(buf) == [
        (
            "str",
            bytes([104, 111, 103, 101, 32, 9, 32, 92, 32, 43, 32, 40, 5, 51, 41]),
            0,
        )
    ]


def test_tokenize_array():
    assert tokens_of(b"[123 (aa\\() -55.]") == [
        ("arr_start", None, 0),
        ("int", 123, 1),
        ("str", bytes([97, 97, 40]), 5),
        ("real", -55.0, 12),
        ("arr_end", None, 16),
    ]


def test_tokenize_indirect_ref_1():
    assert tokens_of(b"  1 0 R") == [("iref", (1, 0), 2)]


def test_tokenize_indirect_ref_2():
    assert tokens_of(b"123 1 0 R") == [
        ("int", 123, 0),
        ("iref", (1, 0), 4),
    ]


def test_tokenize_name():
    assert tokens_of(b"/Name..;$@?! ") == [("name", "Name..;$@?!", 0)]


def test_tokenize_comment():
    assert tokens_of(b"/Name%hogehoge /..<>(){}[]\r\n123") == [
        ("name", "Name", 0),
        ("int", 123, 28),
    ]


def test_tokenize_boolean_null():
    assert tokens_of(b"null true false") == [
        ("null", None, 0),
        ("bool", True, 5),
        ("bool", False, 10),
    ]


def test_tokenize_indirect_obj():
    # lexing halts at endobj even though the buffer continues (Q11)
    assert tokens_of(b"1 0 obj\n123 endobj   hogehoge lkjdflkj)") == [
        ("iobj_start", (1, 0), 0),
        ("int", 123, 8),
        ("iobj_end", None, 12),
    ]


# -- quirk tests (SURVEY.md §2.9) --


def test_q1_backslash_t_is_vt():
    """src/lexer.rs:134-135: the \\t escape pushes 0x0B, not 0x09."""
    assert parse_string(b"a\\tb") == b"a\x0bb"


def test_q2_octal_overflow_truncates():
    """src/lexer.rs:114-115: \\777 -> u16 511 -> low byte 0xFF."""
    assert parse_string(b"\\777 ") == b"\xff "
    assert parse_string(b"\\400 ") == b"\x00 "


def test_q14_trailing_octal_dropped():
    """Pending octal at end of buffer is never flushed (src/lexer.rs:108-170)."""
    assert parse_string(b"ab\\53") == b"ab"
    assert parse_string(b"ab\\053") == b"ab"
    assert parse_string(b"ab\\053 ") == b"ab+ "
    # exactly 3 digits followed by a 4th octal char: flushed + literal
    assert parse_string(b"\\0533") == b"+3"


def test_escape_passthrough_and_lone_backslash():
    assert parse_string(b"\\n\\r\\b\\f\\(\\)\\\\") == b"\n\r\x08\x0c()\\"
    assert parse_string(b"\\z") == b"z"  # unknown escape: backslash dropped


def test_q4_regular_char_set():
    """0x12 (DC2) terminates a name; 0x0C (FF) does NOT (src/lexer.rs:292-311)
    even though FF is whitespace between tokens (src/lexer.rs:398)."""
    lx = Lexer(b"/AB\x12CD ", 0)
    with pytest.raises(LexerError):  # the stray DC2 byte itself then errors
        lx.tokenize()
    assert lx.tokens[0] == ("name", "AB", 0)
    # FF is a regular char inside a token, so the name runs through it
    assert tokens_of(b"/AB\x0cCD ")[0] == ("name", "AB\x0cCD", 0)


def test_q5_hex_odd_pads_and_ws_rejected():
    assert parse_hex_string(b"a0e0f") == bytes([160, 224, 240])
    with pytest.raises(LexerError) as ei:
        tokens_of(b"<a0 e0>")
    assert ei.value.kind == "UnexpectedByte"


def test_q10_object_num_zero_invalid():
    with pytest.raises(LexerError) as ei:
        tokens_of(b"0 0 R")
    assert ei.value.kind == "InvalidIndirectRef"
    with pytest.raises(LexerError):
        tokens_of(b"1 -1 R")


def test_q9_stream_requires_lf():
    lx = Lexer(b"1 0 obj\n<</Length 1>>\nstream\nXYZ", 0)
    lx.tokenize()
    assert lx.tokens[-1][0] == "stream_start"
    assert lx.tokens[-1][1] == 29  # byte after the LF

    with pytest.raises(LexerError) as ei:
        tokens_of(b"1 0 obj\n<</Length 1>>\nstream\rXYZ")
    assert ei.value.kind == "UnexpectedByte"


def test_stream_crlf():
    lx = Lexer(b"1 0 obj\n<</Length 1>>\nstream\r\nXYZ", 0)
    lx.tokenize()
    assert lx.tokens[-1] == ("stream_start", 30, 29)


def test_stream_too_short_confirm():
    with pytest.raises(LexerError) as ei:
        tokens_of(b"1 0 obj <<>> stream")
    assert ei.value.kind == "ConfirmStream"


def test_q13_bad_numbers():
    for bad in (b". ", b"-- ", b"+ ", b"..- "):
        with pytest.raises(LexerError) as ei:
            tokens_of(bad)
        assert ei.value.kind == "ParseNumber"


def test_isize_overflow_becomes_real():
    """Rust isize parse overflows -> f64 path (src/lexer.rs:424-431)."""
    toks = tokens_of(b"99999999999999999999 ")
    assert toks[0][0] == "real"
    assert toks[0][1] == 1e20


def test_name_non_ascii_errors():
    with pytest.raises(LexerError) as ei:
        tokens_of(b"/Na\xffme ")
    assert ei.value.kind == "ParseName"


def test_buffer_offset_propagates():
    lx = Lexer(b" 42 ", 1000)
    lx.tokenize()
    assert lx.tokens == [("int", 42, 1001)]


def test_undefined_keyword():
    with pytest.raises(LexerError) as ei:
        tokens_of(b"qwerty")
    assert ei.value.kind == "UndefinedKeyword"


def test_unbalanced_detection():
    lx = Lexer(b"1 0 obj 123", 0)
    lx.tokenize()
    assert lx.has_unbalanced_indirectobj()


# -- differential test: optimized tokenize vs literal naive port --

from hypothesis import given, settings, strategies as st

_FRAGMENTS = [
    b" ", b"\n", b"\r", b"\r\n", b"\t", b"\x0c", b"\x12", b"\x00",
    b"1", b"12", b"+3", b"-4.5", b".", b"--", b"4.",
    b"/Name", b"/", b"/A\xffB",
    b"(str)", b"(a\\tb)", b"(\\053", b"(()", b"()", b"(", b")",
    b"<a0e0>", b"<a0e>", b"<", b"<<", b">>", b">", b"<a0 e0>",
    b"[", b"]", b"null", b"true", b"false", b"nullx",
    b"R", b"1 0 R", b"0 0 R", b"obj", b"1 0 obj", b"endobj", b"endobjx",
    b"stream", b"stream\n", b"stream\r\nXY", b"stream\rX",
    b"% comment", b"%", b"qq",
]

pdfish = st.lists(st.sampled_from(_FRAGMENTS), min_size=1, max_size=12).map(
    b"".join
)


def run_lexer(buf, naive):
    lx = Lexer(buf, 7)
    try:
        (lx.tokenize_naive if naive else lx.tokenize)()
        outcome = ("ok", lx.tokens, lx.has_unbalanced_indirectobj())
    except LexerError as e:
        outcome = ("err", e.kind, e.byte_offset, lx.tokens)
    return outcome


@given(pdfish)
@settings(max_examples=1500)
def test_tokenize_differential(buf):
    if not buf:
        return
    assert run_lexer(buf, naive=False) == run_lexer(buf, naive=True)


@given(st.binary(max_size=60))
@settings(max_examples=400)
def test_escape_roundtrip(data):
    """SURVEY §5.5: unescape∘escape is the identity on arbitrary bytes."""
    from pdf_parser_ray.pdfcore.pdfbuild import escape_literal_string

    assert parse_string(escape_literal_string(data)) == data


@given(st.binary(max_size=60))
@settings(max_examples=400)
def test_escaped_string_lexes_balanced(data):
    """An escaped literal string always lexes to exactly its bytes."""
    from pdf_parser_ray.pdfcore.pdfbuild import escape_literal_string

    toks = tokens_of(b"(" + escape_literal_string(data) + b") ")
    assert toks == [("str", data, 0)]
