"""Parser tests — object trees ported 1:1 from
/root/reference/src/parser/test.rs:6-127 plus quirk Q7 and stream-object
attachment."""

import pytest

from pdf_parser_ray.pdfcore.errors import ParserError
from pdf_parser_ray.pdfcore.parser import Parser, parse_object


def test_parse_integer():
    assert parse_object(b"123") == ("int", 123, 0)


def test_parse_real():
    assert parse_object(b"-123.") == ("real", -123.0, 0)


def test_parse_boolean():
    assert parse_object(b"true") == ("bool", True, 0)


def test_parse_null():
    assert parse_object(b"null") == ("null", None, 0)


def test_parse_indirect_ref():
    assert parse_object(b"1 0 R") == ("ref", (1, 0), 0)


def test_parse_string_1():
    assert parse_object(b"(hoge)") == ("string", b"hoge", 0)


def test_parse_array_1():
    obj = parse_object(b"[  123  true \n  -12.[2 1 R\nnull] ]")
    assert obj == (
        "array",
        [
            ("int", 123, 3),
            ("bool", True, 8),
            ("real", -12.0, 16),
            ("array", [("ref", (2, 1), 21), ("null", None, 27)], 20),
        ],
        0,
    )


def test_parse_dict_1():
    obj = parse_object(b"<</hoge 1 0 R\n/fuga <</arr [123\n/name]>>>>")
    assert obj == (
        "dict",
        {
            "hoge": ("ref", (1, 0), 8),
            "fuga": (
                "dict",
                {"arr": ("array", [("int", 123, 28), ("name", "name", 32)], 27)},
                20,
            ),
        },
        0,
    )


def test_q7_duplicate_keys_last_wins():
    obj = parse_object(b"<</k 1 /k 2>>")
    assert obj[1]["k"][1] == 2


def test_indirect_obj():
    obj = parse_object(b"1 0 obj\n123 endobj")
    assert obj == ("iobj", ("int", 123, 8), 0)


def test_stream_obj():
    buf = b"1 0 obj\n<</Length 3>>\nstream\nabc"
    obj = parse_object(buf)
    assert obj[0] == "stream"
    assert obj[2] == 29  # stream data start offset
    assert obj[1][0] == "dict"
    assert obj[1][1]["Length"] == ("int", 3, 18)


def test_stream_without_length_invalid():
    with pytest.raises(ParserError) as ei:
        parse_object(b"1 0 obj\n<</Len 3>>\nstream\nabc")
    assert ei.value.kind == "InvalidStreamObj"


def test_unbalanced_obj_missmatch():
    with pytest.raises(ParserError) as ei:
        Parser(b"1 0 obj 123", 0)
    assert ei.value.kind == "IndirectObjMissMatch"


def test_no_token():
    with pytest.raises(ParserError) as ei:
        parse_object(b"   ")
    assert ei.value.kind == "NoToken"


def test_lexer_error_wrapped():
    with pytest.raises(ParserError) as ei:
        parse_object(b"qwerty")
    assert ei.value.kind == "Lexer"
    assert "cannot tokenize" in ei.value.describe()


def test_dict_unexpected_token():
    with pytest.raises(ParserError) as ei:
        parse_object(b"<<123 456>>")
    assert ei.value.kind == "UnexpectedToken"
