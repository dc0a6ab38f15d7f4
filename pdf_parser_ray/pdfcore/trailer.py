"""Trailer parsing (SURVEY.md §2.2 V2).

Mirrors /root/reference/src/trailer.rs:23-100: the trailer is searched
only in the last 1024 bytes (Implementation Note 18; quirk Q8 — no
/Prev chains, no xref streams), cut at ``%%EOF``, the dict taken between
the ``trailer`` keyword and ``startxref``, requiring ``Size`` and
``Root``; the ``startxref`` integer is parsed after the *last*
``startxref`` occurrence. Keyword searches use the rawbyte state
machine (quirk Q6 applies).
"""

from __future__ import annotations

from . import rawbyte
from .errors import ParserError, TrailerError
from .objects import (
    assert_natural,
    ensure_dict_with_key,
    ensure_int,
    ensure_ref,
)
from .parser import Parser


class Trailer:
    __slots__ = (
        "xref_start_offset",
        "xref_entry_num",
        "root_catalog_ref",
        "trailer_dict",
    )

    def __init__(self, xref_start_offset, xref_entry_num, root_catalog_ref,
                 trailer_dict=None):
        self.xref_start_offset = xref_start_offset
        self.xref_entry_num = xref_entry_num
        self.root_catalog_ref = root_catalog_ref
        # full parsed dict retained for the /Prev-/XRefStm extension
        # (xrefx.py); the reference only extracts Size/Root
        self.trailer_dict = trailer_dict


def parse_trailer(buf: bytes, filesize: int) -> Trailer:
    byte_offset = max(filesize, 1024) - 1024
    window = bytes(buf[byte_offset : byte_offset + 1024])

    window = rawbyte.cut_from(window, b"%%EOF")
    if window is None:
        raise TrailerError("EOF marker is not found")

    trailer_dict_obj = _parse_trailer_dict(window, byte_offset)
    trailer_dict = ensure_dict_with_key(trailer_dict_obj, ["Size", "Root"])

    size_obj = ensure_int(trailer_dict[1]["Size"])
    assert_natural(size_obj)
    xref_entry_num = size_obj[1]

    root_catalog_ref = ensure_ref(trailer_dict[1]["Root"])

    xref_start_offset = _parse_xref_offset(window, byte_offset)

    return Trailer(
        xref_start_offset, xref_entry_num, root_catalog_ref, trailer_dict
    )


def parse_startxref(buf: bytes, filesize: int) -> int:
    """startxref offset only — for trailer-less xref-stream files
    (engine extension; the reference requires a ``trailer`` keyword)."""
    byte_offset = max(filesize, 1024) - 1024
    window = bytes(buf[byte_offset : byte_offset + 1024])
    window = rawbyte.cut_from(window, b"%%EOF")
    if window is None:
        raise TrailerError("EOF marker is not found")
    return _parse_xref_offset(window, byte_offset)


def _parse_xref_offset(window: bytes, byte_offset: int) -> int:
    after = rawbyte.extract_tail_after(window, b"startxref")
    if after is None:
        raise TrailerError("startxref is not found")
    start = (len(window) - len(after)) + byte_offset
    try:
        obj = Parser(after, start).parse()
    except ParserError as e:
        raise TrailerError(
            f"parse byte offset of cross reference table: {e.describe()}"
        ) from e
    int_obj = ensure_int(obj)
    assert_natural(int_obj)
    return int_obj[1]


def _parse_trailer_dict(window: bytes, byte_offset: int) -> tuple:
    after = rawbyte.extract_after(window, b"trailer")
    if after is None:
        raise TrailerError("trailer is not found")
    dict_start = (len(window) - len(after)) + byte_offset

    dict_buf = rawbyte.cut_tail_from(after, b"startxref")
    if dict_buf is None:
        raise TrailerError("startxref is not found")

    try:
        return Parser(dict_buf, dict_start).parse()
    except ParserError as e:
        raise TrailerError(f"parse trailer dictionary: {e.describe()}") from e
