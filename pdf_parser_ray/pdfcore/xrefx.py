"""Extended cross-reference resolution: xref streams, /Prev chains,
hybrid /XRefStm, and object streams (ObjStm).

These are ABSENT from the reference (quirk Q8: single classic
subsection, no /Prev, no xref streams — src/cross_reference.rs:58-78,
src/trailer.rs:24-27) but named by BASELINE.json's north_star as part of
the byte-to-text core, so they are designed fresh from the public PDF
1.7 spec (§3.4.3-3.4.7) in the same structural style.

Parity contract: documents inside the reference's subset (classic
single-subsection xref, no /Prev) NEVER take these paths — document.py
uses the byte-exact ``xref.XRef`` as the primary section and only falls
back here for (a) objects outside the newest section of a chained
classic file, or (b) files whose startxref points at an xref *stream*
(no ``trailer`` keyword at all, where the reference errors).

Entry forms: ``("n", byte_offset, gen)`` in-use, ``("f", next, gen)``
free, ``("z", objstm_num, index)`` compressed (type 2).
"""

from __future__ import annotations

import re as _re

from . import rawbyte
from .errors import XrefError
from .objects import TAG, VAL, ensure_dict_with_key, ensure_int, ensure_stream
from .parser import Parser

_INT_RUN = _re.compile(rb"\d+")
_WS = b"\x00\t\n\x0c\r "


class Section:
    """One xref section (classic or stream) with its dict/trailer."""

    __slots__ = ("entries", "trailer_dict", "prev", "xrefstm", "size")

    def __init__(self, entries, trailer_dict, prev, xrefstm, size):
        self.entries = entries          # {obj_num: entry tuple}
        self.trailer_dict = trailer_dict  # ("dict", {...}, off) or None
        self.prev = prev                # int offset or None
        self.xrefstm = xrefstm          # int offset or None (hybrid)
        self.size = size                # /Size or None


def _skip_ws(buf: bytes, i: int) -> int:
    n = len(buf)
    while i < n and buf[i] in _WS:
        i += 1
    return i


def parse_classic_section(buf: bytes, offset: int) -> Section:
    """Full classic section: ALL subsections + the trailing trailer dict.

    (The reference parses only the first subsection and takes the
    trailer from the last 1024 bytes; this extended parser exists for
    chained files outside that subset.)
    """
    i = _skip_ws(buf, offset)
    if buf[i : i + 4] != b"xref":
        raise XrefError("xref is not found")
    i = _skip_ws(buf, i + 4)
    entries: dict[int, tuple] = {}
    while True:
        if buf.startswith(b"trailer", i):
            i += 7
            break
        m = _re.compile(rb"(\d+)\s+(\d+)").match(buf, i)
        if m is None:
            raise XrefError("subsection line is not found")
        from_, count = int(m.group(1)), int(m.group(2))
        line_end = rawbyte.first_match_eol(buf[m.end() : m.end() + 4])
        if line_end is None:
            raise XrefError("subsection line is not found")
        i = m.end() + line_end[0] + line_end[1]
        for k in range(count):
            entry = buf[i : i + 18]
            if len(entry) != 18:
                raise XrefError("cross reference entry truncated")
            num = from_ + k
            off_f, gen_f, type_b = entry[:10], entry[11:16], entry[17]
            if not (off_f.isdigit() and gen_f.isdigit()):
                raise XrefError("cross reference entry malformed")
            if num not in entries:  # first subsection wins within a section
                if type_b == 110:  # n
                    entries[num] = ("n", int(off_f), int(gen_f))
                elif type_b == 102:  # f (real spec free marker)
                    entries[num] = ("f", int(off_f), int(gen_f))
                else:
                    entries[num] = ("?", int(off_f), int(gen_f))
            i += 20
        i = _skip_ws(buf, i)

    window = buf[i : i + 4096]
    cut = rawbyte.cut_from(window, b"startxref")
    if cut is not None and len(cut) > 0:
        window = cut
    trailer_obj = Parser(window, i).parse()
    d = trailer_obj[VAL] if trailer_obj[TAG] == "dict" else {}
    prev = d.get("Prev")
    xrefstm = d.get("XRefStm")
    size = d.get("Size")
    return Section(
        entries,
        trailer_obj if trailer_obj[TAG] == "dict" else None,
        prev[VAL] if prev is not None and prev[TAG] == "int" else None,
        xrefstm[VAL] if xrefstm is not None and xrefstm[TAG] == "int" else None,
        size[VAL] if size is not None and size[TAG] == "int" else None,
    )


def parse_stream_section(doc, offset: int) -> Section:
    """Xref stream section (PDF 1.5 §3.4.7): /W field widths, /Index
    subsection pairs, Flate/LZW + predictors handled by the filter
    chain. ``doc`` provides stream decoding (PdfDocument-compatible)."""
    obj = Parser(doc.buf[offset : offset + 4096], offset).parse()
    stream = ensure_stream(obj)
    d = ensure_dict_with_key(stream[VAL], ["W", "Size"])
    dv = d[VAL]

    w_arr = [ensure_int(el)[VAL] for el in dv["W"][VAL]]
    if len(w_arr) != 3:
        raise XrefError("xref stream /W must have 3 elements")
    size = ensure_int(dv["Size"])[VAL]
    if "Index" in dv:
        idx = [ensure_int(el)[VAL] for el in dv["Index"][VAL]]
        pairs = list(zip(idx[0::2], idx[1::2]))
    else:
        pairs = [(0, size)]

    data = doc.get_stream_decoded(stream)
    w1, w2, w3 = w_arr
    row_len = w1 + w2 + w3
    entries: dict[int, tuple] = {}
    pos = 0
    for start, count in pairs:
        for k in range(count):
            if pos + row_len > len(data):
                raise XrefError("xref stream data truncated")
            row = data[pos : pos + row_len]
            pos += row_len
            f1 = int.from_bytes(row[:w1], "big") if w1 else 1
            f2 = int.from_bytes(row[w1 : w1 + w2], "big")
            f3 = int.from_bytes(row[w1 + w2 :], "big")
            num = start + k
            if num in entries:
                continue
            if f1 == 0:
                entries[num] = ("f", f2, f3)
            elif f1 == 1:
                entries[num] = ("n", f2, f3)
            elif f1 == 2:
                entries[num] = ("z", f2, f3)
            else:
                entries[num] = ("?", f2, f3)

    prev = dv.get("Prev")
    return Section(
        entries,
        d,
        prev[VAL] if prev is not None and prev[TAG] == "int" else None,
        None,
        size,
    )


class XRefChain:
    """Merged view over an xref chain, newest section first."""

    __slots__ = ("sections", "root_ref", "size")

    def __init__(self, sections):
        self.sections = sections
        self.root_ref = None
        self.size = None
        for sec in sections:  # newest Root/Size win
            if sec.trailer_dict is not None:
                d = sec.trailer_dict[VAL]
                if self.root_ref is None and "Root" in d and d["Root"][TAG] == "ref":
                    self.root_ref = d["Root"]
                if self.size is None and sec.size is not None:
                    self.size = sec.size
        if self.size is None:
            self.size = max(
                (max(s.entries) + 1 for s in sections if s.entries), default=0
            )

    @classmethod
    def load(cls, doc, start_offset: int) -> "XRefChain":
        sections = []
        seen: set[int] = set()
        queue = [start_offset]
        while queue:
            offset = queue.pop(0)
            if offset in seen or offset < 0 or offset >= doc.size:
                continue
            seen.add(offset)
            i = _skip_ws(doc.buf, offset)
            if doc.buf.startswith(b"xref", i):
                sec = parse_classic_section(doc.buf, offset)
            else:
                sec = parse_stream_section(doc, offset)
            sections.append(sec)
            if sec.xrefstm is not None:
                queue.append(sec.xrefstm)  # hybrid: stream shadows classic prev
            if sec.prev is not None:
                queue.append(sec.prev)
        return cls(sections)

    def lookup(self, obj_num: int, gen_num: int) -> tuple:
        for sec in self.sections:
            entry = sec.entries.get(obj_num)
            if entry is None:
                continue
            kind = entry[0]
            if kind == "f":
                raise XrefError("entry type f is not supportted yet")
            if kind == "?":
                raise XrefError("entry type is not supportted")
            if kind == "n":
                if entry[2] != gen_num:
                    raise XrefError("generation number miss match")
                return entry
            return entry  # "z": generation is implicitly 0
        raise XrefError(f"object number `{obj_num}` is not contained")


class ObjStm:
    """One parsed object stream (/Type /ObjStm, §3.4.6): bare objects
    packed after a header of (obj_num, relative_offset) integer pairs."""

    __slots__ = ("numbers", "offsets", "data", "first")

    def __init__(self, data: bytes, n: int, first: int):
        header_ints = [int(m.group(0)) for m in _INT_RUN.finditer(data[:first])]
        if len(header_ints) < 2 * n:
            raise XrefError("object stream header truncated")
        self.numbers = header_ints[0 : 2 * n : 2]
        self.offsets = header_ints[1 : 2 * n : 2]
        self.data = data
        self.first = first

    def get(self, index: int) -> tuple:
        """Parse the bare object at ``index``; returned tuple is the
        object itself (no iobj wrapper — offsets are stream-relative)."""
        if index >= len(self.numbers):
            raise XrefError(f"object stream index `{index}` out of range")
        start = self.first + self.offsets[index]
        end = (
            self.first + self.offsets[index + 1]
            if index + 1 < len(self.offsets)
            else len(self.data)
        )
        return Parser(self.data[start:end], start).parse()
