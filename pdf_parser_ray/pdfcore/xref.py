"""Classic cross-reference table (SURVEY.md §2.2 V3, §2.5 J1).

Mirrors /root/reference/src/cross_reference.rs:51-211: one ``xref``
keyword + ONE subsection header ``from count`` (quirk Q8); 20-byte
entries with fields ``[0..10]`` offset, ``[11..16]`` generation and byte
17 the type. Quirk Q3: the type byte is compared against 110 (``n``) and
103 (``g``) — not 102 (``f``) — so a real free (``f``) entry errors
``NotSupporttedEntryType`` and even a ``g`` match hits the reference's
"entry type f is not supportted yet" panic; both become row errors here.

Entries are parsed lazily per lookup exactly like the reference (a
corrupt entry that is never dereferenced never errors), but results are
memoized per document — the reference re-reads and re-parses the entry
(and the object behind it) on every call, which is pure waste when the
whole payload is already an in-memory Arrow cell (SURVEY.md §2.2 V9).
"""

from __future__ import annotations

from . import rawbyte
from .errors import PanicError, XrefError
from .objects import assert_natural, assert_not_negative, ensure_int
from .parser import Parser


class XRef:
    __slots__ = ("buf", "actual_start_offset", "from_", "entry_num", "_entry_cache")

    def __init__(self, buf: bytes, xref_start_offset: int):
        # 30 bytes are expected to cover "xref" + the subsection header line
        window = bytes(buf[xref_start_offset : xref_start_offset + 30])
        n = len(window)

        after = rawbyte.extract_after(window, b"xref")
        if after is None:
            raise XrefError("xref is not found")
        after = rawbyte.extract_after_eol(after)
        if after is None:
            raise XrefError("xref is not found")
        xref_line_length = n - len(after)

        self.from_, self.entry_num = self._parse_subsection_line(
            after, xref_start_offset + xref_line_length
        )

        past_subsection = rawbyte.extract_after_eol(after)
        if past_subsection is None:
            # reference unwraps here (src/cross_reference.rs:70)
            raise PanicError("xref window ends inside subsection line")
        self.actual_start_offset = xref_start_offset + (n - len(past_subsection))

        self.buf = buf
        self._entry_cache: dict[int, tuple[int, int, bool]] = {}

    @staticmethod
    def _parse_subsection_line(buffer: bytes, byte_offset: int) -> tuple[int, int]:
        line = rawbyte.cut_after_eol(buffer)
        if line is None:
            raise XrefError("subsection line is not found")

        from_buf = rawbyte.cut_from(line, b" ")
        if from_buf is None:
            raise XrefError("subsection line is not found")
        from_obj = ensure_int(Parser(from_buf, byte_offset).parse())
        assert_not_negative(from_obj)

        count_buf = rawbyte.extract_after(line, b" ")
        if count_buf is None:
            raise XrefError("subsection line is not found")
        count_off = byte_offset + (len(line) - len(count_buf))
        count_obj = ensure_int(Parser(count_buf, count_off).parse())
        assert_natural(count_obj)

        return from_obj[1], count_obj[1]

    def contains(self, obj_num: int) -> bool:
        return self.from_ <= obj_num < (self.from_ + self.entry_num)

    def _entry_start_byte_offset(self, obj_num: int) -> int:
        return self.actual_start_offset + (obj_num - self.from_) * 20

    def _parse_entry(self, entry_off: int) -> tuple[int, int, bool]:
        """(byte offset, generation, is_in_use) for the 18-byte entry."""
        cached = self._entry_cache.get(entry_off)
        if cached is not None:
            return cached
        entry = bytes(self.buf[entry_off : entry_off + 18])
        if len(entry) != 18:
            raise PanicError("cannot read 18 byte")

        # fast path: well-formed entries are pure digit runs; the full
        # Parser is only needed for its exact error behavior on
        # malformed bytes, so fall back to it in that case
        n_buf, g_buf = entry[:10], entry[11:16]
        if n_buf.isdigit() and g_buf.isdigit():
            n_obj = ("int", int(n_buf), entry_off)
            g_obj = ("int", int(g_buf), entry_off + 12)
        else:
            n_obj = ensure_int(Parser(n_buf, entry_off).parse())
            assert_not_negative(n_obj)
            g_obj = ensure_int(Parser(g_buf, entry_off + 12).parse())
            assert_not_negative(g_obj)

        t_byte = entry[17]
        if t_byte == 110:  # n
            is_n = True
        elif t_byte == 103:  # g (Q3: 'f' is NOT matched here)
            is_n = False
        else:
            raise XrefError("entry type is not supportted")

        result = (n_obj[1], g_obj[1], is_n)
        self._entry_cache[entry_off] = result
        return result

    def get_byte_offset(self, indirect_ref: tuple) -> int:
        """(obj_num, gen) -> byte offset; per-document hash lookup (J1)."""
        obj_num, gen_num = indirect_ref[1]
        if not self.contains(obj_num):
            raise XrefError(f"object number `{obj_num}` is not contained")

        offset, gen, is_n = self._parse_entry(self._entry_start_byte_offset(obj_num))
        if not is_n:
            # reference panic (src/cross_reference.rs:162-164, quirk Q3)
            raise PanicError("entry type f is not supportted yet")
        if gen != gen_num:
            raise XrefError("generation number miss match")
        return offset
