"""PDF object lexer (SURVEY.md §2.2 V4-V7).

Byte-exact reimplementation of the reference tokenizer
(/root/reference/src/lexer.rs:215-689). Tokens are plain tuples
``(kind, value, byte_offset)`` with ``kind`` one of the K_* constants;
``byte_offset`` is absolute in the document (buffer_start_offset + local).

Preserved reference quirks (SURVEY.md §2.9):
  Q1  ``\\t`` escape decodes to 0x0B (VT), not 0x09 (src/lexer.rs:134-135)
  Q2  octal escapes parse as u16 then truncate to the low byte
      (``\\777`` -> 0xFF, src/lexer.rs:114-115)
  Q4  ``is_regular_char`` excludes 0x12 (DC2) instead of 0x0C (FF)
      (src/lexer.rs:292-311) while whitespace-skip includes byte 12
  Q5  hex strings: odd digit count pads a trailing 0; whitespace inside
      is rejected (src/lexer.rs:206-209, 469-477)
  Q9  ``stream`` must be followed by LF or CRLF, never bare CR
  Q10 indirect refs/objects require object_num > 0
  Q11 lexing halts at ``endobj`` / ``stream`` (object-bounded)
  Q13 ``+123``/``-.002``/``4.``/``.5`` are numbers; ``.``/``--`` are
      ParseNumber errors
  Q14 (found during port, src/lexer.rs:108-170): a literal string that
      *ends* inside an octal escape drops the pending digits — the
      accumulator is never flushed at end of buffer, so ``(\\053)``
      decodes to b"" while ``(\\053 )`` decodes to b"+ ".

Integer parse mirrors Rust ``isize`` (64-bit): values outside
[-2^63, 2^63) fall through to the f64/Real path (src/lexer.rs:424-431).
"""

from __future__ import annotations

from .errors import LexerError
from . import rawbyte

# token kinds
K_EOL = "eol"                      # never emitted by tokenize(); parser skips it
K_BOOL = "bool"
K_INT = "int"
K_REAL = "real"
K_HEXSTR = "hexstr"
K_STR = "str"
K_NAME = "name"
K_DICT_START = "dict_start"
K_DICT_END = "dict_end"
K_ARR_START = "arr_start"
K_ARR_END = "arr_end"
K_NULL = "null"
K_IREF = "iref"                    # value = (obj_num, gen_num)
K_IOBJ_START = "iobj_start"        # value = (obj_num, gen_num)
K_IOBJ_END = "iobj_end"
K_STREAM_START = "stream_start"    # value = absolute offset of stream data

_ISIZE_MIN = -(2**63)
_ISIZE_MAX = 2**63 - 1

_NUMBER_CHARS = frozenset(b"0123456789+-.")
# Q4: 0x12 (DC2) is a delimiter here instead of 0x0C (FF) — mirror exactly
_NON_REGULAR = frozenset(b"\x00\t\n\x12\r ()<>[]{}/%")
_HEX_DIGITS = frozenset(b"0123456789abcdefABCDEF")
_OCTAL_DIGITS = frozenset(b"01234567")


def parse_name(buf: bytes) -> str:
    """ASCII-only name body; no #xx escapes (src/lexer.rs:89-96)."""
    if not buf.isascii():
        raise ValueError("non-ascii name")
    return buf.decode("ascii")


def parse_string(buf: bytes) -> bytes:
    """Literal-string unescape (src/lexer.rs:99-173; quirks Q1/Q2/Q14)."""
    out = bytearray()
    i = 0
    n = len(buf)
    octal = ""
    in_octal = False
    prev_backslash = False
    while i < n:
        byte = buf[i]
        if in_octal:
            if len(octal) == 3 or byte not in _OCTAL_DIGITS:
                # u16 parse then take the low byte (Q2)
                out.append(int(octal, 8) & 0xFF)
                in_octal = False
                octal = ""
            else:
                octal += chr(byte)
                i += 1
                continue
        if prev_backslash:
            if byte == 0x6E:       # n -> LF
                out.append(0x0A)
            elif byte == 0x72:     # r -> CR
                out.append(0x0D)
            elif byte == 0x74:     # t -> 0x0B, not TAB (Q1)
                out.append(0x0B)
            elif byte == 0x62:     # b -> BS
                out.append(0x08)
            elif byte == 0x66:     # f -> FF
                out.append(0x0C)
            elif byte == 0x28:     # (
                out.append(0x28)
            elif byte == 0x29:     # )
                out.append(0x29)
            elif byte == 0x5C:     # backslash
                out.append(0x5C)
            elif byte in _OCTAL_DIGITS:
                in_octal = True
                octal += chr(byte)
            else:                  # lone backslash dropped, byte kept
                out.append(byte)
            prev_backslash = False
            i += 1
            continue
        if byte == 0x5C:
            prev_backslash = True
            i += 1
            continue
        out.append(byte)
        i += 1
    # Q14: pending octal at end of buffer is dropped (reference never
    # flushes it after the loop)
    return bytes(out)


def parse_hex_string(buf: bytes) -> bytes:
    """Hex pairs -> bytes; odd length pads trailing 0 (src/lexer.rs:177-212)."""
    for b in buf:
        if b not in _HEX_DIGITS:
            raise ValueError("non-hexdigit")
    out = bytearray()
    n = len(buf)
    for i in range(0, n - 1, 2):
        out.append(int(buf[i : i + 2], 16))
    if n % 2 == 1:
        out.append(int(buf[n - 1 : n].decode() + "0", 16))
    return bytes(out)


class Lexer:
    """Object-bounded tokenizer over one buffer window.

    Mirrors /root/reference/src/lexer.rs:227-689. ``buffer`` must be
    ``bytes`` (not memoryview: indexing must yield ints and slices bytes).
    """

    __slots__ = (
        "buffer",
        "start",
        "i",
        "token_head_i",
        "byte",
        "has_iobj_start",
        "has_iobj_end",
        "tokens",
    )

    def __init__(self, buffer: bytes, buffer_start_offset: int = 0):
        if len(buffer) == 0:
            # reference panics (src/lexer.rs:229-231); contained here
            raise LexerError("UnexpectedByte", buffer_start_offset)
        self.buffer = buffer
        self.start = buffer_start_offset
        self.i = 0
        self.token_head_i = 0
        self.byte = buffer[0]
        self.has_iobj_start = False
        self.has_iobj_end = False
        self.tokens: list[tuple] = []

    # -- cursor helpers (src/lexer.rs:246-345) --

    def _move(self) -> bool:
        self.i += 1
        if len(self.buffer) <= self.i:
            return False        # self.byte stays stale, as in the reference
        self.byte = self.buffer[self.i]
        return True

    def _confirm(self, kind: str, value=None) -> None:
        self.tokens.append((kind, value, self.start + self.token_head_i))
        self.token_head_i = self.i

    def _cancel(self):
        if self.tokens:
            tok = self.tokens.pop()
            self.token_head_i = tok[2] - self.start
            return tok
        self.token_head_i = 0
        return None

    def _skip(self) -> None:
        self.token_head_i = self.i

    def _is_number_char(self) -> bool:
        return self.byte in _NUMBER_CHARS

    def _is_regular_char(self) -> bool:
        return self.byte not in _NON_REGULAR

    def _assume_and_move(self, target: bytes) -> bool:
        if not target:
            return False
        buf, i = self.buffer, self.i
        if buf[i : i + len(target)] != target:
            return False
        self.i += len(target) - 1
        if self.i < len(buf):
            self.byte = buf[self.i]
        return True

    def _expect_keyword_end(self) -> None:
        if self._move() and self._is_regular_char():
            raise self._error("UndefinedKeyword")

    def _error(self, kind: str) -> LexerError:
        return LexerError(kind, self.start + self.token_head_i)

    def has_unbalanced_indirectobj(self) -> bool:
        return self.has_iobj_start != self.has_iobj_end

    # -- main loop (src/lexer.rs:353-688) --

    def tokenize(self) -> None:
        is_comment = False
        buf = self.buffer
        n = len(buf)

        while self.token_head_i < n:
            byte = self.byte

            if byte == 10:  # LF
                self._move()
                is_comment = False
                self._skip()
                continue

            if byte == 13:  # CR (CRLF is one EOL)
                if rawbyte.is_next_satisfy(buf, self.i, lambda b: b == 10):
                    self._move()
                self._move()
                is_comment = False
                self._skip()
                continue

            if is_comment:
                self._move()
                self._skip()
                continue

            if byte in (0, 9, 12, 32):  # whitespace set (includes FF; cf. Q4)
                self._move()
                self._skip()
                continue

            if byte == 0x25:  # %
                is_comment = True
                self._move()
                self._skip()
                continue

            # Integer / Real (Q13)
            if byte in _NUMBER_CHARS:
                while self._is_number_char():
                    if not self._move():
                        break
                s = buf[self.token_head_i : self.i].decode("ascii")
                try:
                    v = int(s)
                    if _ISIZE_MIN <= v <= _ISIZE_MAX:
                        self._confirm(K_INT, v)
                        continue
                except ValueError:
                    pass
                try:
                    self._confirm(K_REAL, float(s))
                    continue
                except ValueError:
                    raise self._error("ParseNumber") from None

            # Name
            if byte == 0x2F:  # /
                self._move()
                while self._is_regular_char():
                    if not self._move():
                        break
                body = buf[self.token_head_i + 1 : self.i]
                try:
                    self._confirm(K_NAME, parse_name(body))
                except ValueError:
                    raise self._error("ParseName") from None
                continue

            # Hex string / dict start
            if byte == 0x3C:  # <
                if not self._move():
                    raise self._error("FinishInObject")
                if self.byte == 0x3C:
                    self._move()
                    self._confirm(K_DICT_START)
                    continue
                while self.byte in _HEX_DIGITS:
                    if not self._move():
                        raise self._error("FinishInObject")
                if self.byte != 0x3E:  # > (Q5: whitespace inside rejected)
                    raise self._error("UnexpectedByte")
                body = buf[self.token_head_i + 1 : self.i]
                try:
                    hex_bytes = parse_hex_string(body)
                except ValueError:
                    raise self._error("ParseHexString") from None
                self._move()
                self._confirm(K_HEXSTR, hex_bytes)
                continue

            # Dict end
            if byte == 0x3E:  # >
                if not self._move():
                    raise self._error("FinishInObject")
                if self.byte != 0x3E:
                    raise self._error("FinishInObject")
                self._move()
                self._confirm(K_DICT_END)
                continue

            # Literal string
            if byte == 0x28:  # (
                if not self._move():
                    raise self._error("FinishInObject")
                prev_backslash = False
                depth = 0
                while not (not prev_backslash and depth == 0 and self.byte == 0x29):
                    if not prev_backslash and self.byte == 0x28:
                        depth += 1
                    if not prev_backslash and self.byte == 0x29 and depth != 0:
                        depth -= 1
                    prev_backslash = not prev_backslash and self.byte == 0x5C
                    if not self._move():
                        raise self._error("FinishInObject")
                body = parse_string(buf[self.token_head_i + 1 : self.i])
                self._move()
                self._confirm(K_STR, body)
                continue

            if byte == 0x5B:  # [
                self._move()
                self._confirm(K_ARR_START)
                continue

            if byte == 0x5D:  # ]
                self._move()
                self._confirm(K_ARR_END)
                continue

            # Indirect ref: `R` retro-consumes two Integer tokens (Q10)
            if byte == 0x52:  # R
                gen_tok = self._cancel()
                obj_tok = self._cancel()
                if (
                    obj_tok is not None
                    and gen_tok is not None
                    and obj_tok[0] == K_INT
                    and gen_tok[0] == K_INT
                    and obj_tok[1] > 0
                    and gen_tok[1] >= 0
                ):
                    self._move()
                    self._confirm(K_IREF, (obj_tok[1], gen_tok[1]))
                    continue
                raise self._error("InvalidIndirectRef")

            # Indirect object start: on failed integer-pop the reference
            # falls through to the remaining keyword checks (tokens lost)
            if self._assume_and_move(b"obj"):
                gen_tok = self._cancel()
                obj_tok = self._cancel()
                if (
                    obj_tok is not None
                    and gen_tok is not None
                    and obj_tok[0] == K_INT
                    and gen_tok[0] == K_INT
                    and obj_tok[1] > 0
                    and gen_tok[1] >= 0
                ):
                    self._move()
                    self._confirm(K_IOBJ_START, (obj_tok[1], gen_tok[1]))
                    self.has_iobj_start = True
                    continue

            if self._assume_and_move(b"endobj"):  # Q11: halt
                self._expect_keyword_end()
                self._confirm(K_IOBJ_END)
                self.has_iobj_end = True
                return

            if self._assume_and_move(b"stream"):  # Q9/Q11
                if (n - self.i) < 3:
                    raise self._error("ConfirmStream")
                self._move()
                if self._assume_and_move(b"\n") or self._assume_and_move(b"\r\n"):
                    self._confirm(K_IOBJ_END)
                    self.has_iobj_end = True
                    self._confirm(K_STREAM_START, self.start + self.i + 1)
                    return
                raise self._error("UnexpectedByte")

            if self._assume_and_move(b"null"):
                self._expect_keyword_end()
                self._confirm(K_NULL)
                continue

            if self._assume_and_move(b"true"):
                self._expect_keyword_end()
                self._confirm(K_BOOL, True)
                continue

            if self._assume_and_move(b"false"):
                self._expect_keyword_end()
                self._confirm(K_BOOL, False)
                continue

            raise self._error("UndefinedKeyword")
