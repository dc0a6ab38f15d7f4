"""PDF header validation (SURVEY.md §2.2 V1).

Mirrors /root/reference/src/header.rs:30-54: read the first <=15 bytes,
cut at the first EOL, decode as UTF-8, and *search* (Rust Regex
``is_match``) for ``%PDF-\\d+\\.\\d+``.
"""

from __future__ import annotations

import re

from . import rawbyte
from .errors import HeaderError

PDF_HEADER_MAX_LENGTH = 15
_HEADER_RE = re.compile(r"%PDF-\d+\.\d+")


def validate_pdf_header(buf: bytes) -> None:
    """Raise HeaderError unless the first line matches the header regex."""
    window = bytes(buf[:PDF_HEADER_MAX_LENGTH])
    line = rawbyte.cut_after_eol(window)
    if line is None:
        raise HeaderError("invalid pdf header")
    try:
        text = line.decode("utf-8")
    except UnicodeDecodeError:
        raise HeaderError("invalid pdf header") from None
    if _HEADER_RE.search(text) is None:
        raise HeaderError("invalid pdf header")
