"""Pure-Python PDF/HTML byte core — importable without Ray.

Mirrors the reference crate's module graph (/root/reference/src/lib.rs:4-15):
rawbyte, lexer, parser/objects, header, trailer, xref, document — plus
the north_star additions: filters (LZW), textextract (content streams +
CMaps), htmlextract (boilerplate strip) and pdfbuild (fixture writer).
"""

from .document import PdfDocument
from .errors import PdfError
from .htmlextract import extract_html_text
from .textextract import extract_text

__all__ = [
    "PdfDocument",
    "PdfError",
    "extract_html_text",
    "extract_text",
]
