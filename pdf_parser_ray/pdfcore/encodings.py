"""Simple-font encodings: base tables + /Differences (PDF 1.7 §5.5.5,
Appendix D) and a practical Adobe Glyph List subset.

The reference has no text path at all; SURVEY.md §2.4 names
"standard-encoding tables" as warm actor state for the engine's text
extraction. A font WITHOUT /ToUnicode but WITH an /Encoding dict (base
encoding + /Differences) maps show-string bytes -> glyph names ->
Unicode here. Fonts with neither fall back to raw byte passthrough
(textextract.py show()).

The glyph list below is the AGL subset covering Latin-1: letters,
digits, punctuation, and common accented forms — enough for web-text
corpora; unknown glyph names map to U+FFFD.
"""

from __future__ import annotations

# glyph name -> unicode char (AGL subset; both directions used)
GLYPH_TO_CHAR: dict[str, str] = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@",
    "bracketleft": "[", "backslash": "\\", "bracketright": "]",
    "asciicircum": "^", "underscore": "_", "grave": "`",
    "braceleft": "{", "bar": "|", "braceright": "}", "asciitilde": "~",
    "quoteleft": "‘", "quoteright": "’",
    "quotedblleft": "“", "quotedblright": "”",
    "endash": "–", "emdash": "—", "bullet": "•",
    "ellipsis": "…", "euro": "€", "sterling": "£",
    "yen": "¥", "cent": "¢", "section": "§",
    "copyright": "©", "registered": "®", "degree": "°",
    "plusminus": "±", "mu": "µ", "paragraph": "¶",
    "middot": "·", "periodcentered": "·",
    "agrave": "à", "aacute": "á", "acircumflex": "â",
    "atilde": "ã", "adieresis": "ä", "aring": "å",
    "ae": "æ", "ccedilla": "ç", "egrave": "è",
    "eacute": "é", "ecircumflex": "ê", "edieresis": "ë",
    "igrave": "ì", "iacute": "í", "icircumflex": "î",
    "idieresis": "ï", "ntilde": "ñ", "ograve": "ò",
    "oacute": "ó", "ocircumflex": "ô", "otilde": "õ",
    "odieresis": "ö", "oslash": "ø", "ugrave": "ù",
    "uacute": "ú", "ucircumflex": "û", "udieresis": "ü",
    "germandbls": "ß",
}
# letters and digits map to themselves by name
for _c in "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz":
    GLYPH_TO_CHAR[_c] = _c

CHAR_TO_GLYPH: dict[str, str] = {}
for _name, _ch in GLYPH_TO_CHAR.items():
    CHAR_TO_GLYPH.setdefault(_ch, _name)


def _ascii_base() -> dict[int, str]:
    """Codes 32..126 -> glyph names shared by Standard/WinAnsi/MacRoman."""
    table: dict[int, str] = {}
    for code in range(32, 127):
        ch = chr(code)
        name = CHAR_TO_GLYPH.get(ch)
        if name is not None:
            table[code] = name
    return table


# base encodings: code -> glyph name (ASCII range; the Latin-1 upper
# half of WinAnsi added where the AGL subset covers it)
STANDARD_ENCODING: dict[int, str] = _ascii_base()

WIN_ANSI_ENCODING: dict[int, str] = dict(_ascii_base())
for _code in range(0xA0, 0x100):
    _ch = chr(_code)
    _name = CHAR_TO_GLYPH.get(_ch)
    if _name is not None:
        WIN_ANSI_ENCODING[_code] = _name

MAC_ROMAN_ENCODING: dict[int, str] = dict(_ascii_base())

BASE_ENCODINGS = {
    "StandardEncoding": STANDARD_ENCODING,
    "WinAnsiEncoding": WIN_ANSI_ENCODING,
    "MacRomanEncoding": MAC_ROMAN_ENCODING,
}


def build_code_map(base_name: str | None, differences: list) -> dict[int, str]:
    """code -> unicode char map from a base encoding + /Differences.

    ``differences`` is the raw array alternation (int code, then glyph
    names) per §5.5.5. Unknown glyphs map to U+FFFD.
    """
    glyphs = dict(BASE_ENCODINGS.get(base_name or "StandardEncoding",
                                     STANDARD_ENCODING))
    code = 0
    for el in differences:
        if isinstance(el, int):
            code = el
        else:
            glyphs[code] = el
            code += 1
    return {c: GLYPH_TO_CHAR.get(g, "�") for c, g in glyphs.items()}
