"""HTML boilerplate-strip tests (FIXTURES.md §3)."""

from pdf_parser_ray.pdfcore.htmlextract import extract_html_text


def text_of(html: bytes) -> bytes:
    return extract_html_text(html)[0]


def test_article_strips_boilerplate():
    html = (
        b"<!doctype html><html><head><title>T</title>"
        b"<style>body{color:red}</style><script>var x=1;</script></head>"
        b"<body><nav><ul><li>Home</li><li>About</li></ul></nav>"
        b"<article><p>First paragraph.</p><p>Second one.</p></article>"
        b"<footer>(c) 2024 Corp</footer></body></html>"
    )
    assert text_of(html) == b"First paragraph.\nSecond one."


def test_minimal():
    assert text_of(b"<html><body><p>hi</p></body></html>") == b"hi"


def test_entities():
    html = b"<p>a &amp; b &lt;c&gt; &#101;&#x66;</p>"
    assert text_of(html) == b"a & b <c> ef"


def test_empty_paragraph_preserves_blank_line():
    html = b"<p>a</p><p></p><p>b</p>"
    assert text_of(html) == b"a\n\nb"


def test_malformed_unclosed():
    html = b"<p>open<p>next</p>"
    assert text_of(html) == b"open\nnext"


def test_empty_doc():
    assert text_of(b"") == b""
    assert text_of(b"<html><head></head><body></body></html>") == b""


def test_inline_tags_preserved():
    html = b"<p>a <b>bold</b> and <a href='#'>link</a> end</p>"
    assert text_of(html) == b"a bold and link end"


def test_br_splits():
    assert text_of(b"<p>a<br>b</p>") == b"a\nb"


def test_script_content_never_leaks():
    html = b"<script>document.write('<p>evil</p>')</script><p>good</p>"
    assert text_of(html) == b"good"


def test_comment_and_cdata_skipped():
    html = b"<p>a</p><!-- <p>nope</p> --><![CDATA[zzz]]><p>b</p>"
    assert text_of(html) == b"a\nb"


def test_stray_lt_is_text():
    assert text_of(b"<p>a < b</p>") == b"a < b"


def test_spans_tile_output():
    html = b"<p>aa</p><p>bbb</p>"
    text, spans = extract_html_text(html)
    assert text == b"aa\nbbb"
    assert spans == [
        {"start": 0, "end": 2, "kind": "block", "page": 0},
        {"start": 3, "end": 6, "kind": "block", "page": 0},
    ]


def test_nested_containers_no_spurious_lines():
    html = b"<div><article><p>x</p></article></div>"
    assert text_of(html) == b"x"


def test_utf8():
    html = "<p>héllo wörld</p>".encode("utf-8")
    assert text_of(html) == "héllo wörld".encode("utf-8")
