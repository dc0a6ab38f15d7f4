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


# -- density-based main-content selection --

from pdf_parser_ray.pdfcore.htmlextract import extract_main_content


def test_density_agrees_with_rules_on_articles():
    html = (
        b"<html><head><title>T</title></head><body><nav><ul><li>Home</li></ul></nav>"
        b"<article><p>Real paragraph one with plenty of words.</p>"
        b"<p>Second real paragraph.</p></article>"
        b"<footer>(c)</footer></body></html>"
    )
    assert extract_main_content(html) == (
        b"Real paragraph one with plenty of words.\nSecond real paragraph."
    )


def test_density_strips_link_stuffed_div():
    """Rule-based stripping can't drop a plain-div link sidebar; the
    density scorer can."""
    page = (
        b"<html><body>"
        b"<div><a href='/a'>Link one</a> <a href='/b'>Link two</a>"
        b" <a href='/c'>Link three</a></div>"
        b"<div><p>The real article text body with substance and many "
        b"words of content.</p><p>Second paragraph of the piece.</p></div>"
        b"</body></html>"
    )
    got = extract_main_content(page)
    assert b"Link one" not in got
    assert got.startswith(b"The real article")


def test_density_fallback_no_containers():
    assert extract_main_content(b"<p>solo</p>") == b"solo"
    assert extract_main_content(b"") == b""


def test_density_never_crashes_on_fuzz():
    import random

    rng = random.Random(5)
    for _ in range(300):
        n = rng.randrange(0, 200)
        extract_main_content(bytes(rng.randrange(256) for _ in range(n)))


def test_real_world_sphinx_docs():
    """Real document smoke: Python's bundled IDLE help page (sphinx
    HTML with a nav sidebar in plain divs). The density selector must
    find the article body; the rule-based strip keeps nav (it isn't in
    suppressible tags here) — exactly the division of labor."""
    import os

    path = "/root/.pyenv/versions/3.13.0/lib/python3.13/idlelib/help.html"
    if not os.path.exists(path):
        import pytest

        pytest.skip("bundled sphinx page not present")
    buf = open(path, "rb").read()
    text, spans = extract_html_text(buf)
    assert len(text) > 10_000 and len(spans) > 100
    main = extract_main_content(buf)
    assert main.startswith("IDLE".encode())
    assert b"Integrated Development" in main
    # the sidebar's "Navigation" header is gone from the main content
    assert not main.startswith(b"Navigation")
