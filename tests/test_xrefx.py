"""Extended xref tests: xref streams (+PNG predictors), ObjStm,
incremental-update /Prev chains (north_star features absent from the
reference; PDF 1.7 spec §3.4.3-3.4.7)."""

import pytest

from pdf_parser_ray.pdfcore import pdfbuild
from pdf_parser_ray.pdfcore.document import PdfDocument
from pdf_parser_ray.pdfcore.errors import PdfError, XrefError
from pdf_parser_ray.pdfcore.filters import (
    apply_png_predictor,
    png_predict_up,
)
from pdf_parser_ray.pdfcore.textextract import extract_text

TEXT = b"modern xref test\nsecond line\n\nlast (one) \\ <with specials>"


@pytest.mark.parametrize("kind", ["stream", "objstm", "prev"])
@pytest.mark.parametrize("variant", ["tj", "cmap"])
@pytest.mark.parametrize("filt", ["none", "lzw"])
def test_modern_roundtrip(kind, variant, filt):
    pdf = pdfbuild.build_text_pdf(
        TEXT, xref_kind=kind, show_variant=variant, stream_filter=filt, page_size=2
    )
    got, _ = extract_text(PdfDocument(pdf))
    assert got == TEXT


def test_png_predictor_roundtrip():
    rows = bytes(range(256)) * 7  # 256 rows x 7 cols
    assert apply_png_predictor(png_predict_up(rows, 7), 1, 8, 7) == rows


def test_xref_stream_has_no_trailer_keyword():
    pdf = pdfbuild.build_text_pdf(b"x", xref_kind="stream")
    assert b"trailer" not in pdf
    assert b"/Type /XRef" in pdf
    doc = PdfDocument(pdf)
    assert doc.trailer is None and doc.xref is None
    assert doc._chain is not None


def test_objstm_entries_are_type2():
    pdf = pdfbuild.build_text_pdf(b"abc", xref_kind="objstm")
    doc = PdfDocument(pdf)
    # the catalog lives inside an object stream -> resolved via type-2
    entry = doc._chain.lookup(doc.root_ref[1][0], 0)
    assert entry[0] == "z"
    assert len(doc.pages) == 1


def test_prev_chain_reference_vs_engine():
    """Quirk Q8 parity: on a /Prev file the reference-exact primary
    section resolves ONLY the updated object; everything else goes
    through the extension chain."""
    pdf = pdfbuild.build_text_pdf(b"chained", xref_kind="prev")
    doc = PdfDocument(pdf)
    assert doc.xref is not None  # classic primary (newest section)
    # primary covers only object 1 (the re-emitted catalog)
    assert doc.xref.from_ == 1 and doc.xref.entry_num == 1
    with pytest.raises(XrefError):
        doc.xref.get_byte_offset(("ref", (2, 0), 0))  # reference would fail
    got, _ = extract_text(doc)  # engine follows /Prev
    assert got == b"chained"


def test_classic_unchanged_by_extension():
    """Reference-subset docs never build a chain."""
    doc = PdfDocument(pdfbuild.build_text_pdf(b"plain"))
    assert doc._chain is None


def test_corrupt_xref_stream_contained():
    pdf = pdfbuild.build_text_pdf(b"x", xref_kind="stream")
    at = pdf.find(b"stream\n", pdf.find(b"/Type /XRef")) + 7
    corrupted = pdf[:at] + bytes(16) + pdf[at + 16 :]  # smash Flate data
    with pytest.raises(PdfError):
        PdfDocument(corrupted)


def test_n_objects_per_kind():
    base = PdfDocument(pdfbuild.build_text_pdf(b"x", xref_kind="classic")).n_objects
    assert PdfDocument(pdfbuild.build_text_pdf(b"x", xref_kind="stream")).n_objects == base + 1
    assert PdfDocument(pdfbuild.build_text_pdf(b"x", xref_kind="objstm")).n_objects == base + 2
    assert PdfDocument(pdfbuild.build_text_pdf(b"x", xref_kind="prev")).n_objects == base


# -- randomized builder x parser interaction coverage --

from hypothesis import given, settings, strategies as st

texts = st.text(
    alphabet="abcdefghijklmnop qrstuvwxyz0123456789()\\<>&#;\n",
    min_size=0,
    max_size=120,
)
variants = st.sampled_from(["tj", "tj_split", "hex", "cmap", "encdiff"])
filters_ = st.sampled_from(["none", "flate", "lzw", "flate+lzw"])
kinds = st.sampled_from(["classic", "stream", "objstm", "prev"])


@given(texts, variants, filters_, kinds, st.booleans(), st.booleans())
@settings(max_examples=120, deadline=None)
def test_random_roundtrip_all_variants(text, variant, filt, kind, indirect, form):
    from pdf_parser_ray.pdfcore.textextract import extract_text

    pdf = pdfbuild.build_text_pdf(
        text,
        show_variant=variant,
        stream_filter=filt,
        xref_kind=kind,
        indirect_length=indirect,
        form_xobject=form,
        page_size=3,
    )
    got, spans = extract_text(PdfDocument(pdf))
    assert got.decode("utf-8") == text
    if spans:
        assert spans[0]["start"] == 0 and spans[-1]["end"] == len(got)


@pytest.mark.parametrize("kind", ["classic", "stream", "objstm", "prev"])
def test_corruption_contained_all_kinds(kind):
    """Random byte corruption of every xref layout stays a contained
    PdfError (or parses to something) — never a foreign exception."""
    import random

    from pdf_parser_ray.pdfcore.textextract import extract_text

    import zlib

    rng = random.Random(zlib.crc32(kind.encode()))
    good = pdfbuild.build_text_pdf(b"corruption seed doc", xref_kind=kind)
    for _ in range(120):
        buf = bytearray(good)
        for _ in range(rng.randrange(1, 5)):
            buf[rng.randrange(len(buf))] = rng.randrange(256)
        try:
            extract_text(PdfDocument(bytes(buf)))
        except PdfError:
            pass
