"""Document skeleton tests (V1-V3, V9-V17): golden synthetic PDFs from
pdfbuild against PdfDocument / trailer / xref / page-tree / streams /
image params, incl. the error-channel fixtures (FIXTURES.md §2)."""

import zlib

import pytest

from pdf_parser_ray.pdfcore import pdfbuild
from pdf_parser_ray.pdfcore.document import PdfDocument
from pdf_parser_ray.pdfcore.errors import (
    HeaderError,
    PanicError,
    PdfError,
    TrailerError,
    XrefError,
)
from pdf_parser_ray.pdfcore.header import validate_pdf_header


def test_header_ok():
    validate_pdf_header(b"%PDF-1.4\nrest")
    validate_pdf_header(b"%PDF-1.7\r\nrest")


def test_header_bad():
    with pytest.raises(HeaderError):
        validate_pdf_header(b"%QQF-1.4\nrest")
    with pytest.raises(HeaderError):
        validate_pdf_header(b"no eol at all in the first fifteen bytes")
    # regex is a *search* in the first line (Rust is_match semantics)
    validate_pdf_header(b"xx%PDF-1.4\nok")


def test_minimal_document():
    pdf = pdfbuild.build_text_pdf(b"hello world")
    doc = PdfDocument(pdf)
    assert len(doc.pages) == 1
    assert doc.pages[0].page_number == 1
    assert doc.trailer.xref_entry_num == doc.xref.entry_num


def test_multi_page_numbering():
    text = b"\n".join(b"line %d" % i for i in range(100))
    pdf = pdfbuild.build_text_pdf(text, page_size=7)
    doc = PdfDocument(pdf)
    assert len(doc.pages) == 15
    assert [p.page_number for p in doc.pages] == list(range(1, 16))
    assert doc.get_page(15).page_number == 15
    with pytest.raises(PdfError):
        doc.get_page(0)
    with pytest.raises(PdfError):
        doc.get_page(16)


def test_indirect_length_stream():
    pdf = pdfbuild.build_text_pdf(b"abc", indirect_length=True)
    doc = PdfDocument(pdf)
    # resolving the page's content stream exercises /Length -> indirect
    from pdf_parser_ray.pdfcore.textextract import extract_text

    text, _ = extract_text(doc)
    assert text == b"abc"


def test_bad_header_doc():
    with pytest.raises(HeaderError):
        PdfDocument(pdfbuild.build_bad_header())


def test_no_eof_doc():
    with pytest.raises(TrailerError) as ei:
        PdfDocument(pdfbuild.build_no_eof())
    assert "EOF marker is not found" in ei.value.describe()


def test_free_entry_deref_is_error():
    """Quirk Q3: a real 'f' entry errors NotSupporttedEntryType when
    dereferenced (src/cross_reference.rs:203-207)."""
    with pytest.raises(XrefError) as ei:
        PdfDocument(pdfbuild.build_free_entry_deref())
    assert "not supportted" in ei.value.describe()


def test_truncated_doc_is_contained_error():
    with pytest.raises(PdfError):
        PdfDocument(pdfbuild.build_truncated())


def test_images_flate_rgb_and_smask_antijoin():
    w, h = 4, 3
    rgb = bytes(range(w * h * 3))
    gray = bytes(range(w * h))
    pdf = pdfbuild.build_image_pdf(
        [
            {"width": w, "height": h, "colorspace": "DeviceRGB", "pixels": rgb},
            {
                "width": w,
                "height": h,
                "colorspace": "DeviceGray",
                "pixels": gray,
                "smask_pixels": gray,
            },
        ]
    )
    doc = PdfDocument(pdf)
    images = doc.extract_images([1])[0]
    # the smask itself is excluded by the anti-join (src/page.rs:51-74)
    assert len(images) == 2
    by_cs = {img["colorspace"]: img for img in images}
    assert by_cs["DeviceRGB"]["rgb"] == rgb
    # gray expands to RGB by channel replication (into_rgb8 semantics)
    assert by_cs["DeviceGray"]["rgb"] == bytes(
        b for px in gray for b in (px, px, px)
    )


def test_image_size_mismatch_panics_contained():
    w, h = 4, 3
    pdf = pdfbuild.build_image_pdf(
        [{"width": w, "height": h, "colorspace": "DeviceRGB", "pixels": b"short"}]
    )
    doc = PdfDocument(pdf)
    with pytest.raises(PanicError):
        doc.extract_images([1])


def test_resolver_memoizes():
    pdf = pdfbuild.build_text_pdf(b"memo")
    doc = PdfDocument(pdf)
    ref = ("ref", (1, 0), 0)
    a = doc.resolve(ref)
    b = doc.resolve(ref)
    assert a is b


def test_xref_generation_mismatch():
    pdf = pdfbuild.build_text_pdf(b"x")
    doc = PdfDocument(pdf)
    with pytest.raises(XrefError) as ei:
        doc.resolve(("ref", (1, 7), 0))
    assert "generation number miss match" in ei.value.describe()


def test_xref_not_contained():
    pdf = pdfbuild.build_text_pdf(b"x")
    doc = PdfDocument(pdf)
    with pytest.raises(XrefError) as ei:
        doc.resolve(("ref", (999, 0), 0))
    assert "not contained" in ei.value.describe()


def test_fuzz_pdfdocument_only_pdferrors():
    """SURVEY §5.5: arbitrary bytes must raise only contained PdfError."""
    import random

    rng = random.Random(123)
    good = pdfbuild.build_text_pdf(b"fuzz seed doc")
    for i in range(400):
        if i % 4 == 0:
            n = rng.randrange(0, 300)
            buf = bytes(rng.randrange(256) for _ in range(n))
        else:  # structured corruptions of a valid doc
            buf = bytearray(good)
            for _ in range(rng.randrange(1, 6)):
                buf[rng.randrange(len(buf))] = rng.randrange(256)
            buf = bytes(buf)
        try:
            doc = PdfDocument(buf)
            from pdf_parser_ray.pdfcore.textextract import extract_text

            extract_text(doc)
        except PdfError:
            pass


def test_thumbnail_ref_captured():
    """V13: /Thumb refs are carried on the page (src/page_tree.rs:184-193)."""
    pdf = pdfbuild.build_text_pdf(b"thumbed", thumbnail=True)
    doc = PdfDocument(pdf)
    assert doc.pages[0].thumbnail is not None
    assert doc.pages[0].thumbnail[0] == "ref"
    # the thumb resolves to an image stream
    stream = doc.resolve(doc.pages[0].thumbnail)
    assert stream[0] == "stream"
    assert PdfDocument(pdfbuild.build_text_pdf(b"x")).pages[0].thumbnail is None


def test_cli_extract_images(tmp_path):
    """Reference-CLI parity surface (src/main.rs:10-48): file in,
    per-page image files out; no Ray involved."""
    import json
    import subprocess
    import sys

    pdf_path = tmp_path / "doc.pdf"
    pixels = bytes(range(48))
    pdf_path.write_bytes(
        pdfbuild.build_image_pdf(
            [{"width": 4, "height": 4, "colorspace": "DeviceRGB", "pixels": pixels}]
        )
    )
    out = subprocess.run(
        [
            sys.executable,
            "-m",
            "pdf_parser_ray.cli",
            "extract-images",
            str(pdf_path),
            "--pages",
            "1",
            "--out",
            str(tmp_path / "imgs"),
        ],
        capture_output=True,
        text=True,
        check=True,
        cwd="/root/repo",
    )
    result = json.loads(out.stdout.strip().splitlines()[-1])
    assert len(result["images_written"]) == 1
    # filenames enumerate the result list 0-based, exactly like the
    # reference (src/main.rs:30-37): first requested page -> 0-0.jpg
    data = (tmp_path / "imgs" / "0-0.jpg").read_bytes()
    assert data[:3] == b"\xff\xd8\xff"
    import numpy as np

    from pdf_parser_ray.pdfcore.jpeg import decode_jpeg

    w, h, n, decoded = decode_jpeg(data)
    assert (w, h, n) == (4, 4, 3)
    err = np.abs(
        np.frombuffer(decoded, np.uint8).astype(int)
        - np.frombuffer(pixels, np.uint8).astype(int)
    ).max()
    assert err <= 2
