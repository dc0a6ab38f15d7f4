"""Deterministic Common-Crawl-style pages table (FIXTURES.md §1).

Builds the BASELINE.json ``input_hint`` table
``(url:string, warc_ts:timestamp[us], html:binary, text:string,
lang:string)`` from a testdata ``documents.parquet``, so scale tracks
the sf directory and every byte is a pure function of ``doc_id``:

- ``doc_id % 3 == 0`` -> synthetic PDF wrapping the document text; the
  representation cycles through every byte path (literal Tj / split TJ
  / hex strings / ToUnicode CMap x flate / raw / LZW x direct or
  indirect /Length x classic xref / xref STREAM with Predictor 12 /
  ObjStm / incremental-update /Prev chain) WITHOUT changing the
  extracted text, so the driver's oracle comparison exercises the
  whole parser including the PDF 1.5 paths the reference lacks
- ``doc_id % 3 == 1`` -> HTML page wrapping the text in boilerplate
  (nav/footer/script/style/aside); half the rows entity-encode ``e``
- ``doc_id % 3 == 2`` -> junk payloads (empty / GIF / PNG / ZIP
  magics) for the router's ``other`` arm and the error channel

The ``text`` column is deliberately stale (``stale {doc_id}``) — the
engine must recompute, never trust it. ``url`` embeds ``doc_id`` so
oracle SQL can join back to ``documents``.

Built once per (sf_dir, GENVER) into /tmp/graft_pages_cache via a Ray
pipeline (map_batches over documents.parquet, streaming write).
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa

from ..pdfcore.pdfbuild import build_text_pdf

# bump when generation rules change (invalidates /tmp caches)
GENVER = "v9"

_BASE_TS_US = 1704067200 * 1_000_000  # 2024-01-01T00:00:00Z in epoch micros

_SHOW_VARIANTS = ("tj", "tj_split", "hex", "cmap")
_FILTERS = ("flate", "none", "lzw")
_XREF_KINDS = ("classic", "stream", "objstm", "prev")


def _escape_html(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def image_dims(doc_id: int) -> tuple[int, int]:
    """Deterministic image size for image-bearing pdf rows (SQL-expressible)."""
    return 2 + doc_id % 7, 3 + doc_id % 5


def image_pixels(doc_id: int, n: int) -> bytes:
    return bytes((doc_id * 7 + i) % 256 for i in range(n))


def make_pdf_payload(doc_id: int, text: str) -> bytes:
    k = doc_id // 3
    image = None
    if k % 5 == 0:
        # every 5th pdf row carries a DeviceRGB image XObject; every
        # 10th additionally an /SMask pair (V12-V17 + J2 coverage).
        # The k%10==5 half uses DCTDecode (engine-encoded baseline
        # JPEG, near-lossless) — object counts are identical, so the
        # extract_structure oracle formula is unchanged
        w_, h_ = image_dims(doc_id)
        image = {
            "width": w_,
            "height": h_,
            "pixels": image_pixels(doc_id, w_ * h_ * 3),
        }
        if k % 10 == 0:
            image["smask_pixels"] = image_pixels(doc_id + 1, w_ * h_)
        else:
            image["filter"] = "dct"
    show_variant = _SHOW_VARIANTS[k % 4]
    if show_variant == "tj_split" and (k // 8) % 2 == 1:
        # alternate the tj_split slot with the /Encoding /Differences
        # variant (inline font: object counts stay formula-stable)
        show_variant = "encdiff"
    # Form-XObject variant (text behind a Do operator): disjoint from
    # image rows so the image-stats oracle stays closed-form
    form = (k // 16) % 2 == 1 and k % 5 != 0
    return build_text_pdf(
        text.encode("utf-8"),
        show_variant=show_variant,
        stream_filter=_FILTERS[k % 3],
        indirect_length=(k % 2 == 0),
        xref_kind=_XREF_KINDS[(k // 4) % 4],
        image=image,
        form_xobject=form,
    )


def make_html_payload(doc_id: int, text: str) -> bytes:
    body = _escape_html(text)
    if doc_id % 2 == 1:
        body = body.replace("e", "&#101;")
    page = (
        "<!doctype html><html><head><title>Doc {i}</title>"
        "<style>body{{color:#222}}</style>"
        "<script>var x = 1 < 2 && 3 > 2;</script></head>"
        "<body><nav><ul><li>Home</li><li>Archive</li><li>About</li></ul></nav>"
        "<article><p>{body}</p></article>"
        "<aside>Related links nobody reads</aside>"
        "<footer>&copy; 2024 site{site}.example</footer></body></html>"
    ).format(i=doc_id, body=body, site=doc_id % 97)
    return page.encode("utf-8")


GIF_PALETTE = bytes(
    b for j in range(256) for b in (j, (j * 7) % 256, (j * 13) % 256)
)


def gif_dims(doc_id: int) -> tuple[int, int]:
    """Deterministic GIF size for junk-arm k==1 rows (SQL-expressible)."""
    return 2 + doc_id % 5, 2 + doc_id % 3


def png_dims(doc_id: int) -> tuple[int, int]:
    """Deterministic PNG size for junk-arm k==2 rows (SQL-expressible)."""
    return 2 + doc_id % 4, 2 + doc_id % 6


def make_junk_payload(doc_id: int) -> bytes:
    """The router's ``other`` arm. k==1/k==2 are REAL GIF/PNG images
    (engine-encoded, deterministic pixels) so the multimodal decode
    stage has true positives; k==0/k==3 stay undecodable."""
    from ..pdfcore.gif import encode_gif
    from ..pdfcore.png import encode_png

    k = (doc_id // 3) % 4
    if k == 0:
        return b""
    if k == 1:
        w, h = gif_dims(doc_id)
        return encode_gif(image_pixels(doc_id, w * h), w, h, GIF_PALETTE)
    if k == 2:
        w, h = png_dims(doc_id)
        return encode_png(image_pixels(doc_id, w * h * 3), w, h, 3)
    return b"PK\x03\x04" + bytes((doc_id * 31 + j) % 256 for j in range(32))


def make_payload(doc_id: int, text: str) -> bytes:
    arm = doc_id % 3
    if arm == 0:
        return make_pdf_payload(doc_id, text)
    if arm == 1:
        return make_html_payload(doc_id, text)
    return make_junk_payload(doc_id)


def expected_text(doc_id: int, text: str) -> bytes:
    """The engine's expected extracted text for a synthesized row."""
    if doc_id % 3 in (0, 1):
        return text.encode("utf-8")
    return b""


def url_for(doc_id: int) -> str:
    return f"https://site{doc_id % 97}.example/p/{doc_id}"


def doc_id_from_url(url: str) -> int:
    return int(url.rsplit("/", 1)[1])


def synth_batch(batch: pa.Table) -> pa.Table:
    """documents rows -> pages rows (map_batches UDF, pyarrow in/out)."""
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    langs = batch["lang"].to_pylist()

    urls = [url_for(i) for i in doc_ids]
    ts = pa.array(
        [_BASE_TS_US + i * 1_000_000 for i in doc_ids], type=pa.int64()
    ).cast(pa.timestamp("us"))
    payloads = [make_payload(i, t) for i, t in zip(doc_ids, texts)]
    stale = [f"stale {i}" for i in doc_ids]

    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": ts,
            "html": pa.array(payloads, type=pa.binary()),
            "text": pa.array(stale, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
        }
    )


def pages_cache_dir(sf_dir: str) -> str:
    key = hashlib.sha256(f"{os.path.abspath(sf_dir)}|{GENVER}".encode()).hexdigest()[:16]
    return os.path.join("/tmp/graft_pages_cache", key)


def build_pages_table(sf_dir: str, repeat: int = 1) -> str:
    """Ensure the synthetic pages parquet exists; returns its directory.

    ``repeat`` > 1 tiles the documents table (with shifted doc_ids) to
    scale benchmark inputs without new goldens (FIXTURES.md §1).
    """
    import ray.data

    out = pages_cache_dir(sf_dir) + (f"-x{repeat}" if repeat > 1 else "")
    done_marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(done_marker):
        return out

    src = os.path.join(sf_dir, "documents.parquet")
    ds = ray.data.read_parquet(src, columns=["doc_id", "text", "lang"])
    if repeat > 1:
        import pyarrow.parquet as pq

        n_docs = pq.ParquetFile(src).metadata.num_rows

        def tile(batch: pa.Table, n=n_docs, r=repeat) -> pa.Table:
            parts = []
            for k in range(r):
                t = batch.set_column(
                    0, "doc_id", pa.compute.add(batch["doc_id"], k * n)
                )
                parts.append(t)
            return pa.concat_tables(parts)

        ds = ds.map_batches(tile, batch_format="pyarrow")

    tmp = out + ".tmp"
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(out, ignore_errors=True)
    ds.map_batches(synth_batch, batch_format="pyarrow", batch_size=256).write_parquet(tmp)
    os.rename(tmp, out)

    # expected-media side table, computed from the WRITTEN artifact:
    # per-row (doc_id, payload_bytes, sha256) lets the driver's DuckDB
    # oracle check the binary-metadata pipeline on arms whose payload
    # bytes are not restatable in SQL (PDF, compressed PNG/GIF)
    meta_out = meta_table_dir(out)
    meta_tmp = meta_out + ".tmp"
    shutil.rmtree(meta_tmp, ignore_errors=True)
    shutil.rmtree(meta_out, ignore_errors=True)

    def meta_batch(t: pa.Table) -> pa.Table:
        ids, sizes, digests = [], [], []
        for url, payload in zip(t["url"].to_pylist(), t["html"].to_pylist()):
            p = payload or b""
            ids.append(doc_id_from_url(url))
            sizes.append(len(p))
            digests.append(hashlib.sha256(p).hexdigest())
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "payload_bytes": pa.array(sizes, pa.int64()),
                "sha256": pa.array(digests, pa.string()),
            }
        )

    import ray.data as rd

    rd.read_parquet(out, columns=["url", "html"]).map_batches(
        meta_batch, batch_format="pyarrow"
    ).write_parquet(meta_tmp)
    os.rename(meta_tmp, meta_out)

    with open(done_marker, "w") as f:
        f.write("ok")
    return out


def meta_table_dir(pages_dir: str) -> str:
    """Directory of the expected-media side table for a pages dir
    (kept OUTSIDE the pages dir so read_parquet(pages) never mixes
    schemas)."""
    return pages_dir.rstrip("/") + "_meta"


PIPELINE_COLUMNS = ["url", "warc_ts", "html", "lang"]  # stale `text` pruned


def read_pages(sf_dir: str, repeat: int = 1, columns: list[str] | None = None):
    """Ray Dataset over the (cached) synthetic pages table.

    Default column set prunes the upstream ``text`` column at the READ
    (the engine recomputes text; hauling the stale copy through the
    object store is pure waste — SURVEY.md "prune at the read").
    Pass ``columns=None ... columns=ALL_COLUMNS`` for the full shape.
    """
    import ray.data

    if columns is None:
        columns = PIPELINE_COLUMNS
    return ray.data.read_parquet(build_pages_table(sf_dir, repeat), columns=columns)
