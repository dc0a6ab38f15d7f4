"""Actor-pool extraction stage (SURVEY.md §2.4, §3.4).

``Extractor`` is a callable class for ``map_batches(Extractor,
concurrency=N, batch_size=B, batch_format="pyarrow")``: warm
cross-document caches live in ``__init__`` (once per actor) — here the
ToUnicode CMap cache, which the reference has no analogue for because
it never amortizes anything across documents (src/lib.rs:17-23 holds
per-document state only).

Per row: dispatch on ``kind`` -> pdf_extract / html_extract; every
reference panic/error becomes ``ok=false, error=...`` columns — one
corrupt document can never kill the job (SURVEY.md §1.2). The per-row
Python loop is the right granularity: each iteration is a whole
document parse (vectorization unit = document), while all column I/O
stays Arrow.

Output schema (SURVEY.md §1.2): url, warc_ts, lang, kind, ok, error,
text:large_binary, spans:list<struct<start,end,kind,page>>, n_pages,
n_objects, nbytes, partition_id.
"""

from __future__ import annotations

import pyarrow as pa

from ..pdfcore.document import PdfDocument
from ..pdfcore.errors import PdfError
from ..pdfcore.htmlextract import extract_html_text
from ..pdfcore.textextract import extract_text

SPAN_TYPE = pa.struct(
    [
        ("start", pa.int64()),
        ("end", pa.int64()),
        ("kind", pa.string()),
        ("page", pa.int32()),
    ]
)

OUTPUT_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("lang", pa.string()),
        ("kind", pa.string()),
        ("ok", pa.bool_()),
        ("error", pa.string()),
        ("text", pa.large_binary()),
        ("spans", pa.list_(SPAN_TYPE)),
        ("n_pages", pa.int32()),
        ("n_objects", pa.int32()),
        ("nbytes", pa.int64()),
        ("partition_id", pa.int32()),
    ]
)

# payloads above this size are routed to the low-concurrency giant-row
# pool instead of the main pool (skew guard, SURVEY.md §4)
GIANT_ROW_BYTES = 64 * 1024 * 1024


def extract_pdf(payload: bytes, cmap_cache: dict):
    doc = PdfDocument(payload)
    text, spans = extract_text(doc, cmap_cache)
    return text, spans, len(doc.pages), doc.n_objects


class Extractor:
    """Stateful extraction actor; see module docstring.

    ``giant_cap``: payloads above it become tagged error rows (the
    main pool's skew guard). The dedicated giant lane constructs the
    actor with ``giant_cap=None`` (no cap, tiny batches, low
    concurrency) — see extract_pipeline.run_extract_job.
    """

    def __init__(self, giant_cap: int | None = GIANT_ROW_BYTES):
        self.cmap_cache: dict = {}
        self.giant_cap = giant_cap

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch["kind"].to_pylist()
        payloads = batch["html"].to_pylist()

        oks: list[bool] = []
        errors: list[str | None] = []
        texts: list[bytes] = []
        spans_col: list[list[dict]] = []
        n_pages: list[int] = []
        n_objects: list[int] = []

        for kind, payload in zip(kinds, payloads):
            if payload is None:
                payload = b""
            if self.giant_cap is not None and len(payload) > self.giant_cap:
                # skew guard (SURVEY.md §4): a multi-GiB document must
                # not stall a worker in the main pool; the giant lane
                # (run_extract_job) reprocesses these rows with an
                # uncapped low-concurrency actor pair
                oks.append(False)
                errors.append(
                    f"giant: payload of {len(payload)} bytes exceeds the "
                    f"{self.giant_cap}-byte main-pool cap"
                )
                texts.append(b"")
                spans_col.append([])
                n_pages.append(0)
                n_objects.append(0)
                continue
            try:
                if kind == "pdf":
                    text, spans, np_, no_ = extract_pdf(payload, self.cmap_cache)
                elif kind == "html":
                    text, spans = extract_html_text(payload)
                    np_, no_ = 0, 0
                else:
                    oks.append(False)
                    errors.append("route: unsupported payload")
                    texts.append(b"")
                    spans_col.append([])
                    n_pages.append(0)
                    n_objects.append(0)
                    continue
                oks.append(True)
                errors.append(None)
                texts.append(text)
                spans_col.append(spans)
                n_pages.append(np_)
                n_objects.append(no_)
            except PdfError as e:
                oks.append(False)
                errors.append(e.describe())
                texts.append(b"")
                spans_col.append([])
                n_pages.append(0)
                n_objects.append(0)
            except Exception as e:  # engine bug: contained, flagged loudly
                oks.append(False)
                errors.append(f"internal: {type(e).__name__}: {e}")
                texts.append(b"")
                spans_col.append([])
                n_pages.append(0)
                n_objects.append(0)

        return pa.table(
            {
                "url": batch["url"],
                "warc_ts": batch["warc_ts"],
                "lang": batch["lang"],
                "kind": batch["kind"],
                "ok": pa.array(oks, type=pa.bool_()),
                "error": pa.array(errors, type=pa.string()),
                "text": pa.array(texts, type=pa.large_binary()),
                "spans": pa.array(spans_col, type=pa.list_(SPAN_TYPE)),
                "n_pages": pa.array(n_pages, type=pa.int32()),
                "n_objects": pa.array(n_objects, type=pa.int32()),
                "nbytes": batch["nbytes"],
                "partition_id": batch["partition_id"],
            }
        )
