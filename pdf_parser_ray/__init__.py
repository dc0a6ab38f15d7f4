"""pdf_parser_ray — a Ray-Data-native document extraction engine.

A brand-new engine with the query/data-processing capabilities of the
reference ``Kotaro7750/pdf_parser`` (a single-threaded Rust PDF parser,
see /root/reference), re-expressed Ray-Data-first:

- ``pdfcore``   — pure-Python byte core (no Ray): PDF lexer/parser/xref/
                  page-tree/filters + content-stream text extraction and
                  HTML boilerplate stripping. Byte-level semantics mirror
                  the reference where they overlap (SURVEY.md §2.9 quirks).
- ``sources``   — parquet readers + deterministic synthetic page-table
                  generation (Common-Crawl-style ``(url, warc_ts, html,
                  text, lang)`` rows).
- ``stages``    — Ray Data map_batches stages: magic-byte router, actor-
                  pool extractor, metrics partials.
- ``pipelines`` — end-to-end pipelines: extraction, dedup (exact/MinHash-
                  LSH/SimHash/Jaccard/embedding), similarity search, text
                  analysis, windowed event aggregation, relational ops.
- ``state``     — partition manifest: checkpoint/resume lineage.

Nothing in this package calls ``ray.init``; sessions are owned by the
caller (driver / bench.py / test fixture).
"""

__version__ = "0.1.0"
