"""DOM-heuristic HTML boilerplate stripping (BASELINE.json north_star).

Absent from the reference (a PDF-only parser); designed fresh here as
the HTML arm of the extraction engine. No external parser libraries —
a small, deterministic tag scanner with explicit rules so extracted
text is byte-reproducible:

- suppressed containers (content dropped entirely): script, style,
  noscript, template, head, title, nav, footer, aside, iframe, svg,
  form, button, select, option
- "line" blocks — each emits exactly one output line, even when empty:
  p, h1..h6, li, pre, blockquote, th, td, caption, dt, dd, figcaption,
  summary
- container blocks (div, article, section, main, ul, ol, table, tr,
  header, body, ...) flush any pending inline text as a line
- <br> flushes the current line
- whitespace-only text nodes are dropped; other text nodes are kept
  verbatim (entities decoded via html.unescape)
- output = lines joined with "\\n", encoded UTF-8

Comments (<!-- -->), doctype and CDATA are skipped. Unclosed tags
degrade gracefully (suppression depth never goes negative).
"""

from __future__ import annotations

import html as _htmlmod
import re

_SUPPRESS = {
    "script",
    "style",
    "noscript",
    "template",
    "head",
    "title",
    "nav",
    "footer",
    "aside",
    "iframe",
    "svg",
    "form",
    "button",
    "select",
    "option",
}

_LINE_BLOCKS = {
    "p",
    "h1",
    "h2",
    "h3",
    "h4",
    "h5",
    "h6",
    "li",
    "pre",
    "blockquote",
    "th",
    "td",
    "caption",
    "dt",
    "dd",
    "figcaption",
    "summary",
}

_CONTAINER_BLOCKS = {
    "div",
    "article",
    "section",
    "main",
    "header",
    "body",
    "html",
    "ul",
    "ol",
    "dl",
    "table",
    "thead",
    "tbody",
    "tfoot",
    "tr",
    "figure",
    "details",
    "hr",
    "address",
    "fieldset",
}

# raw-text elements: content runs to the matching close tag, no nesting
_RAWTEXT = {"script", "style", "textarea", "title"}

_TAG_NAME_RE = re.compile(rb"[a-zA-Z][a-zA-Z0-9-]*")


def _decode_bytes(buf: bytes) -> str:
    try:
        return buf.decode("utf-8")
    except UnicodeDecodeError:
        return buf.decode("latin-1")


def extract_html_text(buf: bytes) -> tuple[bytes, list[dict]]:
    """Main-content text from an HTML payload.

    Returns ``(text_bytes, spans)``; spans are per-line
    ``{start, end, kind: "block", page: 0}`` byte ranges into the output.
    """
    lines: list[str] = []
    cur: list[str] = []
    suppress_depth = 0

    def flush(force: bool) -> None:
        text = "".join(cur)
        cur.clear()
        if text or force:
            lines.append(text)

    i = 0
    n = len(buf)
    while i < n:
        lt = buf.find(b"<", i)
        if lt == -1:
            if suppress_depth == 0:
                chunk = buf[i:n]
                if chunk.strip():
                    cur.append(_htmlmod.unescape(_decode_bytes(chunk)))
            break
        if lt > i and suppress_depth == 0:
            chunk = buf[i:lt]
            if chunk.strip():
                cur.append(_htmlmod.unescape(_decode_bytes(chunk)))
        i = lt
        nxt = buf[lt + 1 : lt + 2]
        if not (nxt.isalpha() or nxt in (b"/", b"!", b"?")):
            # "a < b": a "<" not opening a tag is literal text
            if suppress_depth == 0:
                cur.append("<")
            i = lt + 1
            continue
        # comment / doctype / cdata
        if buf.startswith(b"<!--", i):
            end = buf.find(b"-->", i + 4)
            i = n if end == -1 else end + 3
            continue
        if buf.startswith(b"<![CDATA[", i):
            end = buf.find(b"]]>", i + 9)
            i = n if end == -1 else end + 3
            continue
        if buf.startswith(b"<!", i) or buf.startswith(b"<?", i):
            end = buf.find(b">", i + 2)
            i = n if end == -1 else end + 1
            continue
        gt = buf.find(b">", i + 1)
        if gt == -1:
            break  # truncated tag: drop the tail
        tag_body = buf[i + 1 : gt]
        i = gt + 1
        closing = tag_body.startswith(b"/")
        if closing:
            tag_body = tag_body[1:]
        m = _TAG_NAME_RE.match(tag_body)
        if m is None:
            # stray "<" followed by non-tag (e.g. "a < b"): treat as text
            if suppress_depth == 0:
                cur.append(_htmlmod.unescape(_decode_bytes(buf[lt : gt + 1])))
            continue
        name = m.group(0).decode("ascii").lower()
        self_closing = tag_body.rstrip().endswith(b"/")

        if not closing and name in _RAWTEXT:
            close = re.compile(
                rb"</" + name.encode() + rb"\s*>", re.IGNORECASE
            ).search(buf, i)
            # rawtext content is dropped unless the element is contentful
            # (textarea/title are suppressed anyway)
            i = n if close is None else close.end()
            continue

        if name in _SUPPRESS:
            if closing:
                suppress_depth = max(0, suppress_depth - 1)
            elif not self_closing:
                suppress_depth += 1
            continue
        if suppress_depth > 0:
            continue
        if name == "br":
            flush(force=True) if cur else lines.append("")
            continue
        if name in _LINE_BLOCKS:
            if closing:
                flush(force=True)  # empty line block -> empty line
            else:
                flush(force=False)
            continue
        if name in _CONTAINER_BLOCKS:
            flush(force=False)
            continue
        # inline tag (a, span, b, i, em, strong, ...): no line effect

    flush(force=False)

    text = "\n".join(lines)
    data = text.encode("utf-8")
    spans: list[dict] = []
    pos = 0
    for line in lines:
        blen = len(line.encode("utf-8"))
        spans.append({"start": pos, "end": pos + blen, "kind": "block", "page": 0})
        pos += blen + 1
    return data, spans


_CANDIDATE_CONTAINERS = {"article", "main", "section", "div", "body", "td"}


def extract_main_content(buf: bytes) -> bytes:
    """Density-scored main-content selection (readability-style DOM
    heuristic): score candidate containers by text mass x (1 - link
    density) and return the best container's line-structured text.

    Complements ``extract_html_text`` (rule-based strip): on pages whose
    boilerplate is NOT in suppressible tags (e.g. sidebars made of
    plain link-stuffed <div>s), density scoring still finds the
    article. Same line semantics as the rule-based path.
    """
    lines: list[tuple[str, tuple[int, ...], int]] = []  # (text, path, link_chars)
    cur: list[str] = []
    cur_link = 0
    suppress_depth = 0
    link_depth = 0
    stack: list[tuple[str, int]] = []  # (tag, node id)
    node_tags: dict[int, str] = {}
    next_id = 1

    def path() -> tuple[int, ...]:
        return tuple(nid for _, nid in stack)

    def flush(force: bool) -> None:
        nonlocal cur_link
        text = "".join(cur)
        cur.clear()
        link = cur_link
        cur_link = 0
        if text or force:
            lines.append((text, path(), link))

    def add_text(chunk: bytes) -> None:
        nonlocal cur_link
        s = _htmlmod.unescape(_decode_bytes(chunk))
        cur.append(s)
        if link_depth > 0:
            cur_link += len(s)

    i = 0
    n = len(buf)
    while i < n:
        lt = buf.find(b"<", i)
        if lt == -1:
            if suppress_depth == 0 and buf[i:n].strip():
                add_text(buf[i:n])
            break
        if lt > i and suppress_depth == 0 and buf[i:lt].strip():
            add_text(buf[i:lt])
        i = lt
        nxt = buf[lt + 1 : lt + 2]
        if not (nxt.isalpha() or nxt in (b"/", b"!", b"?")):
            if suppress_depth == 0:
                cur.append("<")
            i = lt + 1
            continue
        if buf.startswith(b"<!--", i):
            end = buf.find(b"-->", i + 4)
            i = n if end == -1 else end + 3
            continue
        if buf.startswith(b"<![CDATA[", i):
            end = buf.find(b"]]>", i + 9)
            i = n if end == -1 else end + 3
            continue
        if buf.startswith(b"<!", i) or buf.startswith(b"<?", i):
            end = buf.find(b">", i + 2)
            i = n if end == -1 else end + 1
            continue
        gt = buf.find(b">", i + 1)
        if gt == -1:
            break
        tag_body = buf[i + 1 : gt]
        i = gt + 1
        closing = tag_body.startswith(b"/")
        if closing:
            tag_body = tag_body[1:]
        m = _TAG_NAME_RE.match(tag_body)
        if m is None:
            if suppress_depth == 0:
                cur.append(_htmlmod.unescape(_decode_bytes(buf[lt : gt + 1])))
            continue
        name = m.group(0).decode("ascii").lower()
        self_closing = tag_body.rstrip().endswith(b"/")

        if not closing and name in _RAWTEXT:
            close = re.compile(
                rb"</" + name.encode() + rb"\s*>", re.IGNORECASE
            ).search(buf, i)
            i = n if close is None else close.end()
            continue
        if name in _SUPPRESS:
            if closing:
                suppress_depth = max(0, suppress_depth - 1)
            elif not self_closing:
                suppress_depth += 1
            continue
        if suppress_depth > 0:
            continue
        if name == "a":
            link_depth = max(0, link_depth - 1) if closing else link_depth + 1
            continue
        if name == "br":
            flush(force=bool(cur))
            continue
        if name in _LINE_BLOCKS:
            flush(force=closing)
            continue
        if name in _CANDIDATE_CONTAINERS or name in _CONTAINER_BLOCKS:
            flush(force=False)
            if closing:
                while stack and stack[-1][0] != name:
                    stack.pop()
                if stack:
                    stack.pop()
            elif not self_closing:
                stack.append((name, next_id))
                node_tags[next_id] = name
                next_id += 1
            continue
        # inline tags: no structural effect

    flush(force=False)

    # score every candidate container over the lines it contains
    best_id, best_score = 0, -1.0
    totals: dict[int, tuple[int, int]] = {}
    for text, pth, link in lines:
        for nid in pth:
            t, l = totals.get(nid, (0, 0))
            totals[nid] = (t + len(text), l + link)
    for nid, (t, l) in totals.items():
        if node_tags.get(nid) not in _CANDIDATE_CONTAINERS or t == 0:
            continue
        # squared link-density penalty: a link-stuffed sidebar drags an
        # enclosing container's score below the clean article container
        score = t * (1.0 - (l / t)) ** 2
        if score > best_score:
            best_id, best_score = nid, score
    if best_score < 0:  # no candidate container: fall back to everything
        selected = [text for text, _, _ in lines]
    else:
        selected = [text for text, pth, _ in lines if best_id in pth]
    return "\n".join(selected).encode("utf-8")


_HREF_RE = re.compile(
    rb"(?:^|\s)href\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>]+))",
    re.IGNORECASE,
)


def extract_outlinks(buf: bytes) -> list[str]:
    """All <a href=...> targets in document order — the link-graph
    extraction step of a crawl pipeline. Shares the text extractor's
    scan rules: comments / CDATA / doctype are skipped, rawtext
    elements (script, style, textarea, title) hide their contents, and
    double-quoted / single-quoted / unquoted attribute forms are all
    accepted. Values are entity-decoded (href="a&amp;b" -> "a&b").
    Unlike text extraction, suppressed containers do NOT hide links —
    nav/footer links are real outlinks to a crawler."""
    out: list[str] = []
    i = 0
    n = len(buf)
    while i < n:
        lt = buf.find(b"<", i)
        if lt == -1:
            break
        nxt = buf[lt + 1 : lt + 2]
        if not (nxt.isalpha() or nxt in (b"/", b"!", b"?")):
            i = lt + 1
            continue
        if buf.startswith(b"<!--", lt):
            end = buf.find(b"-->", lt + 4)
            i = n if end == -1 else end + 3
            continue
        if buf.startswith(b"<![CDATA[", lt):
            end = buf.find(b"]]>", lt + 9)
            i = n if end == -1 else end + 3
            continue
        if buf.startswith(b"<!", lt) or buf.startswith(b"<?", lt):
            end = buf.find(b">", lt + 2)
            i = n if end == -1 else end + 1
            continue
        gt = buf.find(b">", lt + 1)
        if gt == -1:
            break
        tag_body = buf[lt + 1 : gt]
        i = gt + 1
        closing = tag_body.startswith(b"/")
        if closing:
            tag_body = tag_body[1:]
        m = _TAG_NAME_RE.match(tag_body)
        if m is None:
            continue
        name = m.group(0).decode("ascii").lower()
        if not closing and name in _RAWTEXT:
            close = re.compile(
                rb"</" + name.encode() + rb"\s*>", re.IGNORECASE
            ).search(buf, i)
            i = n if close is None else close.end()
            continue
        if closing or name != "a":
            continue
        hm = _HREF_RE.search(tag_body[m.end() :])
        if hm is None:
            continue
        raw = next(g for g in hm.groups() if g is not None)
        out.append(_htmlmod.unescape(_decode_bytes(raw)))
    return out


def detect_charset(buf: bytes) -> str:
    """Charset sniff for crawl payloads — the decode-decision step a
    Common-Crawl pipeline runs before text extraction. Deterministic
    rule ladder (first match wins):

    - UTF-8 BOM (EF BB BF)            -> "utf-8-bom"
    - UTF-16 LE/BE BOM (FF FE/FE FF)  -> "utf-16"
    - decodes as UTF-8, all < 0x80    -> "ascii"
    - decodes as UTF-8 w/ multibyte   -> "utf-8"
    - anything else                   -> "latin-1" (the fallback
      ``_decode_bytes`` also uses — every byte string decodes)
    """
    if buf.startswith(b"\xef\xbb\xbf"):
        return "utf-8-bom"
    if buf.startswith(b"\xff\xfe") or buf.startswith(b"\xfe\xff"):
        return "utf-16"
    try:
        buf.decode("utf-8")
    except UnicodeDecodeError:
        return "latin-1"
    return "ascii" if all(b < 0x80 for b in buf) else "utf-8"
