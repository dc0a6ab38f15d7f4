"""Deterministic synthetic PDF builder (FIXTURES.md §2).

Hand-rolled byte-level writer producing documents inside the engine's
(and reference's) supported subset: ``%PDF-1.4`` header, classic xref
with a single subsection, all referenced entries type ``n``, streams
with direct or indirect /Length, Flate/LZW/raw content streams.

Used for pytest golden fixtures AND for the synthetic Common-Crawl-style
pages table (sources/synth.py): the PDF representation varies per doc
(literal Tj / split TJ array / hex strings / ToUnicode-mapped codes /
Flate / LZW / indirect Length) without changing the extracted text, so
the driver's oracle comparison exercises every byte path.

Everything here is pure and deterministic — same inputs, same bytes.
"""

from __future__ import annotations

import hashlib
import zlib

from .filters import lzw_encode, png_predict_up


def escape_literal_string(data: bytes) -> bytes:
    """Escape for a PDF literal string: backslash, parens, CR/LF."""
    out = bytearray()
    for b in data:
        if b in (0x5C, 0x28, 0x29):
            out.append(0x5C)
            out.append(b)
        elif b == 0x0A:
            out += b"\\n"
        elif b == 0x0D:
            out += b"\\r"
        else:
            out.append(b)
    return bytes(out)


class _Writer:
    """Sequential object writer tracking byte offsets for the xref."""

    def __init__(self):
        self.parts: list[bytes] = [b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n"]
        self.pos = len(self.parts[0])
        self.offsets: dict[int, int] = {}
        self.objstm_members: dict[int, tuple[int, int]] = {}
        self.next_num = 1
        # set by build_text_pdf(encrypt=...): (num, data) -> encrypted
        # bytes, applied to every stream body except plaintext ones
        # (the xref stream, which the spec keeps unencrypted)
        self.encryptor = None

    def alloc(self) -> int:
        num = self.next_num
        self.next_num += 1
        return num

    def add(self, num: int, body: bytes) -> None:
        obj = b"%d 0 obj\n" % num + body + b"\nendobj\n"
        self.offsets[num] = self.pos
        self.parts.append(obj)
        self.pos += len(obj)

    def add_stream(self, num: int, dict_extra: bytes, data: bytes,
                   length_ref: int | None = None,
                   plaintext: bool = False) -> int:
        if self.encryptor is not None and not plaintext:
            data = self.encryptor(num, data)
        if length_ref is None:
            length_entry = b"/Length %d" % len(data)
        else:
            length_entry = b"/Length %d 0 R" % length_ref
        body = (
            b"<< " + length_entry + (b" " + dict_extra if dict_extra else b"")
            + b" >>\nstream\n" + data + b"\nendstream"
        )
        self.add(num, body)
        return len(data)

    def add_objstm(self, container_num: int, members: list[tuple[int, bytes]]) -> None:
        """Pack (num, body) dict objects into one /Type /ObjStm stream;
        records type-2 xref entries for the members."""
        header = bytearray()
        data = bytearray()
        for num, body in members:
            header += b"%d %d " % (num, len(data))
            data += body + b"\n"
        first = len(header)
        payload = bytes(header) + bytes(data)
        for idx, (num, _) in enumerate(members):
            self.objstm_members[num] = (container_num, idx)
        self.add_stream(
            container_num,
            b"/Type /ObjStm /N %d /First %d" % (len(members), first),
            payload,
        )

    def finish(self, root_num: int, trailer_extra: bytes = b"") -> bytes:
        xref_pos = self.pos
        count = self.next_num
        xref = [b"xref\n", b"0 %d\n" % count, b"0000000000 65535 f\r\n"]
        for num in range(1, count):
            xref.append(b"%010d %05d n\r\n" % (self.offsets[num], 0))
        trailer = (
            b"trailer\n<< /Size %d /Root %d 0 R%s >>\nstartxref\n%d\n%%%%EOF\n"
            % (count, root_num, trailer_extra, xref_pos)
        )
        return b"".join(self.parts) + b"".join(xref) + trailer

    def finish_xref_stream(self, root_num: int, compress: bool = True,
                           trailer_extra: bytes = b"") -> bytes:
        """Terminate with a PDF 1.5 cross-reference STREAM (no trailer
        keyword): /W [1 4 2] rows, optionally Flate + PNG Up predictor
        (Predictor 12) — the layout real producers emit."""
        xnum = self.alloc()
        xref_stream_pos = self.pos
        count = self.next_num
        rows = bytearray()
        rows += b"\x00" + (0).to_bytes(4, "big") + (65535).to_bytes(2, "big")
        for num in range(1, count):
            member = self.objstm_members.get(num)
            if member is not None:
                stm_num, idx = member
                rows += b"\x02" + stm_num.to_bytes(4, "big") + idx.to_bytes(2, "big")
            else:
                off = xref_stream_pos if num == xnum else self.offsets[num]
                rows += b"\x01" + off.to_bytes(4, "big") + (0).to_bytes(2, "big")
        extra = (
            b"/Type /XRef /Size %d /W [ 1 4 2 ] /Root %d 0 R%s"
            % (count, root_num, trailer_extra)
        )
        if compress:
            data = zlib.compress(png_predict_up(bytes(rows), 7))
            extra += b" /Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 7 >>"
        else:
            data = bytes(rows)
        self.add_stream(xnum, extra, data, plaintext=True)
        tail = b"startxref\n%d\n%%%%EOF\n" % xref_stream_pos
        return b"".join(self.parts) + tail


def _cmap_stream(chars: list[str]) -> tuple[bytes, dict[str, int]]:
    """A ToUnicode CMap mapping code i (1 byte) -> chars[i]; returns
    (cmap bytes, char->code map). Only BMP chars supported (enough for
    the synthetic corpus)."""
    assert len(chars) <= 256
    enc = {c: i for i, c in enumerate(chars)}
    lines = [
        b"/CIDInit /ProcSet findresource begin\n",
        b"12 dict begin\nbegincmap\n",
        b"/CMapName /Custom def\n/CMapType 2 def\n",
        b"1 begincodespacerange\n<00> <FF>\nendcodespacerange\n",
        b"%d beginbfchar\n" % len(chars),
    ]
    for c, i in enc.items():
        lines.append(b"<%02X> <%04X>\n" % (i, ord(c)))
    lines.append(b"endbfchar\nendcmap\nend\nend\n")
    return b"".join(lines), enc


def _content_ops(lines: list[bytes], show_variant: str,
                 enc: dict[str, int] | None = None) -> bytes:
    """BT..ET operator sequence showing ``lines`` (one Td+show per line)."""
    ops = [b"BT\n/F1 12 Tf\n72 720 Td\n"]
    first = True
    for line in lines:
        if not first:
            ops.append(b"0 -14 Td\n")
        first = False
        if enc is not None:
            codes = bytes(enc[c] for c in line.decode("utf-8"))
            ops.append(b"<" + codes.hex().upper().encode() + b"> Tj\n")
        elif show_variant == "hex":
            ops.append(b"<" + line.hex().encode() + b"> Tj\n")
        elif show_variant == "tj_split" and len(line) > 8:
            third = len(line) // 3
            a, b_, c = line[:third], line[third : 2 * third], line[2 * third :]
            ops.append(
                b"[ (" + escape_literal_string(a) + b") -2 ("
                + escape_literal_string(b_) + b") 3 ("
                + escape_literal_string(c) + b") ] TJ\n"
            )
        else:
            ops.append(b"(" + escape_literal_string(line) + b") Tj\n")
    ops.append(b"ET")
    return b"".join(ops)


def build_text_pdf(
    text: bytes | str,
    *,
    page_size: int = 40,
    show_variant: str = "tj",         # tj | tj_split | hex | cmap
    stream_filter: str = "none",      # none|flate|lzw|flate+lzw|ahx|a85+flate|rl
    indirect_length: bool = False,
    xref_kind: str = "classic",       # classic | stream | objstm | prev
    image: dict | None = None,        # {width, height, pixels, smask_pixels?}
    thumbnail: bool = False,          # /Thumb ref on page 1 (V13)
    inherit_resources: bool = False,  # /Resources on the Pages node only
    form_xobject: bool = False,       # content lives in a Form XObject (Do)
    encrypt: str | None = None,       # rc4-40 | rc4-128 | aesv2
) -> bytes:
    """A PDF whose extracted text (textextract rules) is exactly ``text``.

    ``text`` splits at \\n into lines; lines chunk into pages of
    ``page_size``; extraction joins lines and pages back with \\n, so
    the roundtrip is the identity for any variant combination.

    ``xref_kind``: classic table (reference subset); PDF 1.5 xref
    STREAM (Flate + Predictor 12); ``objstm`` additionally packs every
    dict object (catalog/pages/page/font) into an object stream with
    type-2 entries; ``prev`` appends an incremental update whose new
    classic section chains to the base via /Prev.

    ``encrypt``: standard security handler with empty user/owner
    passwords — "rc4-40" (V1/R2), "rc4-128" (V2/R3) or "aesv2"
    (V4/R4 AES-128-CBC). Every stream body is encrypted with the
    per-object key; the xref stream stays plaintext per spec. Not
    combinable with xref_kind="prev" (the incremental trailer does
    not repeat /Encrypt).
    """
    if encrypt and xref_kind == "prev":
        raise ValueError("encrypt= is not supported with xref_kind='prev'")
    if xref_kind == "prev":
        return _append_incremental(
            build_text_pdf(
                text,
                page_size=page_size,
                show_variant=show_variant,
                stream_filter=stream_filter,
                indirect_length=indirect_length,
                xref_kind="classic",
                image=image,
                form_xobject=form_xobject,
            )
        )

    if isinstance(text, str):
        text = text.encode("utf-8")
    lines = text.split(b"\n")
    pages = [lines[i : i + page_size] for i in range(0, len(lines), page_size)] or [[b""]]

    w = _Writer()
    use_objstm = xref_kind == "objstm"
    objstm_members: list[tuple[int, bytes]] = []

    enc_handler = None
    file_id = b""
    if encrypt:
        from . import crypt as _crypt

        profiles = {
            "rc4-40": (1, 2, 40, "rc4"),
            "rc4-128": (2, 3, 128, "rc4"),
            "aesv2": (4, 4, 128, "aesv2"),
        }
        if encrypt not in profiles:
            raise ValueError(f"unknown encrypt profile {encrypt!r}")
        enc_v, enc_r, enc_bits, enc_mode = profiles[encrypt]
        file_id = hashlib.md5(b"graft-file-id|" + encrypt.encode() + b"|" + text).digest()
        enc_o = _crypt.compute_o_entry(b"", b"", enc_r, enc_bits // 8)
        enc_handler = _crypt.StandardSecurityHandler(
            enc_r, enc_bits // 8, enc_o, -1, file_id, enc_mode
        )
        enc_u = _crypt.compute_u_entry(enc_handler.file_key, file_id, enc_r)
        w.encryptor = lambda num, data: enc_handler.encrypt(num, 0, data)

    def emit_dict(num: int, body: bytes) -> None:
        if use_objstm:
            objstm_members.append((num, body))
        else:
            w.add(num, body)

    catalog = w.alloc()
    pages_num = w.alloc()

    enc = None
    font_num = None
    cmap_num = None
    inline_font = None
    if show_variant == "encdiff":
        # simple font with /Encoding /Differences (no ToUnicode): codes
        # 33.. map to AGL glyph names of the text's characters; the
        # font dict stays INLINE so the object count matches the plain
        # variants (extract_structure oracle invariance)
        from .encodings import CHAR_TO_GLYPH

        chars = sorted({c for line in lines for c in line.decode("utf-8")})
        missing = [c for c in chars if c not in CHAR_TO_GLYPH]
        if missing:
            raise ValueError(f"encdiff variant lacks glyph names for {missing!r}")
        if len(chars) > 200:
            raise ValueError("encdiff variant supports <=200 distinct chars")
        enc = {c: 33 + i for i, c in enumerate(chars)}
        diff = b" ".join(b"/" + CHAR_TO_GLYPH[c].encode() for c in chars)
        inline_font = (
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            b"/Encoding << /Type /Encoding /Differences [ 33 %s ] >> >>" % diff
        )
    if show_variant == "cmap":
        chars = sorted({c for line in lines for c in line.decode("utf-8")})
        if len(chars) > 256:
            raise ValueError("cmap variant supports <=256 distinct chars")
        font_num = w.alloc()
        cmap_num = w.alloc()
        cmap_bytes, enc = _cmap_stream(chars)
        emit_dict(
            font_num,
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            b"/ToUnicode %d 0 R >>" % cmap_num,
        )
        w.add_stream(cmap_num, b"", cmap_bytes)

    thumb_clause = b""
    if thumbnail:
        thumb_num = w.alloc()
        w.add_stream(
            thumb_num,
            b"/Type /XObject /Subtype /Image /Width 2 /Height 2 "
            b"/ColorSpace /DeviceGray /BitsPerComponent 8 /Filter /FlateDecode",
            zlib.compress(bytes(4)),
        )
        thumb_clause = b" /Thumb %d 0 R" % thumb_num

    # optional DeviceRGB Flate image XObject (+ optional SMask pair) on
    # page 1 — text extraction is unaffected; exercises V12-V17
    image_clause = b""
    if image is not None:
        smask_clause = b""
        if image.get("smask_pixels") is not None:
            smask_num = w.alloc()
            w.add_stream(
                smask_num,
                b"/Type /XObject /Subtype /Image /Width %d /Height %d "
                b"/ColorSpace /DeviceGray /BitsPerComponent 8 /Filter /FlateDecode"
                % (image["width"], image["height"]),
                zlib.compress(image["smask_pixels"]),
            )
            smask_clause = b" /SMask %d 0 R" % smask_num
        img_num = w.alloc()
        if image.get("filter") == "ccitt":
            # 1-bit DeviceGray bilevel image, Group 4 (K = -1): pixels
            # are 0 (black) / 1 (white) bytes, one per pixel
            from .ccitt import ccitt_encode

            k = image.get("ccitt_k", -1)
            w.add_stream(
                img_num,
                b"/Type /XObject /Subtype /Image /Width %d /Height %d "
                b"/ColorSpace /DeviceGray /BitsPerComponent 1 "
                b"/Filter /CCITTFaxDecode /DecodeParms "
                b"<< /K %d /Columns %d /Rows %d >>"
                % (image["width"], image["height"], k, image["width"], image["height"]),
                ccitt_encode(image["pixels"], image["width"], image["height"], k),
            )
            entries = b"/Im0 %d 0 R" % img_num
            image_clause = b" /XObject << %s >>" % entries
        else:
            if image.get("filter") == "dct":
                # DCTDecode arm: pixels carried as a JPEG built by the
                # engine's own encoder (near-lossless flat quant);
                # ``jpeg_bytes`` overrides the body (e.g. progressive
                # fixtures)
                from .jpeg import encode_jpeg

                img_filter = b"/DCTDecode"
                img_body = image.get("jpeg_bytes") or encode_jpeg(
                    image["pixels"], image["width"], image["height"], 3
                )
            else:
                img_filter = b"/FlateDecode"
                img_body = zlib.compress(image["pixels"])
            w.add_stream(
                img_num,
                b"/Type /XObject /Subtype /Image /Width %d /Height %d "
                b"/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter %s%s"
                % (image["width"], image["height"], img_filter, smask_clause),
                img_body,
            )
            entries = b"/Im0 %d 0 R" % img_num
            if image.get("smask_pixels") is not None:
                entries += b" /Sm0 %d 0 R" % smask_num
            image_clause = b" /XObject << %s >>" % entries

    page_nums = []
    for page_lines in pages:
        page_num = w.alloc()
        content_num = w.alloc()
        length_num = w.alloc() if indirect_length else None

        content = _content_ops(page_lines, show_variant, enc)
        if stream_filter == "flate":
            data = zlib.compress(content)
            filt = b"/Filter /FlateDecode"
        elif stream_filter == "lzw":
            data = lzw_encode(content)
            filt = b"/Filter /LZWDecode"
        elif stream_filter == "flate+lzw":
            # filter ARRAY: decode applies Flate then LZW, so encode in
            # reverse order (LZW innermost)
            data = zlib.compress(lzw_encode(content))
            filt = b"/Filter [ /FlateDecode /LZWDecode ]"
        elif stream_filter == "ahx":
            from .filters import ascii_hex_encode

            data = ascii_hex_encode(content)
            filt = b"/Filter /ASCIIHexDecode"
        elif stream_filter == "a85+flate":
            # the common real-world chain: binary flate body transported
            # as 7-bit ASCII85 (decode order A85 then Flate)
            from .filters import ascii85_encode

            data = ascii85_encode(zlib.compress(content))
            filt = b"/Filter [ /ASCII85Decode /FlateDecode ]"
        elif stream_filter == "rl":
            from .filters import run_length_encode

            data = run_length_encode(content)
            filt = b"/Filter /RunLengthDecode"
        else:
            data = content
            filt = b""

        xobj = image_clause if not page_nums else b""  # page 1 only
        if inherit_resources:
            res = b"" if not xobj else b"/Resources << %s >>" % xobj.strip()
        elif font_num is not None:
            res = b"/Resources << /Font << /F1 %d 0 R >>%s >>" % (font_num, xobj)
        elif inline_font is not None:
            res = b"/Resources << /Font << /F1 %s >>%s >>" % (inline_font, xobj)
        else:
            res = (
                b"/Resources << /Font << /F1 << /Type /Font /Subtype /Type1 "
                b"/BaseFont /Helvetica >> >>%s >>" % xobj
            )
        thumb = thumb_clause if not page_nums else b""
        if form_xobject:
            # page content is just `q /Fx0 Do Q`; the real text ops live
            # inside a /Subtype /Form XObject with its OWN /Resources
            form_num = w.alloc()
            if font_num is not None:
                form_res = b"/Resources << /Font << /F1 %d 0 R >> >>" % font_num
            elif inline_font is not None:
                form_res = b"/Resources << /Font << /F1 %s >> >>" % inline_font
            else:
                form_res = (
                    b"/Resources << /Font << /F1 << /Type /Font /Subtype /Type1 "
                    b"/BaseFont /Helvetica >> >> >>"
                )
            w.add_stream(
                form_num,
                b"/Type /XObject /Subtype /Form /BBox [ 0 0 612 792 ] %s%s"
                % (form_res, filt and b" " + filt or b""),
                data,
            )
            res_with_form = (
                b"/Resources << /XObject << /Fx0 %d 0 R >> >>" % form_num
            )
            emit_dict(
                page_num,
                b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 612 792] %s%s "
                b"/Contents %d 0 R >>"
                % (pages_num, res_with_form, thumb, content_num),
            )
            stored = w.add_stream(
                content_num, b"", b"q /Fx0 Do Q", length_ref=length_num
            )
            if length_num is not None:
                w.add(length_num, b"%d" % stored)
        else:
            emit_dict(
                page_num,
                b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 612 792] %s%s "
                b"/Contents %d 0 R >>" % (pages_num, res, thumb, content_num),
            )
            stored = w.add_stream(content_num, filt, data, length_ref=length_num)
            if length_num is not None:
                w.add(length_num, b"%d" % stored)
        page_nums.append(page_num)

    kids = b" ".join(b"%d 0 R" % p for p in page_nums)
    emit_dict(catalog, b"<< /Type /Catalog /Pages %d 0 R >>" % pages_num)
    pages_res = b""
    if inherit_resources:
        if font_num is not None:
            pages_res = b" /Resources << /Font << /F1 %d 0 R >> >>" % font_num
        else:
            pages_res = (
                b" /Resources << /Font << /F1 << /Type /Font /Subtype /Type1 "
                b"/BaseFont /Helvetica >> >> >>"
            )
    emit_dict(
        pages_num,
        b"<< /Type /Pages /Kids [ %s ] /Count %d%s >>"
        % (kids, len(page_nums), pages_res),
    )

    if use_objstm:
        container = w.alloc()
        w.add_objstm(container, objstm_members)

    trailer_extra = b""
    if enc_handler is not None:
        enc_num = w.alloc()
        if enc_mode == "aesv2":
            cf = (
                b" /CF << /StdCF << /CFM /AESV2 /Length 16 >> >>"
                b" /StmF /StdCF /StrF /StdCF"
            )
        else:
            cf = b""
        w.add(
            enc_num,
            b"<< /Filter /Standard /V %d /R %d /Length %d /P -1 "
            b"/O <%s> /U <%s>%s >>"
            % (
                enc_v,
                enc_r,
                enc_bits,
                enc_o.hex().encode(),
                enc_u.hex().encode(),
                cf,
            ),
        )
        idh = file_id.hex().encode()
        trailer_extra = b" /Encrypt %d 0 R /ID [ <%s> <%s> ]" % (enc_num, idh, idh)

    if xref_kind in ("stream", "objstm"):
        return w.finish_xref_stream(catalog, trailer_extra=trailer_extra)
    return w.finish(catalog, trailer_extra=trailer_extra)


def _append_incremental(base: bytes) -> bytes:
    """Incremental update: re-emit the catalog (object 1) at the end
    with a one-entry classic section chaining via /Prev. The reference
    resolves the catalog through the NEW section but errors NotContain
    on everything else (quirk Q8); the engine follows the chain."""
    old_startxref = int(
        base.rsplit(b"startxref", 1)[1].split(b"%%EOF")[0].strip()
    )
    size = int(base.rsplit(b"/Size ", 1)[1].split(b" ", 1)[0].split(b"/")[0])
    # the update must span > 1024 bytes so the base %%EOF leaves the
    # reference's last-1024 trailer window (src/trailer.rs:24-27) — in
    # real incremental files the appended content guarantees this;
    # comment lines are the spec-legal filler
    pad = (b"%" + b"p" * 78 + b"\n") * 14
    base = base + pad
    upd_obj = b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
    obj_off = len(base)
    xref_pos = obj_off + len(upd_obj)
    tail = (
        b"xref\n1 1\n%010d %05d n\r\n"
        b"trailer\n<< /Size %d /Root 1 0 R /Prev %d >>\nstartxref\n%d\n%%%%EOF\n"
        % (obj_off, 0, size, old_startxref, xref_pos)
    )
    return base + upd_obj + tail


def build_image_pdf(images: list[dict]) -> bytes:
    """One page with image XObjects (FIXTURES.md pdf_images).

    Each image dict: {width, height, colorspace: "DeviceRGB"|"DeviceGray",
    pixels: bytes (raw), smask: bool} — pixels are Flate-compressed.
    """
    w = _Writer()
    catalog = w.alloc()
    pages_num = w.alloc()
    page_num = w.alloc()
    content_num = w.alloc()

    xobj_entries = []
    for idx, img in enumerate(images):
        img_num = w.alloc()
        smask_clause = b""
        if img.get("smask_pixels") is not None:
            smask_num = w.alloc()
            w.add_stream(
                smask_num,
                b"/Type /XObject /Subtype /Image /Width %d /Height %d "
                b"/ColorSpace /DeviceGray /BitsPerComponent 8 /Filter /FlateDecode"
                % (img["width"], img["height"]),
                zlib.compress(img["smask_pixels"]),
            )
            smask_clause = b" /SMask %d 0 R" % smask_num
            xobj_entries.append((b"/Im%dm" % idx, smask_num))
        w.add_stream(
            img_num,
            b"/Type /XObject /Subtype /Image /Width %d /Height %d "
            b"/ColorSpace /%s /BitsPerComponent 8 /Filter /FlateDecode%s"
            % (
                img["width"],
                img["height"],
                img["colorspace"].encode(),
                smask_clause,
            ),
            zlib.compress(img["pixels"]),
        )
        xobj_entries.append((b"/Im%d" % idx, img_num))

    xobj_dict = b" ".join(b"%s %d 0 R" % (n, num) for n, num in xobj_entries)
    w.add(
        page_num,
        b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /XObject << %s >> >> /Contents %d 0 R >>"
        % (pages_num, xobj_dict, content_num),
    )
    w.add_stream(content_num, b"", b"q Q")
    w.add(catalog, b"<< /Type /Catalog /Pages %d 0 R >>" % pages_num)
    w.add(
        pages_num,
        b"<< /Type /Pages /Kids [ %d 0 R ] /Count 1 >>" % page_num,
    )
    return w.finish(catalog)


# -- malformed fixtures (error channel) --

def build_bad_header() -> bytes:
    good = build_text_pdf(b"x")
    return b"%QQF-1.4" + good[8:]


def build_no_eof() -> bytes:
    good = build_text_pdf(b"x")
    return good.replace(b"%%EOF", b"%%EOG")


def build_truncated(frac: float = 0.6) -> bytes:
    good = build_text_pdf(b"hello truncated world")
    return good[: int(len(good) * frac)]


def build_free_entry_deref() -> bytes:
    """Catalog's xref entry rewritten to type ``f`` -> quirk Q3 error path."""
    good = build_text_pdf(b"x")
    xref_at = good.rfind(b"xref\n0 ")  # table start, not "startxref"
    # entry lines start after "xref\n0 N\n"; object 1 is the 2nd line
    header_end = good.index(b"\n", good.index(b"\n", xref_at) + 1) + 1
    entry1 = header_end + 20
    line = good[entry1 : entry1 + 20]
    assert line.endswith(b" n\r\n")
    return good[:entry1] + line[:17] + b"f" + line[18:] + good[entry1 + 20 :]
