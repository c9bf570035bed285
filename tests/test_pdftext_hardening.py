"""pdftext hardening (VERDICT r4 #3 + ADVICE quarantine contract):
ASCIIHex/ASCII85 filters, hex and UTF-16BE strings, /ObjStm compressed
objects, and ValueError on structural corruption. Fixtures are
hand-assembled minimal PDFs — the extractor scans objects linearly, so
each fixture carries exactly the structures under test."""

from __future__ import annotations

import base64
import zlib

import pytest

from pdf_etl_engine_spark.functions import pdftext


def _pdf(objects: list[bytes], info_num: int | None = None) -> bytes:
    out = bytearray(b"%PDF-1.5\n")
    offsets = []
    for i, obj in enumerate(objects, 1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + obj + b"\nendobj\n"
    xref_pos = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    trailer = b"trailer\n<< /Size " + str(len(objects) + 1).encode()
    trailer += b" /Root 1 0 R"
    if info_num is not None:
        trailer += b" /Info " + str(info_num).encode() + b" 0 R"
    trailer += b" >>\nstartxref\n" + str(xref_pos).encode() + b"\n%%EOF\n"
    return bytes(out + trailer)


def _page_objs(content_obj: bytes) -> list[bytes]:
    return [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        content_obj,
    ]


def _stream_obj(dict_extra: bytes, payload: bytes) -> bytes:
    return (
        b"<< " + dict_extra + b"/Length " + str(len(payload)).encode()
        + b" >>\nstream\n" + payload + b"\nendstream"
    )


CONTENT = b"BT /F1 12 Tf (Total: 42) Tj 0 -14 Td (Status: ok) Tj ET"


def test_ascii_hex_filter():
    hexed = CONTENT.hex().encode() + b">"
    pdf = _pdf(_page_objs(_stream_obj(b"/Filter /ASCIIHexDecode ", hexed)))
    assert pdftext.extract_pdf_text(pdf).splitlines() == [
        "Total: 42", "Status: ok"
    ]


def test_ascii85_filter():
    enc = base64.a85encode(CONTENT) + b"~>"
    pdf = _pdf(_page_objs(_stream_obj(b"/Filter /ASCII85Decode ", enc)))
    assert pdftext.extract_pdf_text(pdf).splitlines() == [
        "Total: 42", "Status: ok"
    ]


def test_filter_chain_a85_then_flate():
    # stream was Flate-compressed then ASCII85-armored; decode order is
    # the declared array order (§7.4): A85 first, then Flate
    enc = base64.a85encode(zlib.compress(CONTENT)) + b"~>"
    pdf = _pdf(_page_objs(
        _stream_obj(b"/Filter [/ASCII85Decode /FlateDecode] ", enc)
    ))
    assert "Total: 42" in pdftext.extract_pdf_text(pdf)


def test_hex_string_and_utf16be_shows():
    content = (
        b"BT"
        b" <" + b"Total: 42".hex().encode() + b"> Tj 0 -14 Td"
        # UTF-16BE literal with BOM: 'Caf\xe9'
        b" (\xfe\xff\x00C\x00a\x00f\x00\xe9) Tj 0 -14 Td"
        # TJ array mixing literal, kerning number, hex string
        b" [(Sta) -20 <747573>] TJ"
        b" ET"
    )
    pdf = _pdf(_page_objs(_stream_obj(b"", content)))
    assert pdftext.extract_pdf_text(pdf).splitlines() == [
        "Total: 42", "Café", "Status"
    ]


def test_utf16be_hex_string():
    s = "Café".encode("utf-16-be")
    content = b"BT <FEFF" + s.hex().encode() + b"> Tj ET"
    pdf = _pdf(_page_objs(_stream_obj(b"", content)))
    assert pdftext.extract_pdf_text(pdf) == "Café"


def _objstm_payload(objs: dict[int, bytes]) -> tuple[bytes, int, int]:
    header = b""
    bodies = b""
    for num, body in objs.items():
        header += f"{num} {len(bodies)} ".encode()
        bodies += body + b"\n"
    return header + bodies, len(objs), len(header)


def test_objstm_info_and_pages():
    """PDF 1.5 shape: Info dict and page objects live inside a
    compressed /ObjStm; the xref stream (/Type /XRef) is binary and
    must not pollute text extraction."""
    packed, n, first = _objstm_payload({
        7: b"<< /Title (Q4 Report) /Author (Ada) >>",
        8: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        9: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
    })
    objstm = _stream_obj(
        b"/Type /ObjStm /N " + str(n).encode() + b" /First "
        + str(first).encode() + b" /Filter /FlateDecode ",
        zlib.compress(packed),
    )
    # fake xref stream: random-ish binary that inflates to bytes
    # containing no BT block, plus W/Index keys like a real one
    xref = _stream_obj(
        b"/Type /XRef /W [1 2 1] /Filter /FlateDecode ",
        zlib.compress(b"\x01\x00\x10\x00" * 8),
    )
    pdf = _pdf(
        [
            b"<< /Type /Catalog /Pages 2 0 R >>",
            b"<< /Type /Pages /Kids [8 0 R 9 0 R] /Count 2 >>",
            b"<< /Dummy true >>",
            _stream_obj(b"/Filter /FlateDecode ", zlib.compress(CONTENT)),
            objstm,
            xref,
        ],
        info_num=7,
    )
    meta = pdftext.pdf_metadata(pdf)
    assert meta["title"] == "Q4 Report"
    assert meta["author"] == "Ada"
    assert meta["n_pages"] == 2
    assert "Total: 42" in pdftext.extract_pdf_text(pdf)
    # the extractor surface answers metadata KPIs through the same path
    got = pdftext.pdf_kpi_extractor(pdf, ["Title", "Page Count"], "")
    assert got == {"Title": "Q4 Report", "Page Count": "2"}


def test_quarantine_declared_flate_corrupt():
    """ADVICE r4: declared FlateDecode that does not inflate is
    corruption → ValueError (quarantine), not silent empty text."""
    pdf = _pdf(_page_objs(
        _stream_obj(b"/Filter /FlateDecode ", b"\x00garbage-not-zlib")
    ))
    with pytest.raises(ValueError, match="FlateDecode"):
        pdftext.extract_pdf_text(pdf)


def test_quarantine_content_but_no_text():
    """A document with page /Contents from which zero text-show ops
    survive is mangled → ValueError instead of an all-N/A row."""
    # stream body present but truncated mid-operator: no (..) Tj pairs
    pdf = _pdf(_page_objs(_stream_obj(b"", b"BT /F1 12 Tf (Tot")))
    with pytest.raises(ValueError, match="no text"):
        pdftext.extract_pdf_text(pdf)


def test_image_only_streams_skipped_not_fatal():
    """An image XObject with an unsupported codec (DCTDecode) is
    skipped; the page text is still recovered."""
    img = _stream_obj(
        b"/Subtype /Image /Filter /DCTDecode ", b"\xff\xd8\xff\xe0fakejpeg"
    )
    objs = _page_objs(_stream_obj(b"", CONTENT)) + [img]
    assert "Total: 42" in pdftext.extract_pdf_text(_pdf(objs))


def test_unsupported_filter_content_skipped():
    """A content stream behind an unsupported codec (JBIG2) can't be
    read: with no other text that is the mangled-document case →
    quarantine."""
    pdf = _pdf(_page_objs(
        _stream_obj(b"/Filter /JBIG2Decode ", b"\x80\x0b\x60\x50")
    ))
    with pytest.raises(ValueError, match="no text"):
        pdftext.extract_pdf_text(pdf)


def test_discover_fields_roundtrip():
    pdf = _pdf(_page_objs(_stream_obj(b"", CONTENT)))
    assert pdftext.pdf_discover_fields(pdf) == {
        "Total": "42", "Status": "ok"
    }


def test_text_free_scan_is_not_quarantined():
    """An image-only PDF (content stream draws an XObject, no BT
    anywhere; image itself DCT-encoded) is legitimately text-free:
    empty text, N/A KPIs, metadata still answered — NOT a ValueError
    (only damage evidence quarantines)."""
    content = b"q 612 0 0 792 0 0 cm /Im0 Do Q"
    img = _stream_obj(
        b"/Subtype /Image /Filter /DCTDecode ", b"\xff\xd8\xff\xe0fake"
    )
    pdf = _pdf(_page_objs(_stream_obj(b"", content)) + [img])
    assert pdftext.extract_pdf_text(pdf) == ""
    got = pdftext.pdf_kpi_extractor(pdf, ["Total", "Page Count"], "")
    assert got == {"Total": "N/A", "Page Count": "1"}


def test_fuzz_only_valueerror_escapes():
    """The quarantine contract requires ValueError (or clean output)
    as the ONLY outcome on arbitrary garbage — any other exception
    would fail the extraction task instead of quarantining the row.
    Deterministic seeded fuzz over structured-ish mutations."""
    import random

    from pdf_etl_engine_spark.sources import multimodal as M

    rng = random.Random(0xC0FFEE)
    base = _pdf(_page_objs(_stream_obj(
        b"/Filter /FlateDecode ", zlib.compress(CONTENT))))
    snippets = [b"stream\n", b"endstream", b"BT", b"ET", b"(", b")",
                b"<<", b">>", b"/Filter /FlateDecode", b"/ObjStm",
                b"/N 5 /First 9999", b"obj", b"endobj", b"\xfe\xff",
                b"<41", b"[(a) 5 ", b"\\", b"/Info 99 0 R",
                # inline-image operators (r6 stripper): unbalanced
                # BI/ID/EI splices must never escape the contract
                b"BI /W 2 /H 2 ID ", b" EI", b"ID \x00\xffBT"]
    for trial in range(300):
        data = bytearray(base)
        for _ in range(rng.randint(1, 6)):
            if not data:
                break
            op = rng.randrange(3)
            pos = rng.randrange(len(data))
            if op == 0:  # splice a structural token
                data[pos:pos] = rng.choice(snippets)
            elif op == 1:  # flip bytes
                data[pos] = rng.randrange(256)
            else:  # truncate
                del data[pos:]
        blob = bytes(data)
        if not blob.startswith(b"%PDF-"):
            blob = b"%PDF-1.4\n" + blob
        for fn in (pdftext.extract_pdf_text, pdftext.pdf_metadata):
            try:
                fn(blob)
            except ValueError:
                pass  # the quarantine path — allowed
        try:
            pdftext.pdf_kpi_extractor(blob, ["Total"], "")
        except ValueError:
            pass
        # media decoders: same contract (ValueError or
        # NotImplementedError only) — every container magic, including
        # the r6 scan-decoding JPEG and MP4 demux paths
        media = rng.choice(
            [b"BM", b"RIFF", b"P6 ", b"\x89PNG\r\n\x1a\n", b"\xff\xd8",
             bytes(4) + b"ftyp", b"RIFF\x00\x01\x00\x00AVI ", b""]
        ) + blob[:64]
        try:
            M.decode_media(media, "")
        except (ValueError, NotImplementedError):
            pass
        try:
            M.decode_pixels(media)
        except (ValueError, NotImplementedError):
            pass
        try:
            M.sample_frames(media, 2)
        except (ValueError, NotImplementedError):
            pass
        try:
            M.decode_video_frames(media, 2)
        except (ValueError, NotImplementedError):
            pass


@pytest.mark.slow
def test_fuzz_encrypted_and_lzw_documents():
    """The r6 decode paths (RC4/AES encryption parse, LZW, predictors)
    obey the same contract on mutated input: ValueError /
    NotImplementedError / clean output only."""
    import random

    rng = random.Random(0xBEEF)
    bases = [
        _build_encrypted_pdf(r=3, length=128),
        _build_aesv2_pdf(),
        _build_aes256_pdf(),
        _pdf(_page_objs(_stream_obj(b"/Filter /LZWDecode ",
                                    _lzw_encode(CONTENT)))),
        _pdf(_page_objs(_stream_obj(
            b"/Filter /FlateDecode /DecodeParms << /Predictor 12 "
            b"/Columns 20 >> ", zlib.compress(b"\x02" + bytes(20))))),
    ]
    snippets = [b"/Encrypt 99 0 R", b"/V 5 /R 6", b"/U <00>", b"/O <>",
                b"/CFM /AESV2", b"/Predictor 12", b"/Columns 0",
                b"/ID [<41>", b"/UE <ffff>", b"/Length 256"]
    for trial in range(200):
        data = bytearray(rng.choice(bases))
        for _ in range(rng.randint(1, 5)):
            if not data:
                break
            op = rng.randrange(3)
            pos = rng.randrange(len(data))
            if op == 0:
                data[pos:pos] = rng.choice(snippets)
            elif op == 1:
                data[pos] = rng.randrange(256)
            else:
                del data[pos:]
        blob = bytes(data)
        if not blob.startswith(b"%PDF-"):
            blob = b"%PDF-1.7\n" + blob
        for fn in (pdftext.extract_pdf_text, pdftext.pdf_metadata):
            try:
                fn(blob)
            except (ValueError, NotImplementedError):
                pass


# ---------------------------------------------------------------------------
# /ToUnicode CMap decode (VERDICT r5 #1): subset-font glyph codes
# ---------------------------------------------------------------------------


def _cmap_stream(body: bytes) -> bytes:
    return _stream_obj(b"", body)


def _font_pdf(content: bytes, cmap_body: bytes,
              font_extra: bytes = b"") -> bytes:
    """Page with /F1 → subset font carrying a /ToUnicode CMap."""
    return _pdf([
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R"
        b" /Resources << /Font << /F1 5 0 R >> >> >>",
        _stream_obj(b"", content),
        b"<< /Type /Font /Subtype /TrueType /BaseFont /AAAAAA+Helv "
        + font_extra + b"/ToUnicode 6 0 R >>",
        _cmap_stream(cmap_body),
    ])


SUBSET_CMAP = (
    b"/CIDInit /ProcSet findresource begin\n"
    b"begincodespacerange <00> <FF> endcodespacerange\n"
    b"beginbfchar\n<01> <0054>\n<02> <006F>\n<03> <0074>\n"
    b"<04> <0061>\n<05> <006C>\n<06> <003A>\n<07> <0020>\n"
    b"<08> <0034>\n<09> <0032>\nendbfchar\nend"
)


def test_tounicode_bfchar_hex_show():
    """Subset-font hex-string operands decode through the CMap: glyph
    codes 01..09 spell 'Total: 42'."""
    content = b"BT /F1 12 Tf <010203040506070809> Tj ET"
    pdf = _font_pdf(content, SUBSET_CMAP)
    assert pdftext.extract_pdf_text(pdf) == "Total: 42"


def test_tounicode_literal_and_tj_array():
    """Literal strings (with octal escapes) and TJ arrays route
    through the same CMap as hex strings."""
    content = (b"BT /F1 12 Tf"
               b" (\x01\x02\\003) Tj 0 -14 Td"
               b" [<0102> -20 (\x03)] TJ"
               b" ET")
    pdf = _font_pdf(content, SUBSET_CMAP)
    assert pdftext.extract_pdf_text(pdf).splitlines() == ["Tot", "Tot"]


def test_tounicode_bfrange_scalar_and_array():
    """bfrange: incrementing-scalar form and array-destination form
    over 2-byte CID codes."""
    cmap = (b"begincodespacerange <0000> <FFFF> endcodespacerange\n"
            b"beginbfrange\n"
            b"<0041> <0043> <0061>\n"          # 0x41..0x43 -> a b c
            b"<0100> <0101> [<0058> <0059>]\n"  # 0x100,0x101 -> X Y
            b"endbfrange")
    content = b"BT /F1 12 Tf <004100420043> Tj 0 -14 Td <01000101> Tj ET"
    pdf = _font_pdf(content, cmap)
    assert pdftext.extract_pdf_text(pdf).splitlines() == ["abc", "XY"]


def test_tounicode_surrogate_pair_destination():
    """A bfchar destination outside the BMP arrives as a UTF-16BE
    surrogate pair and decodes to the astral code point."""
    cmap = (b"begincodespacerange <00> <FF> endcodespacerange\n"
            b"beginbfchar <01> <D83DDE00> endbfchar")  # U+1F600
    pdf = _font_pdf(b"BT /F1 12 Tf <01> Tj ET", cmap)
    assert pdftext.extract_pdf_text(pdf) == "\U0001f600"


def test_tounicode_unmapped_code_fallback():
    """Codes the CMap does not cover fall back to the code-point value
    (deterministic, never an exception)."""
    pdf = _font_pdf(b"BT /F1 12 Tf <0141> Tj ET", SUBSET_CMAP)
    assert pdftext.extract_pdf_text(pdf) == "TA"  # 01 mapped, 41->'A'


def test_tf_switches_fonts_mid_stream():
    """Two fonts, one with a CMap, one without: Tf state must track
    document order so each show uses its own font's decoding."""
    pdf = _pdf([
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R"
        b" /Resources << /Font << /F1 5 0 R /F2 7 0 R >> >> >>",
        _stream_obj(b"", b"BT /F1 12 Tf <0102> Tj 0 -14 Td"
                         b" /F2 10 Tf (plain) Tj 0 -14 Td"
                         b" /F1 8 Tf <03> Tj ET"),
        b"<< /Type /Font /Subtype /TrueType /ToUnicode 6 0 R >>",
        _cmap_stream(SUBSET_CMAP),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ])
    assert pdftext.extract_pdf_text(pdf).splitlines() == [
        "To", "plain", "t"
    ]


def test_tounicode_indirect_resources():
    """/Resources given as an indirect reference (common in generated
    PDFs) resolves to the same font table."""
    pdf = _pdf([
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R"
        b" /Resources 7 0 R >>",
        _stream_obj(b"", b"BT /F1 12 Tf <010203> Tj ET"),
        b"<< /Type /Font /Subtype /TrueType /ToUnicode 6 0 R >>",
        _cmap_stream(SUBSET_CMAP),
        b"<< /Font << /F1 5 0 R >> /ProcSet [/PDF /Text] >>",
    ])
    assert pdftext.extract_pdf_text(pdf) == "Tot"


def test_tounicode_flate_compressed_cmap():
    """Real writers Flate-compress the CMap stream; the filter chain
    applies before parsing."""
    pdf = _pdf([
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R"
        b" /Resources << /Font << /F1 5 0 R >> >> >>",
        _stream_obj(b"", b"BT /F1 12 Tf <010203040506070809> Tj ET"),
        b"<< /Type /Font /ToUnicode 6 0 R >>",
        _stream_obj(b"/Filter /FlateDecode ", zlib.compress(SUBSET_CMAP)),
    ])
    assert pdftext.extract_pdf_text(pdf) == "Total: 42"


def test_tounicode_corrupt_cmap_quarantines():
    """A CMap stream that declares FlateDecode but does not inflate is
    corruption → ValueError (quarantine contract extends to fonts)."""
    pdf = _pdf([
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R"
        b" /Resources << /Font << /F1 5 0 R >> >> >>",
        _stream_obj(b"", b"BT /F1 12 Tf <0102> Tj ET"),
        b"<< /Type /Font /ToUnicode 6 0 R >>",
        _stream_obj(b"/Filter /FlateDecode ", b"\x00not-zlib"),
    ])
    with pytest.raises(ValueError, match="FlateDecode"):
        pdftext.extract_pdf_text(pdf)


def test_tounicode_kpi_extraction_end_to_end():
    """Field lines written entirely in subset-font glyph codes answer
    KPIs — the VERDICT r5 #1 user story."""
    content = b"BT /F1 12 Tf <010203040506070809> Tj ET"
    pdf = _font_pdf(content, SUBSET_CMAP)
    assert pdftext.pdf_kpi_extractor(pdf, ["Total"], "") == {"Total": "42"}
    assert pdftext.pdf_discover_fields(pdf) == {"Total": "42"}


def test_no_tounicode_fast_path_unchanged():
    """Documents without /ToUnicode anywhere take the pre-CMap fast
    path — byte-identical output to the direct decoding."""
    pdf = _pdf(_page_objs(_stream_obj(b"", CONTENT)))
    assert pdftext.extract_pdf_text(pdf).splitlines() == [
        "Total: 42", "Status: ok"
    ]


def test_encoding_differences_simple_font():
    """/Encoding /Differences re-encoded simple font (the TeX/dvips
    shape): codes re-map through AGL glyph names; unknown names fall
    back to the byte value; uniXXXX names resolve directly."""
    pdf = _pdf([
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R"
        b" /Resources << /Font << /F1 5 0 R >> >> >>",
        _stream_obj(b"", b"BT /F1 10 Tf (\x01\x02\x03\x04\x05) Tj"
                         b" 0 -14 Td (\x10\x11) Tj ET"),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /ABCDEF+CMR10"
        b" /Encoding << /Type /Encoding /Differences"
        b" [ 1 /T /o /t /a /l 16 /uni00E9 /unknownglyph ] >> >>",
    ])
    lines = pdftext.extract_pdf_text(pdf).splitlines()
    assert lines[0] == "Total"
    assert lines[1] == "é\x11"  # uniXXXX resolved; unknown -> byte value


def test_encoding_differences_indirect_and_named_punct():
    """Differences via an indirect /Encoding object, using named
    punctuation/ligature glyphs."""
    pdf = _pdf([
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R"
        b" /Resources << /Font << /F1 5 0 R >> >> >>",
        _stream_obj(b"", b"BT /F1 10 Tf (\x01\x02\x03\x04) Tj ET"),
        b"<< /Type /Font /Subtype /Type1 /Encoding 6 0 R >>",
        b"<< /Type /Encoding /Differences"
        b" [ 1 /quotedblleft /fi /quotedblright /endash ] >>",
    ])
    assert pdftext.extract_pdf_text(pdf) == "“ﬁ”–"


def test_tounicode_wins_over_differences():
    """A font with BOTH maps uses /ToUnicode (authoritative for text
    extraction, PDF 32000-1 9.10.2)."""
    pdf = _pdf([
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R"
        b" /Resources << /Font << /F1 5 0 R >> >> >>",
        _stream_obj(b"", b"BT /F1 10 Tf <01> Tj ET"),
        b"<< /Type /Font /ToUnicode 6 0 R /Encoding"
        b" << /Differences [ 1 /X ] >> >>",
        _cmap_stream(b"beginbfchar <01> <0059> endbfchar"),  # -> 'Y'
    ])
    assert pdftext.extract_pdf_text(pdf) == "Y"


def test_quote_show_operators():
    """The ' (next-line-show) and " (spacing-next-line-show, with its
    two numeric word/char-spacing operands) both emit their string —
    the full PDF 32000-1 §9.4.3 show-operator family."""
    content = (
        b"BT /F1 12 Tf (Line one) Tj T* (Line two) ' "
        b"2 0.5 (Line three) \" ET"
    )
    pdf = _pdf(_page_objs(_stream_obj(b"", content)))
    assert pdftext.extract_pdf_text(pdf).splitlines() == [
        "Line one", "Line two", "Line three"
    ]


def _lzw_encode(data: bytes) -> bytes:
    """Minimal in-test LZW encoder (PDF §7.4.4 conventions: initial
    clear code, 9→12 bit growth with EarlyChange=1, EOD terminator) —
    an independent implementation to roundtrip the decoder against."""
    table = {bytes([i]): i for i in range(256)}
    next_code, width = 258, 9
    codes = [(256, 9)]
    w = b""
    for ch in data:
        c = bytes([ch])
        if w + c in table:
            w += c
            continue
        codes.append((table[w], width))
        table[w + c] = next_code
        next_code += 1
        # EarlyChange: widen one entry before the table fills the width
        if next_code + 1 > (1 << width) and width < 12:
            width += 1
        w = c
    if w:
        codes.append((table[w], width))
    codes.append((257, width))
    acc = n = 0
    out = bytearray()
    for code, cw in codes:
        acc = (acc << cw) | code
        n += cw
        while n >= 8:
            n -= 8
            out.append((acc >> n) & 0xFF)
    if n:
        out.append((acc << (8 - n)) & 0xFF)
    return bytes(out)


def test_lzw_filter():
    pdf = _pdf(_page_objs(
        _stream_obj(b"/Filter /LZWDecode ", _lzw_encode(CONTENT))
    ))
    assert pdftext.extract_pdf_text(pdf).splitlines() == [
        "Total: 42", "Status: ok"
    ]


def test_lzw_code_width_growth():
    """A payload with >253 new table entries forces the 9→10 bit
    transition; EarlyChange handling must keep encoder and decoder in
    sync across it."""
    payload = bytes(range(256)) * 6 + b"abcabcabc" * 40
    assert pdftext._lzw_decode(_lzw_encode(payload)) == payload
    with pytest.raises(ValueError):
        pdftext._lzw_decode(b"\xff\xff\xff\xff")  # code beyond table


def test_run_length_filter():
    rle = bytearray()
    for i in range(0, len(CONTENT), 4):  # literal runs of ≤4
        chunk = CONTENT[i : i + 4]
        rle += bytes([len(chunk) - 1]) + chunk
    rle += bytes([254, ord("X"), 128])  # 3×'X' repeat run + EOD
    content_obj = _stream_obj(b"/Filter /RunLengthDecode ", bytes(rle))
    pdf = _pdf(_page_objs(content_obj))
    # the trailing XXX lands outside BT..ET so text is unchanged
    assert pdftext.extract_pdf_text(pdf).splitlines() == [
        "Total: 42", "Status: ok"
    ]


def test_flate_png_predictor():
    """Flate + /DecodeParms /Predictor 12 (PNG Up) — the layout modern
    writers emit for ObjStm/XRef streams; rows must defilter before
    the content parses."""
    columns = 20
    padded = CONTENT + b" " * (-len(CONTENT) % columns)
    rows = [padded[i : i + columns] for i in range(0, len(padded), columns)]
    filtered = bytearray()
    prev = bytes(columns)
    for row in rows:
        filtered += b"\x02" + bytes(
            (row[i] - prev[i]) & 0xFF for i in range(columns)
        )
        prev = row
    payload = zlib.compress(bytes(filtered))
    content_obj = _stream_obj(
        b"/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 20 >> ",
        payload,
    )
    pdf = _pdf(_page_objs(content_obj))
    assert pdftext.extract_pdf_text(pdf).splitlines() == [
        "Total: 42", "Status: ok"
    ]


def test_flate_tiff_predictor():
    columns = len(CONTENT)
    diffed = bytes([CONTENT[0]]) + bytes(
        (CONTENT[i] - CONTENT[i - 1]) & 0xFF for i in range(1, columns)
    )
    content_obj = _stream_obj(
        b"/Filter /FlateDecode /DecodeParms << /Predictor 2 /Columns "
        + str(columns).encode() + b" >> ",
        zlib.compress(diffed),
    )
    pdf = _pdf(_page_objs(content_obj))
    assert pdftext.extract_pdf_text(pdf).splitlines() == [
        "Total: 42", "Status: ok"
    ]


def _build_encrypted_pdf(r=3, length=128, user_pwd=b"", title=b"Secret Report",
                         form_value=None):
    """Standard-security-handler encrypted PDF built per the spec
    algorithms (§7.6.3) — RC4 V1/V2, R2/R3 — so the decoder's key
    derivation and /U verification are exercised end-to-end."""
    import hashlib
    import struct

    from pdf_etl_engine_spark.functions.pdftext import _PDF_PAD, _rc4

    md5 = lambda b: hashlib.md5(b).digest()  # noqa: E731
    pad = lambda p: (p + _PDF_PAD)[:32]  # noqa: E731
    n = 5 if r == 2 else length // 8
    p_flags = -44

    # /O from an owner password (Algorithm 3)
    h = md5(pad(b"owner-secret"))
    if r >= 3:
        for _ in range(50):
            h = md5(h)
    okey = h[:n]
    o_entry = _rc4(okey, pad(user_pwd))
    if r >= 3:
        for i in range(1, 20):
            o_entry = _rc4(bytes(b ^ i for b in okey), o_entry)

    file_id = bytes(range(16))
    # file key (Algorithm 2) for the user password
    h = md5(pad(user_pwd) + o_entry + struct.pack("<i", p_flags) + file_id)
    if r >= 3:
        for _ in range(50):
            h = md5(h[:n])
    key = h[:n]
    # /U (Algorithms 4/5)
    if r == 2:
        u_entry = _rc4(key, _PDF_PAD)
    else:
        x = _rc4(key, md5(_PDF_PAD + file_id))
        for i in range(1, 20):
            x = _rc4(bytes(b ^ i for b in key), x)
        u_entry = x + bytes(16)

    def objkey(num):
        return md5(key + num.to_bytes(3, "little") + bytes(2))[
            : min(n + 5, 16)
        ]

    enc_content = _rc4(objkey(4), CONTENT)
    enc_title = _rc4(objkey(5), title)
    v = 1 if r == 2 else 2
    objects = _page_objs(_stream_obj(b"", enc_content)) + [
        b"<< /Title <" + enc_title.hex().encode() + b"> >>",
        (b"<< /Filter /Standard /V " + str(v).encode() + b" /R "
         + str(r).encode() + b" /Length " + str(length).encode()
         + b" /P " + str(p_flags).encode()
         + b" /O <" + o_entry.hex().encode() + b">"
         + b" /U <" + u_entry.hex().encode() + b"> >>"),
    ]
    if form_value is not None:
        # RC4-encrypted AcroForm text field (obj 7): /T and /V strings
        # use the same per-object key derivation as streams
        enc_t = _rc4(objkey(7), b"Invoice Number")
        enc_v = _rc4(objkey(7), form_value)
        objects[0] = (b"<< /Type /Catalog /Pages 2 0 R"
                      b" /AcroForm << /Fields [7 0 R] >> >>")
        objects.append(b"<< /FT /Tx /T <" + enc_t.hex().encode()
                       + b"> /V <" + enc_v.hex().encode() + b"> >>")
    out = bytearray(b"%PDF-1.5\n")
    offsets = []
    for i, obj in enumerate(objects, 1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + obj + b"\nendobj\n"
    xref_pos = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (b"trailer\n<< /Size " + str(len(objects) + 1).encode()
            + b" /Root 1 0 R /Info 5 0 R /Encrypt 6 0 R"
            + b" /ID [<" + file_id.hex().encode() + b"> <"
            + file_id.hex().encode() + b">] >>\nstartxref\n"
            + str(xref_pos).encode() + b"\n%%EOF\n")
    return bytes(out)


@pytest.mark.parametrize("r,length", [(2, 40), (3, 128)])
def test_encrypted_pdf_empty_user_password(r, length):
    """Owner-locked PDFs (empty user password — the common case) decrypt
    transparently: RC4 file-key derivation, /U verification, per-object
    stream + Info-string decryption."""
    pdf = _build_encrypted_pdf(r=r, length=length)
    assert pdftext.extract_pdf_text(pdf).splitlines() == [
        "Total: 42", "Status: ok"
    ]
    meta = pdftext.pdf_metadata(pdf)
    assert meta["title"] == "Secret Report"


def test_encrypted_pdf_real_user_password_quarantines():
    pdf = _build_encrypted_pdf(r=3, length=128, user_pwd=b"hunter2")
    with pytest.raises(ValueError, match="password"):
        pdftext.extract_pdf_text(pdf)
    with pytest.raises(ValueError, match="password"):
        pdftext.pdf_metadata(pdf)


def test_encrypted_pdf_aes_unsupported():
    pdf = _build_encrypted_pdf(r=3, length=128)
    pdf = pdf.replace(b"/V 2 /R 3", b"/V 4 /R 4", 1)
    with pytest.raises(NotImplementedError, match="not supported"):
        pdftext.extract_pdf_text(pdf)


def _pad16(b: bytes) -> bytes:
    n = 16 - len(b) % 16
    return b + bytes([n]) * n


def _build_aesv2_pdf(title=b"AES Report"):
    """V4/R4 AESV2 crypt-filter PDF: R3-style key derivation, per-
    object MD5+sAlT keys, IV-prefixed AES-128-CBC payloads."""
    import hashlib
    import struct

    from pdf_etl_engine_spark.functions.cryptokit import aes_cbc_encrypt
    from pdf_etl_engine_spark.functions.pdftext import _PDF_PAD, _rc4

    md5 = lambda b: hashlib.md5(b).digest()  # noqa: E731
    n = 16
    p_flags = -44
    o_entry = bytes(range(100, 132))  # opaque: decoder never re-derives it
    file_id = bytes(range(16))
    h = md5(_PDF_PAD + o_entry + struct.pack("<i", p_flags) + file_id)
    for _ in range(50):
        h = md5(h[:n])
    key = h[:n]
    x = _rc4(key, md5(_PDF_PAD + file_id))
    for i in range(1, 20):
        x = _rc4(bytes(b ^ i for b in key), x)
    u_entry = x + bytes(16)

    def objkey(num):
        return md5(key + num.to_bytes(3, "little") + bytes(2) + b"sAlT")[:16]

    iv = bytes(range(16))
    enc_content = iv + aes_cbc_encrypt(objkey(4), iv, _pad16(CONTENT))
    enc_title = iv + aes_cbc_encrypt(objkey(5), iv, _pad16(title))
    objects = _page_objs(_stream_obj(b"", enc_content)) + [
        b"<< /Title <" + enc_title.hex().encode() + b"> >>",
        (b"<< /Filter /Standard /V 4 /R 4 /Length 128 /P "
         + str(p_flags).encode()
         + b" /CF << /StdCF << /CFM /AESV2 /Length 16 >> >>"
         + b" /StmF /StdCF /StrF /StdCF"
         + b" /O <" + o_entry.hex().encode() + b">"
         + b" /U <" + u_entry.hex().encode() + b"> >>"),
    ]
    return _assemble_encrypted(objects, file_id)


def _build_aes256_pdf(title=b"AES256 Report", wrong_password=False):
    """V5/R6 AES-256 PDF: U = Hash2B(pwd, vsalt) + salts, /UE wraps the
    random file key, payloads are IV + AES-256-CBC."""
    import os

    from pdf_etl_engine_spark.functions.cryptokit import aes_cbc_encrypt
    from pdf_etl_engine_spark.functions.pdftext import _hash_2b

    rngb = os.urandom  # salts/keys need no determinism for the test
    file_key = rngb(32)
    vsalt, ksalt = rngb(8), rngb(8)
    pwd = b"secret" if wrong_password else b""
    u_entry = _hash_2b(pwd, vsalt, b"") + vsalt + ksalt
    ue = aes_cbc_encrypt(_hash_2b(pwd, ksalt, b""), bytes(16), file_key)
    iv = rngb(16)
    enc_content = iv + aes_cbc_encrypt(file_key, iv, _pad16(CONTENT))
    enc_title = iv + aes_cbc_encrypt(file_key, iv, _pad16(title))
    objects = _page_objs(_stream_obj(b"", enc_content)) + [
        b"<< /Title <" + enc_title.hex().encode() + b"> >>",
        (b"<< /Filter /Standard /V 5 /R 6 /Length 256"
         + b" /CF << /StdCF << /CFM /AESV3 /Length 32 >> >>"
         + b" /StmF /StdCF /StrF /StdCF"
         + b" /O <" + bytes(48).hex().encode() + b">"
         + b" /U <" + u_entry.hex().encode() + b">"
         + b" /OE <" + bytes(32).hex().encode() + b">"
         + b" /UE <" + ue.hex().encode() + b"> >>"),
    ]
    return _assemble_encrypted(objects, bytes(range(16)))


def _assemble_encrypted(objects, file_id):
    out = bytearray(b"%PDF-1.7\n")
    offsets = []
    for i, obj in enumerate(objects, 1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + obj + b"\nendobj\n"
    xref_pos = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (b"trailer\n<< /Size " + str(len(objects) + 1).encode()
            + b" /Root 1 0 R /Info 5 0 R /Encrypt 6 0 R"
            + b" /ID [<" + file_id.hex().encode() + b"> <"
            + file_id.hex().encode() + b">] >>\nstartxref\n"
            + str(xref_pos).encode() + b"\n%%EOF\n")
    return bytes(out)


def test_encrypted_pdf_aesv2():
    pdf = _build_aesv2_pdf()
    assert pdftext.extract_pdf_text(pdf).splitlines() == [
        "Total: 42", "Status: ok"
    ]
    assert pdftext.pdf_metadata(pdf)["title"] == "AES Report"


@pytest.mark.slow
def test_encrypted_pdf_aes256_r6():
    pdf = _build_aes256_pdf()
    assert pdftext.extract_pdf_text(pdf).splitlines() == [
        "Total: 42", "Status: ok"
    ]
    assert pdftext.pdf_metadata(pdf)["title"] == "AES256 Report"


@pytest.mark.slow
def test_encrypted_pdf_aes256_wrong_password_quarantines():
    pdf = _build_aes256_pdf(wrong_password=True)
    with pytest.raises(ValueError, match="password"):
        pdftext.extract_pdf_text(pdf)


def test_encrypted_pdf_aes_corrupt_payload_quarantines():
    pdf = _build_aesv2_pdf()
    # truncate the content stream's ciphertext to a non-block size:
    # stream decrypt must raise, not emit garbage
    at = pdf.index(b"stream\n") + 7
    cut = pdf[:at + 17] + pdf[pdf.index(b"\nendstream", at):]
    with pytest.raises(ValueError):
        pdftext.extract_pdf_text(cut)


def test_fragmented_line_assembly():
    """r6: writers split one visual line across several show ops
    (kerning/font changes with pure-horizontal Td moves); fragments
    must reassemble into one line so `Key: Value` field extraction
    still works, while vertical moves / Tm / T* start new lines."""
    content = (
        b"BT /F1 12 Tf"
        b" (Tot) Tj 14 0 Td (al: ) Tj 18 0 Td (42) Tj"  # one visual line
        b" 0 -14 Td (Status: ok) Tj"                     # vertical: new line
        b" 1 0 0 1 72 600 Tm (Footer) Tj"                # Tm: new line
        b" ET"
    )
    pdf = _pdf(_page_objs(_stream_obj(b"", content)))
    assert pdftext.extract_pdf_text(pdf).splitlines() == [
        "Total: 42", "Status: ok", "Footer"
    ]
    got = pdftext.pdf_kpi_extractor(pdf, ["Total", "Status"], "")
    assert got == {"Total": "42", "Status": "ok"}

    # decimal/negative Td operands parse; ty=0.0 keeps the line
    content2 = (b"BT (A) Tj -3.5 0.0 Td (B) Tj 2.5 -11.25 TD (C) Tj ET")
    pdf2 = _pdf(_page_objs(_stream_obj(b"", content2)))
    assert pdftext.extract_pdf_text(pdf2).splitlines() == ["AB", "C"]


def test_inline_image_binary_is_ignored():
    """§8.9.7: BI..ID..EI sample bytes are arbitrary binary — here they
    spell a fake text block and a fake show. They must not leak into
    the extracted text, and the real shows around them must survive."""
    fake = b"BT (FAKE SECRET) Tj ET"  # bytes inside the image data
    content = (
        b"BT /F1 12 Tf (Before: 1) Tj ET\n"
        b"BI /W 4 /H 2 /BPC 8 /CS /G ID " + fake + b"\x00\xff\x01 EI\n"
        b"BT (After: 2) Tj ET"
    )
    pdf = _pdf(_page_objs(_stream_obj(b"", content)))
    assert pdftext.extract_pdf_text(pdf).splitlines() == [
        "Before: 1", "After: 2"
    ]


def test_inline_image_only_page_not_quarantined():
    """A page whose only content is an inline image whose binary
    happens to contain 'BT' is a legitimately text-free scan — it must
    return "" (metadata KPIs still answer), not raise the
    no-recoverable-text quarantine."""
    content = b"q BI /W 2 /H 2 /BPC 8 /CS /RGB ID \x42\x54 BT \xff\x00 EI Q"
    pdf = _pdf(_page_objs(_stream_obj(b"", content)))
    assert pdftext.extract_pdf_text(pdf) == ""


def test_inline_image_truncated_tail_blanked():
    """ID with no closing EI: everything after it is untrusted image
    bytes; real shows before the image still extract."""
    content = (
        b"BT (Total: 7) Tj ET "
        b"BI /W 1 /H 1 /BPC 8 /CS /G ID \x00(garbage) Tj"
    )
    pdf = _pdf(_page_objs(_stream_obj(b"", content)))
    assert pdftext.extract_pdf_text(pdf).splitlines() == ["Total: 7"]


def test_id_inside_string_not_treated_as_image():
    """The letters 'ID' inside a shown string must not start an image
    segment — the _ID_RE word-boundary + the BI prefix requirement
    guard that: no BI, no stripping at all."""
    content = b"BT (ID 123) Tj 0 -14 Td (BI plan) Tj ET"
    pdf = _pdf(_page_objs(_stream_obj(b"", content)))
    assert pdftext.extract_pdf_text(pdf).splitlines() == [
        "ID 123", "BI plan"
    ]


def _pdf_two_pages_out_of_order() -> bytes:
    """Page 2's content stream is serialized BEFORE page 1's — the
    shape linearized / incrementally-updated writers produce."""
    c1 = b"BT (Page one) Tj ET"
    c2 = b"BT (Page two) Tj ET"
    return _pdf([
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [4 0 R 5 0 R] /Count 2 >>",
        _stream_obj(b"", c2),                      # obj 3: page 2 content
        b"<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>",  # page 1
        b"<< /Type /Page /Parent 2 0 R /Contents 3 0 R >>",  # page 2
        _stream_obj(b"", c1),                      # obj 6: page 1 content
    ])


def test_page_tree_order_beats_object_order():
    """Text must come out in PAGE order even when the writer stored
    the streams in the opposite physical order."""
    pdf = _pdf_two_pages_out_of_order()
    assert pdftext.extract_pdf_text(pdf).splitlines() == [
        "Page one", "Page two"
    ]


def test_nested_kids_tree_walk():
    """Intermediate /Pages nodes (balanced page trees): depth-first
    Kids order is the reading order."""
    pdf = _pdf([
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R 4 0 R] /Count 2 >>",
        b"<< /Type /Pages /Parent 2 0 R /Kids [6 0 R] /Count 1 >>",
        b"<< /Type /Pages /Parent 2 0 R /Kids [7 0 R] /Count 1 >>",
        _stream_obj(b"", b"BT (Second) Tj ET"),    # obj 5
        b"<< /Type /Page /Parent 3 0 R /Contents 8 0 R >>",
        b"<< /Type /Page /Parent 4 0 R /Contents 5 0 R >>",
        _stream_obj(b"", b"BT (First) Tj ET"),     # obj 8
    ])
    assert pdftext.extract_pdf_text(pdf).splitlines() == ["First", "Second"]


def test_cyclic_page_tree_does_not_hang():
    """A damaged tree whose /Kids points back at an ancestor must
    terminate (cycle guard) and still extract the reachable page."""
    pdf = _pdf([
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [2 0 R 3 0 R] /Count 1 >>",  # self-cycle
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        _stream_obj(b"", b"BT (Alive) Tj ET"),
    ])
    assert pdftext.extract_pdf_text(pdf).splitlines() == ["Alive"]


def test_acroform_field_values():
    """§12.7 AcroForm: a fillable invoice's values live in /V entries,
    not page text — the KPI extractor must answer from them. Names
    qualify through /Kids; hex and UTF-16BE values decode; checkbox
    states come back as the name token."""
    utf16 = "Café".encode("utf-16-be").hex().encode()
    pdf = _pdf([
        b"<< /Type /Catalog /Pages 2 0 R"
        b" /AcroForm << /Fields [4 0 R 5 0 R 8 0 R] >> >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R >>",
        b"<< /FT /Tx /T (Invoice Number) /V (INV-0042) >>",
        b"<< /T (Totals) /Kids [6 0 R 7 0 R] >>",
        b"<< /FT /Tx /T (Net) /V <FEFF" + utf16 + b"> >>",
        b"<< /FT /Btn /T (Paid) /V /Yes >>",
        b"<< /FT /Tx /T (Notes) /V (a \\(nested\\) note) >>",
    ])
    assert pdftext.pdf_form_fields(pdf) == {
        "Invoice Number": "INV-0042",
        "Totals.Net": "Café",
        "Totals.Paid": "Yes",
        "Notes": "a (nested) note",
    }
    got = pdftext.pdf_kpi_extractor(
        pdf, ["Invoice Number", "Totals.Net", "Missing"], ""
    )
    assert got == {
        "Invoice Number": "INV-0042",
        "Totals.Net": "Café",
        "Missing": "N/A",
    }
    assert pdftext.pdf_discover_fields(pdf)["Invoice Number"] == "INV-0042"


def test_acroform_printed_text_wins_on_collision():
    """When the same normalized key appears in page text AND a form
    field, the printed value keeps precedence (no behavior change for
    text-bearing documents)."""
    pdf = _pdf([
        b"<< /Type /Catalog /Pages 2 0 R"
        b" /AcroForm << /Fields [5 0 R] >> >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        _stream_obj(b"", b"BT (Total: 42) Tj ET"),
        b"<< /FT /Tx /T (Total) /V (99) >>",
    ])
    assert pdftext.pdf_kpi_extractor(pdf, ["Total"], "") == {"Total": "42"}


def test_acroform_cycle_and_absent_form():
    """A /Kids cycle terminates; a document with no AcroForm returns
    {} without touching extraction."""
    pdf = _pdf([
        b"<< /Type /Catalog /Pages 2 0 R"
        b" /AcroForm << /Fields [4 0 R] >> >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R >>",
        b"<< /T (Loop) /Kids [4 0 R] >>",
    ])
    assert pdftext.pdf_form_fields(pdf) == {}
    plain = _pdf(_page_objs(_stream_obj(b"", CONTENT)))
    assert pdftext.pdf_form_fields(plain) == {}


def test_winansi_encoding_typographic_block():
    """Annex D.2: a /WinAnsiEncoding font's 0x80-0x9F codes are the
    CP1252 typographic set, not latin-1 control bytes — smart quotes,
    en dash, euro, ellipsis must extract as the real characters."""
    content = (
        b"BT /F1 12 Tf"
        b" (\x93Total\x94: \x80 42 \x96 ok\x85) Tj"
        b" ET"
    )
    pdf = _pdf([
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R"
        b" /Resources << /Font << /F1 5 0 R >> >> >>",
        _stream_obj(b"", content),
        b"<< /Type /Font /Subtype /TrueType /BaseFont /Arial"
        b" /Encoding /WinAnsiEncoding >>",
    ])
    assert pdftext.extract_pdf_text(pdf) == "“Total”: € 42 – ok…"


def test_winansi_base_with_differences_overlay():
    """/BaseEncoding /WinAnsiEncoding + /Differences: the named base
    fills 0x80-0x9F, the Differences entries win where both map."""
    content = b"BT /F1 9 Tf (\x93\x41\x96) Tj ET"
    pdf = _pdf([
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R"
        b" /Resources << /Font << /F1 5 0 R >> >> >>",
        _stream_obj(b"", content),
        b"<< /Type /Font /Subtype /TrueType"
        b" /Encoding << /BaseEncoding /WinAnsiEncoding"
        b" /Differences [ 65 /eacute ] >> >>",
    ])
    # 0x93 from WinAnsi, 0x41 ('A') remapped by Differences, 0x96 base
    assert pdftext.extract_pdf_text(pdf) == "“é–"


def test_macroman_encoding_high_block():
    """/MacRomanEncoding: the whole 0x80-0xFF block is Mac OS Roman —
    0x8E is é, 0xD5 is a right single quote, 0xA5 is a bullet."""
    content = b"BT /F1 12 Tf (Caf\x8e \xd5ok\xd5 \xa5) Tj ET"
    pdf = _pdf([
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R"
        b" /Resources << /Font << /F1 5 0 R >> >> >>",
        _stream_obj(b"", content),
        b"<< /Type /Font /Subtype /TrueType /BaseFont /Times"
        b" /Encoding /MacRomanEncoding >>",
    ])
    assert pdftext.extract_pdf_text(pdf) == "Café ’ok’ •"


def test_deep_nesting_never_escapes_the_contract():
    """Adversarial depth: thousands of nested AVI LISTs, a
    thousands-deep page-tree Kids chain, and a deep AcroForm field
    chain must all resolve to the contract outcomes (ValueError /
    clean output), never RecursionError."""
    import struct
    import sys

    from pdf_etl_engine_spark.sources import multimodal as M

    # nested AVI LISTs: ~36 KB payload, 3000 deep
    old = sys.getrecursionlimit()
    sys.setrecursionlimit(100000)
    payload = b"JUNK"
    for _ in range(3000):
        data = b"movi" + payload
        payload = b"LIST" + struct.pack("<I", len(data)) + data
    avi = (b"RIFF" + struct.pack("<I", len(b"AVI " + payload))
           + b"AVI " + payload)
    sys.setrecursionlimit(old)
    with pytest.raises((ValueError, NotImplementedError)):
        M.decode_media(avi, "")
    with pytest.raises((ValueError, NotImplementedError)):
        M.sample_frames(avi, 2)
    with pytest.raises((ValueError, NotImplementedError)):
        M.decode_video_frames(avi, 2)

    # page tree: a 5000-deep Pages->Kids chain before the real page
    n = 5000
    objs = [b"<< /Type /Catalog /Pages 2 0 R >>"]
    for i in range(2, n):
        objs.append(
            b"<< /Type /Pages /Kids [" + str(i + 1).encode()
            + b" 0 R] /Count 1 >>"
        )
    objs.append(b"<< /Type /Page /Parent 2 0 R /Contents "
                + str(n + 1).encode() + b" 0 R >>")
    objs.append(_stream_obj(b"", b"BT (Deep: ok) Tj ET"))
    deep = _pdf(objs)
    # object-order fallback still extracts the text
    assert pdftext.extract_pdf_text(deep).splitlines() == ["Deep: ok"]

    # AcroForm: 5000-deep Kids chain terminating in a valued field
    objs = [b"<< /Type /Catalog /Pages 2 0 R"
            b" /AcroForm << /Fields [3 0 R] >> >>",
            b"<< /Type /Pages /Kids [] /Count 0 >>"]
    for i in range(3, n):
        objs.append(b"<< /T (L" + str(i).encode() + b") /Kids ["
                    + str(i + 1).encode() + b" 0 R] >>")
    objs.append(b"<< /FT /Tx /T (Leaf) /V (x) >>")
    deepform = _pdf(objs)
    assert isinstance(pdftext.pdf_form_fields(deepform), dict)


def test_encrypted_acroform_field_values():
    """Encrypted fillable invoice: AcroForm /T and /V strings are
    RC4-encrypted with the per-object key like every other string —
    they must decrypt and answer KPIs alongside the page text."""
    pdf = _build_encrypted_pdf(form_value=b"INV-E-77")
    assert pdftext.pdf_form_fields(pdf) == {"Invoice Number": "INV-E-77"}
    got = pdftext.pdf_kpi_extractor(pdf, ["Invoice Number", "Total"], "")
    assert got == {"Invoice Number": "INV-E-77", "Total": "42"}


def test_stream_payload_ending_in_cr_or_lf_not_truncated():
    """§7.3.8: binary stream data may END in \\r or \\n; the
    pre-endstream EOL must not eat that payload byte (the declared
    /Length is authoritative). Regression: a 1-in-128 zlib payload
    whose last byte is 0x0D inflated short and falsely quarantined."""
    # the zlib tail is the plaintext's Adler-32 low byte — vary the
    # byte SUM widely (3 chars over a 91-char alphabet) to hit any
    # residue, keeping the chars literal-safe (no parens/backslash)
    alpha = bytes(c for c in range(33, 127) if c not in (40, 41, 92))
    for tail_byte in (b"\r", b"\n"):
        for i in range(91 ** 3):
            tag = bytes(
                alpha[(i // 91 ** j) % 91] for j in range(3)
            ).decode("latin-1")
            payload = zlib.compress(
                b"BT /F1 12 Tf (Total: " + tag.encode("latin-1")
                + b") Tj ET"
            )
            if payload.endswith(tail_byte):
                break
        else:
            raise AssertionError("no payload with desired tail byte")
        pdf = _pdf(_page_objs(
            _stream_obj(b"/Filter /FlateDecode ", payload)
        ))
        assert pdftext.extract_pdf_text(pdf) == f"Total: {tag}"


# ---------------------------------------------------------------------------
# Embedded-TrueType cmap fallback (r6): Identity-H Type0 fonts with
# no /ToUnicode decode via the font program's own cmap table
# ---------------------------------------------------------------------------


def _ttf_fmt4(uni_to_gid: dict[int, int]) -> bytes:
    """Minimal TrueType program: one (3,1) format-4 cmap subtable, one
    single-code segment per mapping (idRangeOffset 0, delta = gid-code
    mod 2^16) plus the mandatory 0xFFFF terminator segment."""
    segs = [(c, c, (g - c) & 0xFFFF) for c, g in sorted(uni_to_gid.items())]
    segs.append((0xFFFF, 0xFFFF, 1))
    n = len(segs)
    sub = bytearray()
    sub += (4).to_bytes(2, "big")                      # format
    sub += (16 + 8 * n).to_bytes(2, "big")             # length
    sub += (0).to_bytes(2, "big")                      # language
    sub += (2 * n).to_bytes(2, "big")                  # segCountX2
    sub += b"\x00\x00\x00\x00\x00\x00"                 # search fields (unused)
    for _s, e, _d in segs:
        sub += e.to_bytes(2, "big")
    sub += b"\x00\x00"                                 # reservedPad
    for s, _e, _d in segs:
        sub += s.to_bytes(2, "big")
    for _s, _e, d in segs:
        sub += d.to_bytes(2, "big")
    sub += b"\x00\x00" * n                             # idRangeOffsets
    cmap = bytearray()
    cmap += (0).to_bytes(2, "big") + (1).to_bytes(2, "big")
    cmap += (3).to_bytes(2, "big") + (1).to_bytes(2, "big")
    cmap += (12).to_bytes(4, "big")                    # subtable offset
    cmap += sub
    out = bytearray()
    out += (0x00010000).to_bytes(4, "big") + (1).to_bytes(2, "big")
    out += b"\x00\x00\x00\x00\x00\x00"                 # search fields
    out += b"cmap" + b"\x00" * 4 + (28).to_bytes(4, "big")
    out += len(cmap).to_bytes(4, "big")
    out += cmap
    return bytes(out)


def _ttf_fmt12(uni_to_gid: dict[int, int]) -> bytes:
    """Same shape with a (3,10) format-12 subtable (one group per
    mapping)."""
    groups = sorted(uni_to_gid.items())
    sub = bytearray()
    sub += (12).to_bytes(2, "big") + b"\x00\x00"       # format, reserved
    sub += (16 + 12 * len(groups)).to_bytes(4, "big")  # length
    sub += (0).to_bytes(4, "big")                      # language
    sub += len(groups).to_bytes(4, "big")
    for c, g in groups:
        sub += c.to_bytes(4, "big") + c.to_bytes(4, "big")
        sub += g.to_bytes(4, "big")
    cmap = bytearray()
    cmap += (0).to_bytes(2, "big") + (1).to_bytes(2, "big")
    cmap += (3).to_bytes(2, "big") + (10).to_bytes(2, "big")
    cmap += (12).to_bytes(4, "big")
    cmap += sub
    out = bytearray()
    out += (0x00010000).to_bytes(4, "big") + (1).to_bytes(2, "big")
    out += b"\x00\x00\x00\x00\x00\x00"
    out += b"cmap" + b"\x00" * 4 + (28).to_bytes(4, "big")
    out += len(cmap).to_bytes(4, "big")
    out += cmap
    return bytes(out)


def _identity_h_pdf(content: bytes, ttf: bytes | None,
                    desc_extra: bytes = b"") -> bytes:
    """Page with /F1 → Identity-H Type0 font, descendant
    CIDFontType2 whose FontFile2 is ``ttf`` (descriptor omits the
    stream when ttf is None)."""
    fd = b"<< /Type /FontDescriptor /FontName /AAAAAA+T /Flags 4"
    if ttf is not None:
        fd += b" /FontFile2 8 0 R"
    fd += b" >>"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R"
        b" /Resources << /Font << /F1 5 0 R >> >> >>",
        _stream_obj(b"", content),
        b"<< /Type /Font /Subtype /Type0 /BaseFont /AAAAAA+T"
        b" /Encoding /Identity-H /DescendantFonts [6 0 R] >>",
        b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /AAAAAA+T"
        b" /FontDescriptor 7 0 R " + desc_extra + b">>",
        fd,
    ]
    if ttf is not None:
        objs.append(_stream_obj(b"", ttf))
    return _pdf(objs)


# glyph ids 1..9 spell "Total: 42" via the font's unicode→gid table
_GID_OF = {ord(ch): i + 1 for i, ch in enumerate("Total: 42")}
_SHOW_GIDS = b"".join(
    (_GID_OF[ord(c)]).to_bytes(2, "big") for c in "Total: 42"
)


def test_identity_h_fontfile2_cmap_fmt4():
    """No /ToUnicode anywhere: text recovers through the embedded
    TrueType format-4 cmap inverted gid→Unicode."""
    content = b"BT /F1 12 Tf <" + _SHOW_GIDS.hex().encode() + b"> Tj ET"
    pdf = _identity_h_pdf(content, _ttf_fmt4(_GID_OF))
    assert pdftext.extract_pdf_text(pdf) == "Total: 42"


def test_identity_h_fontfile2_cmap_fmt12():
    content = b"BT /F1 12 Tf <" + _SHOW_GIDS.hex().encode() + b"> Tj ET"
    pdf = _identity_h_pdf(content, _ttf_fmt12(_GID_OF))
    assert pdftext.extract_pdf_text(pdf) == "Total: 42"


def test_identity_h_cid_to_gid_stream():
    """A stream-form /CIDToGIDMap composes cid→gid→Unicode: CIDs
    100.. map to gids 1.. via the remap table."""
    n = len("Total: 42")
    c2g = bytearray(2 * 200)
    for i in range(n):
        c2g[2 * (100 + i): 2 * (100 + i) + 2] = (i + 1).to_bytes(2, "big")
    cids = b"".join((100 + i).to_bytes(2, "big") for i in range(n))
    content = b"BT /F1 12 Tf <" + cids.hex().encode() + b"> Tj ET"
    ttf = _ttf_fmt4(_GID_OF)
    fd = b"<< /Type /FontDescriptor /FontName /AAAAAA+T /Flags 4"
    fd += b" /FontFile2 8 0 R >>"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R"
        b" /Resources << /Font << /F1 5 0 R >> >> >>",
        _stream_obj(b"", content),
        b"<< /Type /Font /Subtype /Type0 /BaseFont /AAAAAA+T"
        b" /Encoding /Identity-H /DescendantFonts [6 0 R] >>",
        b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /AAAAAA+T"
        b" /FontDescriptor 7 0 R /CIDToGIDMap 9 0 R >>",
        fd,
        _stream_obj(b"", ttf),
        _stream_obj(b"", bytes(c2g)),
    ]
    assert pdftext.extract_pdf_text(_pdf(objs)) == "Total: 42"


def test_identity_h_no_fontfile_groups_two_bytes():
    """Without a font program the CIDs still group as 2-byte codes —
    code-point fallback, not per-byte garbage."""
    codes = b"".join(ord(c).to_bytes(2, "big") for c in "Total: 42")
    content = b"BT /F1 12 Tf <" + codes.hex().encode() + b"> Tj ET"
    pdf = _identity_h_pdf(content, None)
    assert pdftext.extract_pdf_text(pdf) == "Total: 42"


def test_identity_h_corrupt_fontfile_degrades():
    """A truncated/garbage font program degrades to the 2-byte
    code-point fallback instead of raising."""
    codes = b"".join(ord(c).to_bytes(2, "big") for c in "Hi")
    content = b"BT /F1 12 Tf <" + codes.hex().encode() + b"> Tj ET"
    for junk in (b"", b"\x00\x01\x00\x00", b"not a font at all"):
        pdf = _identity_h_pdf(content, junk)
        assert pdftext.extract_pdf_text(pdf) == "Hi"


def test_identity_h_tounicode_still_wins():
    """A font carrying BOTH /ToUnicode and an embedded program uses
    /ToUnicode (the authoritative extraction table, §9.10.2)."""
    cmap = (b"begincodespacerange <0000> <FFFF> endcodespacerange\n"
            b"beginbfchar <0001> <0058> endbfchar")  # gid 1 -> 'X'
    content = b"BT /F1 12 Tf <0001> Tj ET"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R"
        b" /Resources << /Font << /F1 5 0 R >> >> >>",
        _stream_obj(b"", content),
        b"<< /Type /Font /Subtype /Type0 /BaseFont /AAAAAA+T"
        b" /Encoding /Identity-H /DescendantFonts [6 0 R]"
        b" /ToUnicode 9 0 R >>",
        b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /AAAAAA+T"
        b" /FontDescriptor 7 0 R >>",
        b"<< /Type /FontDescriptor /FontName /AAAAAA+T /Flags 4"
        b" /FontFile2 8 0 R >>",
        _stream_obj(b"", _ttf_fmt4({ord("Z"): 1})),  # program says 'Z'
        _stream_obj(b"", cmap),
    ]
    assert pdftext.extract_pdf_text(_pdf(objs)) == "X"


# ---------------------------------------------------------------------------
# CFF (/FontFile3) charset decode (r7): Identity-H with a CFF-only
# program recovers text through the name-keyed charset
# ---------------------------------------------------------------------------


def _cff_index_bytes(items: list[bytes]) -> bytes:
    """Encode one CFF INDEX (offSize 1 — test data is tiny)."""
    if not items:
        return (0).to_bytes(2, "big")
    out = bytearray(len(items).to_bytes(2, "big"))
    out.append(1)  # offSize
    off = 1
    offs = [off]
    for it in items:
        off += len(it)
        offs.append(off)
    out += bytes(offs)
    for it in items:
        out += it
    return bytes(out)


def _cff_font(glyph_names: list[str], cid_keyed: bool = False) -> bytes:
    """Minimal name-keyed CFF: header, Name INDEX, Top DICT INDEX
    (charset + CharStrings offsets as fixed 5-byte ints), String INDEX
    (custom names), empty Global Subr INDEX, format-0 charset, and a
    CharStrings INDEX of endchar-only glyphs. ``glyph_names[i]`` is
    glyph id i+1 (gid 0 is .notdef). ``cid_keyed`` stamps a ROS
    operator so the parser must refuse (charset entries would be
    CIDs)."""
    from pdf_etl_engine_spark.functions import pdftext as P

    std_sid = {n: i for i, n in enumerate(P._CFF_STD)}
    strings: list[bytes] = []
    sids = []
    for n in glyph_names:
        if n in std_sid:
            sids.append(std_sid[n])
        else:
            sids.append(391 + len(strings))
            strings.append(n.encode("latin-1"))

    def int5(v: int) -> bytes:
        return b"\x1d" + v.to_bytes(4, "big")

    header = b"\x01\x00\x04\x04"
    name_index = _cff_index_bytes([b"T"])
    ros = (int5(391) + int5(392) + int5(0) + b"\x0c\x1e") if cid_keyed else b""
    # top dict: [ROS?] charset <off> (15), CharStrings <off> (17)
    top_len = len(ros) + 12
    top_index_overhead = 2 + 1 + 2  # count, offSize, two offsets
    string_index = _cff_index_bytes(strings)
    gsubr_index = (0).to_bytes(2, "big")
    charset_pos = (
        len(header) + len(name_index) + top_index_overhead + top_len
        + len(string_index) + len(gsubr_index)
    )
    charset = b"\x00" + b"".join(s.to_bytes(2, "big") for s in sids)
    charstrings_pos = charset_pos + len(charset)
    top = ros + int5(charset_pos) + b"\x0f" + int5(charstrings_pos) + b"\x11"
    assert len(top) == top_len
    top_index = _cff_index_bytes([top])
    charstrings = _cff_index_bytes([b"\x0e"] * (len(glyph_names) + 1))
    return (header + name_index + top_index + string_index
            + gsubr_index + charset + charstrings)


def _identity_h_cff_pdf(content: bytes, cff: bytes) -> bytes:
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R"
        b" /Resources << /Font << /F1 5 0 R >> >> >>",
        _stream_obj(b"", content),
        b"<< /Type /Font /Subtype /Type0 /BaseFont /BBBBBB+S"
        b" /Encoding /Identity-H /DescendantFonts [6 0 R] >>",
        b"<< /Type /Font /Subtype /CIDFontType0 /BaseFont /BBBBBB+S"
        b" /FontDescriptor 7 0 R >>",
        b"<< /Type /FontDescriptor /FontName /BBBBBB+S /Flags 4"
        b" /FontFile3 8 0 R >>",
        _stream_obj(b"/Subtype /Type1C", cff),
    ]
    return _pdf(objs)


_CFF_NAMES = ["T", "o", "t", "a", "l", "colon", "space", "four", "two"]


def test_identity_h_fontfile3_cff_charset():
    """No /ToUnicode, CFF-only program: text recovers through the
    name-keyed charset GID→SID→name→Unicode (VERDICT r6 #9)."""
    # gids spell "Total: 42"
    want = "Total: 42"
    gid_of = {"T": 1, "o": 2, "t": 3, "a": 4, "l": 5, ":": 6,
              " ": 7, "4": 8, "2": 9}
    show = b"".join(gid_of[c].to_bytes(2, "big") for c in want)
    content = b"BT /F1 12 Tf <" + show.hex().encode() + b"> Tj ET"
    pdf = _identity_h_cff_pdf(content, _cff_font(_CFF_NAMES))
    assert pdftext.extract_pdf_text(pdf) == want


def test_identity_h_cff_custom_string_sid():
    """A subset glyph named via the font's own String INDEX (uniXXXX
    form) resolves through the AGL uni-name rule."""
    cff = _cff_font(["uni20AC"])  # euro sign, gid 1
    content = b"BT /F1 12 Tf <0001> Tj ET"
    assert pdftext.extract_pdf_text(
        _identity_h_cff_pdf(content, cff)
    ) == "€"


def test_identity_h_cff_cid_keyed_degrades():
    """A CID-keyed CFF (ROS in the top DICT) must NOT be read as
    names — charset entries are CIDs; decode degrades to the 2-byte
    code-point fallback. (This fixture's ROS ordering SID doesn't
    resolve to "Identity", i.e. a registered/unknown ROS.)"""
    codes = b"".join(ord(c).to_bytes(2, "big") for c in "Hi")
    content = b"BT /F1 12 Tf <" + codes.hex().encode() + b"> Tj ET"
    pdf = _identity_h_cff_pdf(
        content, _cff_font(["T", "o"], cid_keyed=True)
    )
    assert pdftext.extract_pdf_text(pdf) == "Hi"


def _cff_cid_font(glyph_names: list[str], cids: list[int] | None = None) -> bytes:
    """CID-keyed CFF with Adobe-Identity ROS: String INDEX =
    ["Adobe", "Identity", *glyph_names], ROS operands (391, 392, 0),
    and a format-0 charset whose entry for glyph i+1 defaults to
    393+i — the custom-SID value of that glyph's preserved name, the
    repackaged-name-keyed-font layout _parse_cff_charset recovers."""
    strings = [b"Adobe", b"Identity"] + [
        n.encode("latin-1") for n in glyph_names
    ]
    if cids is None:
        cids = [393 + i for i in range(len(glyph_names))]

    def int5(v: int) -> bytes:
        return b"\x1d" + v.to_bytes(4, "big")

    header = b"\x01\x00\x04\x04"
    name_index = _cff_index_bytes([b"T"])
    ros = int5(391) + int5(392) + int5(0) + b"\x0c\x1e"
    top_len = len(ros) + 12
    top_index_overhead = 2 + 1 + 2  # count, offSize, two offsets
    string_index = _cff_index_bytes(strings)
    gsubr_index = (0).to_bytes(2, "big")
    charset_pos = (
        len(header) + len(name_index) + top_index_overhead + top_len
        + len(string_index) + len(gsubr_index)
    )
    charset = b"\x00" + b"".join(c.to_bytes(2, "big") for c in cids)
    charstrings_pos = charset_pos + len(charset)
    top = ros + int5(charset_pos) + b"\x0f" + int5(charstrings_pos) + b"\x11"
    assert len(top) == top_len
    top_index = _cff_index_bytes([top])
    charstrings = _cff_index_bytes([b"\x0e"] * (len(glyph_names) + 1))
    return (header + name_index + top_index + string_index
            + gsubr_index + charset + charstrings)


def test_identity_h_cff_cid_keyed_identity_ros_names():
    """CID-keyed CFF under Adobe-Identity ROS whose CIDs are the
    preserved glyph-name custom SIDs: text recovers charset → String
    INDEX → AGL, no /ToUnicode anywhere (VERDICT r9 #6)."""
    want = "Total: 42"  # 9 distinct characters
    names = [f"uni{ord(c):04X}" for c in want]
    show = b"".join((393 + i).to_bytes(2, "big") for i in range(len(want)))
    content = b"BT /F1 12 Tf <" + show.hex().encode() + b"> Tj ET"
    pdf = _identity_h_cff_pdf(content, _cff_cid_font(names))
    assert pdftext.extract_pdf_text(pdf) == want


def test_identity_h_cff_ignores_nonconforming_cid_to_gid_stream():
    """A CIDToGIDMap stream attached to a CIDFontType0 (CFF) font is
    nonconforming — §9.7.4.1 defines the entry for CIDFontType2 only.
    The CID-keyed charset must be used directly, never re-indexed
    through the stream (ADVICE r10: composing them read wrong
    characters)."""
    want = "Total: 42"
    names = [f"uni{ord(c):04X}" for c in want]
    show = b"".join((393 + i).to_bytes(2, "big") for i in range(len(want)))
    content = b"BT /F1 12 Tf <" + show.hex().encode() + b"> Tj ET"
    # a garbage remap that would scramble every CID if composed
    c2g = bytearray(2 * 500)
    for cid in range(500):
        c2g[2 * cid: 2 * cid + 2] = ((cid * 7 + 3) % 500).to_bytes(2, "big")
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R"
        b" /Resources << /Font << /F1 5 0 R >> >> >>",
        _stream_obj(b"", content),
        b"<< /Type /Font /Subtype /Type0 /BaseFont /BBBBBB+S"
        b" /Encoding /Identity-H /DescendantFonts [6 0 R] >>",
        b"<< /Type /Font /Subtype /CIDFontType0 /BaseFont /BBBBBB+S"
        b" /FontDescriptor 7 0 R /CIDToGIDMap 9 0 R >>",
        b"<< /Type /FontDescriptor /FontName /BBBBBB+S /Flags 4"
        b" /FontFile3 8 0 R >>",
        _stream_obj(b"/Subtype /Type1C", _cff_cid_font(names)),
        _stream_obj(b"", bytes(c2g)),
    ]
    assert pdftext.extract_pdf_text(_pdf(objs)) == want


def test_identity_h_cff_cid_keyed_numeric_cids_degrade():
    """Adobe-Identity ROS with genuinely NUMERIC CIDs (below the
    custom-SID range): nothing maps — small CIDs are ambiguous with
    standard SIDs of unrelated glyphs — so decode stays on the 2-byte
    code-point fallback."""
    codes = b"".join(ord(c).to_bytes(2, "big") for c in "Hi")
    content = b"BT /F1 12 Tf <" + codes.hex().encode() + b"> Tj ET"
    pdf = _identity_h_cff_pdf(
        content, _cff_cid_font(["T", "o"], cids=[1, 2])
    )
    assert pdftext.extract_pdf_text(pdf) == "Hi"


def test_identity_h_cff_garbage_degrades():
    """A malformed CFF program degrades to code-point fallback."""
    codes = b"".join(ord(c).to_bytes(2, "big") for c in "Hi")
    content = b"BT /F1 12 Tf <" + codes.hex().encode() + b"> Tj ET"
    for junk in (b"", b"\x01\x00\x04", b"garbage not a font"):
        pdf = _identity_h_cff_pdf(content, junk)
        assert pdftext.extract_pdf_text(pdf) == "Hi"
