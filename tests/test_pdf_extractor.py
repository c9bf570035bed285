"""The non-LLM production extractor over REAL PDF bytes (VERDICT r2
next-round #4): synthetic-but-valid PDFs (correct xref, Flate-compressed
content streams) → extract → pivot → coerce → append, golden-checked;
corrupt bytes quarantine instead of failing the batch.
"""

from __future__ import annotations

import zlib

import pytest

from pdf_etl_engine_spark import pipeline
from pdf_etl_engine_spark.functions import pdftext


def build_pdf(
    lines: list[str],
    title: str | None = None,
    author: str | None = None,
    compress: bool = True,
) -> bytes:
    """Minimal VALID single-page PDF: catalog → pages → page →
    content stream (one Tj per line) → font, Info dict, correct xref
    offsets and trailer."""
    ops = ["BT", "/F1 12 Tf", "72 720 Td"]
    for i, line in enumerate(lines):
        esc = (
            line.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
        )
        if i:
            ops.append("0 -14 Td")
        ops.append(f"({esc}) Tj")
    ops.append("ET")
    stream = "\n".join(ops).encode("latin-1")
    filt = b""
    if compress:
        stream = zlib.compress(stream)
        filt = b"/Filter /FlateDecode "
    objects = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< " + filt + b"/Length " + str(len(stream)).encode() + b" >>\n"
        b"stream\n" + stream + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    info = b"<<"
    if title:
        info += b" /Title (" + title.encode("latin-1") + b")"
    if author:
        info += b" /Author (" + author.encode("latin-1") + b")"
    info += b" >>"
    objects.append(info)
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, obj in enumerate(objects, 1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + obj + b"\nendobj\n"
    xref_pos = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        b"trailer\n<< /Size " + str(len(objects) + 1).encode()
        + b" /Root 1 0 R /Info " + str(len(objects)).encode() + b" 0 R >>\n"
        + b"startxref\n" + str(xref_pos).encode() + b"\n%%EOF\n"
    )
    return bytes(out)


def test_text_roundtrip_compressed_and_plain():
    lines = ["Total Amount ($): $1,234.56", "Status: Approved (final)"]
    for compress in (True, False):
        pdf = build_pdf(lines, compress=compress)
        assert pdftext.extract_pdf_text(pdf).splitlines() == lines


def test_escape_and_octal_decoding():
    # \050 = "(" and \051 = ")" in octal; backslash escapes for parens
    raw = build_pdf([])[: len(b"%PDF-1.4\n")] + (
        b"1 0 obj\n<< /Length 44 >>\nstream\n"
        b"BT (A \\(quoted\\) \\050octal\\051 va\\\\lue) Tj ET\n"
        b"endstream\nendobj\n"
    )
    assert (
        pdftext.extract_pdf_text(raw) == "A (quoted) (octal) va\\lue"
    )


def test_metadata_and_page_count():
    pdf = build_pdf(["x"], title="Q3 Report", author="Finance Team")
    meta = pdftext.pdf_metadata(pdf)
    assert meta["title"] == "Q3 Report"
    assert meta["author"] == "Finance Team"
    assert meta["n_pages"] == 1


def test_non_pdf_bytes_raise():
    with pytest.raises(ValueError):
        pdftext.extract_pdf_text(b'{"not": "a pdf"}')


def test_kpi_extraction_contract():
    pdf = build_pdf(
        ["Total Amount ($): $1,234.56", "Report Date: 2024-01-15"],
        title="Invoice 7",
    )
    got = pdftext.pdf_kpi_extractor(
        pdf, ["Total Amount ($)", "Report Date", "Status", "Title"], ""
    )
    assert got == {
        "Total Amount ($)": "$1,234.56",
        "Report Date": "2024-01-15",
        "Status": "N/A",  # not in the document → prompt contract
        "Title": "Invoice 7",  # metadata answers KPIs too
    }


KPI_META = [
    {"name": "Total Amount ($)", "sample_value": "$1,234.56", "type": "number"},
    {"name": "Report Date", "sample_value": "2024-01-15", "type": "date"},
    {"name": "Status", "sample_value": "Approved", "type": "categorical"},
]


@pytest.mark.slow
def test_pdf_ingest_end_to_end_golden(tmp_path, spark):
    """The reference's full core loop on actual PDF bytes: scan →
    extract (real parse) → pivot → coerce → append → read back."""
    cat = pipeline.Catalog(spark, str(tmp_path / "catalog"))
    cat.create_folder(
        "user_abc", "invoices", "Invoices", "pdf docs", kpi_metadata=KPI_META
    )
    facts = str(tmp_path / "facts")
    d = tmp_path / "incoming" / "user_abc" / "invoices" / "batch"
    d.mkdir(parents=True)
    (d / "inv_001.pdf").write_bytes(
        build_pdf(
            [
                "Invoice Summary",
                "Total Amount ($): $1,234.56",
                "Report Date: 2024-01-15",
                "Status: Approved",
            ]
        )
    )
    (d / "inv_002.pdf").write_bytes(
        build_pdf(
            ["Total Amount ($): (500)", "Report Date: January 3, 2024"],
            compress=False,
        )
    )
    (d / "corrupt.pdf").write_bytes(b"\x00\x01 not a pdf at all")

    res = pipeline.ingest_batch(
        spark,
        f"{tmp_path}/incoming/*/*/*/*",
        cat,
        facts,
        extractor=pipeline.pdf_extractor,
        quarantine_path=str(tmp_path / "quarantine"),
    )
    assert res["rows_written"] == 2
    assert res["files_failed"] == 1  # corrupt.pdf quarantined

    out = pipeline.read_results(spark, facts, "user_abc", "invoices")
    rows = {r["file_name"]: r for r in out.collect()}
    assert set(rows) == {"inv_001.pdf", "inv_002.pdf"}
    r1 = rows["inv_001.pdf"]
    assert r1["kpi_total_amount____"] == pytest.approx(1234.56)
    assert str(r1["kpi_report_date"]) == "2024-01-15"
    assert r1["kpi_status"] == "Approved"
    r2 = rows["inv_002.pdf"]
    assert r2["kpi_total_amount____"] == pytest.approx(-500.0)  # parens neg
    assert str(r2["kpi_report_date"]) == "2024-01-03"  # fuzzy format chain
    assert r2["kpi_status"] is None  # N/A → NULL


def test_mixed_tj_and_array_preserve_document_order():
    """first-occurrence-wins depends on document order: a TJ array
    before a Tj string must stay first."""
    raw = b"%PDF-1.4\n" + (
        b"1 0 obj\n<< /Length 99 >>\nstream\n"
        b"BT [(Report Date: 2024-01-15)] TJ 0 -14 Td"
        b" (Report Date: 1999-09-09) Tj ET\n"
        b"endstream\nendobj\n"
    )
    assert pdftext.extract_pdf_text(raw).splitlines() == [
        "Report Date: 2024-01-15",
        "Report Date: 1999-09-09",
    ]
    got = pdftext.pdf_kpi_extractor(raw, ["Report Date"], "")
    assert got == {"Report Date": "2024-01-15"}


def test_backslash_8_and_9_drop_backslash_not_crash():
    """PDF spec: \\8 and \\9 are not octal — the backslash is ignored.
    Such documents must extract, not quarantine."""
    raw = b"%PDF-1.4\n" + (
        b"1 0 obj\n<< /Length 30 >>\nstream\n"
        b"BT (Code: A\\8B\\9\\101) Tj ET\n"
        b"endstream\nendobj\n"
    )
    # \101 octal = 'A'; \8 \9 keep the digit
    assert pdftext.extract_pdf_text(raw) == "Code: A8B9A"


def test_info_dict_resolved_via_trailer_not_page_text():
    """Page text containing '/Title (...)' bytes must not shadow the
    real Info dictionary's title."""
    pdf = build_pdf(
        ["see /Title (Fake) in body"], title="Real Title", compress=False
    )
    assert pdftext.pdf_metadata(pdf)["title"] == "Real Title"


def _encrypt_pdf_aes256(lines: list[str], password: bytes = b"") -> bytes:
    """AES-256 (V5/R6) encrypt a build_pdf-style document: the
    content stream becomes IV + AES-CBC ciphertext and the trailer
    gains /Encrypt — the modern owner-locked invoice shape."""
    import os
    import zlib as _z

    from pdf_etl_engine_spark.functions.cryptokit import aes_cbc_encrypt
    from pdf_etl_engine_spark.functions.pdftext import _hash_2b

    ops = ["BT", "/F1 12 Tf", "72 720 Td"]
    for i, line in enumerate(lines):
        esc = (
            line.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
        )
        if i:
            ops.append("0 -14 Td")
        ops.append(f"({esc}) Tj")
    ops.append("ET")
    plain = _z.compress("\n".join(ops).encode("latin-1"))

    file_key = os.urandom(32)
    vsalt, ksalt = os.urandom(8), os.urandom(8)
    u = _hash_2b(password, vsalt, b"") + vsalt + ksalt
    ue = aes_cbc_encrypt(_hash_2b(password, ksalt, b""), bytes(16), file_key)
    iv = os.urandom(16)
    pad = 16 - len(plain) % 16
    enc = iv + aes_cbc_encrypt(file_key, iv, plain + bytes([pad]) * pad)

    objects = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        b"<< /Filter /FlateDecode /Length " + str(len(enc)).encode()
        + b" >>\nstream\n" + enc + b"\nendstream",
        (b"<< /Filter /Standard /V 5 /R 6 /Length 256"
         b" /CF << /StdCF << /CFM /AESV3 /Length 32 >> >>"
         b" /StmF /StdCF /StrF /StdCF"
         b" /O <" + bytes(48).hex().encode() + b">"
         b" /U <" + u.hex().encode() + b">"
         b" /OE <" + bytes(32).hex().encode() + b">"
         b" /UE <" + ue.hex().encode() + b"> >>"),
    ]
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
            + b" /Root 1 0 R /Encrypt 5 0 R /ID [<"
            + bytes(16).hex().encode() + b"> <" + bytes(16).hex().encode()
            + b">] >>\nstartxref\n" + str(xref_pos).encode() + b"\n%%EOF\n")
    return bytes(out)


@pytest.mark.slow
def test_encrypted_pdf_ingest_end_to_end(tmp_path, spark):
    """An AES-256 owner-locked invoice ingests transparently through
    the full Spark pipeline (decrypt → inflate → extract → coerce),
    while a genuinely password-protected one quarantines with the
    error recorded — never a silent all-N/A row."""
    cat = pipeline.Catalog(spark, str(tmp_path / "catalog"))
    cat.create_folder(
        "user_abc", "invoices", "Invoices", "pdf docs", kpi_metadata=KPI_META
    )
    facts = str(tmp_path / "facts")
    d = tmp_path / "incoming" / "user_abc" / "invoices" / "batch"
    d.mkdir(parents=True)
    (d / "locked.pdf").write_bytes(_encrypt_pdf_aes256(
        ["Total Amount ($): $88.20", "Status: Approved"]
    ))
    (d / "protected.pdf").write_bytes(_encrypt_pdf_aes256(
        ["Total Amount ($): $1.00"], password=b"hunter2"
    ))

    res = pipeline.ingest_batch(
        spark,
        f"{tmp_path}/incoming/*/*/*/*",
        cat,
        facts,
        extractor=pipeline.pdf_extractor,
        quarantine_path=str(tmp_path / "quarantine"),
    )
    assert res["rows_written"] == 1
    assert res["files_failed"] == 1

    out = pipeline.read_results(spark, facts, "user_abc", "invoices")
    rows = {r["file_name"]: r for r in out.collect()}
    assert rows["locked.pdf"]["kpi_total_amount____"] == pytest.approx(88.2)
    assert rows["locked.pdf"]["kpi_status"] == "Approved"
    q = spark.read.parquet(str(tmp_path / "quarantine")).collect()
    assert len(q) == 1 and "password" in q[0]["error"]
