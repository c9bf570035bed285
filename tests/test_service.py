"""Service surface: token verification + route semantics
(main.py:54-77, 356-811) as library calls — VERDICT r2 "what's
missing" #2/#3.
"""

from __future__ import annotations

from pdf_etl_engine_spark import pipeline
from pdf_etl_engine_spark.service import HmacTokenVerifier, Service
from tests.test_pdf_extractor import KPI_META, build_pdf

SECRET = b"test-secret"


def test_token_roundtrip_tamper_and_expiry():
    now = [1000.0]
    v = HmacTokenVerifier(SECRET, clock=lambda: now[0])
    tok = v.issue("user_abc", "Owner@Example.COM", ttl_s=60)
    assert v.verify(tok) == {"uid": "user_abc", "email": "owner@example.com"}
    # tampered payload → None, never an exception
    b64, sig = tok.rsplit(".", 1)
    assert v.verify(b64[:-4] + "AAAA." + sig) is None
    assert v.verify(tok[:-1] + ("0" if tok[-1] != "0" else "1")) is None
    assert v.verify("garbage") is None and v.verify(None) is None
    # expiry honored
    now[0] = 1061.0
    assert v.verify(tok) is None
    # wrong secret
    assert HmacTokenVerifier(b"other").verify(tok) is None


def _service(tmp_path, spark):
    cat = pipeline.Catalog(spark, str(tmp_path / "catalog"))
    verifier = HmacTokenVerifier(SECRET)
    svc = Service(
        spark,
        cat,
        str(tmp_path / "facts"),
        str(tmp_path / "incoming"),
        verifier,
    )
    return svc, verifier


def test_routes_require_auth(tmp_path, spark):
    svc, _ = _service(tmp_path, spark)
    assert svc.setup_account(None)[0] == 401
    assert svc.create_folder("bad-token", {"name": "X"})[0] == 401
    assert svc.get_results(None, "invoices")[0] == 401
    assert svc.upload_batch_file(None, {})[0] == 401


def test_full_service_flow_with_shares(tmp_path, spark):
    svc, verifier = _service(tmp_path, spark)
    owner = verifier.issue("user_abc", "owner@example.com")
    editor = verifier.issue("user_ed", "Editor@Example.COM")
    viewer = verifier.issue("user_vw", "viewer@example.com")
    stranger = verifier.issue("user_zz", "zz@example.com")

    status, body = svc.create_folder(
        owner, {"name": "Invoices!", "kpi_metadata": KPI_META}
    )
    assert (status, body["folder_id"]) == (200, "invoices_")

    # shared-user upload permission matrix (main.py:640-651)
    pdf = build_pdf(["Total Amount ($): $10.00", "Status: Approved"])
    req = {
        "folder_id": "invoices_",
        "owner_id": "user_abc",
        "filename": "a b.pdf",
        "content": pdf,
    }
    assert svc.upload_batch_file(editor, req)[0] == 403  # no share yet
    assert svc.share_folder(owner, {
        "folder_id": "invoices_", "shared_email": "viewer@example.com",
    })[0] == 200
    assert svc.share_folder(owner, {
        "folder_id": "invoices_", "shared_email": "editor@example.com",
        "permission": "edit",
    })[0] == 200
    assert svc.upload_batch_file(viewer, req)[0] == 403  # view-only
    status, body = svc.upload_batch_file(editor, req)
    assert status == 200
    assert body["filename"] == "a_b.pdf"  # sanitized (main.py:637)
    assert svc.upload_batch_file(
        editor, {**req, "filename": "notes.txt"}
    )[0] == 400  # pdf-only

    status, counters = svc.process_batch()
    assert status == 200 and counters["rows_written"] == 1

    # read path: owner and shared users read, stranger cannot
    status, body = svc.get_results(owner, "invoices_")
    assert status == 200 and len(body["results"]) == 1
    assert body["results"][0]["kpi_status"] == "Approved"
    status, _ = svc.get_results(viewer, "invoices_", owner_id="user_abc")
    assert status == 200
    assert svc.get_results(stranger, "invoices_", owner_id="user_abc")[0] == 403
    assert svc.get_results(owner, "nope")[0] == 404
