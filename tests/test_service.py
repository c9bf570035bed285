"""Service surface: token verification + route semantics
(main.py:54-77, 356-811) as library calls — VERDICT r2 "what's
missing" #2/#3.
"""

from __future__ import annotations

import pytest

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


@pytest.mark.slow
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


def test_incoming_root_grammar_fail_fast(tmp_path, spark):
    """ADVICE r4: a root not named 'incoming' would make every
    rel_path empty and silently ingest zero rows — the constructor
    refuses it instead."""
    import pytest

    cat = pipeline.Catalog(spark, str(tmp_path / "catalog"))
    with pytest.raises(ValueError, match="incoming"):
        Service(
            spark, cat, str(tmp_path / "facts"),
            str(tmp_path / "landing"), HmacTokenVerifier(SECRET),
        )


@pytest.mark.slow
def test_share_newest_wins_downgrade(tmp_path, spark):
    """ADVICE r4 (medium): re-sharing as 'view' must downgrade an
    earlier 'edit' — the reference's Firestore set() upsert
    (main.py:617-626) replayed as newest-wins over append-only rows."""
    svc, verifier = _service(tmp_path, spark)
    owner = verifier.issue("user_abc", "owner@example.com")
    editor = verifier.issue("user_ed", "editor@example.com")
    svc.create_folder(owner, {"name": "Docs", "kpi_metadata": KPI_META})
    req = {
        "folder_id": "docs",
        "owner_id": "user_abc",
        "filename": "x.pdf",
        "content": build_pdf(["Status: ok"]),
    }
    svc.share_folder(owner, {
        "folder_id": "docs", "shared_email": "editor@example.com",
        "permission": "edit",
    })
    assert svc.upload_batch_file(editor, req)[0] == 200
    svc.share_folder(owner, {
        "folder_id": "docs", "shared_email": "editor@example.com",
        "permission": "view",
    })
    status, body = svc.upload_batch_file(editor, req)
    assert status == 403 and "view-only" in body["error"]
    # read access survives the downgrade (any live share grants read)
    assert svc.catalog.can_read(
        "user_ed", "editor@example.com", "user_abc", "docs"
    )


def test_upload_rejects_traversal_ids(tmp_path, spark):
    """ADVICE r4: ids compose into filesystem paths — traversal bytes
    must 400, and add_share sanitizes folder_id so a poisoned share
    row can't smuggle one in."""
    svc, verifier = _service(tmp_path, spark)
    owner = verifier.issue("user_abc", "owner@example.com")
    editor = verifier.issue("user_ed", "editor@example.com")
    req = {
        "filename": "x.pdf",
        "content": build_pdf(["Status: ok"]),
    }
    for bad_owner, bad_folder in (
        ("../../etc", "docs"),
        ("user_abc", "../../tmp/out"),
        ("user_abc", "a/b"),
    ):
        status, _ = svc.upload_batch_file(
            editor, {**req, "owner_id": bad_owner, "folder_id": bad_folder}
        )
        assert status == 400
    # a share created with traversal folder_id stores the sanitized id
    svc.catalog.add_share("user_abc", "../x", "editor@example.com", "edit")
    rows = svc.catalog.shares().collect()
    assert all("/" not in r["folder_id"] and ".." not in r["folder_id"]
               for r in rows)


@pytest.mark.slow
def test_get_results_resolves_shared_folder_without_owner_id(tmp_path, spark):
    """ADVICE r4: a viewer omitting owner_id reaches a folder shared
    with them via the reference's cross-tenant fallback search
    (main.py:783-791)."""
    svc, verifier = _service(tmp_path, spark)
    owner = verifier.issue("user_abc", "owner@example.com")
    viewer = verifier.issue("user_vw", "viewer@example.com")
    editor = verifier.issue("user_ed", "editor@example.com")
    svc.create_folder(owner, {"name": "Docs", "kpi_metadata": KPI_META})
    svc.share_folder(owner, {
        "folder_id": "docs", "shared_email": "viewer@example.com",
    })
    svc.share_folder(owner, {
        "folder_id": "docs", "shared_email": "editor@example.com",
        "permission": "edit",
    })
    svc.upload_batch_file(editor, {
        "folder_id": "docs", "owner_id": "user_abc",
        "filename": "x.pdf", "content": build_pdf(["Status: Fine"]),
    })
    svc.process_batch()
    status, body = svc.get_results(viewer, "docs")  # owner_id omitted
    assert status == 200 and len(body["results"]) == 1
    # stranger still can't reach it without a share
    stranger = verifier.issue("user_zz", "zz@example.com")
    assert svc.get_results(stranger, "docs")[0] == 404


@pytest.mark.slow
def test_get_kpis_status_matrix(tmp_path, spark):
    """/get-kpis (main.py:517-591): 401 / 400 / 404 / 403 / 200, with
    the pre-computed kpi_metadata fast path."""
    svc, verifier = _service(tmp_path, spark)
    owner = verifier.issue("user_abc", "owner@example.com")
    viewer = verifier.issue("user_vw", "viewer@example.com")
    stranger = verifier.issue("user_zz", "zz@example.com")
    svc.create_folder(
        owner, {"name": "Docs", "context_hint": "invoices",
                "kpi_metadata": KPI_META}
    )
    assert svc.get_kpis(None, "docs")[0] == 401
    assert svc.get_kpis(owner, None)[0] == 400
    assert svc.get_kpis(owner, "nope")[0] == 404
    assert svc.get_kpis(stranger, "docs", owner_id="user_abc")[0] == 403
    svc.share_folder(owner, {
        "folder_id": "docs", "shared_email": "viewer@example.com",
    })
    for tok, kw in ((owner, {}), (viewer, {"owner_id": "user_abc"})):
        status, body = svc.get_kpis(tok, "docs", **kw)
        assert status == 200
        assert body["is_trained"] is True
        assert body["status"] == "active"
        assert body["context_hint"] == "invoices"
        assert [k["name"] for k in body["selected_kpis"]] == [
            k["name"] for k in KPI_META
        ]


def test_get_kpis_fallback_on_the_fly_typing(tmp_path, spark):
    """Legacy folders without kpi_metadata get types inferred from raw
    samples on the fly (main.py:564-589)."""
    svc, verifier = _service(tmp_path, spark)
    owner = verifier.issue("user_abc", "owner@example.com")
    svc.catalog.create_folder(
        "user_abc", "legacy", "Legacy", "old",
        selected_kpis=["Amount", "When", "Status"],
        kpi_samples={"Amount": "$42.50", "When": "2024-01-15",
                     "Status": "Approved"},
    )
    status, body = svc.get_kpis(owner, "legacy")
    assert status == 200 and body["is_trained"] is False
    got = {k["name"]: k["type"] for k in body["selected_kpis"]}
    assert got == {"Amount": "number", "When": "date",
                   "Status": "categorical"}
    samples = {k["name"]: k["sample_value"] for k in body["selected_kpis"]}
    assert samples["Amount"] == "$42.50"


@pytest.mark.slow
def test_train_flow_routes_end_to_end(tmp_path, spark):
    """VERDICT r4 #2: the full train→upload→process→read flow using
    ONLY service routes (analyze-master → confirm-kpis → upload →
    trigger → get-results), reference semantics at each step."""
    import pathlib

    svc, verifier = _service(tmp_path, spark)
    owner = verifier.issue("user_abc", "owner@example.com")

    assert svc.analyze_master(None, {})[0] == 401
    assert svc.analyze_master(owner, {})[0] == 400
    assert svc.analyze_master(
        owner, {"file_path": "incoming/user_abc/docs/master/m.pdf"}
    )[0] == 404
    assert svc.analyze_master(
        owner, {"file_path": "../outside.pdf"}
    )[0] == 400

    # create the folder, then land a master file and analyze it
    assert svc.create_folder(owner, {"name": "Docs"})[0] == 200
    master = build_pdf(
        ["Total Amount ($): $1,234.56", "Report Date: 2024-01-15",
         "Status: Approved"]
    )
    mpath = pathlib.Path(svc.incoming_root, "user_abc", "docs", "master",
                         "m.pdf")
    mpath.parent.mkdir(parents=True, exist_ok=True)
    mpath.write_bytes(master)
    status, body = svc.analyze_master(
        owner, {"file_path": "incoming/user_abc/docs/master/m.pdf"}
    )
    assert status == 200
    detected = {d["key"]: d["value"] for d in body["detected_kpis"]}
    assert detected["Total Amount ($)"] == "$1,234.56"
    assert detected["Report Date"] == "2024-01-15"

    # folder exists but untrained: get_kpis reflects that
    status, body = svc.get_kpis(owner, "docs")
    assert status == 200 and body["is_trained"] is False
    assert body["status"] == "waiting_for_training"

    # confirm a curated subset
    assert svc.confirm_kpis(None, {})[0] == 401
    assert svc.confirm_kpis(owner, {"folder_id": "docs"})[0] == 400
    assert svc.confirm_kpis(
        owner, {"folder_id": "nope", "selected_kpis": []}
    )[0] == 404
    status, body = svc.confirm_kpis(owner, {
        "folder_id": "docs",
        "selected_kpis": ["Total Amount ($)", "Status"],
        "kpi_samples": detected,
    })
    assert status == 200
    types = {k["name"]: k["type"] for k in body["kpi_metadata"]}
    assert types == {"Total Amount ($)": "number", "Status": "categorical"}

    status, body = svc.get_kpis(owner, "docs")
    assert status == 200 and body["is_trained"] is True
    assert body["status"] == "active"

    # batch upload by the owner path + process + read back typed rows
    bpath = pathlib.Path(svc.incoming_root, "user_abc", "docs", "batch",
                         "b1.pdf")
    bpath.parent.mkdir(parents=True, exist_ok=True)
    bpath.write_bytes(build_pdf(
        ["Total Amount ($): $10.00", "Status: Paid"]
    ))
    status, counters = svc.process_batch()
    assert status == 200 and counters["rows_written"] == 1
    status, body = svc.get_results(owner, "docs")
    assert status == 200 and len(body["results"]) == 1
    row = body["results"][0]
    assert row["kpi_total_amount____"] == 10.0
    assert row["kpi_status"] == "Paid"


@pytest.mark.slow
def test_process_batch_quarantines_untrained(tmp_path, spark):
    """A file landing in an untrained folder quarantines (counted) —
    the route answers 200 with counters instead of raising, and the
    quarantine table holds the row (vs the reference's silent 200,
    main.py:757-759)."""
    import pathlib

    svc, verifier = _service(tmp_path, spark)
    owner = verifier.issue("user_abc", "owner@example.com")
    svc.create_folder(owner, {"name": "Trained", "kpi_metadata": KPI_META})
    good = pathlib.Path(svc.incoming_root, "user_abc", "trained", "batch",
                        "ok.pdf")
    good.parent.mkdir(parents=True, exist_ok=True)
    good.write_bytes(build_pdf(["Total Amount ($): $3.00"]))
    stray = pathlib.Path(svc.incoming_root, "user_abc", "never_trained",
                         "batch", "stray.pdf")
    stray.parent.mkdir(parents=True, exist_ok=True)
    stray.write_bytes(build_pdf(["Whatever: 1"]))

    status, counters = svc.process_batch()
    assert status == 200
    assert counters["rows_written"] == 1
    q = spark.read.parquet(svc.quarantine_path)
    assert q.count() == 1
    assert "never_trained" in q.collect()[0]["error"]


def test_process_batch_empty_bucket_is_zero_not_500(tmp_path, spark):
    """A trigger firing before any upload answers 200 with zero
    counters (PATH_NOT_FOUND is an empty batch, not an error)."""
    svc, _ = _service(tmp_path, spark)
    status, counters = svc.process_batch()
    assert status == 200
    assert counters == {"files_seen": 0, "files_matched": 0,
                        "rows_written": 0, "files_failed": 0}


@pytest.mark.slow
def test_get_kpis_resolves_shared_folder_without_owner_id(tmp_path, spark):
    """A viewer's UI typically knows only folder_id — get_kpis falls
    back to the cross-tenant resolve like get_results does."""
    svc, verifier = _service(tmp_path, spark)
    owner = verifier.issue("user_abc", "owner@example.com")
    viewer = verifier.issue("user_vw", "viewer@example.com")
    stranger = verifier.issue("user_zz", "zz@example.com")
    svc.create_folder(owner, {"name": "Docs", "kpi_metadata": KPI_META})
    svc.share_folder(owner, {
        "folder_id": "docs", "shared_email": "viewer@example.com",
    })
    status, body = svc.get_kpis(viewer, "docs")  # owner_id omitted
    assert status == 200 and body["is_trained"] is True
    assert svc.get_kpis(stranger, "docs")[0] == 404  # unresolvable


@pytest.mark.slow
def test_analyze_master_cross_tenant_requires_edit_share(tmp_path, spark):
    """Hardening over the reference (which reads ANY blob by path,
    main.py:427-433): analyzing another tenant's master needs an edit
    share — the same bar as uploading into the folder."""
    import pathlib

    svc, verifier = _service(tmp_path, spark)
    owner = verifier.issue("user_abc", "owner@example.com")
    intruder = verifier.issue("user_zz", "zz@example.com")
    editor = verifier.issue("user_ed", "editor@example.com")
    svc.create_folder(owner, {"name": "Docs"})
    mpath = pathlib.Path(svc.incoming_root, "user_abc", "docs", "master",
                         "m.pdf")
    mpath.parent.mkdir(parents=True, exist_ok=True)
    mpath.write_bytes(build_pdf(["Secret Total: 99"]))
    req = {"file_path": "incoming/user_abc/docs/master/m.pdf"}

    assert svc.analyze_master(intruder, req)[0] == 403
    svc.share_folder(owner, {
        "folder_id": "docs", "shared_email": "editor@example.com",
        "permission": "edit",
    })
    status, body = svc.analyze_master(editor, req)
    assert status == 200
    assert {d["key"] for d in body["detected_kpis"]} == {"Secret Total"}
    # owner always can
    assert svc.analyze_master(owner, req)[0] == 200


@pytest.mark.slow
def test_list_folders_owned_and_shared(tmp_path, spark):
    """Extension route: owned + shared folder listing with live
    (newest-wins) permission attached."""
    svc, verifier = _service(tmp_path, spark)
    owner = verifier.issue("user_abc", "owner@example.com")
    viewer = verifier.issue("user_vw", "viewer@example.com")
    svc.create_folder(owner, {"name": "Alpha", "kpi_metadata": KPI_META})
    svc.create_folder(owner, {"name": "Beta"})
    svc.share_folder(owner, {
        "folder_id": "alpha", "shared_email": "viewer@example.com",
        "permission": "edit",
    })
    svc.share_folder(owner, {  # downgrade: listing shows the live perm
        "folder_id": "alpha", "shared_email": "viewer@example.com",
        "permission": "view",
    })
    assert svc.list_folders(None)[0] == 401
    status, body = svc.list_folders(owner)
    assert status == 200
    assert [f["folder_id"] for f in body["folders"]] == ["alpha", "beta"]
    assert body["folders"][0]["is_trained"] is True
    assert body["shared_folders"] == []
    status, body = svc.list_folders(viewer)
    assert status == 200 and body["folders"] == []
    assert body["shared_folders"] == [{
        "folder_id": "alpha", "display_name": "Alpha",
        "is_trained": True, "status": "active",
        "owner_id": "user_abc", "permission": "view",
    }]
