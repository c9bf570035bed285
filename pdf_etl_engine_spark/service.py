"""Service surface: the reference's Flask routes as library calls
(VERDICT r2 "what's missing" #2 and #3).

The reference is an HTTP service (/root/reference/main.py:356-811)
whose every route is: verify a bearer token → check access → call the
engine. This module reproduces that surface without a web framework:
``Service`` methods take a bearer token + payload and return
``(status_code, payload_dict)`` exactly like the reference's
``(jsonify(...), code)`` pairs, so wiring any HTTP framework on top is
a 10-line adapter. Identity verification is the same shape as
Firebase's ``verify_id_token`` (main.py:54-77) — a signed token
carrying (uid, email, exp) — implemented locally as HMAC-SHA256 over
the payload; swap ``TokenVerifier`` for a real IdP client in
production.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import re
import time
from typing import Callable

from pyspark.sql import SparkSession

from pdf_etl_engine_spark import pipeline


# ---------------------------------------------------------------------------
# Identity (main.py:54-77): token -> {uid, email} | None
# ---------------------------------------------------------------------------

class HmacTokenVerifier:
    """Local stand-in for an IdP's ID-token verification: tokens are
    ``base64url(json payload) . hexdigest(HMAC-SHA256(secret, payload))``
    carrying uid/email/exp. Same contract as the reference's
    ``auth.verify_id_token``: any invalid, tampered, or expired token
    verifies to None (the route then answers 401) — never an
    exception. ``clock`` injectable for deterministic tests."""

    def __init__(self, secret: bytes, clock: Callable[[], float] | None = None):
        self._secret = secret
        self._clock = clock or time.time

    def issue(self, uid: str, email: str, ttl_s: float = 3600.0) -> str:
        payload = json.dumps(
            {"uid": uid, "email": email, "exp": self._clock() + ttl_s},
            sort_keys=True,
        ).encode()
        sig = hmac.new(self._secret, payload, hashlib.sha256).hexdigest()
        return base64.urlsafe_b64encode(payload).decode() + "." + sig

    def verify(self, token: str | None) -> dict | None:
        if not token:
            return None
        try:
            b64, sig = token.rsplit(".", 1)
            payload = base64.urlsafe_b64decode(b64.encode())
            want = hmac.new(self._secret, payload, hashlib.sha256).hexdigest()
            if not hmac.compare_digest(want, sig):
                return None
            data = json.loads(payload)
            if data.get("exp", 0) < self._clock():
                return None
            return {"uid": data["uid"], "email": data.get("email", "").lower()}
        except Exception:
            return None  # malformed token == unauthorized (main.py:62-64)


def _sanitize_id(name: str) -> str:
    """Folder-id grammar (main.py:383)."""
    return re.sub(r"[^a-zA-Z0-9_]", "_", name).lower()


def _sanitize_filename(name: str) -> str:
    """Upload filename grammar (main.py:637)."""
    return re.sub(r"[^a-zA-Z0-9_.-]", "_", name)


class Service:
    """Route-for-route semantics of the reference service over the
    Spark-native engine. Every method: verify → authorize → library
    call; returns ``(status, dict)``."""

    def __init__(
        self,
        spark: SparkSession,
        catalog: pipeline.Catalog,
        fact_path: str,
        incoming_root: str,
        verifier: HmacTokenVerifier,
        extractor: pipeline.Extractor = pipeline.pdf_extractor,
    ):
        self.spark = spark
        self.catalog = catalog
        self.fact_path = fact_path
        self.incoming_root = incoming_root
        self.verifier = verifier
        self.extractor = extractor

    # -- /setup-account (main.py:356-373) --------------------------------
    def setup_account(self, token: str | None) -> tuple[int, dict]:
        ident = self.verifier.verify(token)
        if not ident:
            return 401, {"error": "Unauthorized"}
        return 200, {"status": "success", "uid": ident["uid"]}

    # -- /create-folder (main.py:375-411) --------------------------------
    def create_folder(self, token: str | None, payload: dict) -> tuple[int, dict]:
        ident = self.verifier.verify(token)
        if not ident:
            return 401, {"error": "Unauthorized"}
        name = payload.get("name")
        if not name:
            return 400, {"error": "name required"}
        folder_id = _sanitize_id(name)
        self.catalog.create_folder(
            ident["uid"],
            folder_id,
            name,
            payload.get("context_hint", ""),
            kpi_metadata=payload.get("kpi_metadata"),
        )
        import pathlib

        for kind in ("master", "batch"):  # placeholder layout, main.py:389-390
            d = pathlib.Path(self.incoming_root, ident["uid"], folder_id, kind)
            d.mkdir(parents=True, exist_ok=True)
            (d / ".placeholder").write_bytes(b"init")
        return 200, {"status": "success", "folder_id": folder_id}

    # -- /share-folder (main.py:617-629 semantics via Catalog) ------------
    def share_folder(self, token: str | None, payload: dict) -> tuple[int, dict]:
        ident = self.verifier.verify(token)
        if not ident:
            return 401, {"error": "Unauthorized"}
        try:
            self.catalog.add_share(
                ident["uid"],
                payload["folder_id"],
                payload["shared_email"],
                payload.get("permission", "view"),
            )
        except (KeyError, ValueError) as e:
            return 400, {"error": str(e)}
        return 200, {"status": "success"}

    # -- /upload-batch-file (main.py:596-654): SHARED-user upload ---------
    def upload_batch_file(
        self, token: str | None, payload: dict
    ) -> tuple[int, dict]:
        ident = self.verifier.verify(token)
        if not ident or not ident.get("email"):
            return 401, {"error": "Unauthorized"}
        folder_id = payload.get("folder_id")
        owner_id = payload.get("owner_id")
        filename = payload.get("filename")
        content = payload.get("content")
        if not folder_id or not owner_id or content is None or not filename:
            return 400, {
                "error": "Missing required fields: folder_id, owner_id, or file"
            }
        if not filename.lower().endswith(".pdf"):
            return 400, {"error": "Only PDF files are allowed"}
        # share lookup (main.py:640-651): exact (owner, folder, email) row
        from pyspark.sql import functions as F

        rows = (
            self.catalog.shares()
            .filter(
                (F.col("owner_id") == owner_id)
                & (F.col("folder_id") == folder_id)
                & (F.col("shared_email") == ident["email"])
            )
            .collect()
        )
        if not rows:
            return 403, {
                "error": "Share not found. You do not have access to this folder."
            }
        if all(r["permission"] != "edit" for r in rows):
            return 403, {
                "error": "You have view-only access. Upload not permitted."
            }
        import pathlib

        safe = _sanitize_filename(filename)
        dst = pathlib.Path(self.incoming_root, owner_id, folder_id, "batch", safe)
        dst.parent.mkdir(parents=True, exist_ok=True)
        dst.write_bytes(content)
        rel = f"incoming/{owner_id}/{folder_id}/batch/{safe}"
        return 200, {"success": True, "path": rel, "filename": safe}

    # -- / (GCS trigger, main.py:656-759): process the batch --------------
    def process_batch(self) -> tuple[int, dict]:
        res = pipeline.ingest_batch(
            self.spark,
            f"{self.incoming_root}/*/*/*/*",
            self.catalog,
            self.fact_path,
            extractor=self.extractor,
        )
        return 200, res

    # -- /get-results (main.py:764-811) -----------------------------------
    def get_results(
        self,
        token: str | None,
        folder_id: str | None,
        owner_id: str | None = None,
    ) -> tuple[int, dict]:
        ident = self.verifier.verify(token)
        if not ident:
            return 401, {"error": "Unauthorized"}
        if not folder_id:
            return 400, {"error": "folder_id required"}
        target = owner_id or ident["uid"]
        known = {
            (m["tenant_id"], m["folder_id"])
            for m in pipeline.latest_folder_metas(self.catalog)
        }
        if (target, folder_id) not in known:
            return 404, {"error": "Folder not found or access denied"}
        if not self.catalog.can_read(
            ident["uid"], ident["email"], target, folder_id
        ):
            return 403, {"error": "Unauthorized"}
        df = pipeline.read_results(self.spark, self.fact_path, target, folder_id)
        return 200, {"results": [r.asDict(recursive=True) for r in df.collect()]}
