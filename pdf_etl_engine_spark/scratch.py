"""Source-keyed scratch directories.

Several components materialize a derived artifact of a source file
into temp space (a streaming landing dir, an ANN index, a fingerprint
store) and want to reuse it across calls but NEVER reuse it for a
changed source. The shared convention: key the directory name by the
source's identity — path + mtime + size — so a regenerated source at
the same path gets a fresh directory instead of silently serving a
stale artifact.
"""

from __future__ import annotations

import os
import pathlib
import tempfile


def scratch_dir(kind: str, src_path: str, *key_parts: str) -> str:
    """Deterministic scratch path under the system tempdir for an
    artifact of ``kind`` derived from ``src_path`` (plus any extra
    ``key_parts``, e.g. parameters baked into the artifact). The
    directory is NOT created."""
    st = os.stat(src_path)
    name = "_".join(
        (
            src_path.strip("/").replace("/", "_"),
            *key_parts,
            str(int(st.st_mtime)),
            str(st.st_size),
        )
    )
    return str(pathlib.Path(tempfile.gettempdir(), kind, name))
