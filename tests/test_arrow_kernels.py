"""The Arrow-kernel bit-exactness contract (r10).

x4j/x4k/x45 route dense linear algebra through numpy kernels whose
correctness rests on ONE claim: an explicit per-index vectorized
accumulation loop (``for j: acc += a[:, j] * b[:, j]``) runs the
IDENTICAL IEEE float64 sequence as the oracles' list_sum/list_reduce
left folds (seed 0.0, index order). The oracle-parity suite checks
that end-to-end on corpus data; these tests pin the claim itself —
against the definitional pure-Python fold on adversarial values, and
against the live DuckDB oracle on constructed exact ties (duplicate
vectors), where a wrong tie-break or a reordered summation would
surface first.
"""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest


def _pure_python_fold_dot(a: list[float], b: list[float]) -> float:
    """The definitional sequence: acc starts at 0.0, adds one product
    per index — exactly DuckDB's list_reduce([0.0] || products)."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + (x * y)
    return acc


def _kernel_dot_block(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """The kernels' accumulation shape (extensions._pair_cosine_kernel
    / _x4j_bucket_kernel / x4k): strict j-order vectorized adds."""
    acc = np.zeros(len(A))
    for j in range(A.shape[1]):
        acc += A[:, j] * B[:, j]
    return acc


def test_kernel_accumulation_bit_equals_pure_fold():
    """Deterministic adversarial values: mixed magnitudes (1e-30 to
    1e30), sign flips, exact zeros, subnormals — any reordering or
    fused-multiply-add in the kernel path would change low-order bits
    that the f"%.12g" parity normalization (and hash grading) sees."""
    rng = np.random.default_rng(20260815)
    cases = []
    for _ in range(200):
        scale = 10.0 ** rng.integers(-30, 31, size=64)
        a = (rng.standard_normal(64) * scale).astype(np.float64)
        b = (rng.standard_normal(64) * scale[::-1]).astype(np.float64)
        cases.append((a, b))
    # structured edge rows
    z = np.zeros(64)
    cases.append((z, z))
    tiny = np.full(64, 5e-324)  # subnormal floor
    cases.append((tiny, np.ones(64)))
    alt = np.array([1e16, -1e16] * 32)  # catastrophic cancellation
    cases.append((alt, np.ones(64)))
    A = np.stack([c[0] for c in cases])
    B = np.stack([c[1] for c in cases])
    got = _kernel_dot_block(A, B)
    for i, (a, b) in enumerate(cases):
        want = _pure_python_fold_dot(list(a), list(b))
        g = float(got[i])
        if math.isnan(want):
            assert math.isnan(g)
            continue
        assert struct.pack("<d", g) == struct.pack("<d", want), (
            f"case {i}: kernel {g!r} != fold {want!r}"
        )


def test_kernel_accumulation_float32_cast_is_exact():
    """The corpus embeddings are float32; the kernels upcast before
    accumulating. float32→float64 is exact, so the fold over the
    upcast values must equal the fold over their Python-float images
    bit-for-bit (this is what lets a float32 parquet column grade
    hash-exact against DuckDB's CAST(x AS DOUBLE))."""
    rng = np.random.default_rng(7)
    a32 = rng.standard_normal(64, dtype=np.float32)
    b32 = rng.standard_normal(64, dtype=np.float32)
    a = a32.astype(np.float64)
    b = b32.astype(np.float64)
    got = float(_kernel_dot_block(a[None, :], b[None, :])[0])
    want = _pure_python_fold_dot(
        [float(x) for x in a32], [float(y) for y in b32]
    )
    assert struct.pack("<d", got) == struct.pack("<d", want)


@pytest.mark.slow
def test_x4k_tie_break_matches_oracle_on_duplicate_vectors(
    spark, tmp_path
):
    """Constructed EXACT ties: several identical vectors make every
    pairwise cosine equal, so the top-k ordering is decided purely by
    the (c DESC, nbr_id) tie-break — the stable argsort in the x4k
    kernel must reproduce the oracle's row_number exactly."""
    import duckdb

    from pdf_etl_engine_spark import registry

    registry.load_all()
    base = np.array([1.0] + [0.0] * 63, dtype=np.float32)
    rows = []
    for vid in range(12):
        if vid < 7:
            emb = base  # 7 identical vectors → all-ties block
        else:
            emb = np.roll(base, vid).astype(np.float32)
        rows.append((vid, [float(x) for x in emb], "L%d" % (vid % 2)))
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label string"
    )
    path = str(tmp_path / "embeddings.parquet")
    df.coalesce(1).write.parquet(path)

    sdf = registry.QUERIES["x4k_knn_join_brute"](spark, str(tmp_path))
    got = sorted(tuple(r) for r in sdf.collect())

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{path}/*.parquet'"
    )
    res = con.execute(registry.ORACLES["x4k_knn_join_brute"])
    want = sorted(tuple(r) for r in res.fetchall())
    assert got == want
