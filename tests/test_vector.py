"""Unit tests for the vector kernel — reference semantics from
``services/vectorDb.ts:26-52`` (see SURVEY.md §2.3 K2)."""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from rag_application_with_vectordb_spark.functions.vector import (
    cosine_sim,
    dot,
    l2_norm,
    vec_lit,
)


def sim(spark, a, b) -> float:
    return (
        spark.range(1)
        .select(cosine_sim(vec_lit(a), vec_lit(b)).alias("s"))
        .first()["s"]
    )


def test_identical_vectors_sim_one(spark):
    assert sim(spark, [1.0, 2.0, 3.0], [1.0, 2.0, 3.0]) == pytest.approx(1.0, abs=1e-12)


def test_antiparallel_sim_minus_one(spark):
    assert sim(spark, [1.0, 2.0], [-1.0, -2.0]) == pytest.approx(-1.0, abs=1e-12)


def test_orthogonal_sim_zero(spark):
    assert sim(spark, [1.0, 0.0], [0.0, 1.0]) == 0.0


def test_dim_mismatch_returns_minus_one(spark):
    # vectorDb.ts:27-32 — an error *value*, not an exception.
    assert sim(spark, [1.0, 2.0, 3.0], [1.0, 2.0]) == -1.0


def test_zero_vector_returns_zero(spark):
    # vectorDb.ts:47-49
    assert sim(spark, [0.0, 0.0], [1.0, 2.0]) == 0.0
    assert sim(spark, [1.0, 2.0], [0.0, 0.0]) == 0.0
    assert sim(spark, [0.0, 0.0], [0.0, 0.0]) == 0.0


def test_dot_and_norm(spark):
    row = (
        spark.range(1)
        .select(
            dot(vec_lit([1.0, 2.0, 3.0]), vec_lit([4.0, 5.0, 6.0])).alias("d"),
            l2_norm(vec_lit([3.0, 4.0])).alias("n"),
        )
        .first()
    )
    assert row["d"] == 32.0
    assert row["n"] == 5.0


def test_fp32_inputs_upcast_to_fp64(spark):
    # Fixture embeddings are array<float>; math must run in double
    # (reference computes over JS float64 — SURVEY.md §7.3.1).
    df = spark.createDataFrame([([0.1, 0.2, 0.3],)], "v array<float>")
    out = df.select(cosine_sim(F.col("v"), F.col("v")).alias("s")).first()["s"]
    assert out == pytest.approx(1.0, abs=1e-9)


finite = st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False)


@settings(max_examples=20, deadline=None)
@given(st.lists(finite, min_size=2, max_size=8), st.lists(finite, min_size=2, max_size=8))
def test_cosine_properties(spark_session_holder, a, b):
    spark = spark_session_holder
    if len(a) != len(b):
        assert sim(spark, a, b) == -1.0
        return
    s_ab = sim(spark, a, b)
    s_ba = sim(spark, b, a)
    assert s_ab == pytest.approx(s_ba, abs=1e-9)  # symmetry
    assert -1.0 - 1e-9 <= s_ab <= 1.0 + 1e-9  # bounded
    # scale invariance for positive scaling
    s_scaled = sim(spark, a, [x * 2.0 for x in b])
    if not (math.sqrt(sum(x * x for x in a)) == 0 or math.sqrt(sum(x * x for x in b)) == 0):
        assert s_scaled == pytest.approx(s_ab, abs=1e-6)


@pytest.fixture(scope="session")
def spark_session_holder(spark):
    return spark


def test_lit_doubles_bit_identical_to_per_element_lits(spark):
    # lit_doubles builds the constant via repr'd SQL literals (one py4j
    # call); every finite double must round-trip bit-exactly vs the
    # per-element F.lit form — including negative zero, denormals,
    # huge/tiny magnitudes, and values with no short decimal form.
    import math
    import struct

    from pyspark.sql import functions as F

    from rag_application_with_vectordb_spark.functions.vector import (
        lit_double_matrix,
        lit_doubles,
    )

    tricky = [
        0.0, -0.0, 1.0, -1.0, 0.1, 2.0 / 3.0, math.pi, -math.e,
        1e-300, -1e300, 5e-324, 1.7976931348623157e308,
        4503599627370496.0, 1 / (1 << 52), -0.9999999999999999,
    ]
    row = spark.range(1).select(
        lit_doubles(tricky).alias("a"),
        F.array(*[F.lit(float(v)) for v in tricky]).alias("b"),
        lit_double_matrix([tricky, tricky[::-1]]).alias("m"),
    ).first()
    bits = lambda x: struct.pack("<d", x)
    assert [bits(x) for x in row["a"]] == [bits(x) for x in row["b"]]
    assert [bits(x) for x in row["a"]] == [bits(v) for v in tricky]
    assert [bits(x) for x in row["m"][1]] == [bits(v) for v in tricky[::-1]]


def test_lit_doubles_nonfinite(spark):
    # r6 ADVICE: repr renders non-finite doubles as 'nan'/'inf', which is
    # not valid Spark SQL — they must be emitted as CAST literals so
    # vec_lit keeps the old per-element F.lit semantics (NaN/±Infinity
    # values, not a parse error).
    import math

    from rag_application_with_vectordb_spark.functions.vector import (
        lit_double_matrix,
        lit_doubles,
    )

    vals = [float("nan"), float("inf"), float("-inf"), 1.5]
    row = spark.range(1).select(
        lit_doubles(vals).alias("a"),
        lit_double_matrix([vals]).alias("m"),
    ).first()
    for got in (row["a"], row["m"][0]):
        assert math.isnan(got[0])
        assert got[1] == float("inf")
        assert got[2] == float("-inf")
        assert got[3] == 1.5


def test_cosine_sim_sql_bitwise(spark):
    """r12 optimization: the unrolled fixed-dim cosine (cosine_sim_sql)
    must be BIT-IDENTICAL to cosine_sim for every input class — normal
    pairs (fast branch), dimension mismatch (-1.0 via the per-row HOF
    fallback), equal-but-other-dim pairs (HOF cosine), and zero vectors
    (0.0) — == on floats, no tolerance."""
    import struct

    from pyspark.sql import functions as F

    from rag_application_with_vectordb_spark.functions.vector import (
        cosine_sim,
        cosine_sim_sql,
    )

    dim = 8
    rows = [
        ([0.5, -1.25, 3.0, 0.1, -0.75, 2.5, -0.3, 1.1],
         [1.0, 0.25, -0.5, 0.7, 0.0, -1.5, 2.25, -0.125]),   # fast branch
        ([0.1] * 8, [0.2] * 8),                              # fast branch
        ([1.0, 2.0, 3.0], [1.0, 2.0, 3.0, 4.0]),             # mismatch -> -1.0
        ([1.0, 2.0], [3.0, 4.0]),                            # equal-but-other-dim
        ([0.0] * 8, [1.0] * 8),                              # zero vector -> 0.0
    ]
    df = spark.createDataFrame(rows, "a array<double>, b array<double>")
    out = df.select(
        cosine_sim(F.col("a"), F.col("b")).alias("hof"),
        F.expr(cosine_sim_sql("a", "b", dim)).alias("unrolled"),
    ).collect()
    bits = lambda x: struct.pack("<d", float(x))
    for r in out:
        assert bits(r["unrolled"]) == bits(r["hof"]), (r["hof"], r["unrolled"])
    # float-typed corpus arrays (the parquet embeddings case)
    dff = spark.createDataFrame(rows[:2], "a array<float>, b array<float>")
    outf = dff.select(
        cosine_sim(F.col("a"), F.col("b")).alias("hof"),
        F.expr(cosine_sim_sql("a", "b", dim)).alias("unrolled"),
    ).collect()
    for r in outf:
        assert bits(r["unrolled"]) == bits(r["hof"])
