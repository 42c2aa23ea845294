"""int8 scalar quantization tests (operators/quant.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rag_application_with_vectordb_spark.functions.vector import as_double
from rag_application_with_vectordb_spark.operators.knn import knn
from rag_application_with_vectordb_spark.operators.quant import (
    QUANT_SCALE,
    dequantize_vec,
    quantize_embeddings,
)
from rag_application_with_vectordb_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_roundtrip_error_bounded(spark, emb):
    # floor grid → error strictly below one quantization step
    q = quantize_embeddings(emb)
    err = q.select(
        F.array_max(
            F.zip_with(
                dequantize_vec(F.col("qvec")),
                as_double(F.col("embedding")),
                lambda a, b: F.abs(a - b),
            )
        ).alias("e")
    ).agg(F.max("e").alias("m")).first()["m"]
    assert err < 1.0 / QUANT_SCALE


def test_quantized_type_is_tinyint(spark, emb):
    q = quantize_embeddings(emb)
    assert dict(q.dtypes)["qvec"] == "array<tinyint>"


def test_clamp_extremes(spark):
    df = spark.createDataFrame(
        [(0, [10.0, -10.0, 0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    row = quantize_embeddings(df).first()
    assert list(row["qvec"]) == [127, -127, 0, 64]


def test_quantized_topk_overlaps_exact(spark, emb):
    # int8 at scale 64 barely perturbs cosine rankings on unit-scale
    # vectors: top-5 should overlap the exact top-5 heavily
    rows = emb.collect()
    qv = [float(x) for x in rows[0]["embedding"]]
    exact = {r["vec_id"] for r in knn(emb, qv, k=5).collect()}
    deq = quantize_embeddings(emb).select(
        "vec_id", dequantize_vec(F.col("qvec")).alias("embedding")
    )
    qdeq_row = deq.filter(F.col("vec_id") == rows[0]["vec_id"]).first()
    approx = {
        r["vec_id"]
        for r in knn(deq, [float(x) for x in qdeq_row["embedding"]], k=5).collect()
    }
    assert len(exact & approx) >= 4


def test_redact_pii_edges(spark):
    # (placed here to avoid another module-scoped session fixture file)
    from rag_application_with_vectordb_spark.functions.text import redact_pii

    df = spark.createDataFrame(
        [
            (0, "mail me at a.b+c@exa-mple.org today"),
            (1, "call 555-123-4567 or ping 10.0.0.7"),
            (2, "no pii here at all"),
        ],
        "id long, text string",
    )
    got = {r["id"]: r["out"] for r in df.select("id", redact_pii(F.col("text")).alias("out")).collect()}
    assert got[0] == "mail me at <EMAIL> today"
    assert got[1] == "call <PHONE> or ping <IP>"
    assert got[2] == "no pii here at all"


def test_quantization_properties_hypothesis(spark):
    from hypothesis import given, settings, strategies as st

    from rag_application_with_vectordb_spark.operators.quant import QUANT_SCALE

    # pure-python twin of the quantize expression, for fast property runs
    def quant(x: float) -> int:
        import math

        return int(max(-127, min(127, math.floor(x * QUANT_SCALE))))

    @settings(max_examples=300, deadline=None)
    @given(st.floats(min_value=-1.5, max_value=1.5, allow_nan=False))
    def prop(x):
        q = quant(x)
        assert -127 <= q <= 127
        if -127 / QUANT_SCALE <= x < 127 / QUANT_SCALE:
            # inside the representable range the floor-grid error bound
            # holds; <= because the fp64 SUBTRACTION rounds up to exactly
            # 1/scale for subnormal x (hypothesis found -1.4e-45)
            assert 0 <= x - q / QUANT_SCALE <= 1.0 / QUANT_SCALE
        # idempotence: re-quantizing the dequantized value is a fixed point
        assert quant(q / QUANT_SCALE) == q

    prop()
    # the python twin must match the Spark expression bit-for-bit
    import random

    rng = random.Random(42)
    vals = [rng.uniform(-1.5, 1.5) for _ in range(200)]
    df = spark.createDataFrame([(0, vals)], "id long, embedding array<double>")
    from rag_application_with_vectordb_spark.operators.quant import quantize_embeddings

    got = list(quantize_embeddings(df).first()["qvec"])
    assert got == [quant(x) for x in vals]
