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


def test_signbit_masks_match_numpy(spark):
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    from rag_application_with_vectordb_spark.operators.quant import signbit_masks

    got = {r["vec_id"]: (r["lo"], r["hi"]) for r in signbit_masks(df).collect()}
    for i, vec in rows:
        lo = sum(1 << j for j in range(32) if vec[j] > 0)
        hi = sum(1 << j for j in range(32) if vec[32 + j] > 0)
        assert got[i] == (lo, hi), i


def test_hamming64_counts_differing_signs(spark):
    from pyspark.sql import functions as F

    from rag_application_with_vectordb_spark.operators.quant import hamming64

    df = spark.createDataFrame(
        [(0b1010, 0, 0b0110, 0), (2**31, 2**31, 0, 0)],
        "lo_a long, hi_a long, lo_b long, hi_b long",
    )
    got = [
        r["h"]
        for r in df.select(
            hamming64(F.col("lo_a"), F.col("hi_a"), F.col("lo_b"), F.col("hi_b")).alias("h")
        ).collect()
    ]
    assert got == [2, 2]


def test_signbits_rerank_finds_self(spark, sf_dir):
    from rag_application_with_vectordb_spark.plans.registry import load_all

    rows = load_all()["ann_signbits_rerank_topk"].fn(spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rs in by_q.items():
        top = max(rs, key=lambda r: r["similarity"])
        # the query vector itself has Hamming 0 → always shortlisted and
        # re-ranked to the top with similarity 1.0
        assert top["vec_id"] == qid and top["hamming"] == 0
        assert abs(top["similarity"] - 1.0) < 1e-12
