"""Salted-join equivalence tests on the naturally skewed events table
(15 user_ids across the whole fixture)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rag_application_with_vectordb_spark.operators.skew import salted_join
from rag_application_with_vectordb_spark.sources.catalog import load_table


def test_salted_join_equals_plain_join(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    users = events.groupBy("user_id").agg(F.count("*").alias("user_events"))
    plain = events.join(users, "user_id").select("event_id", "user_id", "user_events")
    salted = salted_join(events, users, "user_id", num_salts=8).select(
        "event_id", "user_id", "user_events"
    )
    p = {tuple(r) for r in plain.collect()}
    s = {tuple(r) for r in salted.collect()}
    assert p == s
    assert len(s) == events.count()


def test_salted_left_join_keeps_unmatched(spark):
    big = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k long, v string")
    small = spark.createDataFrame([(1, "x")], "k long, w string")
    out = salted_join(big, small, "k", num_salts=4, how="left").collect()
    assert len(out) == 3
    matched = {r["k"]: r["w"] for r in out}
    assert matched[1] == "x" and matched[2] is None and matched[3] is None
