"""Fixture-drift canary: the driver regenerates /root/testdata between
rounds and has already changed a column's physical parquet encoding once
(round 3: ``events.ts`` TIMESTAMP(NANOS) → ``timestamp[us]``, which killed
25 driver rows and the whole bench through one hard-coded decode). This
test pins the LOGICAL schema the engine expects after ``load_table``'s
normalization — a regeneration that drifts again fails one named test
here instead of half the scorecard.
"""

from __future__ import annotations

from rag_application_with_vectordb_spark.sources.catalog import TABLES, load_table

# Logical (post-normalization) dtypes load_table must deliver, whatever
# the physical parquet encoding underneath. Captured from the round-4
# fixture generation; intentionally exact (==, not subset) so that
# added/removed/retyped columns all trip the canary.
EXPECTED_DTYPES = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "bigint",
        "c_name": "string",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint",
        "s_name": "string",
        "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "timestamp_ntz",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_linenumber": "int",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "timestamp_ntz",
    },
    "events": {
        "event_id": "bigint",
        "ts": "timestamp",  # normalized: nanos-as-long OR ntz → TIMESTAMP
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "source": "string",
        "lang": "string",
        "text": "string",
        "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint",
        "embedding": "array<float>",
        "label": "int",
    },
}


def test_every_table_loads_with_expected_logical_schema(spark, sf_dir):
    drift = []
    for name in TABLES:
        try:
            df = load_table(spark, sf_dir, name)
        except Exception as exc:  # noqa: BLE001 — report, don't abort the sweep
            drift.append(f"{name}: LOAD FAILED: {type(exc).__name__}: {exc}")
            continue
        got = dict(df.dtypes)
        want = EXPECTED_DTYPES[name]
        if got != want:
            for col in sorted(set(want) | set(got)):
                if want.get(col) != got.get(col):
                    drift.append(
                        f"{name}.{col}: expected {want.get(col)}, fixture now yields {got.get(col)}"
                    )
    assert not drift, "fixture drift detected:\n" + "\n".join(drift)


def test_every_table_has_rows(spark, sf_dir):
    for name in TABLES:
        assert load_table(spark, sf_dir, name).limit(1).count() == 1, f"{name} is empty"
