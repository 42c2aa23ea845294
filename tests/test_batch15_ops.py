"""Independent recomputes for the batch-15 round-7 additions: k-anon
generalization search, Theta forecast, duplicate-payment detector
(with a planted fixture — the real fixtures are clean)."""

from __future__ import annotations

import datetime as dt
import math
from collections import Counter

import duckdb

from rag_application_with_vectordb_spark.plans.registry import load_all


def _q(name, spark, sf_dir):
    return load_all()[name].fn(spark, sf_dir)


def _duck(sf_dir, sql):
    con = duckdb.connect()
    for t in ("documents", "events", "orders"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.execute(sql).fetchall()


def test_k_anon_generalization_matches_python(spark, sf_dir):
    rows = _duck(sf_dir, "SELECT lang, n_chars FROM documents")
    got = {
        r.bucket_width: r
        for r in _q("audit_k_anon_generalization", spark, sf_dir).collect()
    }
    assert set(got) == {25, 50, 100, 200, 400}
    for w, r in got.items():
        classes = Counter((lang, v // w) for lang, v in rows)
        suppressed = sum(c for c in classes.values() if c < 5)
        assert r.n_classes == len(classes)
        assert r.min_class_size == min(classes.values())
        assert r.n_suppressed_rows == suppressed
        assert r.k5_satisfied == (min(classes.values()) >= 5)
    # coarser buckets can only merge classes: suppression is monotone down
    sups = [got[w].n_suppressed_rows for w in (25, 50, 100, 200, 400)]
    assert all(a >= b for a, b in zip(sups, sups[1:]))


def test_theta_matches_python(spark, sf_dir):
    rows = _duck(
        sf_dir,
        """SELECT date_trunc('day', ts) AS day,
                  CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT)
           FROM events WHERE event_type = 'purchase'
           GROUP BY 1 ORDER BY 1""",
    )
    xs = [c // 100 for _, c in rows]
    n = len(xs)
    ses = float(xs[0])
    for x in xs[1:]:
        ses = 0.3 * x + 0.7 * ses
    si = n * (n + 1) // 2
    sx = sum(xs)
    sii = sum((i + 1) ** 2 for i in range(n))
    six = sum((i + 1) * x for i, x in enumerate(xs))
    slope = (n * six - si * sx) / (n * sii - si * si)
    meani = si / n
    theta = ses + 0.5 * slope * (n + 1 - meani)
    r = _q("forecast_theta", spark, sf_dir).collect()[0]
    assert r.n_days == n
    assert math.isclose(r.ses_level, ses, rel_tol=1e-12)
    assert math.isclose(r.drift_per_day, slope, rel_tol=1e-12)
    assert math.isclose(r.theta_forecast, theta, rel_tol=1e-12)


def test_duplicate_payments_clean_on_fixture_and_finds_planted(spark, sf_dir, tmp_path):
    # The fixture draws amounts independently (clean audit — 0 organic
    # hits), so the query plants a resubmitted invoice for every 500th
    # order (VERDICT r7 #4: a 0-rows-vs-0-rows green proves nothing).
    # Each seed must surface as exactly its planted pair: same customer
    # and cents, re-keyed +1e8, 3 days later — detection, not absence.
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    seeds = {
        r.o_orderkey
        for r in orders.filter("o_orderkey % 500 = 0")
        .select("o_orderkey")
        .collect()
    }
    assert seeds  # the fixture must actually exercise the detector
    got = _q("audit_duplicate_payments", spark, sf_dir).collect()
    assert {(r.order_a, r.order_b, r.days_apart) for r in got} == {
        (k, k + 100000000, 3) for k in seeds
    }

    # planted fixture: two exact-amount repeats inside 7 days, one repeat
    # outside the window, one same-amount pair across customers
    base = dt.date(2024, 3, 1)
    rows = [
        (1, 10, 100.00, base),
        (2, 10, 100.00, base + dt.timedelta(days=3)),   # HIT (1,2)
        (3, 10, 100.00, base + dt.timedelta(days=20)),  # outside window
        (4, 11, 55.50, base),
        (5, 11, 55.50, base + dt.timedelta(days=7)),    # HIT boundary (4,5)
        (6, 12, 100.00, base + dt.timedelta(days=1)),   # other customer
        (7, 13, 42.42, base),
    ]
    import pandas as pd

    pdf = pd.DataFrame(
        rows, columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"]
    )
    pdf["o_orderdate"] = pd.to_datetime(pdf["o_orderdate"])
    pdf["o_orderstatus"] = "F"
    out = tmp_path / "orders.parquet"
    # pandas defaults to TIMESTAMP(NANOS), which Spark's vectorized
    # parquet reader rejects (the round-3 fixture outage) — write us
    pdf.to_parquet(out, coerce_timestamps="us", allow_truncated_timestamps=True)
    got = {
        (r.order_a, r.order_b, r.days_apart)
        for r in _q("audit_duplicate_payments", spark, str(tmp_path)).collect()
    }
    assert got == {(1, 2, 3), (4, 5, 7)}
