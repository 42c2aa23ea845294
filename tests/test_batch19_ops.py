"""Independent recomputes for the batch-19 round-7 additions: greedy
knapsack with LP bound, and trimmed/winsorized means."""

from __future__ import annotations

import math

import duckdb

from rag_application_with_vectordb_spark.plans.registry import load_all


def _q(name, spark, sf_dir):
    return load_all()[name].fn(spark, sf_dir)


def _duck(sf_dir, sql):
    con = duckdb.connect()
    for t in ("part", "events"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.execute(sql).fetchall()


def test_knapsack_matches_python_and_bound_holds(spark, sf_dir):
    items = _duck(
        sf_dir,
        """SELECT p_partkey, CAST(p_size AS BIGINT),
                  CAST(round(p_retailprice*100) AS BIGINT)
           FROM part WHERE p_size > 0""",
    )
    cap = 200
    ranked = sorted(items, key=lambda r: (-(r[2] / r[1]), r[0]))
    cum_c = cum_v = n = 0
    frontier = None
    for pk, c, v in ranked:
        if cum_c + c <= cap:
            cum_c += c
            cum_v += v
            n += 1
        else:
            frontier = (c, v, cum_c + c, cum_v + v)
            break
    if frontier:
        fc, fv, fcc, fcv = frontier
        lp = (fcv - fv + (cap - (fcc - fc)) * fv / fc) / 100.0
    else:
        lp = cum_v / 100.0
    r = _q("optimize_knapsack_greedy", spark, sf_dir).collect()[0]
    assert (r.n_items, r.used_capacity, r.total_value_cents) == (n, cum_c, cum_v)
    assert math.isclose(r.total_value_dollars, cum_v / 100.0, rel_tol=1e-12)
    assert math.isclose(r.lp_bound_dollars, lp, rel_tol=1e-12)
    # Dantzig's bound dominates any feasible solution, incl. the greedy
    assert r.total_value_dollars <= r.lp_bound_dollars + 1e-9
    assert r.used_capacity <= cap


def test_trimmed_winsorized_match_python(spark, sf_dir):
    vals = sorted(
        r[0]
        for r in _duck(
            sf_dir,
            """SELECT CAST(round(value*100) AS BIGINT) FROM events
               WHERE event_type = 'purchase'""",
        )
    )
    n = len(vals)
    cut = n // 10
    kept = vals[cut : n - cut]
    trimmed = sum(kept) / len(kept) / 100.0
    lo, hi = vals[cut], vals[n - cut - 1]
    wins = sum(min(max(v, lo), hi) for v in vals) / n / 100.0
    r = _q("stats_trimmed_mean", spark, sf_dir).collect()[0]
    assert (r.n_obs, r.n_trimmed_each_side, r.n_kept) == (n, cut, len(kept))
    assert math.isclose(r.trimmed_mean_dollars, trimmed, rel_tol=1e-12)
    assert math.isclose(r.winsorized_mean_dollars, wins, rel_tol=1e-12)
    # robustness ordering on a right-skewed positive distribution:
    # both robust means sit below the raw mean
    raw = sum(vals) / n / 100.0
    assert r.trimmed_mean_dollars <= raw + 1e-9
