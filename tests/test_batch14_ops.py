"""Independent recomputes for the batch-14 round-7 additions: FPOF
basket outliers, Haar multiresolution energy, and Nelson-Aalen."""

from __future__ import annotations

import itertools
import math
from collections import Counter, defaultdict

import duckdb

from rag_application_with_vectordb_spark.plans.registry import load_all


def _q(name, spark, sf_dir):
    return load_all()[name].fn(spark, sf_dir)


def _duck(sf_dir, sql):
    con = duckdb.connect()
    for t in ("lineitem", "events"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.execute(sql).fetchall()


def test_fpof_matches_python(spark, sf_dir):
    rows = _duck(sf_dir, "SELECT DISTINCT l_orderkey, l_partkey FROM lineitem")
    baskets = defaultdict(set)
    for ok, pk in rows:
        baskets[ok].add(pk)
    sup = Counter()
    for items in baskets.values():
        for pr in itertools.combinations(sorted(items), 2):
            sup[pr] += 1
    fp = {p for p, s in sup.items() if s >= 2}
    scored = []
    for ok, items in baskets.items():
        prs = list(itertools.combinations(sorted(items), 2))
        if not prs:
            continue
        nf = sum(1 for p in prs if p in fp)
        scored.append((nf / len(prs), ok, len(prs), nf))
    scored.sort()
    expect = [(ok, np, nf, s) for s, ok, np, nf in scored[:10]]
    got = [
        (r.order_key, r.n_pairs, r.n_frequent, r.fpof)
        for r in _q("anomaly_fpof_baskets", spark, sf_dir).collect()
    ]
    assert len(got) == 10
    for (eok, enp, enf, es), (gok, gnp, gnf, gs) in zip(expect, got):
        assert (eok, enp, enf) == (gok, gnp, gnf)
        assert math.isclose(es, gs, rel_tol=1e-12)


def test_haar_matches_python(spark, sf_dir):
    rows = _duck(
        sf_dir,
        """SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
                  CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT)
           FROM events WHERE event_type = 'purchase'
           GROUP BY 1 ORDER BY 1""",
    )
    xs = [c // 100 for _, c in rows][-16:]
    assert len(xs) == 16
    got = {r.level: r for r in _q("events_haar_energy", spark, sf_dir).collect()}
    cur = xs
    for level in range(1, 5):
        approx, detail = [], []
        for i in range(0, len(cur), 2):
            approx.append(cur[i] + cur[i + 1])
            detail.append(cur[i] - cur[i + 1])
        e = sum(d * d for d in detail)
        r = got[level]
        assert (r.n_coeffs, r.sum_detail_sq) == (len(detail), e)
        assert math.isclose(r.energy, e / 2**level, rel_tol=1e-12)
        cur = approx
    # Parseval sanity: total detail energy + final approx energy equals
    # the signal energy (unnormalized Haar identity)
    total = sum(got[k].sum_detail_sq / 2**k for k in range(1, 5))
    total += (cur[0] ** 2) / 16
    assert math.isclose(total, sum(x * x for x in xs), rel_tol=1e-9)


def test_nelson_aalen_matches_km_relation(spark, sf_dir):
    na = {r.t_days: r for r in _q("survival_nelson_aalen", spark, sf_dir).collect()}
    km = {
        r.t_days: r
        for r in _q("survival_km_signup_purchase", spark, sf_dir).collect()
    }
    assert set(na) == set(km)
    def _rha(x):
        m = math.floor(abs(x))
        m = m + 1 if abs(x) - m >= 0.5 else m
        return int(m) if x >= 0 else -int(m)

    cum = 0
    for t in sorted(na):
        r = na[t]
        assert (r.n_risk, r.d_events, r.c_censored) == (
            km[t].n_risk,
            km[t].d_events,
            km[t].c_censored,
        )
        # exact recompute of the grid-landed hazard increments
        if r.d_events > 0:
            cum += _rha(1e6 * r.d_events / r.n_risk)
        assert r.cum_hazard_micro == cum
        assert math.isclose(r.cum_hazard, cum / 1e6, rel_tol=1e-12)
        # H(t) <= -ln S(t): the exact NA/KM inequality (x <= -ln(1-x))
        if km[t].log_surv_micro is not None:
            assert r.cum_hazard <= -km[t].log_surv_micro / 1e6 + 1e-4
    # cumulative hazard is nondecreasing
    ts = sorted(na)
    hz = [na[t].cum_hazard for t in ts]
    assert hz == sorted(hz)
