"""Independent recomputes for the batch-5 round-7 additions: SLO
burn-rate alerts, randomized response, Brier decomposition, and
LM-Dirichlet retrieval."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import duckdb

from rag_application_with_vectordb_spark.plans.registry import load_all


def _q(name, spark, sf_dir):
    return load_all()[name].fn(spark, sf_dir)


def _duck(sf_dir, sql):
    con = duckdb.connect()
    for t in ("events", "documents"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.execute(sql).fetchall()


def _hex13(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:13], 16)


# --- SLO burn --------------------------------------------------------------------


def test_slo_burn_matches_python(spark, sf_dir):
    rows = _duck(
        sf_dir,
        """SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
                  CAST(COUNT(*) AS BIGINT),
                  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                       AS BIGINT)
           FROM events GROUP BY 1 ORDER BY 1""",
    )
    days = {d: (tot, err) for d, tot, err in rows}
    got = {r.day_idx: r for r in _q("slo_burn_rate_daily", spark, sf_dir).collect()}
    assert set(got) == set(days)
    for d, r in got.items():
        tot, err = days[d]
        t7 = sum(days[x][0] for x in days if d - 6 <= x <= d)
        e7 = sum(days[x][1] for x in days if d - 6 <= x <= d)
        assert (r.total, r.errors, r.total_7d, r.errors_7d) == (tot, err, t7, e7)
        assert math.isclose(r.burn_1d, err / tot / 0.05, rel_tol=1e-12)
        assert math.isclose(r.burn_7d, e7 / t7 / 0.05, rel_tol=1e-12)
        assert r.page == (10 * err > tot and 20 * e7 > t7)
    # the fixture's ~20% error rate must keep the pager hot: burn > 1
    assert any(r.page for r in got.values())


# --- randomized response ----------------------------------------------------------


def test_randomized_response_matches_python(spark, sf_dir):
    rows = _duck(sf_dir, "SELECT doc_id, lang FROM documents")
    n = len(rows)
    n_true = sum(1 for _, lang in rows if lang == "en")
    n_rep = 0
    for did, lang in rows:
        truth = 1 if lang == "en" else 0
        keep = _hex13(f"rr42|{did}") % 4 < 3
        n_rep += truth if keep else 1 - truth
    r = _q("private_rate_randomized_response", spark, sf_dir).collect()[0]
    assert (r.n, r.n_reported) == (n, n_rep)
    assert math.isclose(r.rr_estimate, (4 * n_rep - n) / (2 * n), rel_tol=1e-12)
    assert math.isclose(r.true_rate, n_true / n, rel_tol=1e-12)
    # the debiased estimate should land near the true rate (2x-variance
    # penalty; at n=500 the standard error is ~4.5 points)
    assert abs(r.rr_estimate - r.true_rate) < 0.2


# --- Brier decomposition ----------------------------------------------------------


def test_brier_decomposition_matches_python(spark, sf_dir):
    rows = _duck(sf_dir, "SELECT n_chars, lang FROM documents")
    lo = min(v for v, _ in rows)
    hi = max(v for v, _ in rows)
    n = len(rows)
    np_ = sum(1 for _, lang in rows if lang == "en")
    obar = np_ / n
    brier_sum = 0
    bins = defaultdict(lambda: [0, 0, 0.0])  # nk, pk, psum
    for v, lang in rows:
        pos = 1 if lang == "en" else 0
        p = (v - lo) / (hi - lo)
        brier_sum += _round_half_away(((p - pos) ** 2) * 1e9)
        b = int(((v - lo) * 10) // (hi - lo + 1))
        bins[b][0] += 1
        bins[b][1] += pos
        bins[b][2] += p
    rel_sum = res_sum = 0
    for nk, pk, psum in bins.values():
        rel_sum += _round_half_away(nk * (psum / nk - pk / nk) ** 2 * 1e9)
        res_sum += _round_half_away(nk * (pk / nk - obar) ** 2 * 1e9)
    r = _q("eval_brier_decomposition", spark, sf_dir).collect()[0]
    assert r.n_docs == n
    assert math.isclose(r.brier, brier_sum / n / 1e9, rel_tol=1e-9)
    assert math.isclose(r.reliability, rel_sum / n / 1e9, rel_tol=1e-9)
    assert math.isclose(r.resolution, res_sum / n / 1e9, rel_tol=1e-9)
    assert math.isclose(r.uncertainty, obar * (1 - obar), rel_tol=1e-12)
    # Murphy identity up to the within-bin variance/covariance residual
    # (exact when forecasts are constant within bins): the residual is
    # bounded by the max within-bin spread of p (~1 bin width squared)
    residual = r.brier - (r.reliability - r.resolution + r.uncertainty)
    assert abs(residual) < 0.02


# --- LM-Dirichlet retrieval --------------------------------------------------------


def test_lm_dirichlet_matches_python(spark, sf_dir):
    terms = ("table", "join", "vector")
    mu = 2000
    rows = _duck(sf_dir, "SELECT doc_id, text FROM documents")
    docs = {}
    for did, text in rows:
        ws = [w for w in text.strip().split() if w]
        docs[did] = (len(ws), Counter(ws))
    tt = sum(dl for dl, _ in docs.values())
    ctf = {t: sum(c[t] for _, c in docs.values()) for t in terms}
    scored = []
    for did, (dl, c) in docs.items():
        s = 0
        for t in terms:
            if ctf[t] == 0:
                continue
            s += _round_half_away(
                math.log((c[t] * tt + mu * ctf[t]) / (tt * (dl + mu))) * 1e6
            )
        scored.append((-s, did))
    scored.sort()
    expect = [(did, -negs) for negs, did in scored[:10]]
    got = [
        (r.doc_id, r.ql_micro)
        for r in _q("retrieval_lm_dirichlet_topk", spark, sf_dir).collect()
    ]
    assert got == expect


def _round_half_away(x: float) -> int:
    f = math.floor(x)
    return int(f + 1) if x - f >= 0.5 else int(f)
