"""Independent recomputes for the batch-16 round-7 additions: Markov
next-event eval, negative-binomial MoM fit, and Jensen-Shannon source
divergence."""

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


def _rha(x: float) -> int:
    m = math.floor(abs(x))
    m = m + 1 if abs(x) - m >= 0.5 else m
    return int(m) if x >= 0 else -int(m)


def test_markov_eval_matches_python(spark, sf_dir):
    rows = _duck(
        sf_dir, "SELECT user_id, event_type FROM events ORDER BY user_id, ts, event_id"
    )
    seqs = defaultdict(list)
    for u, t in rows:
        seqs[u].append(t)
    trans_train = Counter()
    test_pairs = []
    for u, seq in seqs.items():
        train = _hex13(f"mk42|{u}") % 1000 < 800
        for a, b in zip(seq, seq[1:]):
            if train:
                trans_train[(a, b)] += 1
            else:
                test_pairs.append((a, b))
    pred = {}
    by_s = defaultdict(list)
    for (a, b), c in trans_train.items():
        by_s[a].append((-c, b))
    for a, lst in by_s.items():
        pred[a] = sorted(lst)[0][1]
    scored = [(a, b) for a, b in test_pairs if a in pred]
    correct = sum(1 for a, b in scored if pred[a] == b)
    r = _q("eval_markov_next_event", spark, sf_dir).collect()[0]
    assert (r.n_transitions, r.n_correct) == (len(scored), correct)
    assert math.isclose(r.accuracy, correct / len(scored), rel_tol=1e-12)
    # uniform chains: near 1/|types| but argmax must beat 0
    assert 0 < r.accuracy < 0.6


def test_negbin_mom_matches_python(spark, sf_dir):
    rows = _duck(
        sf_dir,
        """SELECT event_type, CAST(ts AS DATE), CAST(COUNT(*) AS BIGINT)
           FROM events GROUP BY 1, 2""",
    )
    n_days = _duck(sf_dir, "SELECT COUNT(DISTINCT CAST(ts AS DATE)) FROM events")[0][0]
    s = Counter()
    sq = Counter()
    for t, _, k in rows:
        s[t] += k
        sq[t] += k * k
    got = {r.event_type: r for r in _q("stats_negbin_mom", spark, sf_dir).collect()}
    assert set(got) == set(s)
    for t, r in got.items():
        m = s[t] / n_days
        v = (sq[t] - s[t] ** 2 / n_days) / (n_days - 1)
        assert r.n_days == n_days and r.n_events == s[t]
        assert math.isclose(r.mean_daily, m, rel_tol=1e-12)
        assert math.isclose(r.var_daily, v, rel_tol=1e-12)
        if v <= m:
            assert r.negbin_r is None and r.negbin_p is None
        else:
            assert math.isclose(r.negbin_r, m * m / (v - m), rel_tol=1e-12)
            assert math.isclose(r.negbin_p, m / v, rel_tol=1e-12)
            # NB mean identity: r(1-p)/p == m
            assert math.isclose(
                r.negbin_r * (1 - r.negbin_p) / r.negbin_p, m, rel_tol=1e-9
            )


def test_js_divergence_matches_python(spark, sf_dir):
    rows = _duck(sf_dir, "SELECT source, text FROM documents")
    sw = defaultdict(Counter)
    for src, text in rows:
        for w in text.strip().split():
            if w:
                sw[src][w] += 1
    gw = Counter()
    for c in sw.values():
        gw.update(c)
    gt = sum(gw.values())
    got = {r.source: r.js_divergence
           for r in _q("text_js_divergence_sources", spark, sf_dir).collect()}
    assert set(got) == set(sw)
    for src, c in sw.items():
        st = sum(c.values())
        kp = kq = 0
        for w, g in gw.items():
            p = c.get(w, 0) / st
            q = g / gt
            m = (p + q) / 2
            if p > 0:
                kp += _rha(p * math.log(p / m) * 1e9)
            kq += _rha(q * math.log(q / m) * 1e9)
        expect = (kp + kq) / 2 / 1e9
        assert math.isclose(got[src], expect, rel_tol=1e-9)
        assert 0 <= got[src] <= math.log(2) + 1e-9
