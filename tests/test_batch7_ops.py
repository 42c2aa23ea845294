"""Independent recomputes for the batch-7 round-7 additions: SymSpell
ED-1 matching (including blocking losslessness), the Hill tail-index
estimator, and cost-matrix threshold optimization."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import duckdb

from rag_application_with_vectordb_spark.plans.registry import load_all


def _q(name, spark, sf_dir):
    return load_all()[name].fn(spark, sf_dir)


def _duck(sf_dir, sql):
    con = duckdb.connect()
    for t in ("part", "events", "documents"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.execute(sql).fetchall()


def _hex13(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:13], 16)


def _ed(a: str, b: str) -> int:
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
        prev = cur
    return prev[n]


# --- SymSpell --------------------------------------------------------------------


def test_symspell_matches_bruteforce_ed1(spark, sf_dir):
    names = sorted({r[0] for r in _duck(sf_dir, "SELECT p_name FROM part")})
    sel = sorted(names, key=lambda n: (_hex13(f"sym42|{n}"), n))[:20]
    probes = []
    for n in sel:
        pos = _hex13(f"sym42|{n}") % len(n)
        probes.append(n[:pos] + n[pos + 1:])
    probes += ["zzzz qux", "wwww corge"]
    expect = {
        (p, n, _ed(p, n)) for p in probes for n in names if _ed(p, n) <= 1
    }
    got = {
        (r.probe, r.matched_name, r.edit_distance)
        for r in _q("er_symspell_match", spark, sf_dir).collect()
    }
    assert got == expect
    # every typo'd probe must recover its source (blocking lossless)
    assert len(got) >= 20
    # garbage probes never match
    assert not any(p in ("zzzz qux", "wwww corge") for p, _, _ in got)


# --- Hill tail index --------------------------------------------------------------


def test_hill_matches_python(spark, sf_dir):
    vals = sorted(
        (
            r[0]
            for r in _duck(
                sf_dir,
                """SELECT CAST(round(value*100) AS BIGINT) FROM events
                   WHERE event_type = 'purchase'""",
            )
        ),
        reverse=True,
    )
    k = 50
    xk1 = vals[k]  # (k+1)-th largest, 0-indexed
    above = [v for v in vals if v > xk1]  # strict-excess convention
    lnsum = sum(_round_half_away(math.log(v / xk1) * 1e6) for v in above)
    r = _q("stats_hill_tail_index", spark, sf_dir).collect()[0]
    assert r.threshold_cents == xk1
    assert r.k_used == len(above)
    assert math.isclose(r.mean_log_excess, lnsum / len(above) / 1e6, rel_tol=1e-12)
    assert math.isclose(r.hill_alpha, len(above) * 1e6 / lnsum, rel_tol=1e-12)
    assert r.hill_alpha > 0


# --- threshold utility -------------------------------------------------------------


def test_threshold_utility_matches_python(spark, sf_dir):
    rows = _duck(sf_dir, "SELECT n_chars, lang FROM documents")
    hist = Counter()
    pos = Counter()
    for v, lang in rows:
        hist[v] += 1
        pos[v] += 1 if lang == "en" else 0
    nn, pp = sum(hist.values()), sum(pos.values())
    cand = []
    cn = cp = 0
    for v in sorted(hist, reverse=True):
        cn += hist[v]
        cp += pos[v]
        tp, fp = cp, cn - cp
        fn, tn = pp - cp, nn - cn - (pp - cp)
        util = 500 * tp - 200 * fp - 300 * fn
        cand.append((-util, v, tp, fp, fn, tn))
    cand.sort()
    expect = [
        (v, tp, fp, fn, tn, -nu, -nu / nn / 100.0)
        for nu, v, tp, fp, fn, tn in cand[:5]
    ]
    from pyspark.sql import functions as F

    got = [
        (r.threshold, r.tp, r.fp, r.fn, r.tn, r.utility_cents,
         r.utility_per_doc_dollars)
        for r in _q("eval_threshold_utility", spark, sf_dir)
        .orderBy(F.desc("utility_cents"), F.asc("threshold"))
        .collect()
    ]
    for (ev, etp, efp, efn, etn, eu, eupd), (gv, gtp, gfp, gfn, gtn, gu, gupd) in zip(
        expect, got
    ):
        assert (ev, etp, efp, efn, etn, eu) == (gv, gtp, gfp, gfn, gtn, gu)
        assert math.isclose(eupd, gupd, rel_tol=1e-12)


def _round_half_away(x: float) -> int:
    f = math.floor(x)
    return int(f + 1) if x - f >= 0.5 else int(f)
