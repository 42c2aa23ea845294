"""Independent recomputes for the batch-2 round-7 additions: spatial
radius join (blocking losslessness vs brute force), cell density,
cumulative gains/lift, and Holt-Winters triple smoothing."""

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
    for t in ("customer", "documents", "events"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.execute(sql).fetchall()


def _coord(axis: str, key: int) -> int:
    h = hashlib.md5(f"geo|{axis}|{key}".encode()).hexdigest()
    return int(h[:13], 16) % 1_000_000


# --- spatial radius join ---------------------------------------------------------


def _brute_pairs(ids, r):
    pts = [(i, _coord("x", i), _coord("y", i)) for i in ids]
    out = {}
    for ai in range(len(pts)):
        ia, xa, ya = pts[ai]
        for bi in range(ai + 1, len(pts)):
            ib, xb, yb = pts[bi]
            d = (xa - xb) ** 2 + (ya - yb) ** 2
            if d <= r * r:
                a, b = min(ia, ib), max(ia, ib)
                out[(a, b)] = d
    return out


def test_geo_radius_matches_bruteforce(spark, sf_dir):
    ids = [r[0] for r in _duck(sf_dir, "SELECT c_custkey FROM customer")]
    expect = _brute_pairs(ids, 10_000)
    got = {
        (r.id_a, r.id_b): r.dist_sq
        for r in _q("geo_radius_pairs", spark, sf_dir).collect()
    }
    assert got == expect
    assert got  # 5 pairs at sf0.001 — non-degenerate


def test_geo_radius_blocking_lossless_at_sf001(spark):
    # the larger fixture exercises many more cell boundaries (329 pairs)
    sf = "/root/testdata/sf0.01"
    ids = [r[0] for r in _duck(sf, "SELECT c_custkey FROM customer")]
    expect = _brute_pairs(ids, 10_000)
    got = {
        (r.id_a, r.id_b): r.dist_sq
        for r in _q("geo_radius_pairs", spark, sf).collect()
    }
    assert got == expect
    assert len(got) > 100


def test_geo_cell_density_matches_recompute(spark, sf_dir):
    ids = [r[0] for r in _duck(sf_dir, "SELECT c_custkey FROM customer")]
    cells = Counter()
    mins: dict = {}
    maxs: dict = {}
    for i in ids:
        c = (_coord("x", i) // 100_000, _coord("y", i) // 100_000)
        cells[c] += 1
        mins[c] = min(mins.get(c, i), i)
        maxs[c] = max(maxs.get(c, i), i)
    got = {(r.cx, r.cy): r for r in _q("geo_cell_density", spark, sf_dir).collect()}
    assert set(got) == set(cells)
    for c, r in got.items():
        assert (r.n_points, r.min_id, r.max_id) == (cells[c], mins[c], maxs[c])


# --- gains / lift ----------------------------------------------------------------


def test_lift_gains_matches_python(spark, sf_dir):
    rows = _duck(sf_dir, "SELECT n_chars, lang FROM documents")
    hist = Counter()
    pos = Counter()
    for v, lang in rows:
        hist[v] += 1
        pos[v] += 1 if lang == "en" else 0
    nn, pp = sum(hist.values()), sum(pos.values())
    prefix = []
    cn = cp = 0
    for v in sorted(hist, reverse=True):
        cn += hist[v]
        cp += pos[v]
        prefix.append((cn, cp))
    got = {r.decile: r for r in _q("eval_lift_gains", spark, sf_dir).collect()}
    assert set(got) == set(range(1, 11))
    for k in range(1, 11):
        cn, cp = next(t for t in prefix if t[0] * 10 >= k * nn)
        r = got[k]
        assert (r.n_targeted, r.pos_captured) == (cn, cp)
        assert math.isclose(r.frac_targeted, cn / nn, rel_tol=1e-12)
        assert math.isclose(r.gain, cp / pp, rel_tol=1e-12)
        assert math.isclose(r.lift, (cp * nn) / (cn * pp), rel_tol=1e-12)
    # gains curve must be monotone and end at 100% of positives
    gains = [got[k].gain for k in range(1, 11)]
    assert gains == sorted(gains) and gains[-1] == 1.0


# --- Holt-Winters ---------------------------------------------------------------


def test_holt_winters_matches_python_recursion(spark, sf_dir):
    rows = _duck(
        sf_dir,
        """SELECT date_trunc('day', ts) AS day,
                  CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS c
           FROM events WHERE event_type = 'purchase'
           GROUP BY 1 ORDER BY 1""",
    )
    series = [(d, c / 100.0) for d, c in rows]
    a, b_, g = 0.3, 0.1, 0.2
    st = [series[0][1], 0.0] + [0.0] * 7
    def _d(day):
        import datetime as dt

        return day.date() if isinstance(day, dt.datetime) else day

    expect = {}
    expect[_d(series[0][0])] = tuple(st[:3]) + (st[0] + st[1] + st[2],)
    for day, x in series[1:]:
        l_new = a * (x - st[2]) + (1 - a) * (st[0] + st[1])
        b_new = b_ * (l_new - st[0]) + (1 - b_) * st[1]
        s_new = g * (x - l_new) + (1 - g) * st[2]
        st = [l_new, b_new] + st[3:9] + [s_new]
        expect[_d(day)] = (st[0], st[1], st[2], st[0] + st[1] + st[2])
    got = _q("forecast_holt_winters", spark, sf_dir).collect()
    assert len(got) == len(expect)
    for r in got:
        el, et, es, ef = expect[r.day]
        assert math.isclose(r.level, el, rel_tol=1e-12, abs_tol=1e-9)
        assert math.isclose(r.trend, et, rel_tol=1e-12, abs_tol=1e-9)
        assert math.isclose(r.season_next, es, rel_tol=1e-12, abs_tol=1e-9)
        assert math.isclose(r.forecast_next, ef, rel_tol=1e-12, abs_tol=1e-9)
