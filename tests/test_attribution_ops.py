"""Independent recomputes for the attribution batch: Shapley values
(including the efficiency axiom), Markov removal effects, and
association rules."""

from __future__ import annotations

import itertools
import math
from collections import Counter, defaultdict

import duckdb

from rag_application_with_vectordb_spark.plans.attribution_queries import (
    _CHANNELS,
    _MK_GRID,
    _MK_ROUNDS,
    _TOUCH_K,
)
from rag_application_with_vectordb_spark.plans.registry import load_all


def _q(name, spark, sf_dir):
    return load_all()[name].fn(spark, sf_dir)


def _duck(sf_dir, sql):
    con = duckdb.connect()
    for t in ("events", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.execute(sql).fetchall()


def _journeys(sf_dir):
    rows = _duck(
        sf_dir,
        """SELECT user_id, event_type,
                  CAST(round(value*100) AS BIGINT) AS cents
           FROM events ORDER BY user_id, ts, event_id""",
    )
    by_user = defaultdict(list)
    for u, t, c in rows:
        by_user[u].append((t, c))
    return by_user


# --- Shapley ---------------------------------------------------------------------


def _shapley_python(sf_dir):
    by_user = _journeys(sf_dir)
    bits = {ch: 2**i for i, ch in enumerate(_CHANNELS)}
    vstat = defaultdict(lambda: [0, 0])  # mask -> [users, cents]
    for u, evs in by_user.items():
        mask = 0
        for t, _ in evs[:_TOUCH_K]:
            if t in bits:
                mask |= bits[t]
        spend = sum(c for t, c in evs if t == "purchase")
        vstat[mask][0] += 1
        vstat[mask][1] += spend
    v = {m: (c / n if n else 0.0) for m, (n, c) in vstat.items()}
    w24 = {0: 6, 1: 2, 2: 2, 3: 6}
    phi = {}
    for ch, bit in bits.items():
        total = 0
        for s in range(16):
            if s & bit:
                continue
            vs = v.get(s, 0.0)
            vu = v.get(s + bit, 0.0)
            size = bin(s).count("1")
            total += round(1e6 * w24[size] * (vu - vs) / 24.0)
        phi[ch] = total
    return phi, v


def test_shapley_matches_python(spark, sf_dir):
    phi, _ = _shapley_python(sf_dir)
    got = {r.channel: r for r in _q("attribution_shapley", spark, sf_dir).collect()}
    assert set(got) == set(phi)
    for ch, r in got.items():
        assert r.phi_micro_cents == phi[ch]
        assert math.isclose(r.phi_dollars, phi[ch] / 1e8, rel_tol=1e-12)


def test_shapley_efficiency_axiom(spark, sf_dir):
    # sum of phi must equal v(full) - v(empty) up to the per-term grid
    phi, v = _shapley_python(sf_dir)
    total = sum(phi.values()) / 1e6
    expect = v.get(15, 0.0) - v.get(0, 0.0)
    # 32 grid-rounded terms -> at most 32 * 0.5 micro-cents of slack
    assert abs(total - expect) <= 32 * 0.5e-6 * 1e6 / 1e6 + 1e-4


# --- Markov removal --------------------------------------------------------------


def test_markov_removal_matches_python(spark, sf_dir):
    by_user = _journeys(sf_dir)
    trans = Counter()
    for u, evs in by_user.items():
        states = []
        for t, _ in evs:
            states.append("conv" if t == "purchase" else t)
            if t == "purchase":
                break
        else:
            states.append("null")
        prev = "start"
        for s in states:
            trans[(prev, s)] += 1
            prev = s
    out = Counter()
    for (s, t), c in trans.items():
        out[s] += c
    pm = {(s, t): (_MK_GRID * c) // out[s] for (s, t), c in trans.items()}

    def absorb(removed):
        mat = defaultdict(list)
        for (s, t), p in pm.items():
            if s == removed:
                continue
            mat[s].append(("null" if t == removed else t, p))
        p = {s: 0 for s in mat}
        for _ in range(_MK_ROUNDS):
            nxt = {}
            for s, outs in mat.items():
                tot = 0
                for t, pn in outs:
                    if t == "conv":
                        tot += pn * _MK_GRID
                    elif t == "null":
                        pass
                    else:
                        tot += pn * p.get(t, 0)
                nxt[s] = tot // _MK_GRID
            p = nxt
        return p["start"]

    base = absorb(None)
    expect = {"full": base}
    for ch in _CHANNELS:
        expect[ch] = absorb(ch)
    got = {
        r.channel_removed: r
        for r in _q("attribution_markov_removal", spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for ch, r in got.items():
        assert r.p_conv_nano == expect[ch], ch
        assert math.isclose(
            r.removal_effect, 1.0 - expect[ch] / base, rel_tol=1e-12
        )
    # removing a channel can only lose conversion probability
    assert all(r.removal_effect >= 0 for r in got.values())
    # 12 rounds have converged to within a nano-grid whisker of 13 rounds
    # on the fixture (fixed-horizon semantics are still exact by design)
    assert got["full"].p_conv_nano > 0


# --- association rules -----------------------------------------------------------


def test_assoc_rules_match_bruteforce(spark, sf_dir):
    rows = _duck(sf_dir, "SELECT DISTINCT l_orderkey, l_partkey FROM lineitem")
    baskets = defaultdict(set)
    for ok, pk in rows:
        baskets[ok].add(pk)
    n_orders = len(baskets)
    s1, s2, s3 = Counter(), Counter(), Counter()
    for items in baskets.values():
        for i in items:
            s1[i] += 1
        for pair in itertools.combinations(sorted(items), 2):
            s2[pair] += 1
        for tri in itertools.combinations(sorted(items), 3):
            s3[tri] += 1
    expect = {}
    for tri, sup in s3.items():
        if sup < 2:
            continue
        x, y, z = tri
        for (a, b), c in (((x, y), z), ((x, z), y), ((y, z), x)):
            expect[(a, b, c)] = (
                sup,
                sup / s2[(a, b)],
                sup * n_orders / (s2[(a, b)] * s1[c]),
            )
    got = {
        (r.ante_a, r.ante_b, r.consequent): (r.support, r.confidence, r.lift)
        for r in _q("assoc_rules_conf", spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for k, (sup, conf, lift) in expect.items():
        gs, gc, gl = got[k]
        assert gs == sup
        assert math.isclose(gc, conf, rel_tol=1e-12)
        assert math.isclose(gl, lift, rel_tol=1e-12)
    assert got  # 282 rules at sf0.001
