"""Marketing-attribution catalog: Shapley-value and Markov-chain
removal-effect attribution over user journeys — the two standard
data-driven attribution models (vs the last-touch heuristic
events_purchase_attribution already covers).

Scale notes (100 TB posture):
- Both models collapse the fact to BOUNDED relations first and do all
  the model math there: Shapley's characteristic function lives on the
  2^|channels| touch-set masks (16 rows for 4 channels), the Markov
  chain on the (|states|+2)^2 transition matrix (~30 rows). The only
  fact-sized work is one keyed window pass (journey ordering) and one
  groupBy — everything downstream is constant-size whatever the fact.
- Shapley terms and Markov iteration probabilities land on fixed
  integer grids (1e-6 / 1e-9) BEFORE any cross-row sum, the catalog's
  standard move for order-free fp: exact BIGINT sums, one fp division
  at the very end.
- The Markov value iteration runs a FIXED 12 rounds (a t-step
  absorption probability — the chain is cyclic, so a fixpoint never
  lands exactly; fixing the horizon and the grid makes the number
  well-defined and bit-reproducible; 12 rounds moves the start-state
  probability by < 1e-6 on the fixtures, pytest-asserted). Spark
  iterates with localCheckpoint per round over the ~30-row relation
  (the Pregel rule: never let lineage grow); the oracle unrolls the
  same rounds as MATERIALIZED CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import tune
from ..sources.catalog import register_views, tables_in_sql
from .registry import register

_CHANNELS = ("click", "error", "signup", "view")
_TOUCH_K = 5  # channels among each user's first-K events form the touch set


def _sql_query(name: str, sql: str, doc: str = "", oracle: str | None = None,
               tags=("attribution",)):
    @register(name, oracle=oracle or sql, doc=doc, tags=tags)
    def fn(spark: SparkSession, sf_dir: str, _sql: str = sql) -> DataFrame:
        tune(spark)
        register_views(spark, sf_dir, tables_in_sql(_sql))
        return spark.sql(_sql)

    return fn


# --- Shapley-value attribution ----------------------------------------------------

# 24 * w(|S|) for n=4 channels: |S|!(n-1-|S|)!  ->  {0:6, 1:2, 2:2, 3:6}
_W24 = {0: 6, 1: 2, 2: 2, 3: 6}


def _shapley_sql() -> str:
    bits = {ch: 2**i for i, ch in enumerate(_CHANNELS)}
    mask_expr = " + ".join(
        f"{b} * MAX(CASE WHEN event_type = '{ch}' THEN 1 ELSE 0 END)"
        for ch, b in bits.items()
    )
    ch_values = ", ".join(f"('{ch}', {b})" for ch, b in bits.items())
    dom_values = ", ".join(f"({k})" for k in range(16))
    # popcount of a 4-bit mask via exact-multiple floor divisions
    pc = (
        "(mask % 2 + ((mask - mask % 2) / 2) % 2"
        " + ((mask - mask % 4) / 4) % 2 + ((mask - mask % 8) / 8) % 2)"
    )
    w24 = f"CASE WHEN {pc} = 0 OR {pc} = 3 THEN 6 ELSE 2 END"
    return f"""
    WITH r AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ),
    spend AS (
      SELECT user_id,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                           THEN CAST(round(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS cents
      FROM events GROUP BY user_id
    ),
    m AS (
      SELECT r.user_id, CAST({mask_expr} AS BIGINT) AS mask
      FROM r WHERE rn <= {_TOUCH_K} AND event_type <> 'purchase'
      GROUP BY r.user_id
    ),
    v AS (
      SELECT m.mask, CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(s.cents) AS BIGINT) AS cents
      FROM m JOIN spend s ON s.user_id = m.user_id
      GROUP BY m.mask
    ),
    dom AS (SELECT CAST(k AS BIGINT) AS mask FROM (VALUES {dom_values}) AS d(k)),
    vv AS (
      SELECT dom.mask,
             CASE WHEN v.n_users IS NULL THEN 0.0
                  ELSE CAST(v.cents AS DOUBLE) / CAST(v.n_users AS DOUBLE)
             END AS val
      FROM dom LEFT JOIN v ON v.mask = dom.mask
    ),
    ch AS (SELECT * FROM (VALUES {ch_values}) AS c(channel, bit)),
    terms AS (
      SELECT ch.channel,
             CAST(round(1000000.0 * ({w24.replace('mask', 'vs.mask')})
                        * (vu.val - vs.val) / 24.0) AS BIGINT) AS term_micro
      FROM ch
      JOIN vv vs ON ((vs.mask - vs.mask % ch.bit) / ch.bit) % 2 = 0
      JOIN vv vu ON vu.mask = vs.mask + ch.bit
    )
    SELECT channel, CAST(SUM(term_micro) AS BIGINT) AS phi_micro_cents,
           CAST(SUM(term_micro) AS DOUBLE) / 100000000.0 AS phi_dollars
    FROM terms GROUP BY channel
    """


_sql_query(
    "attribution_shapley",
    _shapley_sql(),
    doc=f"Shapley-value attribution of purchase spend across the "
    f"{len(_CHANNELS)} engagement channels: the characteristic "
    f"function v(S) = mean total spend of users whose first-{_TOUCH_K}"
    "-event touch set is exactly S (unobserved coalitions take v=0, "
    "the standard empirical-Shapley convention), and phi_i = "
    "sum_S w(|S|) (v(S+i) - v(S)) with the exact factorial weights "
    "(24w in {6,2,2,6}). Touch sets encode as 4-bit integer MASKS, so "
    "the whole game lives on a 16-row relation: coalition lattice "
    "walks are mask arithmetic (presence via exact-multiple floor "
    "division, S+i via +bit), the 8 marginal terms per channel land "
    "on the 1e-6 grid BEFORE summation (order-free exact BIGINTs), "
    "and fact-sized work is exactly one keyed window + two groupBys. "
    "The efficiency axiom (sum phi = v(full) - v(empty)) is "
    "pytest-asserted — the standard correctness proof for a Shapley "
    "implementation.",
    tags=("attribution", "analytics"),
)


# --- Markov removal-effect attribution ---------------------------------------------

_MK_ROUNDS = 12
_MK_GRID = 1_000_000_000


def _mk_base_ctes(mat: str = "") -> str:
    """Journey → transition-count → per-variant nano-probability matrix.
    ``mat=" MATERIALIZED"`` on the DuckDB side pins the journey/matrix
    CTEs so the 12 unrolled rounds don't each re-run the fact windows
    (the CTE-inlining rule); Spark derives ``mat`` once and
    localCheckpoints it instead."""
    variants = ", ".join(f"('full')" if v == "full" else f"('{v}')"
                         for v in ("full",) + _CHANNELS)
    g = _MK_GRID
    m = mat
    return f"""
    r AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ),
    fp AS (
      SELECT user_id, MIN(rn) AS prn FROM r
      WHERE event_type = 'purchase' GROUP BY user_id
    ),
    j AS (
      SELECT r.user_id, r.rn,
             CASE WHEN r.event_type = 'purchase' THEN 'conv'
                  ELSE r.event_type END AS state,
             fp.prn
      FROM r LEFT JOIN fp ON fp.user_id = r.user_id
      WHERE fp.prn IS NULL OR r.rn <= fp.prn
    ),
    tr AS (
      SELECT user_id, 'start' AS s, state AS t FROM j WHERE rn = 1
      UNION ALL
      SELECT user_id, state AS s,
             lead(state) OVER (PARTITION BY user_id ORDER BY rn) AS t
      FROM j
      UNION ALL
      SELECT user_id, state AS s, 'null' AS t
      FROM (SELECT user_id, state, prn,
                   row_number() OVER (PARTITION BY user_id ORDER BY rn DESC) AS rev
            FROM j) last
      WHERE rev = 1 AND prn IS NULL
    ),
    cnt AS{m} (
      SELECT s, t, CAST(COUNT(*) AS BIGINT) AS c
      FROM tr WHERE t IS NOT NULL GROUP BY s, t
    ),
    outc AS (SELECT s, CAST(SUM(c) AS BIGINT) AS tot FROM cnt GROUP BY s),
    pm AS (
      SELECT cnt.s, cnt.t,
             CAST(({g} * cnt.c - ({g} * cnt.c) % outc.tot) / outc.tot AS BIGINT)
               AS p_nano
      FROM cnt JOIN outc ON outc.s = cnt.s
    ),
    vr AS (SELECT * FROM (VALUES {variants}) AS v(variant)),
    mat AS{m} (
      SELECT vr.variant, pm.s,
             CASE WHEN pm.t = vr.variant THEN 'null' ELSE pm.t END AS t,
             CAST(SUM(pm.p_nano) AS BIGINT) AS p_nano
      FROM pm CROSS JOIN vr
      WHERE pm.s <> vr.variant
      GROUP BY vr.variant, pm.s, CASE WHEN pm.t = vr.variant THEN 'null' ELSE pm.t END
    )"""


def _mk_round_sql(prev: str, cur: str, mat: str = "") -> str:
    g = _MK_GRID
    return f"""{cur} AS{mat} (
      SELECT m.variant, m.s AS state,
             CAST((SUM(m.p_nano * CASE WHEN m.t = 'conv' THEN {g}
                                       WHEN m.t = 'null' THEN 0
                                       ELSE COALESCE(p.p, 0) END)
                   - SUM(m.p_nano * CASE WHEN m.t = 'conv' THEN {g}
                                         WHEN m.t = 'null' THEN 0
                                         ELSE COALESCE(p.p, 0) END) % {g}) / {g}
                  AS BIGINT) AS p
      FROM mat m
      LEFT JOIN {prev} p ON p.variant = m.variant AND p.state = m.t
      GROUP BY m.variant, m.s
    )"""


def _mk_oracle() -> str:
    rounds = [
        "p0 AS MATERIALIZED (SELECT variant, s AS state, CAST(0 AS BIGINT) AS p "
        "FROM mat GROUP BY variant, s)"
    ]
    for i in range(1, _MK_ROUNDS + 1):
        rounds.append(_mk_round_sql(f"p{i-1}", f"p{i}", mat=" MATERIALIZED"))
    chain = ",\n    ".join(rounds)
    return f"""
    WITH {_mk_base_ctes(" MATERIALIZED")},
    {chain}
    SELECT f.variant AS channel_removed, f.p AS p_conv_nano,
           1.0 - CAST(f.p AS DOUBLE) / CAST(b.p AS DOUBLE) AS removal_effect
    FROM p{_MK_ROUNDS} f
    JOIN p{_MK_ROUNDS} b ON b.variant = 'full' AND b.state = 'start'
    WHERE f.state = 'start'
    """


@register(
    "attribution_markov_removal",
    oracle=_mk_oracle(),
    doc=f"Markov-chain removal-effect attribution (Anderl et al. 2014): "
    "pool every user journey (truncated at first conversion; "
    "non-converters terminate in an absorbing 'null') into one "
    "transition matrix, then for each channel re-route its inbound "
    "edges to 'null', drop its outbound, and measure how much the "
    "start-state conversion probability falls — removal_effect = "
    "1 - P_removed/P_full, the causal-flavored credit last-touch "
    "can't give. Conversion probability is a "
    f"{_MK_ROUNDS}-step value iteration (the chain is cyclic so the "
    "t-step absorption probability IS the defined semantic) on the "
    "1e-9 integer grid with exact floor division each round — "
    "bit-reproducible across engines and partitionings, proven by "
    "the unrolled MATERIALIZED-CTE oracle. Fact-sized work: one "
    "keyed journey window + one transition groupBy; the iteration "
    "runs on a ~30-row (variant x state x next) relation whatever "
    "the fact size — Spark localCheckpoints each ~10-row round "
    "(the Pregel lineage rule).",
    tags=("attribution", "analytics"),
)
def attribution_markov_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    register_views(spark, sf_dir, ("events",))
    mat = spark.sql(
        "WITH " + _mk_base_ctes() + " SELECT variant, s, t, p_nano FROM mat"
    ).localCheckpoint()
    mat.createOrReplaceTempView("mk_mat")
    g = _MK_GRID
    p = (
        mat.groupBy("variant", F.col("s").alias("state"))
        .agg(F.lit(0).cast("bigint").alias("p"))
        .localCheckpoint()
    )
    for _ in range(_MK_ROUNDS):
        joined = mat.alias("m").join(
            p.alias("p"),
            (F.col("m.variant") == F.col("p.variant"))
            & (F.col("p.state") == F.col("m.t")),
            "left",
        )
        contrib = F.col("m.p_nano") * (
            F.when(F.col("m.t") == "conv", F.lit(g))
            .when(F.col("m.t") == "null", F.lit(0))
            .otherwise(F.coalesce(F.col("p.p"), F.lit(0)))
        )
        s = F.sum(contrib)
        p = (
            joined.groupBy(F.col("m.variant").alias("variant"), F.col("m.s").alias("state"))
            .agg(((s - s % g) / g).cast("bigint").alias("p"))
            .localCheckpoint()
        )
    start = p.filter(F.col("state") == "start")
    base = start.filter(F.col("variant") == "full").select(
        F.col("p").alias("p_full")
    )
    return start.crossJoin(F.broadcast(base)).select(
        F.col("variant").alias("channel_removed"),
        F.col("p").alias("p_conv_nano"),
        (F.lit(1.0) - F.col("p").cast("double") / F.col("p_full").cast("double")).alias(
            "removal_effect"
        ),
    )
