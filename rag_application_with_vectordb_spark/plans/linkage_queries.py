"""Record linkage / entity resolution: blocked fuzzy-name matching.

The reference has no fuzzy matching (its only similarity is vector
cosine, ``services/vectorDb.ts:27-49``); a data-curation pipeline needs
string-level entity resolution too — finding records that refer to the
same real-world entity despite name variations. The canonical shape is
blocking (cheap key that true matches share) → in-block candidate
pairs → expensive pairwise similarity (edit distance) on candidates
only. Never all-pairs: at 100 TB the block key is the shuffle key and
each task scores only its own block.

Determinism: ``levenshtein`` is exact integer edit distance and agrees
between Spark and DuckDB (verified on the fixture vocabulary); counts
are exact BIGINTs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import tune
from ..sources.catalog import load_table, register_views
from .registry import register


@register(
    "er_blocked_name_pairs",
    oracle="""
    WITH names AS (
      SELECT p_name, split_part(p_name, ' ', 2) AS block,
        CAST(COUNT(*) AS BIGINT) AS n_parts
      FROM part GROUP BY p_name
    )
    SELECT a.block, a.p_name AS name_a, b.p_name AS name_b,
      CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist,
      CAST(a.n_parts * b.n_parts AS BIGINT) AS n_record_pairs
    FROM names a JOIN names b
      ON a.block = b.block AND a.p_name < b.p_name
    """,
    doc="Entity resolution over part names, done in the scalable order: "
    "(1) canonicalize — collapse identical names first, so the "
    "quadratic stage runs on DISTINCT names, not records (2000 parts "
    "-> 64 names here; the n_record_pairs column carries the record "
    "multiplicity back); (2) block on the head noun — true variants "
    "share it, so candidate generation is an equi-join on the block "
    "key, never a cross join; (3) score only in-block candidate pairs "
    "with exact Levenshtein. At 100 TB the name-collapse is one "
    "groupBy, the self-join shuffles on the block key, and a hot block "
    "would be split by a secondary key (length band) — the all-pairs "
    "form never exists in the plan.",
    tags=("linkage", "dedup"),
)
def er_blocked_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    part = load_table(spark, sf_dir, "part")
    names = part.groupBy("p_name").agg(F.count("*").cast("bigint").alias("n_parts"))
    names = names.select(
        "p_name",
        F.split(F.col("p_name"), " ").getItem(1).alias("block"),
        "n_parts",
    )
    a = names.select(
        F.col("block"),
        F.col("p_name").alias("name_a"),
        F.col("n_parts").alias("n_a"),
    )
    b = names.select(
        F.col("block").alias("block_b"),
        F.col("p_name").alias("name_b"),
        F.col("n_parts").alias("n_b"),
    )
    pairs = a.join(
        b, (F.col("block") == F.col("block_b")) & (F.col("name_a") < F.col("name_b"))
    )
    return pairs.select(
        "block",
        "name_a",
        "name_b",
        F.levenshtein(F.col("name_a"), F.col("name_b")).cast("bigint").alias(
            "edit_dist"
        ),
        (F.col("n_a") * F.col("n_b")).cast("bigint").alias("n_record_pairs"),
    )


@register(
    "er_match_clusters",
    oracle="""
    WITH names AS (
      SELECT p_name, split_part(p_name, ' ', 2) AS block,
        CAST(COUNT(*) AS BIGINT) AS n_parts
      FROM part GROUP BY p_name
    ),
    edges AS (
      SELECT a.p_name AS na, b.p_name AS nb
      FROM names a JOIN names b
        ON a.block = b.block AND a.p_name < b.p_name
      WHERE levenshtein(a.p_name, b.p_name) <= 3
    ),
    -- min-label propagation to fixed point (block diameter is tiny:
    -- each unrolled step halves the remaining distance to the root)
    l0 AS (SELECT p_name, p_name AS root FROM names),
    l1 AS (
      SELECT l.p_name, MIN(m) AS root FROM (
        SELECT p_name, root AS m FROM l0
        UNION ALL SELECT e.nb AS p_name, l.root AS m FROM edges e JOIN l0 l ON l.p_name = e.na
        UNION ALL SELECT e.na AS p_name, l.root AS m FROM edges e JOIN l0 l ON l.p_name = e.nb
      ) l GROUP BY p_name
    ),
    l2 AS (
      SELECT l.p_name, MIN(m) AS root FROM (
        SELECT p_name, root AS m FROM l1
        UNION ALL SELECT e.nb AS p_name, l.root AS m FROM edges e JOIN l1 l ON l.p_name = e.na
        UNION ALL SELECT e.na AS p_name, l.root AS m FROM edges e JOIN l1 l ON l.p_name = e.nb
      ) l GROUP BY p_name
    ),
    l3 AS (
      SELECT l.p_name, MIN(m) AS root FROM (
        SELECT p_name, root AS m FROM l2
        UNION ALL SELECT e.nb AS p_name, l.root AS m FROM edges e JOIN l2 l ON l.p_name = e.na
        UNION ALL SELECT e.na AS p_name, l.root AS m FROM edges e JOIN l2 l ON l.p_name = e.nb
      ) l GROUP BY p_name
    )
    SELECT l3.root AS cluster_rep,
      CAST(COUNT(*) AS BIGINT) AS n_names,
      CAST(SUM(n.n_parts) AS BIGINT) AS n_records
    FROM l3 JOIN names n ON n.p_name = l3.p_name
    GROUP BY l3.root
    """,
    doc="Entity-match clusters: the blocked edit-distance pairs "
    "(edit_dist <= 3) become edges, and connected components via "
    "min-label propagation assign every name to a cluster whose "
    "representative is the lexicographically smallest member — the "
    "standard survivorship rule. Three propagation rounds suffice "
    "because a block holds at most 8 adjective variants (diameter <= "
    "3 after round 1); the Spark side runs the same fixed number of "
    "rounds, so both engines compute the identical fixed point. At "
    "100 TB each round is one groupBy-min on the name key — the "
    "classic iterative-CC-on-Spark shape, with rounds logarithmic in "
    "cluster diameter, not cluster size.",
    tags=("linkage", "dedup", "graph"),
)
def er_match_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    part = load_table(spark, sf_dir, "part")
    names = part.groupBy("p_name").agg(F.count("*").cast("bigint").alias("n_parts"))
    names = names.select(
        "p_name", F.split(F.col("p_name"), " ").getItem(1).alias("block"), "n_parts"
    )
    a = names.select(F.col("block"), F.col("p_name").alias("na"))
    b = names.select(F.col("block").alias("block_b"), F.col("p_name").alias("nb"))
    edges = (
        a.join(b, (F.col("block") == F.col("block_b")) & (F.col("na") < F.col("nb")))
        .filter(F.levenshtein(F.col("na"), F.col("nb")) <= 3)
        .select("na", "nb")
    )
    labels = names.select("p_name", F.col("p_name").alias("root"))
    for _ in range(3):
        via_a = edges.join(labels, labels["p_name"] == edges["na"]).select(
            F.col("nb").alias("p_name"), "root"
        )
        via_b = edges.join(labels, labels["p_name"] == edges["nb"]).select(
            F.col("na").alias("p_name"), "root"
        )
        labels = (
            labels.select("p_name", "root")
            .unionByName(via_a)
            .unionByName(via_b)
            .groupBy("p_name")
            .agg(F.min("root").alias("root"))
        )
    return (
        labels.join(names.select("p_name", "n_parts"), "p_name")
        .groupBy(F.col("root").alias("cluster_rep"))
        .agg(
            F.count("*").cast("bigint").alias("n_names"),
            F.sum("n_parts").cast("bigint").alias("n_records"),
        )
    )


# --- fuzzy string matching: character-trigram Jaccard against a probe list -----

_FUZZY_PROBES = (
    "cold widgit",   # transposition-ish typo of 'cold widget'
    "blu rod",       # too-short overlap: lands BELOW threshold (J=0.375)
    "large blot",    # scrambled 'bolt': right AT the boundary (J=5/11)
    "smal widget",   # dropped letter
    "xyzzy qux",     # garbage: must NOT match anything
)
_FUZZY_MIN_J = 0.45


def _fuzzy_sql(trigrams) -> str:
    probes = ", ".join(f"('{p}')" for p in _FUZZY_PROBES)
    return f"""
    WITH names AS (SELECT DISTINCT p_name AS name FROM part),
    nt AS (
      SELECT name, {trigrams('name')} AS tris FROM names
    ),
    probes (probe) AS (VALUES {probes}),
    pt AS (
      SELECT probe, {trigrams('probe')} AS tris FROM probes
    ),
    npost AS (SELECT name, {{unnest}} AS tri FROM nt),
    ppost AS (SELECT probe, {{unnest}} AS tri FROM pt),
    inter AS (
      SELECT p.probe, n.name, CAST(COUNT(*) AS BIGINT) AS i
      FROM ppost p JOIN npost n ON p.tri = n.tri
      GROUP BY p.probe, n.name
    ),
    sizes AS (
      SELECT i.probe, i.name, i.i,
             CAST({{psize}} AS BIGINT) AS pa, CAST({{nsize}} AS BIGINT) AS nb
      FROM inter i
      JOIN pt ON i.probe = pt.probe
      JOIN nt ON i.name = nt.name
    ),
    scored AS (
      SELECT probe, name, i AS shared_trigrams,
             CAST(i AS DOUBLE) / CAST(pa + nb - i AS DOUBLE) AS jaccard
      FROM sizes
    ),
    best AS (
      SELECT probe, name, shared_trigrams, jaccard,
             ROW_NUMBER() OVER (PARTITION BY probe
                                ORDER BY jaccard DESC, name ASC) AS rn
      FROM scored WHERE jaccard >= {_FUZZY_MIN_J}
    )
    SELECT probe, name AS matched_name, shared_trigrams, jaccard
    FROM best WHERE rn = 1
    ORDER BY probe ASC
    """


def _fuzzy_duck() -> str:
    tri = lambda c: (
        f"list_distinct(list_transform(range(1, greatest(length({c}) - 2, 1) + 1), "
        f"i -> substr({c}, CAST(i AS INTEGER), 3)))"
    )
    return (
        _fuzzy_sql(tri)
        .replace("{unnest}", "unnest(tris)")
        .replace("{psize}", "len(pt.tris)")
        .replace("{nsize}", "len(nt.tris)")
    )


def _fuzzy_spark() -> str:
    tri = lambda c: (
        f"array_distinct(transform(sequence(1, greatest(length({c}) - 2, 1)), "
        f"i -> substring({c}, i, 3)))"
    )
    return (
        _fuzzy_sql(tri)
        .replace("{unnest}", "explode(tris)")
        .replace("{psize}", "size(pt.tris)")
        .replace("{nsize}", "size(nt.tris)")
    )


@register(
    "er_fuzzy_trigram_match",
    oracle=_fuzzy_duck(),
    doc=f"Fuzzy string matching: each probe (typo'd product name) links "
    "to its best catalog name by character-trigram Jaccard >= "
    f"{_FUZZY_MIN_J} — the dirty-input lookup beside "
    "er_blocked_name_pairs' Levenshtein canonicalization (trigram "
    "blocking needs NO edit-distance scan: candidates come from an "
    "inverted-index equi-join on shared trigrams, so a probe never "
    "compares against names it shares nothing with — the PPJoin-family "
    "shape at the character level). Garbage probes fall below the "
    "threshold and return no row. Name relation collapses to DISTINCT "
    "first (bounded by the catalog's name domain); jaccard is one fp64 "
    "ratio of exact BIGINTs; best-match ties break on name ASC.",
    tags=("linkage", "text"),
)
def er_fuzzy_trigram_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    register_views(spark, sf_dir, ("part",))
    return spark.sql(_fuzzy_spark())


# --- SymSpell deletion-neighborhood fuzzy matching (max ED = 1) ------------------

_SYM_PROBE_N = 20


def _symspell_sql(del1, hexfn, str_t: str) -> str:
    """``del1(col)`` renders the engine's delete-one-char variant array;
    candidate keys are {x} UNION del1(x) on BOTH sides — for ED(a,b)<=1
    the key sets always intersect (equal -> x itself; substitution ->
    delete the differing position from both; indel -> the shorter IS a
    del1 of the longer), so candidate generation is LOSSLESS and the
    shared levenshtein() verification only confirms."""
    h = hexfn(f"md5(concat('sym42|', name))")
    return f"""
    WITH names AS (SELECT DISTINCT p_name AS name FROM part),
    sel AS (
      SELECT name, {h} AS hk,
             row_number() OVER (ORDER BY {h} ASC, name ASC) AS rn
      FROM names
    ),
    probes AS (
      SELECT concat(left(name, CAST(hk % length(name) AS INT)),
                    substring(name, CAST(hk % length(name) AS INT) + 2)) AS probe
      FROM sel WHERE rn <= {_SYM_PROBE_N}
      UNION ALL
      SELECT probe FROM (VALUES ('zzzz qux'), ('wwww corge')) AS g(probe)
    ),
    pkeys AS (
      SELECT probe, probe AS k FROM probes
      UNION
      SELECT probe, {{unnest_p}} AS k FROM (
        SELECT probe, {del1('probe')} AS dels FROM probes
      ) pd
    ),
    nkeys AS (
      SELECT name, name AS k FROM names
      UNION
      SELECT name, {{unnest_n}} AS k FROM (
        SELECT name, {del1('name')} AS dels FROM names
      ) nd
    ),
    cand AS (
      SELECT DISTINCT p.probe, n.name
      FROM pkeys p JOIN nkeys n ON p.k = n.k
    )
    SELECT probe, name AS matched_name,
           CAST(levenshtein(probe, name) AS BIGINT) AS edit_distance
    FROM cand
    WHERE levenshtein(probe, name) <= 1
    """


def _register_symspell():
    from .oracle_dialect import duck_hex13_to_long
    from .stats_queries import _spark_hex13

    spark_del1 = lambda c: (
        f"transform(sequence(1, length({c})), "
        f"i -> concat(left({c}, i - 1), substring({c}, i + 1)))"
    )
    duck_del1 = lambda c: (
        f"list_transform(range(1, length({c}) + 1), "
        f"i -> left({c}, CAST(i AS INTEGER) - 1) || substr({c}, CAST(i AS INTEGER) + 1))"
    )
    spark_sql = _symspell_sql(spark_del1, _spark_hex13, "STRING").replace(
        "{unnest_p}", "explode(dels)"
    ).replace("{unnest_n}", "explode(dels)")
    duck_sql = _symspell_sql(duck_del1, duck_hex13_to_long, "VARCHAR").replace(
        "{unnest_p}", "unnest(dels)"
    ).replace("{unnest_n}", "unnest(dels)")

    @register(
        "er_symspell_match",
        oracle=duck_sql,
        doc=f"SymSpell deletion-neighborhood fuzzy matching (Garbe's "
        "algorithm, max edit distance 1): probes are {_SYM_PROBE_N} "
        "deterministically typo'd catalog names (md5-chosen deletion "
        "position) plus two garbage strings; candidates come from an "
        "equi-join of {x} UNION delete-one-char(x) key sets — LOSSLESS "
        "for ED<=1 by the pigeonhole argument in the builder docstring, "
        "so unlike trigram-Jaccard blocking (er_fuzzy_trigram_match) "
        "no true match can be blocked away — and the shared "
        "levenshtein() verification only confirms. The key relation is "
        "|names| x (len+1) rows of short strings (the precomputed-"
        "dictionary trade SymSpell is famous for: ~13x postings buy "
        "an equi-join instead of an edit-distance scan); garbage "
        "probes fall out at verification. One shuffle on the key.",
        tags=("linkage", "text"),
    )
    def er_symspell_match(spark: SparkSession, sf_dir: str) -> DataFrame:
        tune(spark)
        register_views(spark, sf_dir, ("part",))
        return spark.sql(spark_sql)

    return er_symspell_match


_register_symspell()
