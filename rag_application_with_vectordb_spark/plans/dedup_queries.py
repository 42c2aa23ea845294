r"""Deduplication query catalog.

The fixture corpus is 500 distinct word-salad documents, so the dedup
demos run over an *augmented* corpus — the originals plus, for
``doc_id < 20``, an exact copy (id + 1e12) and a suffixed near-copy
(id + 2e12). The augmentation is plain relational algebra, expressed
identically on the Spark and DuckDB sides, so results stay
hash-checkable while actually exercising the duplicate-detection paths.

The offsets sit FAR beyond any plausible corpus id space: the original
+10000/+20000 offsets collided with real doc_ids at sf1.0 (50k docs),
planting two different texts under one id — violating the operators'
id-uniqueness precondition and silently breaking cross-engine parity
(caught by the full-catalog sf1.0 oracle sweep).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    duplicate_components,
    embedding_lsh_neardup_pairs,
    embedding_neardup_pairs,
    exact_dup_groups,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_blocked_pairs,
    simhash_signatures,
    simhash_pairs,
)
from ..operators.cc import twostar_components
from ..session import tune

#: Mechanical ceiling for the four EXACT inverted-index anchors
#: (dedup_ngram_jaccard, text_containment_pairs, both prefix-filter
#: forms): their docstrings state the scale regime — sub-quadratic only
#: on selective (Zipfian) vocabularies — and the r9 sf10 sweep showed
#: the low-entropy scale-up corpus wedging them for hours. The
#: operators now pre-estimate candidate volume (Σ df·(df−1)/2, one
#: linear aggregate) and refuse past this ceiling with an error naming
#: the scalable path (MinHash-LSH / max_df), instead of going silently
#: quadratic. 2e9 pairs ≈ minutes of join work — comfortably past every
#: in-regime fixture (sf1.0 is ~1.4e8) and far below the sf10
#: low-entropy blow-up (~5e9+).
MAX_EXACT_CANDIDATE_PAIRS = 2_000_000_000
from ..sources.catalog import load_table
from .oracle_dialect import duck_cosine, duck_fold_unit, duck_hex13_to_long
from .registry import QUERIES, register

_NEAR_SUFFIX = " spark engine near duplicate suffix"

#: Synthetic-copy id offsets — must never collide with real ids at ANY
#: corpus size a fixture or deployment could present.
_AUG_EXACT_OFF = 1_000_000_000_000
_AUG_NEAR_OFF = 2_000_000_000_000

_AUG_SQL = f"""
      SELECT doc_id, text FROM documents
      UNION ALL SELECT doc_id + {_AUG_EXACT_OFF} AS doc_id, text FROM documents WHERE doc_id < 20
      UNION ALL SELECT doc_id + {_AUG_NEAR_OFF} AS doc_id, text || '{_NEAR_SUFFIX}' AS text
                FROM documents WHERE doc_id < 20
"""

_SETS_SQL = rf"""
    aug AS ({_AUG_SQL}),
    sets AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(len(w) - 1, 1)),
                                          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingles
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM aug)
      WHERE len(w) >= 3
    )
"""

_JACCARD_SQL = rf"""
    WITH {_SETS_SQL},
    posting AS (SELECT doc_id, unnest(shingles) AS shingle FROM sets),
    sizes AS (SELECT doc_id, len(shingles) AS set_size FROM sets),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS intersection
      FROM posting a JOIN posting b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT doc_a, doc_b, intersection,
             CAST(sa.set_size AS BIGINT) AS size_a, CAST(sb.set_size AS BIGINT) AS size_b,
             CAST(intersection AS DOUBLE)
               / CAST(sa.set_size + sb.set_size - intersection AS DOUBLE) AS jaccard
      FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
    )
"""


#: per-(SparkContext, fixture) cache of the checkpointed 20-row planted
#: head. A localCheckpoint mints a FRESH RDD on every call, so an
#: un-memoized checkpoint gives every _augmented_docs invocation a
#: distinct logical plan — which silently defeats Spark's persisted-
#: relation cache lookup in everything derived from it (the bench's
#: warm passes of dedup_minhash_lsh_pairs went 3.7 s -> 31 s at sf10:
#: each pass re-shingled and re-persisted 520k signatures instead of
#: hitting the previous pass's cache). Memoizing restores a stable
#: lineage; entries are keyed by the context's applicationId — NOT
#: id(sparkContext) (ADVICE r9: CPython reuses object ids after GC, so
#: a restarted session could be handed a cached DataFrame whose
#: checkpointed RDDs belong to a dead context) — so a restarted session
#: (fresh applicationId, dead checkpoint RDDs) re-checkpoints instead
#: of reusing a corpse.
_AUG_HEAD_CACHE: dict[tuple[str, str], DataFrame] = {}


def _augmented_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # The planted-copy branches re-read documents per UNION arm, so every
    # reference to the augmented relation used to cost 3 scan nodes (1
    # corpus-sized + 2 id<20-pruned). Checkpointing the 20-row head makes
    # each reference exactly ONE corpus scan + two 20-row local reads —
    # catalog-wide, since every dedup/decontamination query derives from
    # this relation.
    key = (spark.sparkContext.applicationId, sf_dir)
    head = _AUG_HEAD_CACHE.get(key)
    if head is None:
        head = docs.filter(F.col("doc_id") < 20).localCheckpoint()
        _AUG_HEAD_CACHE[key] = head
    exact = head.select((F.col("doc_id") + _AUG_EXACT_OFF).alias("doc_id"), F.col("text"))
    near = head.select(
        (F.col("doc_id") + _AUG_NEAR_OFF).alias("doc_id"),
        F.concat(F.col("text"), F.lit(_NEAR_SUFFIX)).alias("text"),
    )
    return docs.unionByName(exact).unionByName(near)


@register(
    "dedup_exact",
    oracle=rf"""
    WITH aug AS ({_AUG_SQL}),
    fp AS (SELECT doc_id, md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fingerprint FROM aug),
    g AS (SELECT fingerprint, count(*) AS group_size, min(doc_id) AS canonical_id FROM fp GROUP BY fingerprint)
    SELECT doc_id, fp.fingerprint, group_size, doc_id = canonical_id AS is_canonical
    FROM fp JOIN g USING (fingerprint)
    """,
    doc="Exact dedup: md5 fingerprint hash-groupBy; canonical = min id. "
    "One shuffle on a 32-byte key — the cheapest possible dedup at scale.",
    tags=("dedup",),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return exact_dup_groups(_augmented_docs(spark, sf_dir))


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    {_JACCARD_SQL}
    SELECT * FROM pairs
    WHERE jaccard >= 0.4
    """,
    doc="Exact n-gram Jaccard near-dup pairs via inverted-index join "
    "(shared-shingle candidates only — never an all-pairs cross join). "
    "SCALE REGIME (measured, round 8): sub-quadratic only while shared "
    "shingles are selective (Zipfian vocabularies — i.e. real text). "
    "On a low-entropy corpus every posting list is dense and the pair "
    "expansion is effectively all-pairs: the sf10 synthetic fixture "
    "(40-word vocabulary, df ≈ 1700 per shingle) OOMs this anchor AND "
    "its prefix-filtered variant. This query is the exact ANCHOR; the "
    "production paths are dedup_minhash_lsh_pairs (sf10-green — band "
    "keys hash whole signatures, so only similar docs collide) and "
    "ngram_jaccard_pairs(max_df=...) (stopword-shingle guard: capped "
    "candidate generation + full-set verification, values stay exact; "
    "pytest-proven in test_dedup_text.py). The regime is now ENFORCED "
    "mechanically: the operator pre-estimates Σ df·(df−1)/2 and "
    "refuses past MAX_EXACT_CANDIDATE_PAIRS with an error naming the "
    "scalable path (sf10: trips in seconds at est 4.0e9 instead of "
    "wedging for hours).",
    tags=("dedup",),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    pairs = ngram_jaccard_pairs(
        _augmented_docs(spark, sf_dir),
        min_jaccard=0.4,
        max_candidate_pairs=MAX_EXACT_CANDIDATE_PAIRS,
    )
    return pairs.select(
        "doc_a",
        "doc_b",
        "intersection",
        F.col("size_a").cast("bigint").alias("size_a"),
        F.col("size_b").cast("bigint").alias("size_b"),
        "jaccard",
    )


@register(
    "dedup_minhash_signatures",
    oracle=f"""
    WITH {_SETS_SQL}
    SELECT doc_id, CAST(j AS INTEGER) AS hash_idx, min(md5(j || '|' || s)) AS minhash
    FROM sets,
         LATERAL (SELECT unnest(shingles)) u(s),
         LATERAL (SELECT unnest(range(0, 12))) t(j)
    GROUP BY doc_id, j
    """,
    doc="MinHash signatures (12 hashes) via min-over-md5 — the permutation "
    "family is plain md5('j|shingle'), identical in DuckDB, so signature "
    "values themselves are hash-checked.",
    tags=("dedup",),
)
def dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    sigs = minhash_signatures(_augmented_docs(spark, sf_dir), num_hashes=12)
    return sigs.select(
        "doc_id", F.posexplode("signature").alias("hash_idx", "minhash")
    )


@register(
    "dedup_minhash_lsh_pairs",
    oracle=f"""
    {_JACCARD_SQL},
    sig AS (
      SELECT doc_id, j, min(md5(j || '|' || s)) AS minhash
      FROM sets,
           LATERAL (SELECT unnest(shingles)) u(s),
           LATERAL (SELECT unnest(range(0, 12))) t(j)
      GROUP BY doc_id, j
    ),
    bands AS (
      SELECT doc_id, CAST(j // 3 AS INTEGER) AS band_idx,
             md5(string_agg(minhash, ',' ORDER BY j)) AS band_key
      FROM sig GROUP BY doc_id, j // 3
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    )
    SELECT p.* FROM pairs p JOIN cand USING (doc_a, doc_b)
    WHERE p.jaccard >= 0.2
    """,
    doc="MinHash-LSH: 4 bands × 3 rows → bucket join for candidates → "
    "exact-Jaccard verification. The 100 TB dedup workhorse: cost is "
    "O(docs × hashes) plus a bounded bucket shuffle.",
    tags=("dedup",),
)
def dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    pairs = minhash_lsh_pairs(
        _augmented_docs(spark, sf_dir), num_hashes=12, bands=4, min_jaccard=0.2
    )
    return pairs.select(
        "doc_a",
        "doc_b",
        "intersection",
        F.col("size_a").cast("bigint").alias("size_a"),
        F.col("size_b").cast("bigint").alias("size_b"),
        "jaccard",
    )


def _simhash_oracle(bits: int = 32) -> str:
    h = duck_hex13_to_long("md5(word)")
    bit_sums = ",\n      ".join(
        f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS b{j}" for j in range(bits)
    )
    recompose = " + ".join(f"(CASE WHEN b{j} > 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END)" for j in range(bits))
    return rf"""
    WITH aug AS ({_AUG_SQL}),
    toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS word FROM aug
    ),
    hashed AS (SELECT doc_id, {h} AS h FROM toks),
    bitsum AS (
      SELECT doc_id,
      {bit_sums}
      FROM hashed GROUP BY doc_id
    )
    SELECT doc_id, {recompose} AS simhash FROM bitsum
    """


@register(
    "dedup_simhash_signatures",
    oracle=_simhash_oracle(32),
    doc="32-bit SimHash signatures: token md5 bits, ±1 vote per bit, sign "
    "→ bit. Integer votes → partitioning-independent, fully "
    "oracle-checkable.",
    tags=("dedup",),
)
def dedup_simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return simhash_signatures(_augmented_docs(spark, sf_dir))


@register(
    "dedup_simhash_pairs",
    oracle=f"""
    WITH sigs AS ({_simhash_oracle(32)})
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
    doc="CANONICAL SimHash near-dup pairs over the FULL corpus via "
    "pigeonhole bit-chunk blocking (4 chunks of 8 bits → Hamming ≤ 3 "
    "pairs must share a chunk): candidates come from an equi-join on "
    "(chunk index, chunk value), never all-pairs. The oracle is the "
    "brute-force all-pairs form — hash-matching it proves the blocking "
    "is lossless. (Round 1 shipped this name as a 100-doc all-pairs "
    "slice; that form survives as dedup_simhash_allpairs_anchor.)",
    tags=("dedup",),
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    pairs = simhash_blocked_pairs(_augmented_docs(spark, sf_dir), max_hamming=3)
    return pairs.select("doc_a", "doc_b", F.col("hamming").cast("bigint").alias("hamming"))


@register(
    "dedup_simhash_allpairs_anchor",
    oracle=f"""
    WITH sigs_all AS ({_simhash_oracle(32)}),
    sigs AS (SELECT * FROM sigs_all WHERE doc_id % {_AUG_EXACT_OFF} < 100)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
    """,
    doc="BOUNDED ORACLE ANCHOR, not a scale path: brute-force all-pairs "
    "SimHash Hamming ≤ 6 over an explicit 100-doc sub-corpus slice "
    "(doc_id % 1e12 < 100). Exists to exercise the quadratic "
    "simhash_pairs operator against an independent oracle at a size "
    "where O(n²) is harmless; the full-corpus pairs query is "
    "dedup_simhash_pairs (pigeonhole-blocked, sub-quadratic).",
    tags=("dedup", "anchor"),
)
def dedup_simhash_allpairs_anchor(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    docs = _augmented_docs(spark, sf_dir).filter(F.col("doc_id") % _AUG_EXACT_OFF < 100)
    pairs = simhash_pairs(docs, max_hamming=6)
    return pairs.select("doc_a", "doc_b", F.col("hamming").cast("bigint").alias("hamming"))


@register(
    "dedup_embedding_topk_pairs",
    oracle=f"""
    WITH sub AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 300)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {duck_cosine('a.embedding', 'b.embedding')} AS cosine
    FROM sub a JOIN sub b ON a.vec_id < b.vec_id
    ORDER BY cosine DESC, id_a ASC, id_b ASC
    LIMIT 50
    """,
    doc="Embedding-cosine near-dup: exact all-pairs top-50 (oracle anchor; "
    "the sub-quadratic path is LSH bucketing in operators.ann).",
    tags=("dedup", "ann"),
)
def dedup_embedding_topk_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    return embedding_neardup_pairs(emb, top_pairs=50)


_NEARDUP_PLANES = 6
_NEARDUP_BUCKET_TARGET = 256
_NEARDUP_MIN_COS = 0.2


@register(
    "dedup_embedding_lsh_pairs",
    oracle=f"""
    WITH np AS (
      SELECT GREATEST({_NEARDUP_PLANES},
                      CAST(CEIL(LOG2(COUNT(*) / {_NEARDUP_BUCKET_TARGET}.0)) AS BIGINT)) AS n
      FROM embeddings
    ),
    planes AS (
      SELECT CAST(t.p AS INTEGER) AS p,
             list_transform(range(0, 64),
                            j -> {duck_fold_unit("'plane|' || t.p || '|' || j")}) AS pv
      FROM (SELECT unnest(range(0, (SELECT n FROM np)))) t(p)
    ),
    b AS (
      SELECT s.vec_id, s.embedding,
             CAST(SUM(CASE WHEN list_dot_product(s.embedding::DOUBLE[], pl.pv) >= 0.0
                           THEN 2.0 ** pl.p ELSE 0.0 END) AS BIGINT) AS bucket
      FROM embeddings s CROSS JOIN planes pl
      GROUP BY s.vec_id, s.embedding
    )
    SELECT a.vec_id AS id_a, bb.vec_id AS id_b,
           {duck_cosine('a.embedding', 'bb.embedding')} AS cosine
    FROM b a JOIN b bb ON a.bucket = bb.bucket AND a.vec_id < bb.vec_id
    WHERE {duck_cosine('a.embedding', 'bb.embedding')} >= {_NEARDUP_MIN_COS}
    """,
    doc="Embedding near-dup at scale: hyperplane-LSH blocking, then "
    "within-bucket cosine ≥ 0.2 — the sub-quadratic production form of "
    "dedup_embedding_topk_pairs (which stays as the exact all-pairs "
    "oracle anchor). Plane count is SF-ADAPTIVE: max(6, "
    "ceil(log2(N/256))) keeps buckets near the 256-member target, so "
    "pair cost stays ~N*target instead of N^2/2^6 (the r9 sf10 sweep "
    "timed out the fixed-6-plane form: 200k vectors in 64 buckets is "
    "6e8 within-bucket cosines). Identical arithmetic on both engines "
    "(scalar subquery in the oracle; boundary caveat: N an exact power "
    "of 2 times the target could round differently in fp log2 — no "
    "fixture hits one). One shuffle on the bucket key; deterministic "
    "md5-fold planes make even the blocked candidate set "
    "value-checkable cross-engine.",
    tags=("dedup", "ann"),
)
def dedup_embedding_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    n_planes = max(
        _NEARDUP_PLANES, math.ceil(math.log2(emb.count() / _NEARDUP_BUCKET_TARGET))
    )
    return embedding_lsh_neardup_pairs(
        emb, n_planes=n_planes, min_cosine=_NEARDUP_MIN_COS
    )


@register(
    "dedup_components",
    oracle=_JACCARD_SQL.replace("WITH ", "WITH RECURSIVE ", 1)
    + r""",
    sig AS (
      SELECT doc_id, j, min(md5(j || '|' || s)) AS minhash
      FROM sets,
           LATERAL (SELECT unnest(shingles)) u(s),
           LATERAL (SELECT unnest(range(0, 12))) t(j)
      GROUP BY doc_id, j
    ),
    bands AS (
      SELECT doc_id, CAST(j // 3 AS INTEGER) AS band_idx,
             md5(string_agg(minhash, ',' ORDER BY j)) AS band_key
      FROM sig GROUP BY doc_id, j // 3
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    ),
    near AS (
      SELECT p.doc_a, p.doc_b FROM pairs p JOIN cand USING (doc_a, doc_b)
      WHERE p.jaccard >= 0.4
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM near
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM near
    ),
    nodes AS (SELECT doc_id FROM aug),
    reach(a, b) AS (
      SELECT doc_id, doc_id FROM nodes
      UNION
      SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
    ),
    comp AS (SELECT a AS doc_id, min(b) AS component_id FROM reach GROUP BY a),
    csizes AS (SELECT component_id, count(*) AS component_size FROM comp GROUP BY 1)
    SELECT c.doc_id, CAST(c.component_id AS BIGINT) AS component_id,
           CAST(s.component_size AS BIGINT) AS component_size,
           CAST(CASE WHEN c.doc_id = c.component_id THEN 1 ELSE 0 END AS BIGINT) AS is_canonical
    FROM comp c JOIN csizes s USING (component_id)
    """,
    doc="Duplicate-cluster assignment: connected components over the "
    "near-dup pair graph (operators/dedup.py duplicate_components — "
    "iterative min-label propagation, one equi-join + agg per round, "
    "rounds = component diameter). Turns pairwise matches into the "
    "actual dedup decision: cluster id, cluster size, and the one "
    "canonical row to keep. The pair graph is MinHash-LSH candidates "
    "(the audited 12x4x3 convention, mirrored in the oracle) verified "
    "at exact Jaccard >= 0.4 — the r9 sf10 sweep wedged the previous "
    "exact inverted-index pair join on the low-entropy scale-up corpus "
    "(Sum(df^2) candidates, the curation_funnel r8 lesson). LSH recall "
    "at the 4x3 S-curve: ~23% for a pair at exactly 0.4, ~97% at 0.75, "
    ">99.9% for the planted copies (>= 0.9) — both engines mirror the "
    "candidate set, and the components the dedup decision exists for "
    "(actual duplicate clusters) sit on the high-recall end. Oracle is "
    "a DuckDB recursive-CTE transitive closure over the same graph.",
    tags=("dedup", "iterative"),
)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    aug = _augmented_docs(spark, sf_dir)
    pairs = minhash_lsh_pairs(aug, num_hashes=12, bands=4, min_jaccard=0.4)
    return duplicate_components(aug.select("doc_id"), pairs)

@register(
    "text_containment_pairs",
    oracle=f"""
    {_JACCARD_SQL}
    SELECT doc_a, doc_b, intersection, size_a, size_b,
           CAST(intersection AS DOUBLE) / CAST(size_a AS DOUBLE) AS containment_a,
           CAST(intersection AS DOUBLE) / CAST(size_b AS DOUBLE) AS containment_b
    FROM pairs
    WHERE greatest(CAST(intersection AS DOUBLE) / CAST(size_a AS DOUBLE),
                   CAST(intersection AS DOUBLE) / CAST(size_b AS DOUBLE)) >= 0.5
    """,
    doc="Containment C(A,B)=|A∩B|/|A| over shared-shingle posting "
    "candidates — the asymmetric dedup signal: a short doc embedded in "
    "a longer one (quote/concat/boilerplate) hits containment ~1 while "
    "Jaccard shrinks with the length gap. Candidates deliberately come "
    "from the shingle posting join, not MinHash bands: band collision "
    "probability tracks JACCARD, so banded candidates miss exactly the "
    "subset pairs containment exists to catch (test-pinned). Posting "
    "fanout is bounded per shingle; hot shingles are frequency-capped "
    "at scale.",
    tags=("dedup", "text"),
)
def text_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import containment_pairs

    tune(spark)
    pairs = containment_pairs(
        _augmented_docs(spark, sf_dir),
        min_containment=0.5,
        max_candidate_pairs=MAX_EXACT_CANDIDATE_PAIRS,
    )
    return pairs.select(
        "doc_a",
        "doc_b",
        "intersection",
        F.col("size_a").cast("bigint").alias("size_a"),
        F.col("size_b").cast("bigint").alias("size_b"),
        "containment_a",
        "containment_b",
    )


# --- semantic dedup (SemDeDup): cluster-bounded embedding near-dup drop -------

_SD_TAU = 0.98
_SD_NOISE = 0.02
_SD_K, _SD_ITERS, _SD_DIM = 8, 2, 64
_SD_SCALE = 1 << 20


def _sd_aug_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..embedder import hash_embedding_expr
    from ..functions.vector import as_double

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    noise = hash_embedding_expr(F.col("vec_id").cast("string"), _SD_DIM, "sd42")
    # Two selects: computing the noise in the same projection that
    # re-aliases vec_id would resolve the hash key against the SHIFTED
    # id (sibling-alias shadowing) — the oracle keys noise by source id.
    near = (
        emb.filter(F.col("vec_id") < 20)
        .select(
            "vec_id",
            F.zip_with(
                as_double(F.col("embedding")), noise, lambda a, b: a + F.lit(_SD_NOISE) * b
            ).alias("embedding"),
        )
        .select((F.col("vec_id") + _AUG_EXACT_OFF).alias("vec_id"), "embedding")
    )
    return emb.select("vec_id", as_double(F.col("embedding")).alias("embedding")).unionByName(near)


_SD_NOISE_FOLD = duck_fold_unit("'sd42|' || j || '|' || CAST(vec_id AS VARCHAR)")

_SD_AUG_SQL = f"""aug AS MATERIALIZED (
      SELECT vec_id, embedding::DOUBLE[] AS embedding FROM embeddings
      UNION ALL
      SELECT vec_id + {_AUG_EXACT_OFF} AS vec_id,
             list_transform(range(0, {_SD_DIM}), j ->
               CAST(embedding[CAST(j AS INTEGER) + 1] AS DOUBLE)
               + CAST({_SD_NOISE} AS DOUBLE) * {_SD_NOISE_FOLD}) AS embedding
      FROM embeddings WHERE vec_id < 20
    )"""


@register(
    "dedup_semantic_semdedup",
    oracle=None,  # assembled below — needs the kmeans generator from ann_queries
    doc="Semantic dedup (SemDeDup, Abbas et al. 2023): cluster the "
    "embedding space with the trained spherical quantizer, then drop "
    "any vector whose cosine to a LOWER-id vector in the SAME cluster "
    "exceeds 0.98 (output: dropped id, the smallest qualifying keeper, "
    "their cosine). The cluster assignment bounds the quadratic: "
    "pairwise cosine runs within clusters only — SemDeDup's own "
    "complexity contract — and the CLUSTER COUNT is SF-adaptive, "
    "k = max(8, floor(sqrt(N))) (identical on both engines: scalar "
    "subquery in the oracle's LIMIT), so within-cluster pair cost "
    "stays ~N*sqrt(N) instead of N^2/8 (the r9 sf10 sweep timed out "
    "the fixed-k form on 200k vectors). Augmentation plants 20 "
    "hash-perturbed near-copies "
    "(cosine ~0.9988) so the drop set is non-vacuous on the "
    "near-uniform fixture; training, assignment, pairwise cosines, and "
    "the keep-lowest-id rule are all value-checked in DuckDB.",
    tags=("dedup", "ann"),
)
def dedup_semantic_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.ann import ivf_assign
    from ..operators.kmeans import kmeans_fit_spherical_fp_values

    tune(spark)
    aug = _sd_aug_spark(spark, sf_dir).persist()
    k = max(_SD_K, math.isqrt(aug.count()))
    cents = kmeans_fit_spherical_fp_values(
        aug, k=k, iterations=_SD_ITERS, scale=_SD_SCALE
    )
    cents_df = spark.createDataFrame(
        [(cid, cvec) for cid, cvec in cents], "centroid_id int, cvec array<double>"
    )
    # prenormed pair scoring: one fold per within-cluster pair instead
    # of three (norms computed once per side; identical fp64 values —
    # the knn_graph_edges precedent), and the projection keeps the pair
    # relation slim past the join
    from ..functions.vector import as_double, cosine_sim_prenormed, l2_norm

    normed = ivf_assign(aug, cents_df).select(
        "vec_id",
        "centroid_id",
        as_double(F.col("embedding")).alias("__v"),
    ).withColumn("__n", l2_norm(F.col("__v")))
    a = normed.select(
        F.col("vec_id").alias("kept_id"),
        F.col("__v").alias("__va"),
        F.col("__n").alias("__na"),
        "centroid_id",
    )
    b = normed.select(
        F.col("vec_id").alias("dropped_id"),
        F.col("__v").alias("__vb"),
        F.col("__n").alias("__nb"),
        "centroid_id",
    )
    pairs = (
        a.join(b, "centroid_id")
        .filter(F.col("kept_id") < F.col("dropped_id"))
        .select(
            "dropped_id",
            "kept_id",
            cosine_sim_prenormed(
                F.col("__va"), F.col("__na"), F.col("__vb"), F.col("__nb")
            ).alias("similarity"),
        )
        .filter(F.col("similarity") >= _SD_TAU)
    )
    w = Window.partitionBy("dropped_id").orderBy(F.asc("kept_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("dropped_id", "kept_id", "similarity")
    )


def _sd_oracle() -> str:
    from .ann_queries import _kmeans_fp_sql_g

    k_sql = (
        f"(SELECT GREATEST({_SD_K}, CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT)) FROM aug)"
    )
    return f"""
    WITH {_SD_AUG_SQL},
    {_kmeans_fp_sql_g("sd", "aug", k_sql, _SD_ITERS, _SD_DIM, _SD_SCALE)},
    cent AS MATERIALIZED (SELECT centroid_id, cvec FROM sdcent{_SD_ITERS}),
    assign AS MATERIALIZED (
      SELECT vec_id, embedding, centroid_id FROM (
        SELECT e.vec_id, e.embedding, c.centroid_id,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {duck_cosine('e.embedding', 'c.cvec')} DESC, c.centroid_id) AS rn
        FROM aug e CROSS JOIN cent c
      ) WHERE rn = 1
    ),
    pairs AS (
      SELECT b.vec_id AS dropped_id, a.vec_id AS kept_id,
             {duck_cosine('a.embedding', 'b.embedding')} AS similarity
      FROM assign a JOIN assign b
        ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
      WHERE {duck_cosine('a.embedding', 'b.embedding')} >= {_SD_TAU}
    )
    SELECT dropped_id, kept_id, similarity FROM (
      SELECT *, row_number() OVER (PARTITION BY dropped_id ORDER BY kept_id) AS rn
      FROM pairs
    ) WHERE rn = 1
    """


QUERIES["dedup_semantic_semdedup"].oracle = _sd_oracle()


# --- substring-span dedup: per-doc duplicated n-gram coverage -----------------

_SPAN_N = 8

_SPAN_GRAM = " || ' ' || ".join(f"w[i+{t}]" for t in range(_SPAN_N))


@register(
    "dedup_substring_spans",
    oracle=rf"""
    WITH aug AS ({_AUG_SQL}),
    toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM aug
    ),
    pos AS (
      SELECT doc_id, CAST(i AS BIGINT) AS pos, md5({_SPAN_GRAM}) AS sh
      FROM toks,
           LATERAL (SELECT unnest(range(1, greatest(len(w) - {_SPAN_N - 2}, 1)))) u(i)
    ),
    dup AS (SELECT sh FROM pos GROUP BY sh HAVING COUNT(DISTINCT doc_id) >= 2),
    dpos AS (SELECT p.doc_id, p.pos FROM pos p JOIN dup USING (sh)),
    cov AS (
      SELECT doc_id, pos,
             max(pos + {_SPAN_N}) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
      FROM dpos
    ),
    perdoc AS (
      SELECT doc_id,
             SUM(GREATEST(0, pos + {_SPAN_N} - GREATEST(pos, COALESCE(prev_end, 0)))) AS dup_tokens
      FROM cov GROUP BY doc_id
    )
    SELECT t.doc_id, CAST(len(t.w) AS BIGINT) AS n_tokens,
           CAST(COALESCE(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
           CAST(COALESCE(p.dup_tokens, 0) AS DOUBLE) / len(t.w) AS dup_fraction
    FROM toks t LEFT JOIN perdoc p USING (doc_id)
    """,
    doc="Substring-level dedup monitor (Lee et al. 2022, word-8-gram "
    "approximation): per document, the fraction of tokens covered by "
    "8-gram spans that also occur in another document — overlapping "
    "spans unioned once via the gaps-and-islands window. On the "
    "augmented corpus the 40 copy/near-copy docs (and their originals) "
    "show dup_fraction ~1.0 while untouched word-salad docs sit at 0 — "
    "the per-doc statistic a pipeline thresholds to trim or drop "
    "duplicated training text. Unlike the suffix-array original this "
    "needs no global sort: n-grams shuffle as md5 keys, duplication is "
    "one hash groupBy, coverage is one per-doc window.",
    tags=("dedup", "text"),
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import duplicated_span_coverage

    tune(spark)
    return duplicated_span_coverage(
        _augmented_docs(spark, sf_dir), n=_SPAN_N
    )


# --- prefix-filtered set-similarity join (All-Pairs / PPJoin) -----------------

_PF_T = 0.5
#: The scalable variant runs at a lower threshold — longer prefixes,
#: more candidates — so its driver row exercises a different (harder)
#: slice of the pruning arithmetic than the r5-green global-ordinal row.
_PF_T_SCALABLE = 0.4


def _pf_oracle(t: float) -> str:
    """Prefix-filter oracle at threshold ``t`` — shared by the
    global-ordinal and per-doc-ordinal registrations (the SQL keeps the
    literal global ordinal: the scalable Spark plan must produce the
    identical pairs, which is exactly the claim under test)."""
    return rf"""
    WITH {_SETS_SQL},
    posting AS (SELECT doc_id, unnest(shingles) AS shingle FROM sets),
    sizes AS (SELECT doc_id, len(shingles) AS set_size FROM sets),
    freq AS (SELECT shingle, COUNT(*) AS df FROM posting GROUP BY shingle),
    ordered AS (
      SELECT shingle, row_number() OVER (ORDER BY df ASC, shingle ASC) AS ordl
      FROM freq
    ),
    ranked AS (
      SELECT p.doc_id, p.shingle, s.set_size,
             row_number() OVER (PARTITION BY p.doc_id ORDER BY o.ordl ASC) AS rn
      FROM posting p JOIN ordered o USING (shingle) JOIN sizes s USING (doc_id)
    ),
    pref AS (
      SELECT doc_id, shingle FROM ranked
      WHERE rn <= set_size - CAST(CEILING({t} * set_size) AS BIGINT) + 1
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM pref a JOIN pref b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    ),
    v AS (
      SELECT c.doc_a, c.doc_b,
             CAST(len(list_intersect(sa.shingles, sb.shingles)) AS BIGINT) AS intersection,
             CAST(len(sa.shingles) AS BIGINT) AS size_a,
             CAST(len(sb.shingles) AS BIGINT) AS size_b
      FROM cand c
      JOIN sets sa ON sa.doc_id = c.doc_a
      JOIN sets sb ON sb.doc_id = c.doc_b
    )
    SELECT doc_a, doc_b, intersection, size_a, size_b,
           CAST(intersection AS DOUBLE)
             / CAST(size_a + size_b - intersection AS DOUBLE) AS jaccard
    FROM v
    WHERE CAST(intersection AS DOUBLE)
            / CAST(size_a + size_b - intersection AS DOUBLE) >= {t}
    """


@register(
    "dedup_prefix_filter_pairs",
    oracle=_pf_oracle(_PF_T),
    doc="Exact set-similarity self-join at Jaccard >= 0.5 with PREFIX "
    "FILTERING (All-Pairs/PPJoin, Bayardo WWW'07): tokens globally "
    "ordered rarest-first, each doc indexes only its |S|-ceil(t|S|)+1 "
    "prefix, and a >= t pair MUST collide inside both prefixes — so the "
    "inverted-index join runs over the short, rare-token lists and "
    "stays provably lossless (pytest asserts set-equality against the "
    "unpruned posting join at the same threshold). The exact-but-pruned "
    "middle ground between dedup_ngram_jaccard (anchor) and "
    "MinHash-LSH (probabilistic); at 100 TB the prefix cut is what "
    "makes an exact verify pass affordable. Caveat (measured, round "
    "8): the cut relies on RARE tokens existing — on a low-entropy "
    "corpus (sf10 synthetic, 40-word vocabulary) prefix postings are "
    "as dense as full ones and this OOMs like the anchor; that regime "
    "belongs to MinHash-LSH or the max_df candidate guard (see "
    "dedup_ngram_jaccard's doc).",
    tags=("dedup", "text"),
)
def dedup_prefix_filter_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import prefix_filter_jaccard_pairs

    tune(spark)
    return prefix_filter_jaccard_pairs(
        _augmented_docs(spark, sf_dir),
        threshold=_PF_T,
        max_candidate_pairs=MAX_EXACT_CANDIDATE_PAIRS,
    )


@register(
    "dedup_prefix_filter_pairs_keyed",
    oracle=_pf_oracle(_PF_T_SCALABLE),
    doc="The prefix-filter join's KEYED-ORDINAL formulation (VERDICT r5 "
    "item 5; renamed from _scalable per VERDICT r9 item 2 — a name "
    "claiming 'scalable' must finish the sf10 sweep, and no exact "
    "prefix-filter can on a 40-word-vocabulary corpus): identical "
    "All-Pairs/PPJoin semantics, but the vocabulary-wide "
    "single-partition row_number ordinal is GONE — each document ranks "
    "its own postings directly by the joined (df, shingle) key inside "
    "the per-doc window (the same total order, ties impossible, so "
    "prefixes and pairs are bit-identical; pytest asserts set-equality "
    "between the two plans and that no unpartitioned Window remains). "
    "The oracle keeps the literal global ordinal — matching it is "
    "exactly the equivalence claim. Runs at t=0.4 (longer prefixes, "
    "more candidates) so this row exercises a harder pruning slice "
    "than the t=0.5 global-ordinal row. KEYED means the PLAN shape "
    "(every window partitioned by doc_id, no single-partition stage) — "
    "the prefix CUT itself still needs rare tokens, so on the "
    "low-entropy scale-up corpus the candidate volume degenerates to "
    "all-pairs exactly like the anchor (r9 sf10 sweep: disk-full; "
    "same caveat as dedup_prefix_filter_pairs — that regime belongs "
    "to MinHash-LSH, and is enforced by the candidate-volume "
    "guard: out-of-regime corpora fail fast with the alternative "
    "named instead of wedging). No max_df cap is offered here on "
    "purpose: with no rare tokens, any cap that cuts candidate volume "
    "cuts essentially ALL candidates — the 'capped' query would go "
    "green at sf10 by returning ~zero pairs, which is worse than an "
    "honest fast refusal.",
    tags=("dedup", "text"),
)
def dedup_prefix_filter_pairs_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import prefix_filter_jaccard_pairs

    tune(spark)
    return prefix_filter_jaccard_pairs(
        _augmented_docs(spark, sf_dir),
        threshold=_PF_T_SCALABLE,
        vocab_ordinal="per-doc",
        max_candidate_pairs=MAX_EXACT_CANDIDATE_PAIRS,
    )


# --- band candidates via the PER-ROW signature path (streaming gate twin) -----


@register(
    "dedup_band_candidates",
    oracle=f"""
    WITH {_SETS_SQL},
    sig AS (
      SELECT doc_id, j, min(md5(j || '|' || s)) AS minhash
      FROM sets,
           LATERAL (SELECT unnest(shingles)) u(s),
           LATERAL (SELECT unnest(range(0, 12))) t(j)
      GROUP BY doc_id, j
    ),
    bands AS (
      SELECT doc_id, CAST(j // 3 AS INTEGER) AS band_idx,
             md5(string_agg(minhash, ',' ORDER BY j)) AS band_key
      FROM sig GROUP BY doc_id, j // 3
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    """,
    doc="LSH band-collision candidate pairs computed through the PER-ROW "
    "signature path (minhash_signature_expr: min-over-HOF inside one "
    "projection, no explode, no aggregate) — the exact computation the "
    "STREAMING near-dup gate (neardup_candidates_stream) runs per "
    "micro-batch, registered as its batch twin so the streaming "
    "operator is transitively oracle-checked the same way the window "
    "aggregates are (streaming_twins pattern). The oracle is the "
    "explode+group construction — hash-equality here also re-proves "
    "the two signature paths bit-identical at the query level.",
    tags=("dedup", "streaming-twin"),
)
def dedup_band_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import word_shingles
    from ..operators.dedup import minhash_band_keys, minhash_signature_expr

    tune(spark)
    docs = _augmented_docs(spark, sf_dir)
    sig = minhash_signature_expr(word_shingles(F.col("text"), 3), 12)
    keyed = (
        docs.filter(F.size(word_shingles(F.col("text"), 3)) > 0)
        .select(F.col("doc_id"), sig.alias("signature"))
        .select(
            "doc_id",
            F.posexplode(minhash_band_keys(F.col("signature"), 4, 3)).alias(
                "band_idx", "band_key"
            ),
        )
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


# --- benchmark decontamination (train/eval n-gram overlap) --------------------

_DECON_N = 8


def _decon_grams_sql(pred: str, distinct: bool = False) -> str:
    """Word 8-gram md5 positions for docs matching ``pred`` (DuckDB)."""
    g = " || ' ' || ".join(f"w[CAST(i + {t} AS INTEGER)]" for t in range(_DECON_N))
    sel = "DISTINCT doc_id, sh" if False else ("DISTINCT sh" if distinct else "doc_id, sh")
    return f"""(
      SELECT {sel} FROM (
        SELECT doc_id, md5({g}) AS sh
        FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
              FROM aug WHERE {pred}) tw,
             LATERAL (SELECT unnest(range(1, greatest(len(w) - {_DECON_N - 2}, 1)))) s(i)
        WHERE len(w) >= {_DECON_N}
      )
    )"""


@register(
    "decontaminate_train_docs",
    oracle=rf"""
    WITH aug AS ({_AUG_SQL}),
    tg AS (SELECT * FROM {_decon_grams_sql(f"doc_id < {_AUG_EXACT_OFF}")}),
    eg AS (SELECT * FROM {_decon_grams_sql(f"doc_id >= {_AUG_EXACT_OFF}", distinct=True)}),
    counts AS (SELECT doc_id, COUNT(*) AS n_grams FROM tg GROUP BY doc_id),
    hits AS (
      SELECT doc_id, COUNT(*) AS contam_grams
      FROM tg WHERE sh IN (SELECT sh FROM eg) GROUP BY doc_id
    )
    SELECT c.doc_id,
           CAST(c.n_grams AS BIGINT) AS n_grams,
           CAST(h.contam_grams AS BIGINT) AS contam_grams,
           CAST(h.contam_grams AS DOUBLE) / CAST(c.n_grams AS DOUBLE) AS contam_fraction
    FROM counts c JOIN hits h USING (doc_id)
    """,
    doc="Benchmark decontamination (GPT-3 App. C recipe at word-8-gram "
    "granularity): flag TRAINING docs sharing any n-gram with the EVAL "
    "set, as a distributed hash join — n-grams travel as md5 keys, the "
    "eval side is a distinct hash set (bounded by the eval corpus), the "
    "hit count is a left-semi join, no all-pairs, no sort. On the "
    "planted corpus the eval set (doc_id >= 1e12: exact + near copies "
    "of base docs 0-19) leaks exactly those 20 base docs, so the "
    "expected output is deterministic and the fractions measure how "
    "much of each doc leaked. At 100 TB: the standard pre-training "
    "hygiene pass, run before every release. Complements "
    "pipeline_ops.contamination_check (trigram shared-count flag over a "
    "keyed-md5 90/10 split): this query measures POSITION-LEVEL leak "
    "coverage at 8-gram granularity against a planted eval set, the "
    "fraction a trim-vs-drop decision needs.",
    tags=("dedup", "text", "pipeline"),
)
def decontaminate_train_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import decontaminate

    tune(spark)
    aug = _augmented_docs(spark, sf_dir)
    return decontaminate(
        aug.filter(F.col("doc_id") < _AUG_EXACT_OFF),
        aug.filter(F.col("doc_id") >= _AUG_EXACT_OFF),
        n=_DECON_N,
    )


# --- composed curation funnel (round 6) ---------------------------------------

_FUNNEL_MIN_TOKENS = 10
_FUNNEL_NEAR_T = 0.6
#: The funnel's near-dup stage generates candidates by MinHash-LSH
#: banding (12 hashes, 4 bands x 3 rows — dedup_minhash_lsh_pairs'
#: audited convention) and verifies EXACT Jaccard against full shingle
#: sets for colliding pairs only. A shared-shingle inverted-index join
#: (even df-capped) is NOT scale-safe here: on a low-entropy corpus
#: every posting list is dense and candidate volume is Sum(df^2) — the
#: round-8 sf1.0 fixture has 64k shingles ALL with df in 9..66, so a
#: df<=64 cap kept ~everything (83M candidate rows, >100 GB in the
#: oracle engine), and at sf10 (df~1700) the uncapped join never
#: finished. Band keys hash WHOLE signature slices, so only
#: truly-similar docs collide regardless of corpus density.


@register(
    "curation_funnel",
    oracle=rf"""
    WITH aug AS ({_AUG_SQL}),
    tok AS (
      SELECT doc_id, text,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
      FROM aug
    ),
    s1 AS (SELECT * FROM tok WHERE n_tokens >= {_FUNNEL_MIN_TOKENS}),
    fp AS (
      SELECT doc_id, n_tokens,
             md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fingerprint
      FROM s1
    ),
    s2 AS (
      SELECT f.doc_id, f.n_tokens FROM fp f
      JOIN (SELECT fingerprint, min(doc_id) AS canonical_id FROM fp GROUP BY 1) g
        ON f.fingerprint = g.fingerprint AND f.doc_id = g.canonical_id
    ),
    sets AS (
      SELECT t.doc_id,
             list_distinct(list_transform(range(1, greatest(len(w) - 1, 1)),
                                          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingles
      FROM (SELECT s2.doc_id, regexp_split_to_array(trim(a.text), '\s+') AS w
            FROM s2 JOIN aug a USING (doc_id)) t(doc_id, w)
      WHERE len(w) >= 3
    ),
    posting AS MATERIALIZED (SELECT doc_id, unnest(shingles) AS shingle FROM sets),
    sizes AS (SELECT doc_id, len(shingles) AS set_size FROM sets),
    sig AS (
      SELECT doc_id, j, min(md5(j || '|' || s)) AS minhash
      FROM sets,
           LATERAL (SELECT unnest(shingles)) u(s),
           LATERAL (SELECT unnest(range(0, 12))) t(j)
      GROUP BY doc_id, j
    ),
    bands AS (
      SELECT doc_id, CAST(j // 3 AS INTEGER) AS band_idx,
             md5(string_agg(minhash, ',' ORDER BY j)) AS band_key
      FROM sig GROUP BY doc_id, j // 3
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id
    ),
    near AS (
      SELECT b.doc_id
      FROM (
        SELECT c.doc_a, c.doc_b, count(*) AS i
        FROM cand c
        JOIN posting pa ON pa.doc_id = c.doc_a
        JOIN posting pb ON pb.doc_id = c.doc_b AND pb.shingle = pa.shingle
        GROUP BY 1, 2
      ) p
      JOIN sizes sa ON sa.doc_id = p.doc_a
      JOIN sizes sb ON sb.doc_id = p.doc_b
      JOIN s2 b ON b.doc_id = p.doc_b
      WHERE CAST(p.i AS DOUBLE) / CAST(sa.set_size + sb.set_size - p.i AS DOUBLE)
            >= {_FUNNEL_NEAR_T}
      GROUP BY 1
    ),
    s3 AS (SELECT * FROM s2 WHERE doc_id NOT IN (SELECT doc_id FROM near))
    SELECT * FROM (
      SELECT 0 AS stage_no, 'raw' AS stage,
             CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens FROM tok
      UNION ALL
      SELECT 1, 'quality_min_tokens', CAST(COUNT(*) AS BIGINT), CAST(SUM(n_tokens) AS BIGINT) FROM s1
      UNION ALL
      SELECT 2, 'exact_dedup_canonical', CAST(COUNT(*) AS BIGINT), CAST(SUM(n_tokens) AS BIGINT) FROM s2
      UNION ALL
      SELECT 3, 'near_dedup_jaccard', CAST(COUNT(*) AS BIGINT), CAST(SUM(n_tokens) AS BIGINT) FROM s3
    )
    """,
    doc="The COMPOSED curation funnel — the individual dedup/quality "
    "operators chained the way a pre-training pipeline actually runs "
    "them, with per-stage retention (docs + tokens): raw -> min-token "
    "quality gate -> exact-dedup keep-canonical (md5 fingerprint, min "
    "id) -> near-dedup drop (inverted-index Jaccard >= 0.6, higher id "
    "of each pair dropped). On the planted corpus the exact stage peels "
    "exactly the 20 planted copies; the near stage drops the 20 planted "
    "near copies plus the corpus's LSH-COLLIDING >= 0.6 pairs, so the "
    "funnel numbers are deterministic and every stage's intermediate is "
    "the SAME relation the standalone queries check. The near-dup stage "
    "is MinHash-LSH banding (dedup_minhash_lsh_pairs' 12x4x3 convention, "
    "mirrored in the oracle) with exact-Jaccard verification of "
    "colliding pairs against FULL shingle sets. Recall is the 4x3 "
    "S-curve P(collide)=1-(1-s^3)^4: ~62% at Jaccard exactly 0.6, ~94% "
    "at 0.8, >99.4% at 0.9 (midpoint s~0.54) — a true pair at the bare "
    "threshold can be missed, and because the oracle mirrors the same "
    "candidate generation, such misses are invisible to the value gate; "
    "raise num_hashes/bands if the release bar needs recall at 0.6 "
    "itself rather than at the near-copy band the funnel targets. "
    "A shared-shingle "
    "inverted-index join here (even df-capped) is Sum(df^2) candidate "
    "volume and never finished on the dense round-8 scale-up fixtures "
    "(see the module constant note). At 100 TB each stage is one "
    "already-audited plan shape; the funnel is what the dataset card "
    "reports per release.",
    tags=("dedup", "pipeline", "text"),
)
def curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import fingerprint, token_count

    tune(spark)
    aug = _augmented_docs(spark, sf_dir)
    # ONE text-bearing pass computes everything the stage roll-ups need
    # (token count + exact-dup fingerprint), checkpointed WITHOUT the
    # text column — ids/counts/32-byte hashes only, so the checkpoint
    # is orders of magnitude under the corpus (the r8 Apriori lesson:
    # never pin a text/fact-sized relation). Every stage aggregate and
    # the canonical-selection join re-read this checkpoint; documents
    # itself is scanned twice total (meta build + the text re-attach
    # for shingling) instead of ~24x from per-stage re-derivation.
    meta = aug.select(
        "doc_id",
        token_count(F.col("text")).cast("bigint").alias("n_tokens"),
        fingerprint(F.col("text")).alias("fingerprint"),
    ).localCheckpoint()
    q = meta.filter(F.col("n_tokens") >= _FUNNEL_MIN_TOKENS)
    canon = q.groupBy("fingerprint").agg(F.min("doc_id").alias("canonical_id"))
    s2_ids = q.join(canon, "fingerprint").filter(
        F.col("doc_id") == F.col("canonical_id")
    ).select("doc_id", "n_tokens")
    # re-attach text only for the LSH stage's survivors; the helper
    # persists its shingle/signature intermediates so the banding and
    # the exact-Jaccard verify share one scan of this join
    s2_docs = aug.join(s2_ids.select("doc_id"), "doc_id").select("doc_id", "text")
    near_drop = (
        minhash_lsh_pairs(
            s2_docs, num_hashes=12, bands=4, min_jaccard=_FUNNEL_NEAR_T
        )
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    s3 = s2_ids.join(near_drop, "doc_id", "left_anti")

    def stage(no: int, name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(no).alias("stage_no"),
            F.lit(name).alias("stage"),
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )

    return (
        stage(0, "raw", meta)
        .unionByName(stage(1, "quality_min_tokens", q))
        .unionByName(stage(2, "exact_dedup_canonical", s2_ids))
        .unionByName(stage(3, "near_dedup_jaccard", s3))
    )


# --- two-star connected components (round-7 tail) ------------------------------


@register(
    "graph_wcc_twostar",
    oracle=None,  # set below: shares dedup_components' recursive-closure oracle
    doc="Connected components over the SAME near-dup pair graph as "
    "dedup_components, computed by the alternating large-star/"
    "small-star contraction (Kiveris et al. 2014, operators/cc.py) "
    "instead of min-label propagation: per-round cost is one "
    "groupBy-min + equi-join, but the ROUND COUNT is O(log n) versus "
    "propagation's O(component diameter) — the variant a 100 TB "
    "chain-shaped graph (web links, citation chains) needs. Both "
    "algorithms converge to min-rooted components, so this query "
    "hash-matches the identical recursive-closure oracle that checks "
    "dedup_components — a three-way cross-ALGORITHM equality (two-star "
    "in Spark == label propagation in Spark == transitive closure in "
    "DuckDB), not just a cross-engine one.",
    tags=("dedup", "graph", "iterative"),
)
def graph_wcc_twostar(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cc import twostar_components

    tune(spark)
    aug = _augmented_docs(spark, sf_dir)
    # the SAME LSH-candidate pair graph as dedup_components (see its
    # docstring for the recall curve) — the shared oracle is what makes
    # the three-way cross-algorithm equality meaningful
    pairs = minhash_lsh_pairs(aug, num_hashes=12, bands=4, min_jaccard=0.4)
    return twostar_components(aug.select("doc_id"), pairs)


QUERIES["graph_wcc_twostar"].oracle = QUERIES["dedup_components"].oracle


# --- grid-density clustering (DBSCAN-lite over the embedding space) ------------
#
# The density-based clustering family next to the catalog's centroid
# family (kmeans/IVF): bin each vector by two fixed embedding
# coordinates into h x h grid cells, call a cell dense at >= minPts
# points, and connect dense cells through 8-neighborhood adjacency —
# grid-DBSCAN (the GriDBSCAN/"cell-based DBSCAN" simplification: density
# attachment via fixed cells instead of per-point eps-balls, which
# removes the all-pairs distance step entirely). Sparse-cell points
# report as one noise row (cluster_id = -1), DBSCAN's defining output.
#
# Scale shape: one scan bins points (stateless arithmetic), one keyed
# aggregate counts cells, and everything after — adjacency join, CC,
# cluster roll-up — runs on the DENSE-CELL relation, whose size is
# bounded by the grid (~(range/h)^2), not the corpus. CC reuses
# duplicate_components (min-label propagation, eager localCheckpoint
# per round); cluster diameters are bounded by the grid diagonal.

_GRID_H = 0.1
_GRID_MINPTS = 10
_GRID_BIAS = 50
_GRID_ENC = 100000


def _grid_cell_sql(col: str, one_based_brackets: bool = True) -> str:
    # Spark's arr[i] is 0-based where DuckDB's is 1-based — use
    # element_at on the Spark side (1-based in both the API and SQL).
    e1 = f"{col}[1]" if one_based_brackets else f"element_at({col}, 1)"
    e2 = f"{col}[2]" if one_based_brackets else f"element_at({col}, 2)"
    return (
        f"((CAST(floor(CAST({e1} AS DOUBLE) / {_GRID_H}) AS BIGINT) + {_GRID_BIAS})"
        f" * {_GRID_ENC}"
        f" + (CAST(floor(CAST({e2} AS DOUBLE) / {_GRID_H}) AS BIGINT) + {_GRID_BIAS}))"
    )


@register(
    "cluster_grid_density",
    oracle=f"""
    WITH RECURSIVE pts AS (
      SELECT {_grid_cell_sql('embedding')} AS cell FROM embeddings
    ),
    counts AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS n FROM pts GROUP BY cell),
    dense AS (SELECT cell, n FROM counts WHERE n >= {_GRID_MINPTS}),
    offs(dx, dy) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,1),(1,-1),(1,0),(1,1)),
    edges AS (
      SELECT a.cell AS src, b.cell AS dst
      FROM dense a JOIN offs o ON TRUE
      JOIN dense b ON b.cell = a.cell + o.dx * {_GRID_ENC} + o.dy
    ),
    reach(a, b) AS (
      SELECT cell, cell FROM dense
      UNION
      SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
    ),
    comp AS (SELECT a AS cell, MIN(b) AS cluster_id FROM reach GROUP BY a),
    agg AS (
      SELECT CAST(c.cluster_id AS BIGINT) AS cluster_id,
             CAST(COUNT(*) AS BIGINT) AS n_cells,
             CAST(SUM(d.n) AS BIGINT) AS n_points
      FROM comp c JOIN dense d USING (cell) GROUP BY 1
    ),
    noise AS (
      SELECT CAST(-1 AS BIGINT) AS cluster_id, CAST(0 AS BIGINT) AS n_cells,
             CAST(COALESCE(SUM(n), 0) AS BIGINT) AS n_points
      FROM counts WHERE n < {_GRID_MINPTS}
    )
    SELECT * FROM agg UNION ALL SELECT * FROM noise
    ORDER BY n_points DESC, cluster_id ASC
    """,
    doc=f"Grid-density clustering (DBSCAN-lite): {_GRID_H}-cells over two "
    f"fixed embedding coordinates, dense at >= {_GRID_MINPTS} points, "
    "8-neighbor dense cells merged by connected components "
    "(duplicate_components' min-label propagation) — the density "
    "family's answer to kmeans_fit's centroids: arbitrary-shape "
    "clusters plus an explicit noise row (cluster_id = -1), no k "
    "chosen in advance. The corpus scans once into per-cell counts; "
    "adjacency, CC, and the roll-up all run on the grid-bounded "
    "dense-cell relation. Oracle walks the same cell graph with a "
    "recursive CTE.",
    tags=("ann", "iterative"),
)
def cluster_grid_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    cell = F.expr(_grid_cell_sql("embedding", one_based_brackets=False))
    counts = emb.select(cell.alias("cell")).groupBy("cell").agg(
        F.count("*").cast("bigint").alias("n")
    )
    counts = counts.localCheckpoint()  # feeds dense CC + noise; scan once
    dense = counts.filter(F.col("n") >= _GRID_MINPTS)
    offs = F.expr(
        "array(" + ", ".join(
            f"struct({dx} AS dx, {dy} AS dy)"
            for dx in (-1, 0, 1) for dy in (-1, 0, 1) if (dx, dy) != (0, 0)
        ) + ")"
    )
    cand = dense.select(
        F.col("cell"), F.explode(offs).alias("o")
    ).select(
        F.col("cell").alias("doc_a"),
        (F.col("cell") + F.col("o.dx") * _GRID_ENC + F.col("o.dy")).alias("doc_b"),
    )
    other = dense.select(F.col("cell").alias("doc_b"))
    pairs = cand.join(other, "doc_b").filter(F.col("doc_a") < F.col("doc_b"))
    # two-star contraction, not min-label propagation: the dense-cell
    # graph's diameter grows with the grid side (sf1.0's wider embedding
    # range already exceeds 20 label-propagation rounds), while two-star
    # closes any diameter in O(log n) rounds.
    comp = twostar_components(
        dense.select(F.col("cell").alias("doc_id")), pairs
    )
    agg = (
        comp.join(dense, comp.doc_id == dense.cell)
        .groupBy(F.col("component_id").alias("cluster_id"))
        .agg(
            F.count("*").cast("bigint").alias("n_cells"),
            F.sum("n").cast("bigint").alias("n_points"),
        )
    )
    noise = counts.filter(F.col("n") < _GRID_MINPTS).agg(
        F.lit(-1).cast("bigint").alias("cluster_id"),
        F.lit(0).cast("bigint").alias("n_cells"),
        F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("n_points"),
    )
    return agg.unionByName(noise).orderBy(F.desc("n_points"), F.asc("cluster_id"))


# --- semantic decontamination (embedding-similarity leak screen) ---------------

_SDC_DIM = 16
_SDC_TAU = 0.995


def _sdc_emb_duck(col: str) -> str:
    from .oracle_dialect import duck_hash_embedding

    return duck_hash_embedding(col, _SDC_DIM)


@register(
    "decontaminate_semantic",
    oracle=rf"""
    WITH aug AS ({_AUG_SQL}),
    tr AS (
      SELECT doc_id, {_sdc_emb_duck('text')} AS emb FROM aug
      WHERE doc_id < {_AUG_EXACT_OFF}
    ),
    ev AS (
      SELECT doc_id AS eval_id, {_sdc_emb_duck('text')} AS emb FROM aug
      WHERE doc_id >= {_AUG_EXACT_OFF}
    ),
    scored AS (
      SELECT tr.doc_id,
             MAX(round({__import__('rag_application_with_vectordb_spark.plans.oracle_dialect', fromlist=['duck_cosine']).duck_cosine('tr.emb', 'ev.emb')}, 6)) AS max_eval_cos
      FROM tr CROSS JOIN ev
      GROUP BY tr.doc_id
    )
    SELECT doc_id, max_eval_cos
    FROM scored WHERE max_eval_cos >= {_SDC_TAU}
    ORDER BY doc_id ASC
    """,
    doc="Semantic decontamination: flag TRAINING docs whose hash-embedding "
    f"cosine to ANY eval doc reaches {_SDC_TAU} — the paraphrase-level "
    "leak screen that complements decontaminate_train_docs' 8-gram "
    "surface matching (n-grams catch verbatim overlap; embeddings "
    "catch near-verbatim rewrites the n-gram screen misses — here the "
    "planted eval set's suffix-perturbed near-copies). The eval side "
    "is bounded (broadcast); the train side scans once through a "
    "broadcast nested-loop cosine + per-doc MAX — the knn_batch shape "
    "with an aggregate instead of a top-k, and at 100 TB the eval "
    "side would sit in an ANN index probed per train partition "
    "(operators/ann.py) with this exact plan as its verify stage. "
    "Cosines round to 6 decimals before MAX (monotone, so rounding "
    "commutes with the aggregate).",
    tags=("dedup", "pipeline", "ann"),
)
def decontaminate_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..embedder import hash_embedding_expr
    from ..functions.vector import cosine_sim

    tune(spark)
    aug = _augmented_docs(spark, sf_dir)
    emb = hash_embedding_expr(F.col("text"), dim=_SDC_DIM)
    tr = aug.filter(F.col("doc_id") < _AUG_EXACT_OFF).select("doc_id", emb.alias("emb"))
    ev = aug.filter(F.col("doc_id") >= _AUG_EXACT_OFF).select(
        F.col("doc_id").alias("eval_id"), emb.alias("emb2")
    )
    scored = (
        tr.crossJoin(F.broadcast(ev))
        .select(
            "doc_id",
            F.round(cosine_sim(F.col("emb"), F.col("emb2")), 6).alias("cos"),
        )
        .groupBy("doc_id")
        .agg(F.max("cos").alias("max_eval_cos"))
    )
    return scored.filter(F.col("max_eval_cos") >= _SDC_TAU).orderBy("doc_id")


# --- winnowing-fingerprint near-dup pairs (the MOSS use of winnowing) ----------

_WNP_MIN_SHARED = 3
_WNP_MAX_DF = 50


def _winnow_pairs_oracle() -> str:
    from .textops import _WIN_K, _WIN_PMOD, _WIN_W, _duck_hex8_to_long

    gram = _duck_hex8_to_long(
        f"md5(array_to_string(list_slice(w, ix.i, ix.i + {_WIN_K - 1}), ' '))"
    )
    return rf"""
    WITH aug AS ({_AUG_SQL}),
    t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM aug
    ),
    g AS (
      SELECT doc_id, CAST(ix.i AS BIGINT) AS pos, {gram} AS gh
      FROM t, LATERAL (SELECT unnest(range(1, len(w) - {_WIN_K - 2})) AS i) ix
      WHERE len(w) >= {_WIN_K}
    ),
    c AS (
      SELECT doc_id, pos, gh * {_WIN_PMOD} + ({_WIN_PMOD} - pos) AS comb FROM g
    ),
    winmin AS (
      SELECT a.doc_id, MIN(b.comb) AS sel
      FROM c a JOIN c b ON b.doc_id = a.doc_id
                       AND b.pos BETWEEN a.pos - {_WIN_W - 1} AND a.pos
      WHERE a.pos >= {_WIN_W}
      GROUP BY a.doc_id, a.pos
    ),
    fpd AS (SELECT DISTINCT doc_id, sel // {_WIN_PMOD} AS gh FROM winmin),
    dfq AS (
      SELECT gh FROM fpd GROUP BY gh HAVING COUNT(*) <= {_WNP_MAX_DF}
    ),
    fpr AS (SELECT fpd.doc_id, fpd.gh FROM fpd JOIN dfq ON dfq.gh = fpd.gh),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(COUNT(*) AS BIGINT) AS shared_fingerprints
      FROM fpr a JOIN fpr b ON a.gh = b.gh AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
      HAVING COUNT(*) >= {_WNP_MIN_SHARED}
    )
    SELECT doc_a, doc_b, shared_fingerprints
    FROM pairs ORDER BY doc_a ASC, doc_b ASC
    """


def _register_winnow_pairs():
    from .textops import winnow_fingerprints_df

    @register(
        "dedup_winnow_pairs",
        oracle=_winnow_pairs_oracle(),
        doc="Near-duplicate candidate pairs from SHARED WINNOWING "
        "FINGERPRINTS — the use MOSS puts winnowing to: docs sharing "
        f">= {_WNP_MIN_SHARED} selected fingerprints are copy "
        "candidates, and the guarantee (any shared run of >= k+w-1 "
        "tokens yields a shared fingerprint) makes the candidate set "
        "a superset of substantial verbatim overlap. Fingerprints "
        f"appearing in more than {_WNP_MAX_DF} docs are dropped "
        "before the join (MOSS's ignore-common-fingerprints rule — "
        "boilerplate grams would otherwise quadratically inflate the "
        "candidate join, the LSH df-cap discipline), so posting-list "
        "fanout is df-bounded. Runs over the planted augmented corpus "
        "(exact + suffixed copies of base docs 0-19): every planted "
        "pair surfaces with a high shared count — pytest asserts the "
        "planted recall. Positions decode exactly from the combined "
        "key, so the ~8x sketch, not the corpus, is what joins.",
        tags=("dedup", "text"),
    )
    def dedup_winnow_pairs(spark, sf_dir):
        tune(spark)
        fp = winnow_fingerprints_df(_augmented_docs(spark, sf_dir))
        # the winnowed sketch is ~1/8 of the corpus and carries only
        # (id, hash) — checkpoint it once so the df-cap aggregate and
        # both join sides re-read the sketch, not the corpus (was 3
        # full re-winnowings / 12 documents scans in one plan)
        fpd = fp.select("doc_id", "gram_hash").distinct().localCheckpoint()
        dfq = (
            fpd.groupBy("gram_hash")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") <= _WNP_MAX_DF)
            .select("gram_hash")
        )
        fpr = fpd.join(dfq, "gram_hash")
        a = fpr.select(F.col("doc_id").alias("doc_a"), "gram_hash")
        b = fpr.select(F.col("doc_id").alias("doc_b"), "gram_hash")
        return (
            a.join(b, "gram_hash")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count("*").cast("bigint").alias("shared_fingerprints"))
            .filter(F.col("shared_fingerprints") >= _WNP_MIN_SHARED)
            .orderBy("doc_a", "doc_b")
        )

    return dedup_winnow_pairs


_register_winnow_pairs()
