"""Deduplication operators for LLM training-data pipelines.

Not in the reference (its store is append-only with no dedup), but a
core requirement of the engine's north star. Five strategies, each
Spark-first and (except where noted) DuckDB-oracle-checkable:

- :func:`exact_dup_groups` — md5-fingerprint hash-groupBy. One shuffle
  on a 32-byte key; the canonical-row choice (min doc_id) is
  deterministic.
- :func:`ngram_jaccard_pairs` — exact set-similarity self-join:
  explode distinct shingles → equi-join on shingle → count — the
  classic "inverted index" join. Scales as Σ posting-list², so the
  scale path is MinHash-LSH below; kept exact here as the oracle
  anchor.
- :func:`minhash_signatures` / :func:`minhash_lsh_pairs` — MinHash via
  per-hash-index min over md5 hex strings (lexicographic min ≙ uniform
  min-hash; md5 is identical in DuckDB so signatures are
  value-checkable), banded into LSH buckets; candidate pairs verified
  with true Jaccard. At 100 TB this is the dedup workhorse: cost is
  O(docs × hashes) + a shuffle on (band, key) — never all-pairs.
- :func:`simhash_signatures` / :func:`simhash_pairs` — 32-bit SimHash
  from token-frequency-weighted md5 bits; near-dup = small Hamming
  distance (bit_count(xor)).
- :func:`embedding_neardup_pairs` — cosine over an embedding column;
  exact all-pairs here (oracle anchor), LSH/IVF in operators.ann for
  the sub-quadratic path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import fingerprint, hex13_to_long, tokens, word_shingles
from ..functions.vector import as_double, dot, l2_norm

__all__ = [
    "exact_dup_groups",
    "ngram_jaccard_pairs",
    "minhash_signatures",
    "minhash_signature_expr",
    "minhash_band_keys",
    "minhash_band_index",
    "band_index_append",
    "minhash_lsh_pairs",
    "simhash_signatures",
    "simhash_pairs",
    "simhash_blocked_pairs",
    "embedding_neardup_pairs",
    "duplicated_span_coverage",
    "prefix_filter_jaccard_pairs",
    "decontaminate",
    "plan_lsh_bands",
]


def exact_dup_groups(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: fingerprint → group stats + canonical flag.

    Output: ``doc_id, fingerprint, group_size, is_canonical`` (canonical =
    min id in its group — the row a dedup pass would keep).
    """
    fp = docs.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fingerprint"))
    groups = fp.groupBy("fingerprint").agg(
        F.count("*").alias("group_size"), F.min(id_col).alias("canonical_id")
    )
    # fingerprint is high-cardinality → this join shuffles both sides on
    # the hash key; AQE handles any freak-skew bucket.
    return fp.join(groups, "fingerprint").select(
        id_col,
        "fingerprint",
        "group_size",
        (F.col(id_col) == F.col("canonical_id")).alias("is_canonical"),
    )


def _spread(docs: DataFrame, id_col: str) -> DataFrame:
    """Repartition to the session's default parallelism before CPU-heavy
    per-row work (hashing/shingling).

    The fixture tables arrive as a single small parquet file → 1 input
    partition, which would serialize all hashing onto one core; at real
    scale the same operator keeps whatever parallelism the scan has, and
    the hash repartition is a no-op cost next to the hashing itself.
    """
    parallelism = docs.sparkSession.sparkContext.defaultParallelism
    return docs.repartition(parallelism, id_col)


def _shingle_sets(docs: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    # Drop <n-token docs BEFORE shingling, via the cheap token count —
    # exactly equivalent to filtering empty shingle sets afterwards
    # (grams exist iff size(tokens) >= n), but pushdown-safe: a
    # post-hoc filter(size(shingles) > 0) gets pushed through the
    # repartition, forcing the whole shingle HOF to evaluate in the
    # narrow pre-shuffle stage (serialized on the fixture's 1-3 input
    # partitions) and then AGAIN after the shuffle — measured 7.1 s vs
    # 0.4 s for the identical 5k-doc output at sf0.1.
    from ..functions.text import tokens

    kept = _spread(docs, id_col).filter(F.size(tokens(F.col(text_col))) >= n)
    return kept.select(
        F.col(id_col), word_shingles(F.col(text_col), n).alias("shingles")
    )


#: Verify-stage ceiling used by the guard when a ``verify_sets``
#: relation is supplied: candidate pairs × (2 × mean set size) — the
#: rows the exact-intersection stage materializes by joining BOTH full
#: posting lists onto every candidate pair. The r10 sf10 sweep proved
#: the pair count alone under-prices prefix filtering on a low-entropy
#: corpus: 1.65e9 candidate pairs passed the 2e9 pair cap, but the
#: verify join was ~1.5e11 cells — heap-OOM (r9: disk-full) instead of
#: a fast refusal. sf1.0 in-regime runs are ~2e9 cells, so 2e10 keeps
#: an order of magnitude of headroom on both sides.
MAX_EXACT_VERIFY_CELLS = 20_000_000_000


def _guard_candidate_volume(
    posting: DataFrame,
    max_candidate_pairs: int | None,
    op: str,
    alternative: str,
    unpersist_on_raise: DataFrame | None = None,
    verify_sets: DataFrame | None = None,
    max_verify_cells: float = MAX_EXACT_VERIFY_CELLS,
) -> None:
    """Refuse a posting self-join whose candidate volume Σ df·(df−1)/2
    exceeds ``max_candidate_pairs`` — the mechanical form of the "scale
    regime" docstrings on the exact inverted-index anchors. One cheap
    per-shingle aggregate (linear in postings) turns an hours-long
    quadratic wedge into a fast, actionable error naming the scalable
    path (the ``global_chunk_index`` max_rows precedent). ``None``
    disables the check.

    ``verify_sets``: for operators with a SEPARATE verify stage (prefix
    filtering; ``max_df``-capped ngram Jaccard), the candidate join is
    thin (id, id) rows but verification joins BOTH full shingle sets
    onto every surviving pair — pairs × 2·mean(|S|) cells. Pass the
    shingle-set relation here and the guard prices that stage too,
    refusing past ``max_verify_cells``; without it, a candidate count
    under the pair cap can still be a heap/disk blow-up (measured at
    sf10: 1.65e9 pairs ⇒ ~1.5e11 verify cells).

    Bound semantics (ADVICE r10): ``est`` = Σ df·(df−1)/2 counts
    candidate pairs WITH MULTIPLICITY (one per shared shingle), while
    the verify join runs on DISTINCT pairs — so both checks price an
    UPPER bound. On corpora where pairs share many shingles, ``est``
    can exceed the distinct-pair volume by up to the mean shared-shingle
    multiplicity, and the guard refuses correspondingly earlier than
    the raw ceilings suggest — conservative in the safe direction (a
    refusal names a scalable twin; an OOM names nothing). The measured
    headroom claims above are in multiplicity units on the fixture
    corpora, where low vocabulary entropy keeps multiplicity high and
    the upper bound tight relative to the blow-up actually observed.

    EAGER: when ``max_candidate_pairs`` is set, the estimate is a
    driver action INSIDE an otherwise lazy plan builder — the full
    shingle+aggregate job runs at plan-construction time (two actions
    when ``verify_sets`` is also given). Callers that only want the
    plan shape (lints, audits) must leave the guard off (the default);
    bench/driver paths opt in explicitly.
    ``unpersist_on_raise``: a lazily-persisted relation to release when
    the guard refuses, so a rejected build doesn't leave a cache entry
    marked persisted that no job will ever materialize or release."""
    if max_candidate_pairs is None:
        return
    est = (
        posting.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .agg(F.sum(F.col("df").cast("double") * (F.col("df") - 1).cast("double")).alias("p2"))
        .first()["p2"]
    )
    est = 0.0 if est is None else est / 2.0

    def _refuse(msg: str) -> None:
        if unpersist_on_raise is not None:
            try:
                unpersist_on_raise.unpersist()
            except Exception:
                pass
        raise ValueError(msg)

    if est > float(max_candidate_pairs):
        _refuse(
            f"{op}: estimated candidate volume {est:.3g} pairs exceeds "
            f"max_candidate_pairs={max_candidate_pairs:.3g} — the posting "
            f"lists are too dense for an exact inverted-index join on this "
            f"corpus (low-entropy vocabulary). Use {alternative}, or pass "
            f"max_candidate_pairs=None to force."
        )
    if verify_sets is not None:
        row = verify_sets.agg(F.avg(F.size("shingles")).alias("s")).first()
        avg_set = float(row["s"] or 0.0)
        cells = est * 2.0 * avg_set
        if cells > float(max_verify_cells):
            _refuse(
                f"{op}: estimated verify volume {cells:.3g} cells "
                f"({est:.3g} candidate pairs x 2 x {avg_set:.1f} mean set "
                f"size) exceeds max_verify_cells={max_verify_cells:.3g} — "
                f"the exact-intersection stage would materialize both full "
                f"posting lists per candidate pair. Use {alternative}, or "
                f"pass max_candidate_pairs=None to force."
            )


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_jaccard: float = 0.0,
    max_df: int | None = None,
    persist: bool = True,
    max_candidate_pairs: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs that share ≥1 shingle.

    Inverted-index join: only documents sharing a shingle ever meet —
    no all-pairs cross join. Output: ``doc_a, doc_b, intersection,
    size_a, size_b, jaccard`` with ``doc_a < doc_b``.

    Scale regime (measured, round 8): "no cross join" is only
    sub-quadratic when shared shingles are SELECTIVE. On a Zipfian
    vocabulary the posting lists that dominate the join are the rare
    tail and the shape holds; on a low-entropy corpus (the sf10
    synthetic fixture draws from a 40-word vocabulary, so every
    3-gram shingle has df ≈ 1700) the pair expansion is effectively
    all-pairs and OOMs — and PREFIX filtering (``prefix_filter_
    jaccard_pairs``) does not save it, because with no rare tokens the
    prefix postings are as dense as the full ones. In that regime use
    MinHash-LSH (``minhash_lsh_pairs`` — sf10-green: band keys hash
    the whole signature, so only truly-similar docs collide), or pass
    ``max_df``:

    ``max_df``: if set, shingles with document frequency > max_df are
    excluded from CANDIDATE GENERATION only (the stopword-shingle
    guard); surviving candidates are verified against the FULL shingle
    sets, so every reported (intersection, jaccard) value stays exact.
    Lossy only for pairs whose every shared shingle is ultra-frequent
    — the same bounded trade the pHash frequent-bucket guard makes.

    ``persist=True`` caches the shingle-set relation (it feeds the size
    table, both posting sides and — with ``max_df`` — the verify pass,
    each of which would otherwise re-scan the source and re-shingle;
    the same convention, and the same 100 TB materialized-intermediate
    reading, as :func:`minhash_lsh_pairs`).
    """
    sets = _shingle_sets(docs, text_col, id_col, n)
    if persist:
        sets = sets.persist()
    sizes = sets.select(F.col(id_col), F.size("shingles").alias("set_size"))
    posting = sets.select(F.col(id_col), F.explode("shingles").alias("shingle"))
    cand_posting = posting
    if max_df is not None:
        keep = (
            posting.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") <= int(max_df))
            .select("shingle")
        )
        cand_posting = posting.join(keep, "shingle")
    _guard_candidate_volume(
        cand_posting,
        max_candidate_pairs,
        "ngram_jaccard_pairs",
        "minhash_lsh_pairs (LSH candidates) or max_df= (stopword-shingle cap)",
        unpersist_on_raise=sets if persist else None,
        # the max_df form verifies candidates against FULL postings —
        # price that stage too (the anchor form has no verify join:
        # candidate multiplicity IS the intersection)
        verify_sets=sets if max_df is not None else None,
    )
    a, b = cand_posting.alias("a"), cand_posting.alias("b")
    if max_df is None:
        # anchor form: candidate multiplicity IS the intersection count
        inter = (
            a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
            .groupBy(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
            .agg(F.count("*").alias("intersection"))
        )
    else:
        cand = (
            a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
            .select(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
            .distinct()
        )
        # verify stage: exact intersection over FULL postings, but only
        # for the (few) surviving candidate pairs
        pa = posting.select(F.col(id_col).alias("doc_a"), "shingle")
        pb = posting.select(
            F.col(id_col).alias("doc_b_r"), F.col("shingle").alias("shingle_b")
        )
        inter = (
            cand.join(pa, "doc_a")
            .join(
                pb,
                (F.col("doc_b") == F.col("doc_b_r"))
                & (F.col("shingle") == F.col("shingle_b")),
            )
            .groupBy("doc_a", "doc_b")
            .agg(F.count("*").alias("intersection"))
        )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("set_size").alias("size_b"))
    out = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("intersection").cast("double")
            / (F.col("size_a") + F.col("size_b") - F.col("intersection")).cast("double"),
        )
    )
    return out.filter(F.col("jaccard") >= float(min_jaccard)).select(
        "doc_a", "doc_b", "intersection", "size_a", "size_b", "jaccard"
    )


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 12,
) -> DataFrame:
    """MinHash signature per document: element j = min over shingles of
    ``md5(j || '|' || shingle)`` (lexicographic min over hex — a uniform
    permutation family; identical text in DuckDB).

    Output: ``doc_id, signature array<string>[num_hashes]``.
    """
    sets = _shingle_sets(docs, text_col, id_col, n)
    # Explode shingles once, then ONE hash aggregate with num_hashes min()
    # columns (md5 computed map-side, partial min before the shuffle).
    # Beats both the nested-HOF form (drops out of codegen → interpreted
    # per-element eval) and the explode-per-hash form (num_hashes× row
    # blowup through the shuffle): measured 33s → 13s → ~4s at sf0.1.
    posting = sets.select(F.col(id_col), F.explode("shingles").alias("shingle"))
    mins = [
        F.min(F.md5(F.concat(F.lit(f"{j}|"), F.col("shingle")))).alias(f"__m{j}")
        for j in range(int(num_hashes))
    ]
    per_doc = posting.groupBy(id_col).agg(*mins)
    return per_doc.select(
        F.col(id_col),
        F.array(*[F.col(f"__m{j}") for j in range(int(num_hashes))]).alias("signature"),
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
    min_jaccard: float = 0.0,
    persist: bool = True,
    intermediates: list | None = None,
) -> DataFrame:
    """MinHash-LSH near-dup pairs: band signatures → bucket join →
    verify candidates with exact Jaccard.

    ``bands`` bands of ``num_hashes/bands`` rows; two docs become
    candidates iff some band signature matches exactly. The bucket join
    shuffles (band_idx, band_key) — at 100 TB this is the only exchange,
    and bucket sizes are bounded by collision probability, not corpus
    size. Output schema matches :func:`ngram_jaccard_pairs`.

    ``persist=True`` caches the shingle-set and signature relations
    (each feeds multiple branches of this one plan, and repeated calls
    over the SAME input hit the plan cache). The cache lives until the
    session ends, so callers looping over MANY DIFFERENT inputs should
    either pass ``persist=False`` (recompute the shared subtrees — still
    correct) or pass a list as ``intermediates=`` and ``unpersist()``
    its entries once the pairs are materialized.
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    rows = num_hashes // bands
    # The shingle-set subtree feeds three branches (signatures + both
    # sides of candidate verification); persist it so the scan + shingle
    # transform + spread shuffle run once. Size is O(corpus tokens) —
    # at 100 TB this would be a materialized intermediate table instead.
    sets = _shingle_sets(docs, text_col, id_col, n)
    if persist:
        sets = sets.persist()
        if intermediates is not None:
            intermediates.append(sets)
    posting = sets.select(F.col(id_col), F.explode("shingles").alias("shingle"))
    mins = [
        F.min(F.md5(F.concat(F.lit(f"{j}|"), F.col("shingle")))).alias(f"__m{j}")
        for j in range(int(num_hashes))
    ]
    # Persist the signature relation too: it is the dedup pipeline's
    # INDEX ARTIFACT (one num_hashes-array row per doc — at 100 TB it is
    # written to a table once and every banding/verification pass reads
    # it), and per-process the plan-cache hit means repeated calls skip
    # the O(postings x hashes) md5 aggregation entirely.
    sigs = posting.groupBy(id_col).agg(*mins).select(
        F.col(id_col),
        F.array(*[F.col(f"__m{j}") for j in range(int(num_hashes))]).alias("signature"),
    )
    if persist:
        sigs = sigs.persist()
        if intermediates is not None:
            intermediates.append(sigs)
    band_arr = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.md5(F.array_join(F.slice(F.col("signature"), b * rows + 1, rows), ",")),
    )
    buckets = sigs.select(
        F.col(id_col), F.posexplode(band_arr).alias("band_idx", "band_key")
    )
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .distinct()
    )
    # Verify ONLY the LSH candidates (attach both shingle sets, set-intersect
    # in place) — never the full inverted-index pair join: candidate count is
    # bounded by band collisions, so verification cost is O(candidates),
    # independent of corpus size.
    sa = sets.select(F.col(id_col).alias("doc_a"), F.col("shingles").alias("sh_a"))
    sb = sets.select(F.col(id_col).alias("doc_b"), F.col("shingles").alias("sh_b"))
    verified = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("long").alias("intersection"),
            F.size("sh_a").alias("size_a"),
            F.size("sh_b").alias("size_b"),
        )
        .withColumn(
            "jaccard",
            F.col("intersection").cast("double")
            / (F.col("size_a") + F.col("size_b") - F.col("intersection")).cast("double"),
        )
    )
    return verified.filter(F.col("jaccard") >= float(min_jaccard))


def containment_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_containment: float = 0.5,
    max_candidate_pairs: int | None = None,
) -> DataFrame:
    """Containment near-dup pairs over shared-shingle candidates.

    Containment ``C(A,B) = |A ∩ B| / |A|`` is the asymmetric companion
    to Jaccard: a short document wholly embedded in a longer one (quote,
    concatenation, boilerplate wrapper) scores containment ≈ 1 while its
    Jaccard can be arbitrarily small — the duplication mode Jaccard
    dedup systematically misses in training corpora. Candidates must
    therefore come from the shingle POSTING join (any pair sharing a
    shingle), NOT from symmetric MinHash-LSH bands: band collision
    probability tracks Jaccard, so banded candidates miss exactly the
    short-in-long pairs containment exists to catch (pinned by
    ``test_containment_catches_subset_doc_jaccard_misses``). The
    posting join never goes all-pairs — only documents sharing a
    shingle meet, and the per-shingle fanout is bounded by posting-list
    length (hot shingles are stopword-like and can be frequency-capped
    at scale). Pairs survive when EITHER direction ≥
    ``min_containment``.

    Output: ``doc_a, doc_b, intersection, size_a, size_b,
    containment_a, containment_b`` (``containment_a`` = fraction of
    A's shingles inside B).
    """
    pairs = ngram_jaccard_pairs(
        docs, text_col, id_col, n, min_jaccard=0.0,
        max_candidate_pairs=max_candidate_pairs,
    )
    out = pairs.select(
        "doc_a",
        "doc_b",
        "intersection",
        "size_a",
        "size_b",
        (F.col("intersection").cast("double") / F.col("size_a").cast("double")).alias("containment_a"),
        (F.col("intersection").cast("double") / F.col("size_b").cast("double")).alias("containment_b"),
    )
    return out.filter(
        F.greatest("containment_a", "containment_b") >= float(min_containment)
    )


#: SimHash width — 32 bits keeps the per-bit aggregate fan-out small and
#: fits the fp64-exact 52-bit hash fold used by the oracle.
SIMHASH_BITS = 32


def simhash_signatures(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = SIMHASH_BITS
) -> DataFrame:
    """Token-frequency-weighted SimHash.

    Each token hashes to ``bits`` bits (md5 fold); bit j of the signature
    is the sign of Σ_tokens (±1). Exact integer aggregation → engine- and
    partitioning-independent. Output: ``doc_id, simhash`` (bigint).
    """
    toks = (
        _spread(docs, id_col)
        .select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("word"))
        .select(F.col(id_col), hex13_to_long(F.md5(F.col("word"))).alias("__h"))
    )
    # each per-bit sum / recombination term as ONE F.expr py4j call — the
    # Column-builder loop cost ~0.6 s of driver time per DataFrame build
    # at 32 bits (same lesson as functions.vector.lit_doubles); identical
    # integer arithmetic, so signature values are unchanged.
    per_bit = [
        F.expr(f"sum(CASE WHEN shiftright(__h, {j}) & 1 = 1 THEN 1 ELSE -1 END)").alias(f"b{j}")
        for j in range(bits)
    ]
    agg = toks.groupBy(id_col).agg(*per_bit)
    sim = F.expr(
        " + ".join(
            f"(CASE WHEN b{j} > 0 THEN CAST({1 << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
            for j in range(bits)
        )
    )
    return agg.select(F.col(id_col), sim.alias("simhash"))


def simhash_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 6,
    bits: int = SIMHASH_BITS,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance.

    All-pairs here (oracle anchor); the scale path blocks on bit-chunks
    (any pair within Hamming ≤ k shares one of k+1 chunks exactly —
    pigeonhole) before comparing.
    """
    sigs = simhash_signatures(docs, text_col, id_col, bits)
    a = sigs.select(F.col(id_col).alias("doc_a"), F.col("simhash").alias("sim_a"))
    b = sigs.select(F.col(id_col).alias("doc_b"), F.col("simhash").alias("sim_b"))
    pairs = a.join(b, F.col("doc_a") < F.col("doc_b"))
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return pairs.select("doc_a", "doc_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= int(max_hamming)
    )


def simhash_blocked_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bits: int = SIMHASH_BITS,
) -> DataFrame:
    """Near-dup pairs by SimHash, via pigeonhole bit-chunk blocking — the
    sub-quadratic scale path with output IDENTICAL to :func:`simhash_pairs`
    at the same threshold (asserted in tests).

    Split each signature into ``max_hamming + 1`` equal bit chunks: two
    signatures within Hamming ≤ ``max_hamming`` differ in at most
    ``max_hamming`` chunks, so at least one chunk matches EXACTLY
    (pigeonhole). Candidates are then an equi-join on (chunk index, chunk
    value) — a hash shuffle on short keys — instead of the all-pairs cross
    join; each candidate pair is verified with the exact bit_count(xor)
    predicate and deduped (a pair may agree on several chunks).

    At 100 TB the blocking join's key space is ~2^(bits/(k+1)) per chunk
    index; near-dup clusters land in the same reducer, everything else
    never meets.
    """
    n_chunks = int(max_hamming) + 1
    if bits % n_chunks:
        raise ValueError(f"bits ({bits}) must divide evenly into {n_chunks} chunks")
    w = bits // n_chunks
    mask = (1 << w) - 1
    sigs = simhash_signatures(docs, text_col, id_col, bits)
    chunks = sigs.select(
        F.col(id_col),
        F.col("simhash"),
        F.posexplode(
            F.array(*[
                F.shiftright(F.col("simhash"), c * w).bitwiseAND(F.lit(mask))
                for c in range(n_chunks)
            ])
        ).alias("chunk_idx", "chunk_val"),
    )
    a = chunks.select(
        F.col(id_col).alias("doc_a"), F.col("simhash").alias("sim_a"), "chunk_idx", "chunk_val"
    )
    b = chunks.select(
        F.col(id_col).alias("doc_b"), F.col("simhash").alias("sim_b"), "chunk_idx", "chunk_val"
    )
    cand = a.join(b, ["chunk_idx", "chunk_val"]).filter(F.col("doc_a") < F.col("doc_b"))
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        cand.select("doc_a", "doc_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= int(max_hamming))
        .dropDuplicates(["doc_a", "doc_b"])
    )


def embedding_neardup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    top_pairs: int | None = None,
    min_cosine: float | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (exact all-pairs).

    Output: ``id_a, id_b, cosine``. Use ``top_pairs`` (deterministic
    tiebreak) or ``min_cosine``. The sub-quadratic path for real corpora
    is ``operators.ann`` (LSH bucketing) — this exact form is the oracle.
    """
    # Precompute each side's norm BEFORE the pair join: cosine then needs
    # one dot product per pair instead of three array folds — ~3× less
    # per-pair work (n vectors' norms amortize over n²/2 pairs).
    normed = emb.select(
        F.col(id_col), as_double(F.col(vec_col)).alias("__v"), l2_norm(as_double(F.col(vec_col))).alias("__n")
    )
    a = normed.select(F.col(id_col).alias("id_a"), F.col("__v").alias("vec_a"), F.col("__n").alias("n_a"))
    b = normed.select(F.col(id_col).alias("id_b"), F.col("__v").alias("vec_b"), F.col("__n").alias("n_b"))
    sim = (
        F.when((F.col("n_a") == 0.0) | (F.col("n_b") == 0.0), F.lit(0.0))
        .otherwise(dot(F.col("vec_a"), F.col("vec_b")) / (F.col("n_a") * F.col("n_b")))
    )
    pairs = a.join(b, F.col("id_a") < F.col("id_b")).select("id_a", "id_b", sim.alias("cosine"))
    if min_cosine is not None:
        pairs = pairs.filter(F.col("cosine") >= float(min_cosine))
    if top_pairs is not None:
        pairs = pairs.orderBy(F.desc("cosine"), F.asc("id_a"), F.asc("id_b")).limit(int(top_pairs))
    return pairs


def embedding_lsh_neardup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 6,
    min_cosine: float = 0.2,
    seed: str = "plane",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-blocked — the
    sub-quadratic scale path for ``embedding_neardup_pairs``.

    Each vector gets one hyperplane-sign bucket (deterministic md5-fold
    planes, same family as ``operators.ann``); candidate pairs are only
    formed WITHIN a bucket, so pair count drops from n²/2 to
    Σ bucket²/2 — with n_planes ≈ log2(n / target_bucket) the blocking
    keeps buckets O(target) and the join linear-ish in n. Recall
    tradeoff: a pair at angle θ collides with probability
    (1 − θ/π)^n_planes — genuine near-dups (θ→0) almost always land
    together, weak pairs may be missed; raise recall by unioning a few
    seed rotations (band analog), each still sub-quadratic.

    One shuffle on the bucket key; skewed buckets are the hazard at
    100 TB — mitigate by adding planes (splits every bucket in two) or
    salting the degenerate bucket of all-zero vectors.

    Output: ``id_a, id_b, cosine`` (cosine ≥ ``min_cosine``).
    """
    from .ann import hyperplane_buckets

    b = hyperplane_buckets(
        emb.select(id_col, vec_col), vec_col, dim, n_planes, seed
    )
    normed = b.select(
        F.col(id_col),
        F.col("bucket"),
        as_double(F.col(vec_col)).alias("__v"),
        l2_norm(as_double(F.col(vec_col))).alias("__n"),
    )
    a = normed.select(
        F.col(id_col).alias("id_a"), F.col("bucket"),
        F.col("__v").alias("vec_a"), F.col("__n").alias("n_a"),
    )
    bb = normed.select(
        F.col(id_col).alias("id_b"), F.col("bucket"),
        F.col("__v").alias("vec_b"), F.col("__n").alias("n_b"),
    )
    sim = (
        F.when((F.col("n_a") == 0.0) | (F.col("n_b") == 0.0), F.lit(0.0))
        .otherwise(dot(F.col("vec_a"), F.col("vec_b")) / (F.col("n_a") * F.col("n_b")))
    )
    return (
        a.join(bb, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("cosine"))
        .filter(F.col("cosine") >= float(min_cosine))
    )


def duplicate_components(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components over the near-dup pair graph: the step that
    turns pairwise matches into actual dedup decisions (which rows form
    one duplicate cluster, which single row to keep).

    Min-label propagation, Pregel-style: every node starts labeled with
    its own id; each round takes the min of its label and its
    neighbors' labels; fixpoint = components labeled by their min id.
    Rounds needed = component diameter — near-dup clusters are small
    and dense (copies of one source document), so a handful of rounds
    closes them; ``max_iter`` bounds the pathological chain. Each round
    is one equi-join + aggregate on the edge list (edge-partitioned,
    no driver state beyond the 1-row convergence probe); at cluster
    scale, checkpoint the label frame every few rounds to truncate
    lineage (the alternating large-star/small-star variant of
    Kiveris et al., "Connected Components in MapReduce", drops the
    round count to O(log n) with the same join shape if diameters
    ever grow).

    Output: ``{id_col}, component_id, component_size, is_canonical``
    (component_id = min doc id in the component; singletons are their
    own component).
    """
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).union(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
    edges = edges.persist()
    # Each round MUST fully materialize and truncate lineage (eager
    # localCheckpoint). The previous lazy persist() was a latent
    # deep-graph bug: the limit(1) convergence probe only materialized
    # the partitions it touched, the prior round was already
    # unpersisted, and every uncached partition recomputed through a
    # lineage that doubled per round — OOM at ~15 rounds (found by the
    # two-star cross-check on a random graph; fixture near-dup graphs
    # converge in <5 rounds and never hit it).
    labels = nodes.select(
        F.col(id_col).alias("node"), F.col(id_col).cast("long").alias("label")
    ).localCheckpoint()
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr_min, labels.node == nbr_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.node") == F.col("o.node"))
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    sizes = labels.groupBy("label").agg(F.count("*").alias("component_size"))
    out = labels.join(sizes, "label").select(
        F.col("node").alias(id_col),
        F.col("label").alias("component_id"),
        F.col("component_size").cast("long").alias("component_size"),
        (F.col("node") == F.col("label")).cast("bigint").alias("is_canonical"),
    )
    edges.unpersist()
    return out


def duplicated_span_coverage(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Per-document duplicated-substring coverage — the span-level dedup
    monitor from "Deduplicating Training Data Makes Language Models
    Better" (Lee et al. 2022), approximated at word n-gram granularity.

    A position-``p`` n-gram in a document is *duplicated* when the same
    n-gram occurs in at least one OTHER document; the duplicated-token
    count is the length of the union of all covered intervals
    ``[p, p+n)`` (overlapping spans counted once, via the classic
    gaps-and-islands window: ``contrib = max(0, p+n - max(p,
    prev_max_end))``). Output per doc: ``doc_id, n_tokens, dup_tokens,
    dup_fraction`` — the per-doc statistic a pipeline thresholds on to
    drop or trim heavily-duplicated training text.

    Scale posture: n-grams travel as md5 hashes (32-byte shuffle keys,
    never the text); the duplicate decision is one groupBy on the hash,
    the join back is hash-keyed, and the interval union is one window
    partitioned by doc_id — three shuffles total, each on a bounded
    key, no all-pairs anywhere. Unlike the suffix-array original this
    is embarrassingly parallel and needs no global sort.
    """
    d = _spread(docs, id_col)
    w = tokens(F.col(text_col))
    toks = d.select(F.col(id_col), w.alias("__w")).persist()

    def gram(i: Column) -> Column:
        parts: list[Column] = []
        for t in range(n):
            if t:
                parts.append(F.lit(" "))
            parts.append(F.element_at(F.col("__w"), i + t))
        return F.concat(*parts)

    grams = F.when(
        F.size("__w") >= n,
        F.transform(
            F.sequence(F.lit(1), F.size("__w") - (n - 1)),
            lambda i: F.struct(
                i.cast("long").alias("pos"), F.md5(gram(i)).alias("sh")
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:bigint,sh:string>>"))
    pos = toks.select(F.col(id_col), F.explode(grams).alias("g")).select(
        F.col(id_col), F.col("g.pos").alias("pos"), F.col("g.sh").alias("sh")
    )
    dup = (
        pos.groupBy("sh")
        .agg(F.countDistinct(id_col).alias("__nd"))
        .filter(F.col("__nd") >= 2)
        .select("sh")
    )
    dpos = pos.join(dup, "sh").select(F.col(id_col), "pos")
    from pyspark.sql import Window

    win = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cov = dpos.withColumn("prev_end", F.max(F.col("pos") + n).over(win))
    contrib = F.greatest(
        F.lit(0).cast("long"),
        F.col("pos")
        + n
        - F.greatest(F.col("pos"), F.coalesce(F.col("prev_end"), F.lit(0).cast("long"))),
    )
    perdoc = cov.groupBy(id_col).agg(F.sum(contrib).alias("__dup"))
    out = (
        toks.select(F.col(id_col), F.size("__w").cast("long").alias("n_tokens"))
        .join(perdoc, id_col, "left")
        .select(
            F.col(id_col),
            "n_tokens",
            F.coalesce(F.col("__dup"), F.lit(0)).cast("long").alias("dup_tokens"),
            (
                F.coalesce(F.col("__dup"), F.lit(0)).cast("double")
                / F.col("n_tokens")
            ).alias("dup_fraction"),
        )
    )
    return out


def minhash_signature_expr(shingles: Column, num_hashes: int = 12) -> Column:
    """Per-ROW MinHash signature: element ``j`` = ``array_min`` over the
    document's shingle array of ``md5(j || '|' || shingle)``.

    Produces strings bit-identical to :func:`minhash_signatures` (same
    hash family, same lexicographic min) but as a stateless projection —
    no explode, no aggregate, no shuffle. The batch path keeps the
    explode+agg form (map-side partial min beats the nested HOF ~3× on
    a corpus scan); THIS form exists for Structured Streaming, where a
    per-row expression needs no watermarked aggregation state: each
    micro-batch row signs itself and can immediately probe a static
    band index (see ``streaming.windows.neardup_candidates_stream``).
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(int(num_hashes) - 1)),
        lambda j: F.array_min(
            F.transform(
                shingles,
                lambda s: F.md5(F.concat(j.cast("string"), F.lit("|"), s)),
            )
        ),
    )


def minhash_band_keys(signature: Column, bands: int, rows: int) -> Column:
    """``array<string>[bands]``: md5 of each band's comma-joined slice of
    the signature — the LSH bucket keys (identical construction to
    :func:`minhash_lsh_pairs`)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(int(bands) - 1)),
        lambda b: F.md5(F.array_join(F.slice(signature, b * int(rows) + 1, int(rows)), ",")),
    )


def minhash_band_index(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
) -> DataFrame:
    """The static LSH index a streaming near-dup gate probes:
    ``(band_idx, band_key, doc_id)`` for the accepted corpus. Built with
    the batch signature path (explode + single agg); at 100 TB this is a
    maintained table, appended as documents are accepted."""
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    rows = num_hashes // bands
    sigs = minhash_signatures(docs, text_col, id_col, n, num_hashes)
    return sigs.select(
        F.col(id_col),
        F.posexplode(minhash_band_keys(F.col("signature"), bands, rows)).alias(
            "band_idx", "band_key"
        ),
    ).select("band_idx", "band_key", F.col(id_col))


def band_index_append(
    new_docs: DataFrame,
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
) -> None:
    """Append newly accepted documents' band rows to a PERSISTED LSH
    band index — the ``ivf_append`` analog for the near-dup gate: the
    index a streaming gate probes must grow as batches are accepted, or
    the gate never catches duplicates of *recently ingested* documents
    (it would only see the corpus frozen at index-build time).

    Uses the per-row signature path (``minhash_signature_expr`` — bit-
    identical to the batch build), writes parquet ``mode("append")``
    partitioned by ``band_idx``: only ``bands`` partition directories,
    each gaining one file per batch; existing rows are never rewritten,
    and the next probe's scan simply sees the new files. Compact with a
    ``repartition(band_idx) → overwrite`` rewrite when small files
    accumulate (the ``ivf_compact`` pattern)."""
    from ..functions.text import word_shingles

    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    rows = num_hashes // bands
    sig = minhash_signature_expr(word_shingles(F.col(text_col), n), num_hashes)
    keyed = (
        new_docs.filter(F.size(word_shingles(F.col(text_col), n)) > 0)
        .select(F.col(id_col), sig.alias("signature"))
        .select(
            F.col(id_col),
            F.posexplode(minhash_band_keys(F.col("signature"), bands, rows)).alias(
                "band_idx", "band_key"
            ),
        )
        .select("band_idx", "band_key", F.col(id_col))
    )
    keyed.write.mode("append").partitionBy("band_idx").parquet(index_path)


def prefix_filter_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    vocab_ordinal: str = "global",
    max_candidate_pairs: int | None = None,
) -> DataFrame:
    """Set-similarity self-join with PREFIX FILTERING (the All-Pairs /
    PPJoin candidate rule, Bayardo et al. WWW'07; Xiao et al. WWW'08).

    Under a global token order (document frequency ascending — rarest
    first), any pair with Jaccard ≥ t must share a token inside both
    documents' length-``|S| − ⌈t·|S|⌉ + 1`` prefixes: if A∩B avoided
    A's prefix it would fit in A's suffix of size ``⌈t·|A|⌉ − 1``,
    contradicting ``|A∩B| ≥ t·|A∪B| ≥ ⌈t·|A|⌉``. So the inverted-index
    join runs over PREFIX postings only — the posting lists shrink by
    roughly the threshold factor and, because prefixes hold the RAREST
    tokens, the surviving lists are the short ones; candidate count
    drops superlinearly vs the any-shared-shingle join of
    :func:`ngram_jaccard_pairs` while remaining LOSSLESS at ≥ t
    (pytest proves set equality on the fixture).

    Output matches :func:`ngram_jaccard_pairs`, filtered to
    ``jaccard >= threshold``.

    Scale: one extra tiny aggregate (global token df) broadcast onto
    the posting ranking; the join shuffles prefix postings only. This
    is the textbook bridge between the exact posting join (anchor) and
    MinHash-LSH (probabilistic): still exact, but pruned.

    ``vocab_ordinal``:

    - ``"global"`` (default, the literal All-Pairs formulation): a dense
      ordinal over the token vocabulary via one unpartitioned
      ``row_number`` window — over the (bounded) distinct-shingle
      relation, not the corpus, but still a single-partition sort at
      extreme vocabulary sizes.
    - ``"per-doc"`` (the scale path): NO vocabulary-wide window at all.
      The ordinal's ONLY use is ordering each document's own tokens, so
      each doc ranks its postings directly by the joined ``(df,
      shingle)`` key inside the per-doc window — the identical total
      order (ties impossible: shingle is unique), hence bit-identical
      prefixes and pairs, with every window partitioned by ``id_col``.
      This strictly dominates the zipWithIndex-style two-level ordinal
      (local rank + broadcast offsets): that still materializes a global
      rank nothing consumes.
    """
    from pyspark.sql import Window

    t = float(threshold)
    if not 0 < t <= 1:
        raise ValueError("threshold must be in (0, 1]")
    if vocab_ordinal not in ("global", "per-doc"):
        raise ValueError("vocab_ordinal must be 'global' or 'per-doc'")
    sets = _shingle_sets(docs, text_col, id_col, n).persist()
    sizes = sets.select(F.col(id_col), F.size("shingles").alias("set_size"))
    posting = sets.select(F.col(id_col), F.explode("shingles").alias("shingle"))
    freq = posting.groupBy("shingle").agg(F.count("*").alias("df"))
    if vocab_ordinal == "per-doc":
        ranked = posting.join(freq, "shingle").withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy(F.asc("df"), F.asc("shingle"))
            ),
        )
    else:
        wo = Window.orderBy(F.asc("df"), F.asc("shingle"))
        ordered = freq.select("shingle", F.row_number().over(wo).alias("ord"))
        ranked = posting.join(ordered, "shingle").withColumn(
            "rn",
            F.row_number().over(Window.partitionBy(id_col).orderBy(F.asc("ord"))),
        )
    ranked = ranked.join(sizes, id_col).withColumn(
        "prefix_len",
        (F.col("set_size") - F.ceil(F.lit(t) * F.col("set_size")) + 1).cast("int"),
    )
    prefix = ranked.filter(F.col("rn") <= F.col("prefix_len")).select(
        F.col(id_col), "shingle"
    )
    _guard_candidate_volume(
        prefix,
        max_candidate_pairs,
        "prefix_filter_jaccard_pairs",
        "minhash_lsh_pairs (prefix filtering needs rare tokens; a "
        "low-entropy vocabulary leaves the prefix postings as dense as "
        "the full ones)",
        unpersist_on_raise=sets,
        # prefix candidates are thin pairs, but verification joins both
        # FULL shingle sets per pair — at sf10 that stage, not the pair
        # count, is what blew the heap (r10 sweep)
        verify_sets=sets,
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .distinct()
    )
    sa = sets.select(F.col(id_col).alias("doc_a"), F.col("shingles").alias("__sa"))
    sb = sets.select(F.col(id_col).alias("doc_b"), F.col("shingles").alias("__sb"))
    verified = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("__sa", "__sb")).cast("bigint").alias("intersection"),
            F.size("__sa").cast("bigint").alias("size_a"),
            F.size("__sb").cast("bigint").alias("size_b"),
        )
        .withColumn(
            "jaccard",
            F.col("intersection").cast("double")
            / (F.col("size_a") + F.col("size_b") - F.col("intersection")).cast("double"),
        )
    )
    return verified.filter(F.col("jaccard") >= t).select(
        "doc_a", "doc_b", "intersection", "size_a", "size_b", "jaccard"
    )


def decontaminate(
    train: DataFrame,
    evalset: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Benchmark decontamination: flag training documents that share any
    word ``n``-gram with an evaluation/heldout set — the GPT-3/PaLM
    recipe (Brown et al. 2020 App. C: 13-gram overlap; n is a knob) run
    as a distributed join instead of a driver-side scan.

    Per contaminated training doc: ``doc_id, n_grams, contam_grams,
    contam_fraction`` where ``contam_grams`` counts gram POSITIONS whose
    n-gram occurs anywhere in the eval set (repeats count per position —
    the fraction is then "how much of this doc is leaked", the threshold
    a pipeline drops or trims on). Clean docs are omitted.

    Scale posture: n-grams travel as md5 hashes (32-byte keys, never
    text); the eval side aggregates to a DISTINCT hash set (bounded by
    the eval corpus, typically ≪ train) and the only joins are
    hash-keyed — a left-semi-shaped hit count plus the per-doc gram
    count. No all-pairs, no sort; the same shape as
    :func:`duplicated_span_coverage` minus the interval union.
    """
    def gram_positions(docs: DataFrame) -> DataFrame:
        d = _spread(docs, id_col)
        toks = d.select(F.col(id_col), tokens(F.col(text_col)).alias("__w"))

        def gram(i: Column) -> Column:
            parts: list[Column] = []
            for t in range(n):
                if t:
                    parts.append(F.lit(" "))
                parts.append(F.element_at(F.col("__w"), i + t))
            return F.concat(*parts)

        grams = F.when(
            F.size("__w") >= n,
            F.transform(
                F.sequence(F.lit(1), F.size("__w") - (n - 1)),
                lambda i: F.md5(gram(i)),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return toks.select(F.col(id_col), F.explode(grams).alias("sh"))

    tg = gram_positions(train)
    eg = gram_positions(evalset).select("sh").distinct()
    # per-doc gram count is arithmetic on the token count (a doc with
    # t >= n tokens has exactly t-n+1 gram positions) — no second pass
    # through the exploded md5 posting, no gram-side re-aggregation
    counts = (
        _spread(train, id_col)
        .select(
            F.col(id_col),
            (F.size(tokens(F.col(text_col))) - (n - 1)).alias("n_grams"),
        )
        .filter(F.col("n_grams") > 0)
    )
    hits = (
        tg.join(eg, "sh", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("contam_grams"))
    )
    return counts.join(hits, id_col).select(
        F.col(id_col),
        F.col("n_grams").cast("bigint").alias("n_grams"),
        F.col("contam_grams").cast("bigint").alias("contam_grams"),
        (F.col("contam_grams").cast("double") / F.col("n_grams").cast("double")).alias(
            "contam_fraction"
        ),
    )


def plan_lsh_bands(threshold: float, num_hashes: int) -> tuple[int, int]:
    """Choose the LSH banding ``(bands, rows_per_band)`` for a target
    Jaccard ``threshold`` given a ``num_hashes``-long MinHash signature.

    The collision probability of a pair with true similarity ``s``
    under ``b`` bands of ``r`` rows is ``p(s) = 1 - (1 - s^r)^b`` (MMDS
    ch.3). The planner enumerates every exact factorization ``b*r ==
    num_hashes`` and picks the one minimizing the symmetric error mass
    of the S-curve against the ideal step at ``threshold``::

        err(b, r) = integral_0^t p(s) ds  +  integral_t^1 (1 - p(s)) ds
                    (false-positive mass)    (false-negative mass)

    evaluated on a fixed 1/1000 grid — pure driver-side arithmetic,
    deterministic, no data touched. Callers feed the result to
    :func:`minhash_lsh_pairs` / :func:`minhash_band_keys`; the classic
    rule-of-thumb threshold of a plan is ``(1/b)**(1/r)``, which the
    planner's choice tracks (pytest pins both properties).

    At 100 TB this is the knob that matters: r too small floods the
    band-key shuffle with false-positive candidates (the verify stage
    pays |candidates| Jaccards); r too large silently drops true
    near-dups. Planning from the target threshold instead of
    hand-picking (12, 3-vs-4) makes the tradeoff explicit.
    """
    if not 0.0 < threshold < 1.0:
        raise ValueError(f"threshold must be in (0,1), got {threshold}")
    if num_hashes < 2:
        raise ValueError(f"num_hashes must be >= 2, got {num_hashes}")
    best: tuple[float, int, int] | None = None
    for r in range(1, num_hashes + 1):
        if num_hashes % r:
            continue
        b = num_hashes // r
        err = 0.0
        for i in range(1, 1000):
            s = i / 1000.0
            p = 1.0 - (1.0 - s**r) ** b
            err += p if s < threshold else (1.0 - p)
        if best is None or err < best[0] or (err == best[0] and b < best[1]):
            best = (err, b, r)
    assert best is not None
    return best[1], best[2]
