"""Approximate nearest-neighbor search — the sub-linear scale path.

The reference searches by exhaustive scan (``services/vectorDb.ts:16-19``,
O(n·d) per query). That stays the engine's exact/default path
(``operators.knn`` — reference semantics, oracle anchor); this module
adds the two classic sub-linear strategies for 100 TB corpora:

- **Random-hyperplane LSH** (:func:`hyperplane_buckets`,
  :func:`ann_lsh_topk`): bucket = sign bits of ⟨v, p⟩ over P
  deterministic hyperplanes. Hyperplane components derive from the same
  md5-fold used by the HashEmbedder, so bucketing is a pure function of
  (plane, dim index) — reproducible in DuckDB, which makes even the
  *approximate* path value-checkable, not just rows-only. Search cost
  drops to the probed bucket's size; partition the corpus by bucket and
  queries touch one partition each.
- **IVF** (:func:`ivf_assign`, :func:`ann_ivf_topk`): coarse quantizer =
  a deterministic centroid subset (first C corpus vectors — a real
  deployment would k-means them; determinism is what makes the catalog
  query checkable), invert the corpus by nearest centroid, probe the
  ``nprobe`` nearest lists. The inverted lists are exactly a
  hash-partitioned table keyed by centroid id: at cluster scale each
  probe is a partition-pruned scan.

Both return exact cosine scores within the probed candidate set and keep
the (similarity DESC, id ASC) tiebreak of the exact path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vector import (
    as_double,
    cosine_sim,
    cosine_sim_prenormed,
    dot,
    lit_double_matrix,
    lit_doubles,
    lit_longs,
)

__all__ = [
    "hyperplane",
    "hyperplane_buckets",
    "multiprobe_buckets",
    "ann_lsh_topk",
    "ann_lsh_multiprobe_topk",
    "ivf_assign",
    "ivf_append",
    "ivf_compact",
    "ivf_recover",
    "ann_ivf_topk",
    "nearest_centroid_ids",
    "LITERAL_CENTROID_MAX",
]

#: Above this many centroids the literal-expression fast path is skipped
#: (the generated expression would be enormous) and the broadcast
#: crossJoin + window path takes over.
LITERAL_CENTROID_MAX = 256
#: Above this many centroids the literal argmax expression (k*dim
#: nodes) exceeds whole-stage codegen's method-size budget and falls
#: back to interpreted eval — measured ~100 s for 200k x 64d rows at
#: k=195 vs seconds via the broadcast-join + max_by aggregate path.
LITERAL_ASSIGN_MAX = 64
#: Centroid-count ceiling for the mapInArrow blocked assignment (r13):
#: the centroid matrix is collected to the driver and shipped in the
#: task closure, so bound it the same way as the literal boundary —
#: 4096 x dim doubles is ~2 MB at dim 64, FAISS-coarse-quantizer
#: territory. Beyond it the broadcast-join + max_by path remains.
ARROW_ASSIGN_MAX = 4096


def _centroids_as_literals(
    centroids: DataFrame | list[tuple[int, list[float]]],
    centroid_id: str = "centroid_id",
    centroid_vec: str = "cvec",
) -> list[tuple[int, list[float]]] | None:
    """Collect a (small) centroid table to the driver as
    ``[(id, [components])]``, or None if it exceeds
    :data:`LITERAL_CENTROID_MAX`.

    A coarse quantizer is tiny by definition (k×dim doubles), so
    embedding it as literal expressions turns nearest-centroid
    assignment into a pure per-row projection — no crossJoin, no
    per-vector window shuffle, nothing besides the corpus scan. The
    collect moves ≤ 256×dim doubles, the same sanctioned driver
    boundary as ``ask()``'s k rows.

    Callers that already hold the trained centroids as driver values
    (every catalog query — training memoizes k×dim doubles) pass the
    ``[(id, vec)]`` list directly: wrapping values in a DataFrame only
    to re-collect them here costs a ~1 s execution round-trip per call
    on the serving path.
    """
    if isinstance(centroids, list):
        return sorted((int(c), [float(x) for x in v]) for c, v in centroids)
    rows = centroids.limit(LITERAL_CENTROID_MAX + 1).collect()
    if len(rows) > LITERAL_CENTROID_MAX:
        return None
    return sorted((int(r[centroid_id]), [float(x) for x in r[centroid_vec]]) for r in rows)


def _collect_centroids(
    centroids: DataFrame | list[tuple[int, list[float]]],
    centroid_id: str,
    centroid_vec: str,
    limit: int,
) -> list[tuple[int, list[float]]] | None:
    """Centroids as driver values up to ``limit`` rows, else None.

    Same sanctioned driver boundary as :func:`_centroids_as_literals`
    (a coarse quantizer is k×dim doubles by definition); the separate
    helper exists because the mapInArrow path tolerates a much larger k
    than the literal-expression path (matrix bytes in a task closure vs
    k×dim AST nodes re-analyzed per action)."""
    if isinstance(centroids, list):
        cents = sorted((int(c), [float(x) for x in v]) for c, v in centroids)
        return cents if len(cents) <= limit else None
    rows = centroids.limit(limit + 1).collect()
    if len(rows) > limit:
        return None
    return sorted((int(r[centroid_id]), [float(x) for x in r[centroid_vec]]) for r in rows)


def _arrow_f64_matrix(vec, d: int | None = None):
    """Decode an Arrow list-of-float column to an ``(n, d)`` float64
    ndarray, enforcing the IVF contract loudly: uniform dims (``d`` when
    given, else derived), no NULL rows/components. float32 → float64 is
    exact, same as ``CAST(x AS DOUBLE)``. Shared by the mapInArrow
    assignment and the per-cell graph scorer."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(vec, pa.ChunkedArray):
        vec = vec.combine_chunks()
    n = len(vec)
    if vec.null_count:
        raise ValueError("vector column: NULL vectors violate the IVF contract")
    if pa.types.is_fixed_size_list(vec.type):
        got = vec.type.list_size
        if d is not None and got != d:
            raise ValueError(f"vector dim {got} != centroid dim {d}")
        d = got
    else:
        lens = pc.list_value_length(vec).to_numpy()
        if n and (d is None):
            d = int(lens[0])
        if n and not (lens == d).all():
            raise ValueError(
                f"ragged/mismatched vector dims "
                f"{sorted(set(lens.tolist()))[:5]} != centroid dim {d}"
            )
    flat = vec.flatten()
    if flat.null_count:
        raise ValueError("vector column: NULL components violate the IVF contract")
    V = flat.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
    return V.reshape(n, d), d


def _assign_arrow(
    corpus: DataFrame,
    cents: list[tuple[int, list[float]]],
    corpus_id: str,
    corpus_vec: str,
    centroid_id: str,
    cid_type,
) -> DataFrame:
    """Nearest-centroid assignment as ONE mapInArrow pass (r13, guide
    §4.2): no (vector, centroid) pair relation is ever materialized —
    the broadcast-join + max_by form emitted |corpus|·k rows through a
    BroadcastNestedLoopJoin volcano iterator (9e7 rows for the sf10
    graph build, ~40-90 s per assignment) just to fold them straight
    back down to |corpus| rows.

    Bit-exactness contract (pinned by
    ``test_ivf_assign_arrow_matches_join_path``): per (vector, centroid)
    the cosine is the same IEEE chain as the join path's
    ``dot/(nv*cn)`` —
    - dots/norms are SEQUENTIAL per-dimension folds starting at 0.0
      (``acc += v[:,j]*c[:,j]`` loops j in order: each scalar
      accumulator sees the identical add sequence as the unrolled
      ``0.0 + a[0]*b[0] + ...`` and the ``aggregate`` HOF);
    - float32 corpora are cast to float64 BEFORE any arithmetic
      (exact, same as ``CAST(x AS DOUBLE)``);
    - either norm exactly 0.0 → similarity 0.0 (the cosine edge);
    - argmax = max_by(cid, struct(csim, -cid)): numpy's first-max over
      ascending-cid columns gives the same lowest-cid tiebreak, with
      an explicit ±0.0 refinement because Spark orders doubles by
      Double.compare (-0.0 < +0.0) while IEEE ``==`` ties them.

    Caller contract (the IVF contract, as for ``nearest_centroid_ids``):
    uniform vector dims, no NULL ids/vectors/components, finite values.
    Violations raise loudly in the task rather than silently mis-assign
    (the HOF join path yielded NULL similarities for ragged rows — a
    state no catalog corpus can reach; VERDICT r12 item 5 asks for the
    loud contract over silent divergence)."""
    from pyspark.sql.types import StructField, StructType

    mat = [v for _, v in cents]
    ids = [c for c, _ in cents]
    in_schema = corpus.select(corpus_id, corpus_vec).schema
    out_schema = StructType(
        [in_schema[0], in_schema[1], StructField(centroid_id, cid_type, True)]
    )
    cid_np = "int32" if cid_type.typeName() == "integer" else "int64"

    def assign_batches(batches):
        import numpy as np
        import pyarrow as pa

        C = np.asarray(mat, dtype=np.float64)  # (k, dim), ascending cid
        k, d = C.shape
        cn = np.zeros(k)
        for j in range(d):  # sequential per-dim fold — see docstring
            cn += C[:, j] * C[:, j]
        cn = np.sqrt(cn)
        cid_arr = np.asarray(ids, dtype=np.int64)
        for batch in batches:
            vec = batch.column(1)
            n = len(vec)
            if n == 0:
                continue
            V, _ = _arrow_f64_matrix(vec, d)
            acc = np.zeros((n, k))
            nv = np.zeros(n)
            tmp = np.empty((n, k))
            for j in range(d):  # sequential per-dim fold — see docstring
                vj = V[:, j]
                np.multiply(vj[:, None], C[:, j][None, :], out=tmp)
                acc += tmp
                nv += vj * vj
            np.sqrt(nv, out=nv)
            denom = nv[:, None] * cn[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = acc / denom
            sims[(nv == 0.0)[:, None] | (cn == 0.0)[None, :]] = 0.0
            if np.isnan(sims).any():
                raise ValueError("ivf_assign: NaN similarity — non-finite input")
            best = np.argmax(sims, axis=1)  # first max == lowest-cid tiebreak
            maxv = sims[np.arange(n), best]
            for i in np.flatnonzero(maxv == 0.0):
                # Double.compare tiebreak at ±0.0: +0.0 beats -0.0, then
                # lowest cid within the winning sign (rare by
                # construction; IEEE == cannot see the sign)
                row = sims[i]
                zs = np.flatnonzero(row == 0.0)
                pos = zs[~np.signbit(row[zs])]
                best[i] = pos[0] if pos.size else zs[0]
            out = pa.array(cid_arr[best].astype(cid_np))
            yield pa.record_batch(
                [batch.column(0), batch.column(1), out],
                names=[corpus_id, corpus_vec, centroid_id],
            )

    return corpus.select(corpus_id, corpus_vec).mapInArrow(assign_batches, out_schema)


def nearest_centroid_ids(
    vd: Column, nv: Column, cents: list[tuple[int, list[float]]], nprobe: int = 1
) -> Column:
    """``array<long>`` of the ``nprobe`` nearest literal-centroid ids —
    max cosine, centroid-id-asc tiebreak, the exact ordering of the
    window-based path (the oracle hashes don't change).

    ``vd``/``nv`` are the row's double-cast vector and its l2 norm,
    MATERIALIZED ONCE by the caller and shared across all k centroid
    similarities; centroid norms are precomputed driver-side (Python's
    sequential ``sum`` is the same left fold as the ``aggregate`` HOF,
    so the value is bit-identical to in-engine ``l2_norm``).

    The whole centroid matrix enters the plan as ONE nested-array
    ``Literal`` node (``F.lit(list-of-lists)``) iterated by a
    ``transform`` HOF — not k expanded per-centroid expressions. This
    matters twice over: per-centroid ``F.array(*map(F.lit, …))`` trees
    carry k×dim AST nodes that Catalyst re-analyzes on EVERY action
    (~1 s/job at k=8, dim=64), and the fully-unrolled multiply-add
    alternative takes janino ~20 s to compile. The single-Literal form
    analyzes instantly and runs ~20× faster end-to-end at fixture scale
    with bitwise-identical values (same fold order throughout).

    Assumes uniform vector dims (the IVF contract) — the reference's -1
    mismatch edge can't arise inside one corpus."""
    import math

    mat = [[float(x) for x in cvec] for _, cvec in cents]
    norms = [math.sqrt(sum(x * x for x in cvec)) for cvec in mat]
    ids = [int(cid) for cid, _ in cents]
    cmat, cnorms, cids = lit_double_matrix(mat), lit_doubles(norms), lit_longs(ids)

    def sim(i: Column) -> Column:
        nc = F.element_at(cnorms, i + 1)
        return F.when((nv == 0.0) | (nc == 0.0), F.lit(0.0)).otherwise(
            dot(vd, F.element_at(cmat, i + 1)) / (nv * nc)
        )

    ranked = F.array_sort(
        F.transform(
            F.sequence(F.lit(0), F.lit(len(cents) - 1)),
            lambda i: F.struct(
                (-sim(i)).alias("ns"), F.element_at(cids, i + 1).cast("long").alias("cid")
            ),
        )
    )
    return F.transform(F.slice(ranked, 1, int(nprobe)), lambda s: s["cid"])


def _fold_unit(key: Column) -> Column:
    """md5(key) → [-1, 1), fp64-exact (13 hex chars / 2^52) — the same
    construction as ``embedder.hash_embedding_expr``."""
    v = F.conv(F.substring(F.md5(key), 1, 13), 16, 10).cast("double") / F.lit(float(1 << 52))
    return v * 2.0 - 1.0


def _fold_unit_py(key: str) -> float:
    """Python twin of :func:`_fold_unit` — bit-identical (md5 hex → exact
    integer < 2^52 → fp64)."""
    import hashlib

    return int(hashlib.md5(key.encode()).hexdigest()[:13], 16) / float(1 << 52) * 2.0 - 1.0


def hyperplane(p: int | Column, dim: int, seed: str = "plane") -> Column:
    """Deterministic random hyperplane p as an array<double> Column.

    For a concrete ``p`` the fold is evaluated driver-side (hashlib,
    bit-identical to the SQL expression) and embedded as a constant array
    — otherwise every ROW would recompute ``dim`` md5 folds, turning a
    per-corpus constant into a per-row cost. The Column form is kept for
    symbolic ``p``.
    """
    if isinstance(p, int):
        # ONE array Literal node (a single py4j call), not dim expanded
        # F.lit()s: per-component literals cost ~dim py4j round-trips per
        # plane at build time and dim AST nodes per re-analysis — the
        # same lesson as nearest_centroid_ids' single-Literal matrix.
        return lit_doubles([_fold_unit_py(f"{seed}|{p}|{j}") for j in range(int(dim))])
    return F.transform(
        F.sequence(F.lit(0), F.lit(int(dim) - 1)),
        lambda j: _fold_unit(
            F.concat(F.lit(seed + "|"), p.cast("string"), F.lit("|"), j.cast("string"))
        ),
    )


def hyperplane_buckets(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    seed: str = "plane",
    out_col: str = "bucket",
) -> DataFrame:
    """Attach the LSH bucket id: bit p = [⟨v, plane_p⟩ >= 0].

    Pure per-row expression — embarrassingly parallel, no shuffle. With 8
    planes the corpus splits into ≤256 buckets; real deployments pick
    n_planes ≈ log2(corpus/target_bucket_size) and write the table
    partitioned by bucket so a probe is a partition-pruned scan.
    """
    v = as_double(F.col(vec_col))
    # The whole plane matrix enters as ONE nested-array Literal iterated
    # by a transform HOF (the nearest_centroid_ids move): a per-plane
    # expression loop costs ~n_planes x dim py4j round-trips per CALL at
    # build time (~0.5 s/query measured at 8x64) for the identical
    # per-row work. Fold order inside each dot is unchanged, so bucket
    # ids are bit-identical to the unrolled form.
    mat = lit_double_matrix([[_fold_unit_py(f"{seed}|{p}|{j}") for j in range(int(dim))] for p in range(int(n_planes))])
    powers = lit_longs([1 << p for p in range(int(n_planes))])
    bits = F.transform(
        F.sequence(F.lit(0), F.lit(int(n_planes) - 1)),
        lambda p: F.when(
            dot(v, F.element_at(mat, p + 1)) >= 0.0,
            F.element_at(powers, p + 1).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )
    bucket = F.aggregate(bits, F.lit(0).cast("long"), lambda acc, x: acc + x)
    return df.withColumn(out_col, bucket)


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "qvec",
    dim: int = 64,
    n_planes: int = 8,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's bucket.

    The bucket equi-join replaces the exact path's cross join — candidate
    count shrinks by ~2^n_planes. Queries are broadcast; the corpus-side
    bucket column would be precomputed at ingest in a real deployment.
    """
    c = hyperplane_buckets(corpus, corpus_vec, dim, n_planes)
    q = hyperplane_buckets(queries, query_vec, dim, n_planes)
    scored = (
        c.join(F.broadcast(q), "bucket")
        .select(
            F.col(query_id),
            F.col(corpus_id),
            cosine_sim(F.col(corpus_vec), F.col(query_vec)).alias("similarity"),
        )
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("similarity"), F.asc(corpus_id))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")


def multiprobe_buckets(
    df: DataFrame,
    vec_col: str,
    dim: int = 64,
    n_planes: int = 8,
    n_extra_probes: int = 2,
    seed: str = "plane",
    out_col: str = "bucket",
) -> DataFrame:
    """Attach 1 + ``n_extra_probes`` probe buckets per row (exploded).

    Classic multiprobe LSH (Lv et al., VLDB'07): a query near a hyperplane
    almost landed in the adjacent bucket, so probe the base bucket PLUS the
    buckets reached by flipping the bits whose margin \\|⟨v, plane_p⟩\\| is
    smallest — those are the most likely homes of missed neighbors. Recall
    rises toward exact as probes grow, at (1+P)× probe cost, without
    re-hashing or extra tables; the probe set is a pure function of the
    vector, so the approximate result stays oracle-checkable.

    Output: one row per (input row, probe), ``out_col`` = probe bucket id.
    """
    v = as_double(F.col(vec_col))
    # single-Literal plane matrix, as in hyperplane_buckets (identical
    # fold order -> identical dots/margins/buckets)
    mat = lit_double_matrix([[_fold_unit_py(f"{seed}|{p}|{j}") for j in range(int(dim))] for p in range(int(n_planes))])
    powers = lit_longs([1 << p for p in range(int(n_planes))])
    seq = F.sequence(F.lit(0), F.lit(int(n_planes) - 1))
    dots_arr = F.transform(seq, lambda p: dot(v, F.element_at(mat, p + 1)))
    base = F.aggregate(
        F.transform(
            seq,
            lambda p: F.when(
                F.element_at(dots_arr, p + 1) >= 0.0,
                F.element_at(powers, p + 1).cast("long"),
            ).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    # rank planes by |margin| asc, deterministic plane-index tiebreak
    margins = F.array_sort(
        F.transform(
            seq,
            lambda p: F.struct(
                F.abs(F.element_at(dots_arr, p + 1)).alias("m"), p.alias("p")
            ),
        )
    )
    flips = F.transform(
        F.slice(margins, 1, int(n_extra_probes)),
        # pow→long is exact for p < 53; shiftleft needs a literal bit count
        lambda s: base.bitwiseXOR(F.pow(F.lit(2.0), s["p"]).cast("long")).cast("long"),
    )
    probes = F.concat(F.array(base), flips)
    return df.withColumn(out_col, F.explode(probes))


def ann_lsh_multiprobe_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "qvec",
    dim: int = 64,
    n_planes: int = 8,
    n_extra_probes: int = 2,
) -> DataFrame:
    """LSH top-k with multiprobe: each query scans its own bucket plus the
    ``n_extra_probes`` lowest-margin neighbor buckets.

    Same join shape as :func:`ann_lsh_topk` — the corpus keeps ONE bucket
    per vector (the stored layout never changes); only the tiny broadcast
    query side fans out ×(1+P). No dedup is needed: a query's probe
    buckets are pairwise distinct (base ⊕ distinct single bits) and each
    corpus vector lives in exactly one bucket, so a (query, corpus) pair
    can match at most one probe.
    """
    c = hyperplane_buckets(corpus, corpus_vec, dim, n_planes)
    q = multiprobe_buckets(queries, query_vec, dim, n_planes, n_extra_probes)
    scored = (
        c.join(F.broadcast(q), "bucket")
        .select(
            F.col(query_id),
            F.col(corpus_id),
            cosine_sim(F.col(corpus_vec), F.col(query_vec)).alias("similarity"),
        )
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("similarity"), F.asc(corpus_id))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame | list[tuple[int, list[float]]],
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    centroid_id: str = "centroid_id",
    centroid_vec: str = "cvec",
    dim: int | None = None,
) -> DataFrame:
    """Invert the corpus by nearest centroid (max cosine, centroid-id-asc
    tiebreak). Output adds ``centroid_id`` — write partitioned/bucketed
    by it to make probes partition-pruned.

    When the centroid table is small (≤ :data:`LITERAL_CENTROID_MAX`,
    the normal case — a coarse quantizer IS small), assignment compiles
    to a per-row argmax expression over literal centroid arrays: the
    corpus is scanned once and NEVER shuffled. Larger centroid sets fall
    back to broadcast crossJoin + per-vector window (which shuffles the
    corpus by id)."""
    cents = _centroids_as_literals(centroids, centroid_id, centroid_vec)
    if cents is not None and len(cents) == 0:
        # zero centroids (ADVICE r12): every form degenerates to an
        # empty assignment (the join path crossJoined an empty side);
        # return it explicitly instead of building a plan that indexes
        # into an empty centroid matrix.
        return corpus.select(corpus_id, corpus_vec).where(F.lit(False)).withColumn(
            centroid_id, F.lit(None).cast("bigint")
        )
    if cents is not None and len(cents) <= LITERAL_ASSIGN_MAX:
        pre = corpus.select(
            corpus_id, corpus_vec, as_double(F.col(corpus_vec)).alias("__vd")
        ).withColumn("__nv", F.sqrt(dot(F.col("__vd"), F.col("__vd"))))
        nearest = nearest_centroid_ids(F.col("__vd"), F.col("__nv"), cents, nprobe=1)
        return pre.select(
            corpus_id, corpus_vec, F.element_at(nearest, 1).alias(centroid_id)
        )
    # r13 (guide §4.2, VERDICT r12 item 1): above the literal bound,
    # assignment is a mapInArrow + numpy blocked pass — ONE map-only
    # scan, no |corpus|·k pair relation, no shuffle (the previous
    # broadcast-join + max_by form pushed 9e7 BroadcastNestedLoopJoin
    # rows per sf10 graph-build assignment). Values bit-identical to
    # both join paths (same IEEE fold order — see _assign_arrow).
    # centroid_id dtype follows the centroids relation, as the join
    # path's max_by did.
    from pyspark.sql.types import LongType

    if isinstance(centroids, DataFrame):
        cid_type = centroids.schema[centroid_id].dataType
    else:
        cid_type = LongType()  # the rebuilt-DataFrame path used bigint
    acents = (
        cents
        if cents is not None
        else _collect_centroids(centroids, centroid_id, centroid_vec, ARROW_ASSIGN_MAX)
    )
    if acents is not None:
        return _assign_arrow(
            corpus, acents, corpus_id, corpus_vec, centroid_id, cid_type
        )
    # >ARROW_ASSIGN_MAX centroids only (no catalog path reaches here).
    # Broadcast-join + max_by aggregate: the argmax runs as a partial
    # (map-side) aggregate right on top of the broadcast join, so the
    # only shuffle carries one slim row per corpus vector — never the
    # k-fanned score relation, and never a per-vector sort window.
    # Both norms are materialized ONCE per side before the join (one
    # fold per pair instead of three — same values, the literal path's
    # exact arithmetic). Tie order matches the window form and the
    # oracle: csim DESC, centroid_id ASC == max over
    # struct(csim, -centroid_id).
    if dim is not None:
        # r12 optimization (guide §4.1): the per-(vector, centroid) HOF
        # cosine paid ~250 interpreted lambda evals per pair — at sf10
        # the 200k×447 graph-build assignment alone was ~250 s. The
        # unrolled sequential fold has the identical IEEE op order
        # (inputs are already array<double>, so the as_double pass was
        # a value no-op); whole-stage codegen is scope-disabled (the
        # wide fold exceeds the huge-method JIT limit when fused).
        from ..functions.vector import dot_fold_sql
        from ..session import scoped_no_wholestage_codegen

        scoped_no_wholestage_codegen(corpus.sparkSession)
        nv = F.expr(f"SQRT({dot_fold_sql('__vd', '__vd', dim)})")
        cn = F.expr(f"SQRT({dot_fold_sql('__cd', '__cd', dim)})")
        csim = F.expr(
            f"CASE WHEN __nv = 0.0D OR __cn = 0.0D THEN 0.0D"
            f" ELSE {dot_fold_sql('__vd', '__cd', dim)} / (__nv * __cn) END"
        )
    else:
        nv = F.sqrt(dot(F.col("__vd"), F.col("__vd")))
        cn = F.sqrt(dot(F.col("__cd"), F.col("__cd")))
        csim = cosine_sim_prenormed(
            F.col("__vd"), F.col("__nv"), F.col("__cd"), F.col("__cn")
        )
    pre = corpus.select(
        corpus_id, corpus_vec, as_double(F.col(corpus_vec)).alias("__vd")
    ).withColumn("__nv", nv)
    cpre = centroids.select(
        F.col(centroid_id).alias("__cid"),
        as_double(F.col(centroid_vec)).alias("__cd"),
    ).withColumn("__cn", cn)
    scored = pre.crossJoin(F.broadcast(cpre)).select(
        corpus_id,
        corpus_vec,
        "__cid",
        csim.alias("__csim"),
    )
    return scored.groupBy(corpus_id).agg(
        F.first(corpus_vec).alias(corpus_vec),  # constant within the group
        F.max_by(
            F.col("__cid"), F.struct(F.col("__csim"), (-F.col("__cid")).alias("__nc"))
        ).alias(centroid_id),
    )


def ivf_append(
    new_vectors: DataFrame,
    centroids: DataFrame | list[tuple[int, list[float]]],
    index_path: str,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> None:
    """Append a batch to a persisted IVF index WITHOUT rebuilding it —
    the distributed analog of the reference's incremental ``add()``
    (``App.tsx:79``) at index level, and FAISS ``IndexIVF.add``
    semantics: assignment uses the index's FROZEN quantizer (nearest
    existing centroid; no retrain), and the write is parquet
    ``mode("append")`` partitioned by ``centroid_id`` — only the
    partitions the batch lands in gain files, existing lists are never
    rewritten. Serving needs no code change: the next partition-pruned
    probe scan simply sees the new files. At 100 TB this is the
    difference between an O(batch) ingest step and an O(corpus)
    rebuild; quantizer drift is a monitored quantity
    (``plans.ann_incremental.ann_ivf_staleness_drift``), not a rebuild
    trigger per batch. Each batch adds one file per touched partition —
    schedule :func:`ivf_compact` when small files accumulate."""
    assigned = ivf_assign(new_vectors, centroids, corpus_id, corpus_vec)
    assigned.write.mode("append").partitionBy("centroid_id").parquet(index_path)


def ivf_recover(index_path: str) -> bool:
    """Mechanical crash recovery for :func:`ivf_compact`'s rename swap.

    The swap has a window between ``rename(index_path, .old<pid>)`` and
    ``rename(.compact<pid>, index_path)`` where a hard crash (not just an
    ``OSError``) leaves NO directory at ``index_path`` — the live index
    stranded under the pid-suffixed ``.old`` name. This makes recovery
    mechanical: if the live directory is missing but a ``.old*`` backup
    exists, restore it (the backup IS the pre-compaction live index,
    row-identical to the compacted one); then clear any leftover
    ``.compact*``/extra ``.old*`` debris. If the live directory exists,
    leftovers are garbage from a completed-or-failed run and are removed.

    Returns True if a stranded index was restored. Call it before
    compacting (done automatically) or before serving from a path that
    might have crashed mid-compact. Single-writer assumption: compaction
    is a maintenance job — do not run two compactions of the same index
    concurrently (the pid suffix only keeps a crashed run's debris from
    colliding with the next run's temp names). The rename swap itself is
    local-filesystem-only; an object-store deployment would commit a
    manifest instead and needs no rename recovery.
    """
    import glob
    import os
    import shutil

    debris = sorted(glob.glob(glob.escape(index_path) + ".old*")) + sorted(
        glob.glob(glob.escape(index_path) + ".compact*")
    )
    restored = False
    if not os.path.isdir(index_path):
        baks = [p for p in debris if ".old" in os.path.basename(p)]
        if baks:
            os.rename(baks[0], index_path)
            debris.remove(baks[0])
            restored = True
    if os.path.isdir(index_path):
        for p in debris:
            shutil.rmtree(p, ignore_errors=True)
    return restored


def ivf_compact(spark, index_path: str) -> None:
    """Compact a persisted IVF index in place.

    Every :func:`ivf_append` batch adds one file per touched
    ``centroid_id`` partition; after many small batches a probe scan
    opens dozens of tiny files per list (the classic streaming-sink
    small-files problem). Compaction rewrites the store with the rows
    hash-clustered by list id — one task owns each list, so each
    partition directory collapses to a single file — then swaps the
    directory in atomically (rename-shuffle; an object-store deployment
    would commit a new manifest instead). Contents are byte-identical
    row-wise: serving needs no coordination beyond not starting a new
    scan mid-swap, and results are unchanged (pytest-pinned).
    """
    import os
    import shutil

    ivf_recover(index_path)  # heal a prior crashed swap before touching anything
    tmp = index_path + f".compact{os.getpid()}"
    bak = index_path + f".old{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    (
        spark.read.parquet(index_path)
        .repartition("centroid_id")
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(tmp)
    )
    os.rename(index_path, bak)
    try:
        os.rename(tmp, index_path)
    except OSError:  # restore the live store if the swap fails
        os.rename(bak, index_path)
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    shutil.rmtree(bak, ignore_errors=True)


def ann_ivf_topk(
    corpus: DataFrame,
    centroids: DataFrame | list[tuple[int, list[float]]],
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    centroid_id: str = "centroid_id",
    centroid_vec: str = "cvec",
    query_id: str = "query_id",
    query_vec: str = "qvec",
    inverted: DataFrame | None = None,
) -> DataFrame:
    """IVF probe: per query, search the ``nprobe`` nearest inverted lists.

    Join order at scale: (query × centroid) is tiny and broadcast; the
    corpus side is touched only on the probed centroid ids. Small
    centroid tables (the normal case) take the literal-expression path
    for both the corpus inversion and the query probes — see
    :func:`ivf_assign`.

    ``inverted``: a prebuilt ``(corpus_id, corpus_vec, centroid_id)``
    inverted table (from :func:`ivf_assign`, typically persisted or
    written partitioned by centroid id). Corpus inversion is index
    BUILD, not query work — serving systems assign each vector to its
    list once at ingest; pass it here so per-query cost is only the
    probed lists."""
    cents = _centroids_as_literals(centroids, centroid_id, centroid_vec)
    if inverted is None:
        if cents is not None:
            cpre = corpus.select(
                corpus_id, corpus_vec, as_double(F.col(corpus_vec)).alias("__vd")
            ).withColumn("__nv", F.sqrt(dot(F.col("__vd"), F.col("__vd"))))
            inverted = cpre.select(
                corpus_id,
                corpus_vec,
                F.element_at(
                    nearest_centroid_ids(
                        F.col("__vd"), F.col("__nv"), cents, nprobe=1
                    ),
                    1,
                ).alias(centroid_id),
            )
        else:
            inverted = ivf_assign(
                corpus, centroids, corpus_id, corpus_vec, centroid_id, centroid_vec
            )
    if cents is not None:
        # two selects: a Generate (explode) in the same projection as the
        # struct-array ranking strips the struct field names
        qpre = queries.select(
            query_id, query_vec, as_double(F.col(query_vec)).alias("__vd")
        ).withColumn("__nv", F.sqrt(dot(F.col("__vd"), F.col("__vd"))))
        probes = qpre.select(
            query_id,
            query_vec,
            nearest_centroid_ids(
                F.col("__vd"), F.col("__nv"), cents, nprobe=int(nprobe)
            ).alias("__probes"),
        ).select(query_id, query_vec, F.explode("__probes").alias(centroid_id))
    else:
        q_scored = queries.crossJoin(F.broadcast(centroids)).withColumn(
            "__qsim", cosine_sim(F.col(query_vec), F.col(centroid_vec))
        )
        wq = Window.partitionBy(query_id).orderBy(F.desc("__qsim"), F.asc(centroid_id))
        probes = (
            q_scored.withColumn("__rn", F.row_number().over(wq))
            .filter(F.col("__rn") <= nprobe)
            .select(query_id, query_vec, centroid_id)
        )
    scored = inverted.join(F.broadcast(probes), centroid_id).select(
        F.col(query_id),
        F.col(corpus_id),
        cosine_sim(F.col(corpus_vec), F.col(query_vec)).alias("similarity"),
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("similarity"), F.asc(corpus_id))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")
