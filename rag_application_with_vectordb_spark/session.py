"""SparkSession construction / tuning.

Two entry points:

- :func:`get_spark` — build a local session with scale-appropriate defaults
  (used by tests and ``bench.py``).
- :func:`tune` — apply the *runtime-settable* subset of those defaults to a
  session we did not create (the driver hands us its own session in
  ``__spark_entry__.py``); never restarts or reconfigures static conf.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

#: Runtime-settable confs every query in this engine assumes.
#: - UTC session time zone: parquet timestamps are naive; DuckDB (the
#:   correctness oracle) treats them as UTC — Spark must agree or every
#:   date boundary comparison flaps (see pitfalls in the PySpark docs).
#: - AQE: runtime coalesce + skew-join handling; at 100 TB the static
#:   shuffle-partition guess is always wrong somewhere.
RUNTIME_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Auto-broadcast only true dimension tables. The 10 MB default let the
    # column-pruned lineitem FACT become the broadcast build side of
    # syntax-ordered SQL joins (a single-threaded hash build probed by a
    # 1-partition dim scan). Real dims here are <= ~300 KB; facts that
    # turn out small at runtime are still broadcast by AQE's
    # shuffle-join -> broadcast conversion, which sees actual sizes.
    "spark.sql.autoBroadcastJoinThreshold": str(2 * 1024 * 1024),
    # Whole-stage codegen ON is the baseline for every query; the wide
    # unrolled-kernel plans (bench_knn_1m family) scope-disable it for
    # their own execution via plans/ann_queries._no_wscg because their
    # fused stage exceeds HotSpot's huge-method JIT limit and would run
    # in the bytecode interpreter. tune() runs at the head of EVERY
    # registered query builder (pinned by
    # tests/test_registry_contract.py::test_every_query_calls_tune,
    # r13), so the disable never outlives the one plan it was set for.
    "spark.sql.codegen.wholeStage": "true",
    # Per-stage safety net (r13): Spark's own fallback threshold for a
    # generated method, aligned to HotSpot's -XX:HugeMethodLimit (8000
    # bytecode bytes — a method past it is NEVER JIT-compiled, on any
    # JVM). A fused stage whose largest generated method cannot be
    # split below 8 KB would silently run in the bytecode interpreter
    # (the r12 finding, ~5x); with this limit Spark deactivates
    # whole-stage codegen for THAT subtree only and per-operator
    # projections (which split fine) take over. The explicit _no_wscg
    # disables stay on the kernel-dominated plans because they measured
    # faster still (the fallback path re-generates the fused source
    # each execution — pq_reconstruction_error 2.1 vs 2.75 s measured);
    # this conf protects any OTHER caller that builds a huge stage with
    # codegen on. Stages that split into <8 KB methods are unaffected
    # (the check is on the largest compiled method, not the stage).
    "spark.sql.codegen.hugeMethodLimit": "8000",
}


def _ship_package(spark: SparkSession) -> None:
    """Make this package importable inside executor Python workers.

    Pandas-UDF closures reference package-level functions, which
    cloudpickle serializes *by module reference* — so a worker whose
    PYTHONPATH lacks the repo (e.g. the hosting driver runs from another
    cwd, or a real cluster's executors) would fail to deserialize them.
    Shipping a zip via ``addPyFile`` fixes both local and cluster mode;
    done once per SparkContext.
    """
    sc = spark.sparkContext
    if getattr(sc, "_rag_pkg_shipped", False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(pkg_dir)
    zpath = os.path.join(tempfile.gettempdir(), f"{pkg_name}-pyfiles.zip")
    with zipfile.ZipFile(zpath, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.join(pkg_name, os.path.relpath(full, pkg_dir)))
        # the vendored protobuf runtime (transformWithStateInPandas'
        # worker-side state protocol) rides the same zip so executor
        # Python workers can import google.protobuf when the runtime
        # lacks it — see protobuf_compat.py
        vend = os.path.join(os.path.dirname(pkg_dir), "vendor", "google")
        if os.path.isdir(vend):
            for root, _dirs, files in os.walk(vend):
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        zf.write(
                            full,
                            os.path.join(
                                "google", os.path.relpath(full, vend)
                            ),
                        )
    try:
        sc.addPyFile(zpath)
    except Exception:
        pass  # already added with identical contents, or a locked context
    sc._rag_pkg_shipped = True


# Persisted relations minted by multi-pass operator builders
# (operators/prefix.bucketed_running_sum, the histogram cumulatives in
# plans/analytics.py), keyed by applicationId. Spark's CacheManager
# dedupes IDENTICAL plans, but a long-running session invoking many
# DIFFERENT builders accumulates distinct cache entries — the
# cache-pressure class the r10 sf10 sweep heap-OOMed on (ADVICE r10).
# ``release_tracked_persists`` is the explicit hook; sweep tooling calls
# it alongside its periodic ``catalog.clearCache()`` so the Python-side
# references are dropped too.
_TRACKED_PERSISTS: dict[str, list] = {}


def track_persist(df):
    """Register a persist()-ed DataFrame for later bulk release.

    Returns ``df`` unchanged so call sites stay one-liners:
    ``src = track_persist(df.persist(...))``. Tracking never affects
    values — only when storage is handed back.
    """
    try:
        app = df.sparkSession.sparkContext.applicationId
        _TRACKED_PERSISTS.setdefault(app, []).append(df)
    except Exception:
        pass  # an untracked persist is only a missed release, never wrong
    return df


def release_tracked_persists(spark: SparkSession) -> int:
    """Unpersist every relation tracked in this application; return the
    count released. Idempotent (unpersist on a cold relation is a no-op)
    and safe BETWEEN queries / for deterministic lineage: a released
    relation recomputes from lineage if some later plan still references
    it. For a NON-deterministic source feeding a multi-pass builder
    (bucketed_running_sum's three passes must agree), a release between
    passes would reintroduce the disagreement the persist prevents —
    such inputs must be checkpointed first, as operators/prefix.py
    already requires (ADVICE r11).

    Also evicts tracked lists of OTHER (stopped) applications: entries
    are keyed by applicationId, so a process that starts several
    sessions without calling this hook would otherwise leak every prior
    app's references for process lifetime (ADVICE r11). Relations from
    a stopped app cannot be unpersisted (their context is gone) — the
    references are simply dropped.
    """
    try:
        app = spark.sparkContext.applicationId
    except Exception:
        return 0
    rels = _TRACKED_PERSISTS.pop(app, [])
    # stale keys belong to stopped apps; their JVM state died with the
    # context, only the Python references linger — drop them
    for stale in [k for k in _TRACKED_PERSISTS if k != app]:
        del _TRACKED_PERSISTS[stale]
    n = 0
    for r in rels:
        try:
            r.unpersist()
            n += 1
        except Exception:
            pass
    return n


def scoped_no_wholestage_codegen(spark: SparkSession) -> None:
    """Scope-disable whole-stage codegen for the CURRENT query's
    execution — the wide unrolled fixed-dim kernels (bench_knn_1m
    family, cosine_sim_sql at dim 64). Every other query's ``tune()``
    resets it to true (RUNTIME_CONF), so the disable only covers the
    plan built right after this call. This is NOT a local-mode tweak:
    on any JVM, one fused WholeStageCodegen method holding ~200+
    unrolled terms exceeds the 8 KB bytecode huge-method JIT limit (and
    cannot be split while its inputs are codegen locals), so it runs in
    the bytecode interpreter — measured 3.9 s vs 0.8 s for the same
    plan at 1M×64 (r12 optimization round)."""
    try:
        spark.conf.set("spark.sql.codegen.wholeStage", "false")
    except Exception:  # noqa: BLE001 — locked conf: values unaffected
        pass


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine defaults to an existing session."""
    for k, v in RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Some confs may be locked by the hosting driver; queries
            # remain correct, only determinism-vs-oracle may be weaker.
            pass
    _ship_package(spark)
    return spark


def get_spark(
    app_name: str = "rag_application_with_vectordb_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build a local SparkSession with engine defaults.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` or all cores. Shuffle
    partitions default to the core count — the local-mode sweet spot
    (the 200 default over-parallelizes small scans; a real cluster
    deployment would size this to ~2-3x total executor cores and lean
    on AQE coalescing).
    """
    # Must precede JVM launch: local-mode Python workers inherit the
    # JVM's env, and the vendored-protobuf fallback rides an env var
    # (see protobuf_compat.ensure_protobuf).
    from .protobuf_compat import ensure_protobuf

    ensure_protobuf()
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cpus), 4)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
    )
    for k, v in RUNTIME_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # Session bring-up includes executor-thread + shuffle-infra spin-up,
    # which local mode otherwise defers to the FIRST job — mis-attributing
    # ~2 s of one-time scheduler/codegen warmup to whichever query runs
    # first (a real cluster pre-starts executors for the same reason).
    # One tiny shuffling job pays it here, inside session construction
    # where it belongs.
    try:
        spark.range(int(cpus)).repartition(2).count()
    except Exception:
        pass  # a failed warm-up must never fail session construction
    return tune(spark)
