"""Benchmark harness: runs the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>}

Each query is forced end-to-end with the noop sink (full computation,
no driver collect cost, no result materialization skew).

Failure-isolated: one red query must never zero out the round's
performance signal (round 3's bench died on its first query and recorded
nothing). Per-query exceptions land in an ``errors`` map; the JSON line
always prints.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rag_application_with_vectordb_spark.plans.registry import load_all
from rag_application_with_vectordb_spark.session import get_spark

#: Headline set: the reference's core query path (knn/chunk/context) plus
#: the heavyweight relational / dedup / streaming-twin representatives.
#: Round-7 refresh (comparability note): ``knn_batch`` and ``ann_lsh_topk``
#: were near-duplicates of the retained ``knn_topk`` / ``ann_ivf_topk``
#: paths (warm 0.76 + 0.86 s at sf0.1) and were swapped for two round-7
#: family representatives ``cdc_snapshot_diff`` + ``text_bpe_train_merges``
#: (warm ~0.7 + ~0.3 s) — warm total comparable round-over-round within
#: ~0.6 s; cold total grows ~4 s of one-time BPE fold-lambda JIT.
HEADLINE = [
    "knn_topk",
    "bench_knn_1m",
    "bench_knn_1m_ivf",
    "ann_ivf_topk",
    "rag_e2e_retrieval",
    "chunk_sliding_window",
    "embed_hash_components",
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_regional_revenue",
    "q7_nation_pair_revenue",
    "q9_product_profit",
    "q18_large_volume_customers",
    "q21_sole_late_supplier",
    "window_running_spend",
    "topk_parts_per_brand",
    "asof_purchase_to_click",
    "range_join_error_after_purchase",
    "dedup_exact",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash_signatures",
    "dedup_embedding_topk_pairs",
    "text_quality_scores",
    "events_tumbling_hourly",
    "events_sessionized",
    "cdc_snapshot_diff",
    "text_bpe_train_merges",
]


def compute_regressions(times: dict, prev: dict | None) -> dict:
    """Per-query regression flags: current warm median beyond 1.5x the
    previous-round median plus its recorded warm spread. ``prev`` is a
    bench_history.jsonl record ({"queries": ..., "queries_warm_spread":
    ...}) or None (no baseline yet → no flags)."""
    if not prev:
        return {}
    out: dict[str, dict] = {}
    for name, cur in times.items():
        p = prev.get("queries", {}).get(name)
        ps = prev.get("queries_warm_spread", {}).get(name, 0.0) or 0.0
        if p is not None and cur > p * 1.5 + ps:
            out[name] = {"prev": p, "cur": cur, "prev_spread": ps}
    return out


def last_history_record(hist_path: str, sf_val) -> dict | None:
    """Latest fully-green record for this scale factor, or None."""
    if not os.path.exists(hist_path):
        return None
    prev = None
    for line in open(hist_path):
        try:
            rec = json.loads(line)
            if rec.get("sf") == sf_val and rec.get("queries"):
                prev = rec
        except (ValueError, KeyError):
            continue
    return prev


def history_anchor(hist_path: str, sf_val, n: int = 12) -> dict | None:
    """Rolling drift anchor (VERDICT r11 item 2): the BEST (minimum)
    fully-green quiet-regime headline total over the last ``n`` records
    at this sf, plus each query's best recorded warm median. The
    prev-round regression gate is a RATCHET — r9→r11 quiet drifted
    17.1→~22 s with ``n_regressed: 0`` every round because each round's
    tolerance re-anchored on the previous round's (already drifted)
    numbers. Comparing against the rolling best makes compounding creep
    visible even when every single step is inside warm spread.

    Records stamped ``regime: contended`` are excluded (they measure
    the machine); pre-r11 records carry no regime stamp and are treated
    as quiet — the one known contended artifact (r10 official) was
    never appended to history by design.
    """
    if not os.path.exists(hist_path):
        return None
    recs = []
    for line in open(hist_path):
        try:
            rec = json.loads(line)
        except ValueError:
            continue
        if rec.get("sf") != sf_val or not rec.get("queries"):
            continue
        if rec.get("regime") == "contended":
            continue
        recs.append(rec)
    recs = recs[-n:]
    if not recs:
        return None
    with_total = [r for r in recs if isinstance(r.get("value"), (int, float))]
    best_rec = min(with_total, key=lambda r: r["value"]) if with_total else None
    best_job = best_rec.get("cpu_ref_job") if best_rec else None
    best_q: dict[str, float] = {}
    for r in recs:
        for k, v in r["queries"].items():
            if v is not None and (k not in best_q or v < best_q[k]):
                best_q[k] = v
    return {
        "best_total": best_rec["value"] if best_rec else None,
        "best_cpu_ref": best_rec.get("cpu_ref") if best_rec else None,
        "best_cpu_ref_job": best_job,
        "n_records": len(recs),
        "best_queries": best_q,
    }


def spread_norms(hist_path: str, sf_val) -> dict[str, float]:
    """Per-query warm-spread family norm: the MEDIAN of each query's
    recorded warm spreads across history records at this sf. The norm
    is what 'quiet machine' means for that query — contended runs show
    spreads ~10x these (BENCH_r10: bench_knn_1m spread 1.59 s vs a
    0.10 s family norm)."""
    if not os.path.exists(hist_path):
        return {}
    samples: dict[str, list[float]] = {}
    for line in open(hist_path):
        try:
            rec = json.loads(line)
        except ValueError:
            continue
        if rec.get("sf") != sf_val:
            continue
        for name, s in (rec.get("queries_warm_spread") or {}).items():
            if s is not None:
                samples.setdefault(name, []).append(float(s))
    return {
        name: sorted(v)[len(v) // 2] for name, v in samples.items() if v
    }


def detect_contention(
    spread: dict[str, float], norms: dict[str, float]
) -> tuple[bool, dict[str, dict]]:
    """VERDICT r10 item 1: the official r10 artifact recorded a
    contended run (39.5 s / n_regressed 19) for code that measured
    18-19 s quiet, and shipped un-annotated. Flag a query as noisy
    when its warm spread exceeds 3x its family norm plus a 0.05 s
    floor (absorbs scheduler jitter on sub-100 ms queries); call the
    RUN contended when >= max(3, a quarter of the suite) are noisy —
    machine contention inflates spreads suite-wide, a real plan
    regression moves one query's median with a normal spread."""
    noisy = {}
    for name, s in spread.items():
        norm = norms.get(name)
        if norm is None:
            continue
        if s > 3.0 * norm + 0.05:
            noisy[name] = {"spread": s, "family_norm": norm}
    measured = [n for n in spread if n in norms]
    contended = len(noisy) >= max(3, len(measured) // 4) if measured else False
    return contended, noisy


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    specs = load_all()
    # Cold-number interpretability: a fresh machine starts with an empty
    # index store, so the cold pass of bench_knn_1m_ivf includes the
    # ONE-TIME 1M index build (~25 s extra; measured ~80 s vs ~44 s
    # cold_total at sf0.1). Record which regime this run measured.
    try:
        from rag_application_with_vectordb_spark.plans.ann_queries import _b1m_store

        index_prebuilt = os.path.isdir(_b1m_store())
    except Exception:  # noqa: BLE001 — observability only, never fail the bench
        index_prebuilt = None
    spark = get_spark("bench")
    errors: dict[str, str] = {}

    # Scaling observability (VERDICT r12 item 2): record what the session
    # ACTUALLY runs with, so the driver's two-point CPU scaling check can
    # distinguish "the $SPARK_GRAFT_CPUS knob was ignored" from "the host
    # is overcommitted / fixed-overhead-bound". Captured before any query
    # (the context is gone once spark.stop() runs).
    try:
        env_master = spark.sparkContext.master
        parallelism = spark.sparkContext.defaultParallelism
    except Exception:  # noqa: BLE001 — observability only
        env_master = None
        parallelism = None

    # CPU reference (r12): a FIXED JVM-side workload whose runtime
    # tracks machine speed only — plans never touch it. r12 found a
    # uniform ~1.5x suite-wide shift across two instance boots (every
    # per-query ratio 1.1-2.1x vs the rolling best, median 1.5,
    # including plans frozen since r6) that no per-query or spread
    # guard could classify; the host the numbers were recorded on is
    # not the host they are compared on. cpu_ref lets the drift flag
    # separate "machine got slower" (total/cpu_ref stable) from "plans
    # got slower" (total/cpu_ref up). MIN after one codegen warm-up
    # pass: the minimum is the host's achievable throughput ceiling
    # (jitter only ever ADDS time). Sizing lesson (late r12): the
    # original 200M-row reference ran ~0.15-0.35 s — task-scheduling
    # noise territory — and its min-of-5 still swung 2.1x between two
    # same-host quiet runs, which blew drift_vs_best_normalized to 2.6
    # on a run whose RAW drift was 1.14. A 1G-row reference (~1 s+)
    # amortizes per-task overhead; cpu_ref_job tags the workload so
    # normalization only ever compares like with like (records with a
    # different/absent tag fall back to the raw gate).
    CPU_REF_JOB = "range1e9_sumsq7_min3"

    def _cpu_ref() -> float | None:
        try:
            job = lambda: spark.range(1_000_000_000).selectExpr(  # noqa: E731
                "sum(id * id % 7) AS s"
            ).collect()
            job()  # codegen warm-up, untimed
            vals = []
            for _ in range(3):
                t0 = time.time()
                job()
                vals.append(time.time() - t0)
            return round(min(vals), 3)
        except Exception:  # noqa: BLE001 — observability only
            return None

    cpu_ref = _cpu_ref()

    def run(name: str) -> float | None:
        if name in errors:  # failed cold — don't re-raise twice more
            return None
        t0 = time.time()
        try:
            specs[name].fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        except Exception as exc:  # noqa: BLE001 — isolation is the point
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            return None
        return round(time.time() - t0, 3)

    # Four passes: the first pays one-time JVM/whole-stage-codegen
    # compile (tens of seconds for the widest generated classes — not a
    # property of the plan) and is reported separately per query; the
    # headline number is the per-query MEDIAN of three warm passes —
    # robust to a single GC/scheduler hiccup, and never mixed with the
    # cold pass, so rounds compare warm-to-warm.
    cold = {name: run(name) for name in HEADLINE}

    def warm_set() -> tuple[dict, dict]:
        warm = [{name: run(name) for name in HEADLINE} for _ in range(3)]
        t, s = {}, {}
        for name in HEADLINE:
            vals = sorted(w[name] for w in warm if w.get(name) is not None)
            if vals:  # median of however many warm passes succeeded (>=1)
                t[name] = vals[len(vals) // 2]
                s[name] = round(vals[-1] - vals[0], 3)
        return t, s

    times, spread = warm_set()

    # Contention guard (VERDICT r10 item 1): if this run's warm spreads
    # blow past family norms suite-wide, the numbers measure the
    # machine, not the plans. Re-measure once (contention is usually
    # transient); if still noisy, stamp the artifact regime=contended
    # so no reader mistakes it for a plan regression — and keep it out
    # of bench_history.jsonl so it can't become the next baseline.
    here = os.path.dirname(os.path.abspath(__file__))
    hist_path = os.path.join(here, "bench_history.jsonl")
    sf_val_early = float(sf) if sf.replace(".", "").isdigit() else sf
    norms = spread_norms(hist_path, sf_val_early)
    contended, noisy = detect_contention(spread, norms)
    remeasured = False
    regime = "quiet"
    if contended:
        remeasured = True
        total1 = sum(times.values())
        times2, spread2 = warm_set()
        contended2, noisy2 = detect_contention(spread2, norms)
        total2 = sum(times2.values())
        if not contended2 or total2 < total1:
            times, spread, contended, noisy = times2, spread2, contended2, noisy2
        if contended:
            # Host-jitter reclassification (r12): TRANSIENT contention
            # moves the total between back-to-back measurements; a host
            # whose steady-state jitter simply exceeds the recorded
            # family norms inflates SPREADS while REPRODUCING the
            # total. r12's host change made 16/27 queries "noisy" at
            # 5-20x the old host's norms on four consecutive runs whose
            # totals agreed within 6% — stamping those contended would
            # starve bench_history of new records and the norms could
            # never recalibrate to the new host (a deadlock: only
            # quiet-stamped runs append). Totals within 5% across the
            # two warm sets => quiet-jittery: treated as quiet for
            # history/baseline purposes, distinguishable in the
            # artifact, and its (larger, real) spreads recalibrate the
            # family norms for this host.
            if total1 and abs(total2 - total1) / min(total1, total2) <= 0.05:
                regime = "quiet-jittery"
            else:
                regime = "contended"

    # A query with zero successful warm passes would silently shrink the
    # headline total and break round-over-round comparability — report
    # total as null in that case (per-query times still carry the signal).
    fully_failed = [n for n in HEADLINE if n not in times]
    total = round(sum(times.values()), 3) if not fully_failed else None
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf

    # Regression gate (VERDICT r7 #6): r7 drifted +10% with no flag
    # (rag_e2e_retrieval +26%, q9 +21% went unremarked). Compare each
    # warm median against the LAST recorded run at the same sf (from
    # bench_history.jsonl — BENCH_r{N}.json keeps only a top-5 headline)
    # and flag any query beyond 1.5x the previous median plus its
    # recorded warm spread. Flag-only, never fail: a bench that refuses
    # to emit numbers is worse than one that emits flagged numbers.
    prev = last_history_record(hist_path, sf_val)
    regressions = compute_regressions(times, prev)

    # Drift anchor (VERDICT r11 item 2): also compare against the
    # rolling BEST quiet total, so N rounds of "0 regressed" can't hide
    # a compounding creep. Flag when > 1.25x the best; name the top
    # movers vs their own best medians so a drift hunt knows where to
    # start. Flag-only, like the regression gate.
    anchor = history_anchor(hist_path, sf_val)
    drift_vs_best = None
    drift_norm = None
    drift_flag = False
    drift_movers: dict[str, dict] = {}
    if anchor and anchor["best_total"] and total is not None:
        drift_vs_best = round(total / anchor["best_total"], 3)
        # machine-speed-normalized drift: ratio of plan-work per unit of
        # machine throughput. Only computable when BOTH records carry a
        # cpu_ref from the SAME reference workload (cpu_ref_job match —
        # late-r12 fix: the 200M-row reference was itself 2x-noisy, and
        # normalizing against it false-fired at 2.6 on a raw-1.14 run).
        # The flag needs BOTH gates over the bar: raw alone false-fires
        # on a host change (the r12 adjudication: raw 1.45x, every query
        # uniformly up, boot id changed between records) and normalized
        # alone false-fires on reference noise; a real plan regression
        # moves both. When normalization is unavailable, raw gates by
        # itself — the conservative pre-cpu_ref behavior.
        if cpu_ref and anchor.get("best_cpu_ref") and (
            anchor.get("best_cpu_ref_job") == CPU_REF_JOB
        ):
            drift_norm = round(
                (total / cpu_ref) / (anchor["best_total"] / anchor["best_cpu_ref"]), 3
            )
        drift_flag = drift_vs_best > 1.25 and (
            drift_norm is None or drift_norm > 1.25
        )
        if drift_flag:
            deltas = {
                q: round(t - anchor["best_queries"][q], 3)
                for q, t in times.items()
                if q in anchor["best_queries"]
            }
            drift_movers = {
                q: {"cur": times[q], "best": anchor["best_queries"][q], "delta": d}
                for q, d in sorted(deltas.items(), key=lambda kv: -kv[1])[:5]
            }
    detail = json.dumps(
        {
            "metric": "headline_suite_runtime",
            "value": total,
            "unit": "sec",
            "queries": times,
            "queries_warm_spread": spread,
            "queries_cold": {k: v for k, v in cold.items() if v is not None},
            "cold_total": round(sum(v for v in cold.values() if v is not None), 3),
            "index_prebuilt": index_prebuilt,
            "errors": errors,
            "regressions": regressions,
            "regressions_vs": prev.get("ts") if prev else None,
            "drift_vs_best": drift_vs_best,
            "drift_vs_best_normalized": drift_norm,
            "drift_flag": drift_flag,
            "drift_movers": drift_movers,
            "drift_anchor_n": anchor["n_records"] if anchor else 0,
            "cpu_ref": cpu_ref,
            "cpu_ref_job": CPU_REF_JOB,
            "regime": regime,
            "contention_remeasured": remeasured,
            "noisy_queries": noisy,
            "n_ok": len(times),
            "n_total": len(HEADLINE),
            "master": env_master,
            "parallelism": parallelism,
            "cpu_count": os.cpu_count(),
            "sf": sf_val,
        }
    )
    # The driver's stdout capture is tail-limited: rounds 4 and 5 both
    # recorded ``parsed: null`` because the full detail payload (per-query
    # medians + spreads + colds + errors + regression maps) grew past the
    # capture window and the driver saw a line starting mid-JSON. r12's
    # top-5-only fix overshot: PERF_r12 could compare only 3 queries
    # round-over-round and mislabeled two IMPROVED queries as
    # "dropped_from_bench" (VERDICT r12 items — the driver reads ONLY this
    # line, never bench_out.json). r13: print the FULL per-query map,
    # rounded to 2 dp, and keep everything else on the line minimal —
    # measured ~1.3 KB for 27 queries, well inside the observed >2 KB
    # capture window, and an order of magnitude under the r04 payload.
    # Also print the effective master / parallelism / host core count:
    # PERF_r12's scaling block was unadjudicable (suspect_cpus_ignored)
    # because nothing in the artifact showed whether $SPARK_GRAFT_CPUS
    # reached the executor (VERDICT r12 item 2).
    headline = json.dumps(
        {
            "metric": "headline_suite_runtime",
            "value": total,
            "unit": "sec",
            "queries": {k: round(v, 2) for k, v in times.items()},
            "n_ok": len(times),
            "n_total": len(HEADLINE),
            "n_err": len(errors),
            "n_regressed": len(regressions),
            "drift_vs_best": drift_vs_best,
            "drift_vs_best_normalized": drift_norm,
            "drift_flag": drift_flag,
            "cpu_ref": cpu_ref,
            "cpu_ref_job": CPU_REF_JOB,
            "regime": regime,
            "cold_total": round(sum(v for v in cold.values() if v is not None), 3),
            "index_prebuilt": index_prebuilt,
            "master": env_master,
            "parallelism": parallelism,
            "cpu_count": os.cpu_count(),
            "sf": sf_val,
        }
    )
    # Loss-proof: persist the full JSON to a file, stop Spark FIRST so
    # nothing can print after us, then emit the short line as the very
    # last stdout bytes. Also append this run's full per-query medians
    # to bench_history.jsonl — the regression gate's baseline for the
    # NEXT run (only fully-green runs qualify; a degraded run must not
    # lower the bar).
    with open(os.path.join(here, "bench_out.json"), "w") as fh:
        fh.write(detail + "\n")
    # only quiet fully-green runs become the next regression baseline —
    # a contended run's inflated medians would mask real regressions
    # (and its spreads would inflate every future family norm)
    if not errors and not fully_failed and regime in ("quiet", "quiet-jittery"):
        with open(hist_path, "a") as fh:
            fh.write(
                json.dumps(
                    {
                        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
                        "sf": sf_val,
                        "value": total,
                        "queries": times,
                        "queries_warm_spread": spread,
                        # cold-regime attribution (VERDICT r9 item 5):
                        # cold totals are only comparable when the
                        # record says whether the one-time 1M IVF build
                        # was already on disk.
                        "cold_total": round(
                            sum(v for v in cold.values() if v is not None), 3
                        ),
                        "index_prebuilt": index_prebuilt,
                        # machine-speed reference for cross-host drift
                        # normalization (r12; see _cpu_ref above)
                        "cpu_ref": cpu_ref,
                        "cpu_ref_job": CPU_REF_JOB,
                        "regime": regime,
                        "master": env_master,
                        "parallelism": parallelism,
                        "cpu_count": os.cpu_count(),
                    }
                )
                + "\n"
            )
    spark.stop()
    sys.stdout.flush()
    print(headline, flush=True)


if __name__ == "__main__":
    main()
