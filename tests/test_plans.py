"""Physical-plan assertions — the scale claims, checked in CI.

These tests pin the *plan shapes* the 100 TB posture depends on:
filters reach the parquet scan, dims broadcast, top-k never global-sorts,
and per-row operators don't shuffle. A regression here is a performance
bug even when results stay correct.
"""

from __future__ import annotations

import re

import pytest

from rag_application_with_vectordb_spark.plans.registry import load_all


@pytest.fixture(scope="module")
def specs():
    return load_all()


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_filter_pushed_to_scan(spark, sf_dir, specs):
    df = specs["q1_pricing_summary"].fn(spark, sf_dir)
    plan = plan_of(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_q1_column_pruning(spark, sf_dir, specs):
    df = specs["q1_pricing_summary"].fn(spark, sf_dir)
    plan = plan_of(df)
    # the scan must not read join keys / partkeys it doesn't need
    scan_line = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_orderkey" not in scan_line
    assert "l_partkey" not in scan_line


def test_q3_broadcasts_dim_side(spark, sf_dir, specs):
    plan = plan_of(specs["q3_top_orders"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan  # top-10 never global-sorts


def test_knn_batch_is_broadcast_nested_loop(spark, sf_dir, specs):
    plan = plan_of(specs["knn_batch"].fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan  # corpus never shuffles


def test_chunker_is_shuffle_free(spark, sf_dir, specs):
    plan = plan_of(specs["chunk_sliding_window"].fn(spark, sf_dir))
    assert "Exchange" not in plan  # generator + filter only, no shuffle
    assert "Generate" in plan


def test_semi_anti_join_operators(spark, sf_dir, specs):
    assert "LeftSemi" in plan_of(specs["join_semi_customers_with_urgent"].fn(spark, sf_dir))
    assert "LeftAnti" in plan_of(specs["join_anti_customers_without_orders"].fn(spark, sf_dir))


def test_scoring_path_stays_jvm_side(spark, sf_dir, specs):
    # No Python evaluation in the KNN hot path: the cosine expression is
    # whole-stage-codegen'd, never a PythonUDF stage.
    plan = plan_of(specs["knn_topk"].fn(spark, sf_dir))
    assert "Python" not in plan  # no BatchEvalPython / ArrowEvalPython stage
    # (WholeStageCodegen spans only materialize in the AQE final plan, so
    # absence of Python eval is the checkable invariant here.)
    assert "TakeOrderedAndProject" in plan


def test_q4_exists_is_semi_join_not_subquery(spark, sf_dir, specs):
    # Correlated EXISTS must plan as ONE semi join on the correlation key,
    # never a per-row re-execution.
    plan = plan_of(specs["q4_order_priority"].fn(spark, sf_dir))
    assert "LeftSemi" in plan
    assert plan.count("Scan parquet") == 2  # orders + lineitem, each once


def test_q6_all_predicates_pushed(spark, sf_dir, specs):
    plan = plan_of(specs["q6_forecast_revenue"].fn(spark, sf_dir))
    pushed = next(l for l in plan.splitlines() if "PushedFilters" in l)
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed
    scan_line = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_orderkey" not in scan_line  # only the 4 needed columns


def test_q16_not_in_is_anti_join(spark, sf_dir, specs):
    plan = plan_of(specs["q16_supplier_part_counts"].fn(spark, sf_dir))
    assert "LeftAnti" in plan


def test_q18_scans_lineitem_exactly_once(spark, sf_dir, specs):
    # The HAVING threshold and the output total_qty are the SAME
    # per-order aggregate, so the plan must aggregate lineitem once and
    # join the survivors — never the SQL shape's three fact scans with a
    # redundant re-aggregation after the join.
    plan = plan_of(specs["q18_large_volume_customers"].fn(spark, sf_dir))
    assert plan.count("lineitem.parquet") == 1
    assert plan.count("HashAggregate") == 2  # one partial + one final, only


def _broadcast_subtrees_scanning(df, table: str) -> list[str]:
    """Names of BroadcastExchange subtrees that feed a RAW scan of
    ``table`` into the broadcast — an aggregate between the exchange and
    the scan reduces cardinality, so that broadcast is legitimate."""

    def walk(node, in_broadcast, hits):
        name = node.nodeName()
        if name == "AdaptiveSparkPlan":
            walk(node.initialPlan(), in_broadcast, hits)
            return
        inb = in_broadcast or "BroadcastExchange" in name
        if "Aggregate" in name:  # broadcast payload is reduced, not raw
            inb = False
        kids = node.children()
        if kids.size() == 0:
            if inb and table in node.toString():
                hits.append(name)
        for i in range(kids.size()):
            walk(kids.apply(i), inb, hits)

    hits: list[str] = []
    walk(df._jdf.queryExecution().executedPlan(), False, hits)
    return hits


def test_lineitem_fact_is_never_a_broadcast_build_side(spark, specs):
    # Regression guard for the autoBroadcastJoinThreshold pin (session.py):
    # with the 10 MB default, the column-pruned 600k-row lineitem fact
    # became the broadcast BUILD side of syntax-ordered SQL joins, probed
    # by a 1-partition dim scan on one core. Facts must stream; only dims
    # broadcast. Scale-dependent by design (at sf0.01 lineitem is ~1 MB
    # and broadcasting it is RIGHT), so this pins the bench scale, where
    # the fact is 10.8 MB — planning only, nothing executes.
    sf_dir = "/root/testdata/sf0.1"
    for name in (
        "q3_top_orders",
        "q7_nation_pair_revenue",
        "q9_product_profit",
        "q12_late_priority",
        "q18_large_volume_customers",
        "q21_sole_late_supplier",
    ):
        df = specs[name].fn(spark, sf_dir)
        assert not _broadcast_subtrees_scanning(df, "lineitem"), name


def test_lineitem_fact_never_broadcasts_at_sf1(spark, specs):
    # The sf1.0 variant (VERDICT r6 gap #2): at 6M lineitem rows (~110 MB
    # on disk) every broadcast decision is far past any threshold — this
    # converts the "graceful at 10x" claim (plans/relational2.py) into a
    # checked property. Runs only when the local scale-up fixture set
    # exists (tools/gen_sf.py 1.0); planning only, nothing executes.
    import os

    import pytest

    sf_dir = "/root/repo/testdata_local/sf1.0"
    if not os.path.isdir(sf_dir):
        pytest.skip("local sf1.0 fixture set not generated (tools/gen_sf.py)")
    for name in (
        "q3_top_orders",
        "q7_nation_pair_revenue",
        "q9_product_profit",
        "q12_late_priority",
        "q18_large_volume_customers",
        "q21_sole_late_supplier",
    ):
        df = specs[name].fn(spark, sf_dir)
        assert not _broadcast_subtrees_scanning(df, "lineitem"), name


def test_lineitem_fact_never_broadcasts_at_sf10(spark, specs):
    # 100x-the-bench-scale variant: 60M lineitem rows (~1 GB on disk,
    # multi-file Spark-written directories rather than the driver's
    # single files) — proves the broadcast discipline holds when every
    # table is far past every threshold AND the scan is multi-partition.
    # Runs only when the local sf10 fixture exists (tools/gen_sf.py 10);
    # planning only, nothing executes.
    import os

    import pytest

    # gen_sf.py names the dir by the float sf ("sf10.0"); accept both
    sf_dir = "/root/repo/testdata_local/sf10"
    if not os.path.isdir(sf_dir):
        sf_dir = "/root/repo/testdata_local/sf10.0"
    if not os.path.isdir(sf_dir):
        pytest.skip("local sf10 fixture set not generated (tools/gen_sf.py)")
    for name in (
        "q3_top_orders",
        "q7_nation_pair_revenue",
        "q9_product_profit",
        "q12_late_priority",
        "q18_large_volume_customers",
        "q21_sole_late_supplier",
    ):
        df = specs[name].fn(spark, sf_dir)
        assert not _broadcast_subtrees_scanning(df, "lineitem"), name


def test_skew_salted_join_widens_shuffle_key(spark, sf_dir, specs):
    # The salted join's whole point is that the shuffle key is
    # (user_id, __salt), not user_id alone — each hot user spreads over
    # num_salts reducers. Pin that the executed plan partitions on the
    # widened key (and that the salt never escapes to the output schema).
    import re

    df = specs["skew_salted_user_spend"].fn(spark, sf_dir)
    plan = plan_of(df)
    assert re.search(r"hashpartitioning\(user_id#\d+L?, __salt", plan), plan
    assert "__salt" not in df.columns


def test_pagerank_reuses_persisted_graph(spark, sf_dir, specs):
    plan = plan_of(specs["graph_pagerank"].fn(spark, sf_dir))
    # the edge-building subtree (lineitem self-join) must be derived ONCE
    # and served from cache in every iteration — without the persist the
    # 3-iteration plan re-ran it 16x (measured before the fix). Every
    # iteration's join + the final output join read the cache, so the
    # executed plan references InMemoryTableScan at least 4 times.
    assert plan.count("InMemoryTableScan") >= 4
    assert "BatchEvalPython" not in plan


def test_substring_spans_has_no_cartesian(spark, sf_dir, specs):
    plan = plan_of(specs["dedup_substring_spans"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_signbits_candidate_side_stays_integer(spark, sf_dir, specs):
    plan = plan_of(specs["ann_signbits_rerank_topk"].fn(spark, sf_dir))
    # Hamming ranking is pure codegen integer work — no Python anywhere
    assert "BatchEvalPython" not in plan
    assert "bit_count" in plan


def test_sample_weighted_k_is_take_ordered(spark, sf_dir, specs):
    plan = plan_of(specs["sample_weighted_k"].fn(spark, sf_dir))
    # stateless E-S sampling: per-partition heaps, never a global sort
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan


def test_prefix_filter_has_no_cartesian(spark, sf_dir, specs):
    plan = plan_of(specs["dedup_prefix_filter_pairs"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_prefix_filter_scalable_has_no_global_window(spark, sf_dir, specs):
    # The literal formulation pays one single-partition exchange for the
    # vocabulary ordinal; the scalable registration must not — every
    # window is partitioned by doc_id (VERDICT r5 item 5).
    legacy = plan_of(specs["dedup_prefix_filter_pairs"].fn(spark, sf_dir))
    assert "SinglePartition" in legacy  # contrast: the ordinal's exchange
    plan = plan_of(specs["dedup_prefix_filter_pairs_keyed"].fn(spark, sf_dir))
    assert "SinglePartition" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_triangles_close_wedges_with_equi_join(spark, sf_dir, specs):
    plan = plan_of(specs["graph_triangles"].fn(spark, sf_dir))
    # the closing edge must be an equi-join (LEAST/GREATEST keys), never
    # a nested-loop over an OR condition
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_resample_windows_are_keyed_by_user(spark, sf_dir, specs):
    plan = plan_of(specs["events_resample_linear"].fn(spark, sf_dir))
    # both IGNORE-NULLS passes partition by user_id — no global window
    assert "BatchEvalPython" not in plan
    import re

    # every Window operator in the plan must carry a partition spec
    for m in re.finditer(r"Window \[", plan):
        seg = plan[m.start() : m.start() + 2000]
        assert "user_id" in seg.split("\n")[0]


def test_attribution_range_frame_stays_keyed(spark, sf_dir, specs):
    plan = plan_of(specs["events_purchase_attribution"].fn(spark, sf_dir))
    assert "specifiedwindowframe(RangeFrame" in plan
    assert "BatchEvalPython" not in plan


def test_ivf_append_parity_serves_with_broadcast_probes(spark, sf_dir, specs):
    # The appended-store serve must look exactly like ann_ivf_topk's:
    # tiny probe side broadcast (never the corpus), partial top-k
    # pushdown below the single query_id exchange, no nested loops.
    plan = plan_of(specs["ann_ivf_append_parity"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "WindowGroupLimit" in plan  # partial top-k before the shuffle
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_stream_ingest_twin_stays_jvm_side(spark, sf_dir, specs):
    # chunk -> hash-embed -> centroid argmax -> agg: pure Catalyst
    # expressions end to end — the ingest hot path must never drop into
    # row-at-a-time Python.
    plan = plan_of(specs["stream_ingest_index_twin"].fn(spark, sf_dir))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_decontaminate_is_semi_join_on_hashes(spark, sf_dir, specs):
    # the train-gram × eval-gram match must be a hash-keyed semi join —
    # never an all-pairs comparison of documents.
    plan = plan_of(specs["decontaminate_train_docs"].fn(spark, sf_dir))
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_tokenize_ids_broadcasts_vocab(spark, sf_dir, specs):
    # the 256-row vocab must broadcast onto the exploded postings; the
    # candidate selection is a TakeOrdered, never a vocabulary-wide sort
    plan = plan_of(specs["text_tokenize_ids"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_anomaly_rolling_z_is_single_keyed_window(spark, sf_dir, specs):
    # one hash exchange on user_id; the trailing frame never globally sorts
    plan = plan_of(specs["events_anomaly_rolling_z"].fn(spark, sf_dir))
    assert "SinglePartition" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BatchEvalPython" not in plan


def test_scd2_windows_all_partition_by_customer(spark, sf_dir, specs):
    plan = plan_of(specs["scd2_customer_status_history"].fn(spark, sf_dir))
    import re
    # every Window operator must be keyed — a global (unpartitioned)
    # window would single-partition the whole orders table
    for line in plan.splitlines():
        if re.search(r"\bWindow\b", line) and "windowspecdefinition" in line:
            assert "o_custkey" in line


def test_cdc_diff_joins_on_the_key_not_broadcast_of_a_snapshot(spark, sf_dir, specs):
    plan = plan_of(specs["cdc_snapshot_diff"].fn(spark, sf_dir))
    # both snapshots derive from the big fact; a full-outer join cannot
    # broadcast either side — it must co-partition on the key
    assert "FullOuter" in plan
    assert "BroadcastHashJoin" not in plan


def test_nb_weight_table_broadcasts_to_the_scoring_join(spark, sf_dir, specs):
    plan = plan_of(specs["text_nb_confusion"].fn(spark, sf_dir))
    # scoring = test tokens JOIN weights: the |classes| x |vocab| weight
    # relation is the broadcast side (fastText serving shape)
    assert "BroadcastHashJoin" in plan


def test_er_pairs_shuffle_on_block_key_no_cartesian(spark, sf_dir, specs):
    plan = plan_of(specs["er_blocked_name_pairs"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_incremental_merge_is_partial_agg_then_merge(spark, sf_dir, specs):
    plan = plan_of(specs["incremental_agg_merge"].fn(spark, sf_dir))
    # two HashAggregates per branch (partial+final) and a full-outer
    # merge join; never a re-aggregation over the unioned raw rows
    assert "FullOuter" in plan
    assert plan.count("HashAggregate") >= 4


def test_split_group_folds_assignment_is_map_side(spark, sf_dir, specs):
    plan = plan_of(specs["split_group_folds"].fn(spark, sf_dir))
    # the fold hash recomputes per row: no distinct-users join on the
    # assignment path (the leak audit aggregates separately)
    assert "SortMergeJoin" not in plan


def test_knn_filtered_pushes_predicate_to_scan(spark, sf_dir, specs):
    plan = plan_of(specs["knn_filtered_topk"].fn(spark, sf_dir))
    # metadata pre-filter must reach the parquet scan, and the top-k
    # must still be a TakeOrderedAndProject over survivors only
    assert "PushedFilters" in plan and "In(label" in plan
    assert "TakeOrderedAndProject" in plan


def test_cusum_is_single_keyed_window_pass(spark, sf_dir, specs):
    plan = plan_of(specs["events_cusum_changepoint"].fn(spark, sf_dir))
    # prefix-sum + running-min chain on the SAME (user_id; ts, event_id)
    # ordering: exactly one DATA shuffle (the calibration row reduces
    # through a SinglePartition aggregate and broadcasts back)
    assert plan.count("hashpartitioning") == 1
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_corr_matrix_is_one_scan_one_row_agg(spark, sf_dir, specs):
    plan = plan_of(specs["feature_corr_matrix"].fn(spark, sf_dir))
    # all 14 co-moments from ONE pass over lineitem; the pair unpivot
    # must not re-reference the aggregate (Spark inlines CTEs)
    assert plan.count("Scan parquet") == 1
    assert "SortMergeJoin" not in plan


def test_acf_self_join_stays_day_grain(spark, sf_dir, specs):
    plan = plan_of(specs["events_acf_daily"].fn(spark, sf_dir))
    # the fact collapses to day grain before the lag join; the inline
    # lag table keeps the day relation referenced exactly twice
    assert plan.count("Scan parquet") == 2
    assert "CartesianProduct" not in plan


def test_auc_sorts_only_the_score_domain(spark, sf_dir, specs):
    plan = plan_of(specs["eval_auc_doclang"].fn(spark, sf_dir))
    # histogram-form Mann-Whitney: the fact aggregates to per-score
    # counts BEFORE the (domain-sized) global prefix-sum window — in
    # tree order the Window sits ABOVE a HashAggregate, never directly
    # over the scan
    assert plan.count("Scan parquet") == 1
    # below the Window (tree prints top-down) there must be a
    # HashAggregate before the scan — i.e. the window's input is the
    # per-score count table, not raw document rows
    below_window = plan[plan.index("Window"):]
    assert "HashAggregate" in below_window.split("FileScan")[0]


def test_kmv_intersect_touches_only_sketch_rows(spark, sf_dir, specs):
    plan = plan_of(specs["approx_distinct_intersect_kmv"].fn(spark, sf_dir))
    # the A∩B join runs over the two k-row sketches (rn <= k filters
    # above the windows), never the raw key sets as a cartesian
    assert "CartesianProduct" not in plan


def test_phrase_search_is_single_scan_no_like(spark, sf_dir, specs):
    plan = plan_of(specs["text_phrase_search_positional"].fn(spark, sf_dir))
    # one explode pass over documents; the per-term "postings" come from
    # offset arithmetic + aggregation, never a rescan per phrase word,
    # and the hot path never runs Contains/LIKE over raw text
    assert plan.count("Scan parquet") == 1
    assert "Contains" not in plan


def test_reco_pairs_push_event_filter_and_prune(spark, sf_dir, specs):
    plan = plan_of(specs["reco_item_item_topk"].fn(spark, sf_dir))
    # the event-type predicate reaches every parquet scan, and the scans
    # read only the 3 needed columns — no full-width fact reads
    assert "In(event_type, [click,purchase])" in plan
    for line in plan.splitlines():
        if "ReadSchema" in line:
            schema = line.split("ReadSchema:")[1]
            assert "value" not in schema and "ts:" not in schema
    assert "CartesianProduct" not in plan


def test_ks_windows_only_the_distinct_value_domain(spark, sf_dir, specs):
    plan = plan_of(specs["stats_ks_lang_length"].fn(spark, sf_dir))
    # the global-order window runs AFTER the group-by on v, so its
    # SinglePartition input is the distinct length domain, not raw docs:
    # a HashAggregate(keys=[v...]) must sit below the Window
    lines = plan.splitlines()
    widx = next(i for i, l in enumerate(lines) if "Window" in l)
    assert any("HashAggregate" in l and "keys=[v" in l for l in lines[widx:])


def test_khop_rounds_do_not_rescan_events(spark, sf_dir, specs):
    plan = plan_of(specs["graph_khop_items"].fn(spark, sf_dir))
    # edges are localCheckpoint'ed once; the 3 BFS rounds must join
    # against the materialized edge RDD, never re-derive it from events
    assert plan.count("Scan parquet") == 0
    assert "Scan ExistingRDD" in plan


def test_pmi_broadcasts_global_totals(spark, sf_dir, specs):
    plan = plan_of(specs["text_pmi_collocations"].fn(spark, sf_dir))
    # the single-row Nu/Nb totals broadcast back over the bigram counts
    # (never a shuffle of the counts against a 1-row side), and the
    # top-50 is TakeOrdered, not a global sort
    assert "BroadcastNestedLoopJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_bootstrap_is_single_pass_fanout(spark, sf_dir, specs):
    plan = plan_of(specs["stats_bootstrap_mean_ci"].fn(spark, sf_dir))
    # the B replicates come from ONE scan fanned out map-side by an
    # explode generator — never B passes over orders; the replicate
    # aggregate partials combine before the (tiny, B-row) shuffle
    assert plan.count("Scan parquet") <= 2  # fan subtree + point-estimate subtree
    assert "Generate explode" in plan


def test_jackknife_never_rescans_per_group(spark, sf_dir, specs):
    plan = plan_of(specs["stats_jackknife_se"].fn(spark, sf_dir))
    # leave-one-out means derive from the per-month totals by
    # subtraction: exactly one scan of orders feeds the whole statistic
    assert plan.count("Scan parquet") == 1


def test_conformal_model_checkpointed_two_fact_scans(spark, sf_dir, specs):
    plan = plan_of(specs["stats_conformal_interval"].fn(spark, sf_dir))
    # the 5-row model AND the residual histogram materialize once each
    # (localCheckpoint → ExistingRDD); orders is scanned exactly twice,
    # both at checkpoint time (train aggregate + calibration pass), so
    # the lazy plan reads no parquet at all and every window in it runs
    # over a bounded relation (coarse-bucket cumulative / single-bucket
    # fine pass over the checkpointed histogram — never the calibration
    # rows themselves; the r07 verdict's unbounded row_number is gone)
    assert plan.count("Scan parquet") == 0
    assert "Scan ExistingRDD" in plan
    # no global row-number over the calibration split
    assert "row_number" not in plan


def test_km_study_end_is_scalar_subquery_not_global_window(spark, sf_dir, specs):
    plan = plan_of(specs["survival_km_signup_purchase"].fn(spark, sf_dir))
    # the censoring horizon comes from a map-side MAX scalar subquery;
    # the only windows over raw events are keyed by user_id (a global
    # MAX(ts) OVER () would funnel the fact through one partition)
    assert "Subquery" in plan
    lines = plan.splitlines()
    for i, l in enumerate(lines):
        if "Window" in l and "user_id" not in l:
            # windows without a user_id key must sit above the duration
            # aggregate (t-keyed, tiny), never over raw events
            below = "\n".join(lines[i:])
            assert "HashAggregate" in below


def test_mase_is_one_scan_day_keyed(spark, sf_dir, specs):
    plan = plan_of(specs["forecast_snaive_mase"].fn(spark, sf_dir))
    assert plan.count("Scan parquet") == 1


def test_permutation_test_is_single_fact_scan(spark, sf_dir, specs):
    # the x200 fan and the d_obs tagging must never re-reference the
    # fact: one parquet scan, permutations broadcast from OneRowRelation
    plan = plan_of(specs["stats_permutation_test"].fn(spark, sf_dir))
    assert plan.count("Scan parquet") == 1
    assert "OneRowRelation" in plan


def test_column_profile_branches_prune_to_one_column(spark, sf_dir, specs):
    import re

    plan = plan_of(specs["audit_column_profile"].fn(spark, sf_dir))
    # each UNION branch's scan must project exactly one column
    scans = re.findall(r"FileScan parquet \[([^\]]*)\]", plan)
    assert len(scans) == 5
    assert all("," not in cols for cols in scans), scans


def test_ranking_eval_broadcasts_probes_never_shuffles_corpus(spark, sf_dir, specs):
    plan = plan_of(specs["eval_retrieval_ranking"].fn(spark, sf_dir))
    # probes broadcast against the corpus scan; the only hash exchange of
    # scored rows is the per-query window partitioning (query-keyed)
    assert "BroadcastNestedLoopJoin" in plan
    assert "hashpartitioning(query_id" in plan


def test_ams_sketch_shuffles_only_seed_partials(spark, sf_dir, specs):
    plan = plan_of(specs["sketch_ams_f2"].fn(spark, sf_dir))
    # two scans by design (sketch fan + exact side), both pruned to user_id
    scans = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert len(scans) == 2
    assert all("struct<user_id:bigint>" in l for l in scans)


def test_winnow_window_is_doc_keyed(spark, sf_dir, specs):
    plan = plan_of(specs["text_winnow_fingerprints"].fn(spark, sf_dir))
    # the per-window argmin partitions by doc_id — never a global window
    assert "SinglePartition" not in plan


def test_wand_topk_is_take_ordered(spark, sf_dir, specs):
    plan = plan_of(specs["retrieval_wand_topk"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    # postings come from the checkpointed index, not re-tokenization
    assert "Scan ExistingRDD" in plan or "InMemoryTableScan" in plan


def test_quantile_normalize_rank_window_is_source_keyed(spark, sf_dir, specs):
    plan = plan_of(specs["feature_quantile_normalize"].fn(spark, sf_dir))
    # within-source ranks partition by source; the only unpartitioned
    # window is the cumulative histogram over the bounded length domain
    assert "hashpartitioning(source" in plan


def test_revenue_bridge_join_is_user_keyed(spark, sf_dir, specs):
    plan = plan_of(specs["revenue_bridge_weekly"].fn(spark, sf_dir))
    assert "FullOuter" in plan or "full_outer" in plan.lower()
    assert "CartesianProduct" not in plan


def test_textrank_doc_walk_stays_keyed(spark, sf_dir, specs):
    plan = plan_of(specs["text_textrank_doc_keywords"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    # final top-3 window partitions by doc_id
    assert "hashpartitioning(doc_id" in plan


def test_geo_radius_blocking_survives_join_reorder(spark, sf_dir, specs):
    # The 9-cell neighborhood must reach the physical plan as a cell-key
    # equi-join. The previous VALUES-offsets form let Catalyst's join
    # reorder connect the two point relations through the distance
    # predicate instead — a CartesianProduct over ALL customer pairs
    # (2.25e12 at sf10, ~2 h; correct output, quadratic plan) with the
    # cell conditions demoted to nested-loop post-filters. The exploded
    # neighbor-key form is a plain equi-join nothing can degrade.
    plan = plan_of(specs["geo_radius_pairs"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Generate explode" in plan  # the neighbor-key fan-out
    # both equi keys must appear as INDEPENDENT attributes ('ncell'
    # containing 'cell' as a substring made the old conjunct vacuous):
    # require the attribute-reference forms ncell#N and a bare cell#N
    assert re.search(r"\bncell#\d+", plan)  # probe-side neighbor key
    assert re.search(r"(?<![a-z_])cell#\d+", plan)  # build-side cell key


def test_pq_reconstruction_error_is_single_scan_no_join(spark, sf_dir, specs):
    # r12 sweep find: the pq_encode→pq_reconstruct→join form shuffle-joined
    # two 64-double arrays per corpus vector on vec_id (173.9 s for 20 rows
    # at sf10). The fused pq_encode_col/pq_reconstruct_col projection is the
    # pinned shape: one embeddings scan, per-row expressions, top-20 via
    # TakeOrderedAndProject — zero joins, zero exchanges.
    plan = plan_of(specs["pq_reconstruction_error"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "Join" not in plan
    assert "Exchange" not in plan
    assert plan.count("Scan parquet") == 1


def test_pq_fused_columns_equal_operator_composition(spark, sf_dir):
    # pq_encode_col/pq_reconstruct_col must be bit-identical to the
    # DataFrame operators they were extracted from — the fused monitor's
    # values may not drift from the oracle-proven composition.
    import pyspark.sql.functions as F

    from rag_application_with_vectordb_spark.operators.pq import (
        pq_codebook_firstc,
        pq_encode,
        pq_encode_col,
        pq_reconstruct,
        pq_reconstruct_col,
    )
    from rag_application_with_vectordb_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    cb = pq_codebook_firstc(emb, m=8, k=16, dim=64)
    joined = {
        r["vec_id"]: (r["codes"], r["recon"])
        for r in pq_encode(emb, cb)
        .join(pq_reconstruct(pq_encode(emb, cb), cb), "vec_id")
        .collect()
    }
    fused = {
        r["vec_id"]: (r["codes"], r["recon"])
        for r in emb.select(
            "vec_id",
            pq_encode_col(cb, F.col("embedding")).alias("codes"),
            pq_reconstruct_col(
                cb, pq_encode_col(cb, F.col("embedding"))
            ).alias("recon"),
        ).collect()
    }
    assert fused == joined


def test_pq_encode_unrolled_matches_operator(spark, sf_dir):
    # r12 optimization: the unrolled leveled encode must produce
    # BIT-IDENTICAL codes to the HOF pq_encode operator (same fold
    # order per codeword dot, same first-max tiebreak).
    from pyspark.sql import functions as F

    from rag_application_with_vectordb_spark.operators.pq import (
        pq_codebook_firstc,
        pq_encode,
        pq_encode_unrolled,
    )
    from rag_application_with_vectordb_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    cb = pq_codebook_firstc(emb, m=8, k=16, dim=64)
    hof = {r["vec_id"]: list(r["codes"]) for r in pq_encode(emb, cb).collect()}
    unrolled = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode_unrolled(emb, cb).select("vec_id", "codes").collect()
    }
    assert unrolled == hof
