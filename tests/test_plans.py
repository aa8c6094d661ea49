"""Physical-plan regression tests: the scale properties the engine
promises (pushdown, pruning, broadcast, codegen, no row-Python)
are asserted, not assumed."""

from __future__ import annotations

import pytest

from ae_data_integration_spark.catalog import load_all
from ae_data_integration_spark.plans.explain import plan_asserts
from tests.conftest import SF_CORRECT

REGISTRY = load_all()


def _df(spark, name):
    from ae_data_integration_spark.catalog import resolve

    return REGISTRY[resolve(name)].fn(spark, SF_CORRECT)


def test_q1_pushdown_and_pruning(spark):
    (
        plan_asserts(_df(spark, "q1_pricing_summary"))
        .has_pushed_filter("l_shipdate")
        .reads_only(
            "lineitem",
            {"l_shipdate", "l_returnflag", "l_linestatus", "l_quantity",
             "l_extendedprice", "l_discount", "l_tax"},
        )
        .has_partial_agg()
        .no_python_row_udf()
    )


def test_q3_broadcasts_customer_dim(spark):
    (
        plan_asserts(_df(spark, "q3_shipping_priority"))
        .has_pushed_filter("c_mktsegment")
        .has_broadcast_join(1)
        .no_python_row_udf()
    )


def test_q5_snowflake_all_broadcast(spark):
    # Every dim join broadcasts; the lineitem side must not shuffle
    # into a sort-merge join.
    (
        plan_asserts(_df(spark, "q5_region_volume"))
        .has_broadcast_join(2)
        .no_sort_merge_join()
        .reads_only("lineitem", {"l_suppkey", "l_extendedprice", "l_discount"})
    )


def test_prep_pipeline_broadcast_stats(spark):
    # min-max stats and the label dim attach via broadcast, never a
    # global window over the fact table.
    plan_asserts(_df(spark, "prep_pipeline")).has_broadcast_join(2).no_python_row_udf()


def test_relational_queries_stay_jvm_side(spark):
    # Every oracle-checked query must be Python-free (mapInPandas
    # queries are rows-only by design and excluded here).
    for name, q in sorted(REGISTRY.items()):
        if q.oracle is None:
            continue
        plan_asserts(q.fn(spark, SF_CORRECT)).no_python_row_udf()


def test_s1_ann_is_broadcast_not_shuffle_join(spark):
    # Probe set broadcasts against the corpus scan (nested-loop cross
    # with broadcast side — no shuffle of the big side).
    plan_asserts(_df(spark, "s1_ann_bruteforce")).has_broadcast_exchange(1)


def test_l2_batchnorm_broadcast_stats(spark):
    # Per-dim stats attach via broadcast join with map-side partial
    # aggregation — never a window, never a Python UDF.
    (
        plan_asserts(_df(spark, "l2_batchnorm"))
        .has_broadcast_join(1)
        .has_partial_agg()
        .no_python_row_udf()
    )


def test_d5_ngram_jaccard_bucketed_not_cartesian(spark):
    # The candidate join is band/bucket equi-join (Sigma|b|^2, not N^2):
    # no cartesian product anywhere in the plan.
    pa = plan_asserts(_df(spark, "d5_ngram_jaccard"))
    assert "CartesianProduct" not in pa.plan
    pa.no_python_row_udf()


def test_kmeans_no_unpartitioned_window(spark):
    # After the driver-roundtrip init, c1's plan contains no
    # unpartitioned WindowExec (argmin window partitions by point id).
    pa = plan_asserts(_df(spark, "c1_kmeans_relational"))
    import re

    for m in re.finditer(r"Window \[.*windowspecdefinition\(([^)]*)\)", pa.plan):
        # every window spec must name at least one partition column
        assert m.group(1).strip(), f"unpartitioned window:\n{m.group(0)}"


def test_c5_exact_silhouette_broadcast_clustersums(spark):
    # k cluster-sum vectors attach via a broadcast nested-loop cross
    # (k rows); cluster sums come from a partial-aggregated explode —
    # no all-pairs point-point join anywhere.
    (
        plan_asserts(_df(spark, "c5_silhouette_exact"))
        .has_broadcast_exchange(1)
        .has_partial_agg()
        .no_python_row_udf()
    )


def test_c6_nb_model_joins_broadcast(spark):
    # The driver-assembled model (cand) and priors re-enter the
    # scoring pass as broadcast literals — the exploded fact side
    # never shuffles into a sort-merge join.
    (
        plan_asserts(_df(spark, "c6_gaussian_nb_cv"))
        .has_broadcast_join(2)
        .no_sort_merge_join()
        .no_python_row_udf()
    )


def test_c7_covariance_broadcast_means(spark):
    # d-sized mean vectors broadcast onto the d^2 covariance cells;
    # cross-products partial-aggregate map-side.
    (
        plan_asserts(_df(spark, "c7_pca_covariance"))
        .has_broadcast_join(2)
        .has_partial_agg()
        .no_python_row_udf()
    )


def test_e5_attribution_single_key_shuffle(spark):
    # purchases x clicks is an equi-join on user_id with a range
    # residual; the aggregate partial-combines map-side. No broadcast
    # needed (both sides are same-table filters), but no Python and a
    # pruned events scan.
    (
        plan_asserts(_df(spark, "e5_attribution_window"))
        .reads_only("events", {"user_id", "event_id", "ts", "event_type", "value"})
        .has_pushed_filter("event_type")
        .has_partial_agg()
        .no_python_row_udf()
    )


def test_l4_mlp_broadcasts_both_weight_layers(spark):
    # Both weight tables attach via broadcast; the embeddings side
    # never shuffles into a sort-merge join.
    (
        plan_asserts(_df(spark, "l4_relu_mlp"))
        .has_broadcast_join(2)
        .no_sort_merge_join()
        .no_python_row_udf()
    )


def test_sk1_cms_broadcasts_sketch(spark):
    # The d*w cell table broadcasts to the probe side; the sketch
    # build partial-aggregates map-side.
    (
        plan_asserts(_df(spark, "sk1_cms_heavy_hitters"))
        .has_broadcast_join(1)
        .has_partial_agg()
        .no_python_row_udf()
    )


def test_q10_pushdown_and_broadcast_dims(spark):
    # returned-item ranking: the selective returnflag filter must reach
    # the lineitem scan (with column pruning), every dim side
    # broadcasts at this SF, and nothing degenerates to a cartesian.
    pa = plan_asserts(_df(spark, "q10_returned_customers"))
    pa.has_broadcast_join(3).no_sort_merge_join().no_python_row_udf()
    assert "EqualTo(l_returnflag,R)" in pa.plan
    assert "CartesianProduct" not in pa.plan


def test_q13_outer_join_keeps_zero_bucket_and_pushdown(spark):
    # The orders-side predicate is in the JOIN condition, so it must
    # appear as a pushed filter on the orders scan (it prunes the
    # build side) while the join stays LEFT OUTER (zero-order
    # customers survive into the c_count=0 bucket).
    pa = plan_asserts(_df(spark, "q13_order_count_dist"))
    pa.has_pushed_filter("o_orderpriority").has_partial_agg().no_python_row_udf()
    assert "LeftOuter" in pa.plan
    assert "CartesianProduct" not in pa.plan
    pa.reads_only("orders", {"o_custkey", "o_orderkey", "o_orderpriority"})


def test_q15_reuses_aggregate_and_broadcasts_max(spark):
    # The revenue aggregate is persisted and reused (max + probe); the
    # 1-row max and the supplier dim attach via broadcast, the
    # lineitem date range reaches the scan.
    pa = plan_asserts(_df(spark, "q15_top_supplier"))
    pa.has_pushed_filter("l_shipdate").has_broadcast_join(2).no_python_row_udf()
    assert "CartesianProduct" not in pa.plan
    assert "InMemoryTableScan" in pa.plan  # the persisted revenue CTE


def test_q21_correlated_exists_as_semi_anti(spark):
    # EXISTS -> left-semi, NOT EXISTS -> left-anti, both riding the
    # l_orderkey equi component (hash joins with the suppkey<>suppkey
    # residual) — never a cartesian; dims broadcast.
    pa = plan_asserts(_df(spark, "q21_sole_blame_supplier"))
    pa.has_broadcast_join(2).no_python_row_udf()
    assert "LeftSemi" in pa.plan
    assert "LeftAnti" in pa.plan
    assert "CartesianProduct" not in pa.plan
    pa.has_pushed_filter("l_returnflag")


def test_q22_scalar_subquery_broadcasts_anti_join(spark):
    # The 1-row average joins via BroadcastNestedLoop (the only sound
    # use of one: a scalar side), the no-recent-orders test is a
    # left-anti on custkey, nation broadcasts.
    pa = plan_asserts(_df(spark, "q22_cold_customers"))
    pa.no_python_row_udf()
    assert "LeftAnti" in pa.plan
    assert "CartesianProduct" not in pa.plan
    pa.reads_only("orders", {"o_custkey", "o_orderdate"})


def test_q2_correlated_min_no_recompute(spark):
    # The per-(part,supplier) cost aggregate feeds both the global min
    # and the probe side; brand filter reaches the part scan; all dims
    # broadcast, no cartesian.
    pa = plan_asserts(_df(spark, "q2_min_cost_supplier"))
    pa.has_broadcast_join(2).has_partial_agg().no_python_row_udf()
    pa.has_pushed_filter("p_brand")
    assert "CartesianProduct" not in pa.plan


def test_q11_global_share_broadcasts_total(spark):
    # The 1-row total joins back via broadcast (nested-loop on a
    # scalar side is the only sound cartesian); the per-part aggregate
    # is persisted so lineitem scans once.
    pa = plan_asserts(_df(spark, "q11_important_parts"))
    pa.has_broadcast_join(2).no_python_row_udf()
    assert "CartesianProduct" not in pa.plan
    assert "InMemoryTableScan" in pa.plan  # persisted per_part reuse


def test_q19_disjunction_pushdown(spark):
    # The OR-of-conjunctions must still push SOMETHING to the scans
    # (Catalyst extracts per-side implied predicates) and the part dim
    # broadcasts.
    pa = plan_asserts(_df(spark, "q19_disjunctive_filter"))
    pa.has_broadcast_join(1).has_partial_agg().no_python_row_udf()
    pa.reads_only(
        "lineitem",
        {"l_partkey", "l_quantity", "l_extendedprice", "l_discount"},
    )


def test_q20_nested_in_as_semi_chain(spark):
    # Both IN subqueries become left-semi hash joins (part prefix into
    # the lineitem scan, heavy suppliers into supplier); date range
    # pushed down.
    pa = plan_asserts(_df(spark, "q20_prefix_part_suppliers"))
    pa.no_python_row_udf().has_pushed_filter("l_shipdate")
    assert pa.plan.count("LeftSemi") >= 2
    assert "CartesianProduct" not in pa.plan


def test_q7_two_fact_join_shape(spark):
    # Both nation-attached dim slices (supplier side, customer side)
    # broadcast; the only shuffle join is lineitem⋈orders on orderkey;
    # the ship-date window reaches the lineitem scan; no cartesian.
    pa = plan_asserts(_df(spark, "q7_volume_shipping"))
    pa.has_pushed_filter("l_shipdate").has_broadcast_join(2)
    pa.has_partial_agg().no_python_row_udf()
    assert "CartesianProduct" not in pa.plan
    pa.reads_only(
        "lineitem",
        {"l_suppkey", "l_orderkey", "l_shipdate",
         "l_extendedprice", "l_discount"},
    )


def test_q8_market_share_shape(spark):
    # 4 dims: part (type filter pushed), supplier⋈nation, and the
    # ASIA-region customer slice as a LEFT SEMI — all broadcast; the
    # order-date window is pushed to the orders scan; one orderkey
    # shuffle; no cartesian.
    pa = plan_asserts(_df(spark, "q8_market_share"))
    pa.has_pushed_filter("p_type").has_pushed_filter("o_orderdate")
    pa.has_broadcast_join(3).has_partial_agg().no_python_row_udf()
    assert "LeftSemi" in pa.plan
    assert "CartesianProduct" not in pa.plan
    # "part.parquet" (not "part"): the bare fragment also matches the
    # lineitem scan block via its l_partkey column.
    pa.reads_only("part.parquet", {"p_partkey", "p_type"})


def test_q9_product_profit_shape(spark):
    # The p_name substring filter prunes the broadcast part slice at
    # its scan; lineitem reads only the five needed columns; supplier
    # ⋈nation broadcasts; no cartesian.
    pa = plan_asserts(_df(spark, "q9_product_profit"))
    pa.has_pushed_filter("p_name").has_broadcast_join(2)
    pa.has_partial_agg().no_python_row_udf()
    assert "CartesianProduct" not in pa.plan
    pa.reads_only(
        "lineitem",
        {"l_partkey", "l_suppkey", "l_orderkey",
         "l_quantity", "l_extendedprice", "l_discount"},
    )


def test_t15_dup_spans_shape(spark):
    # window hashing is a pure map (JVM HOFs, no row-Python); the only
    # shuffles are the anchor-hash groupBy (map-side partials) and the
    # doc_id join back; no cartesian anywhere.
    pa = plan_asserts(_df(spark, "t15_dup_spans"))
    pa.no_python_row_udf().has_partial_agg()
    assert "CartesianProduct" not in pa.plan


def test_s4_hybrid_rrf_shape(spark):
    # both legs end in TakeOrdered heads (no full-sort materialization
    # of the corpus) and the corpus-side cosine leg broadcasts the
    # single probe vector; no row-Python.
    pa = plan_asserts(_df(spark, "s4_hybrid_rrf"))
    pa.no_python_row_udf()
    assert "TakeOrderedAndProject" in pa.plan


def test_e9_anomaly_broadcasts_stats(spark):
    # per-type stats (5 rows) attach by broadcast; the fact side
    # shuffles once for the hour/type rollup.
    (
        plan_asserts(_df(spark, "e9_hourly_anomaly"))
        .has_broadcast_join(1)
        .has_partial_agg()
        .no_python_row_udf()
    )


def test_er1_linkage_no_cartesian(spark):
    # the deletion-variant equi-join must plan as a keyed join (any
    # strategy), never a cartesian/BNL product.
    p = plan_asserts(_df(spark, "er1_name_matches"))
    p.no_python_row_udf()
    assert "CartesianProduct" not in p.plan and "BroadcastNestedLoop" not in p.plan


def test_dq2_profile_single_scan(spark):
    # ONE parquet scan feeds all per-column aggregates (the oracle
    # re-scans per column; the engine must not).
    import re

    p = plan_asserts(_df(spark, "dq2_profile"))
    assert len(re.findall(r"\(\d+\) Scan parquet", p.plan)) == 1
    p.reads_only("lineitem", {"l_quantity", "l_extendedprice", "l_discount"})
    p.no_python_row_udf()


def test_dq3_skew_report_broadcasts_probes(spark):
    (
        plan_asserts(_df(spark, "dq3_key_skew"))
        .has_broadcast_join(1)
        .has_partial_agg()
        .reads_only("lineitem", {"l_orderkey"})
        .no_python_row_udf()
    )


def test_t18_pii_scrub_is_map_only(spark):
    # the redaction chain is a codegen'd map; the only shuffle is the
    # 5-row segment rollup.
    import re

    p = plan_asserts(_df(spark, "t18_pii_scrub"))
    p.has_partial_agg().no_python_row_udf()
    # countDistinct expands to a two-phase agg: 2 agg exchanges + the
    # final sort's range exchange — and nothing else (no join, no
    # pre-agg shuffle of the scrubbed rows).
    assert len(re.findall(r"\(\d+\) Exchange", p.plan)) <= 3


def test_scd1_versions_single_key_window(spark):
    # windows run partition-local after one shuffle on the dim key;
    # no global (empty-partition-spec) window.
    p = plan_asserts(_df(spark, "scd1_versions"))
    p.no_python_row_udf()
    assert "partitionBy=[]" not in p.plan.replace(" ", "")


def test_scd2_merge_single_join_no_python(spark):
    # MERGE = one full-outer key join: no cartesian, no row-Python,
    # pushdown of the snapshot/batch filters reaches the scans.
    p = plan_asserts(_df(spark, "scd2_merge_upsert"))
    p.no_python_row_udf()
    assert "CartesianProduct" not in p.plan
    assert p.plan.count("FullOuter") >= 1


def test_s5_sq8_no_corpus_shuffle(spark):
    # grid + probes broadcast; the corpus meets them via broadcast
    # joins only (the one repartition is the documented _widen
    # round-robin, not a key shuffle of pair-expanded data).
    p = plan_asserts(_df(spark, "s5_sq8_rerank"))
    p.no_python_row_udf().has_broadcast_exchange()
    assert "CartesianProduct" not in p.plan


def test_scd3_equi_join_with_keylocal_range(spark):
    # Time-travel lookup: the custkey equi-join is a hash join (never
    # a nested loop); the [from, to) range runs as a join condition on
    # the matched key, not a cartesian filter.
    pa = plan_asserts(_df(spark, "scd3_point_in_time"))
    pa.no_python_row_udf()
    assert "CartesianProduct" not in pa.plan
    assert "BroadcastNestedLoopJoin" not in pa.plan
    assert "HashJoin" in pa.plan or "SortMergeJoin" in pa.plan
    assert "probe_us" in pa.plan  # range predicate inside the join


def test_w5_single_user_shuffle(spark):
    # Both windows (first-seen flag on (user, type), running sum on
    # user) reuse ONE user_id hash exchange; the only other exchange
    # is the final presentation sort.
    pa = plan_asserts(_df(spark, "w5_cumulative_distinct"))
    pa.no_python_row_udf()
    hash_ex = pa.plan.count("Arguments: hashpartitioning")
    assert hash_ex == 1, f"expected 1 hash exchange, plan has {hash_ex}"


def test_e10_single_user_shuffle(spark):
    # distinct days, island window, streak aggregate and per-user
    # windows all run on one user_id partitioning.
    pa = plan_asserts(_df(spark, "e10_activity_streaks"))
    pa.no_python_row_udf()
    hash_ex = pa.plan.count("Arguments: hashpartitioning")
    assert hash_ex == 1, f"expected 1 hash exchange, plan has {hash_ex}"


def test_e11_bounded_contribution_explode(spark):
    # No range self-join: the only join is the 1-row max_day bound
    # (scalar nested-loop is the sound cartesian); the explode is the
    # bounded 7-way contribution generator.
    pa = plan_asserts(_df(spark, "e11_rolling_dau"))
    pa.no_python_row_udf()
    assert "CartesianProduct" not in pa.plan
    assert pa.plan.count("Arguments: explode(sequence(") == 1


def test_t21_bpe_encode_vocab_sized(spark):
    # Encoding happens on the aggregated vocabulary: exactly one
    # partial+final token aggregation before the replace chain, zero
    # Python row UDFs (the whole merge chain is codegen'd replace).
    pa = plan_asserts(_df(spark, "t21_bpe_encode"))
    pa.no_python_row_udf().has_partial_agg()
    assert "BatchEvalPython" not in pa.plan


def test_pipe4b_bucket_join_no_cartesian(spark):
    # the quantizer is a per-row signature (zero shuffle); the only
    # pair work is the cluster-key equi self-join; no row-Python.
    pa = plan_asserts(_df(spark, "pipe4b_semantic_dedup_scaled"))
    pa.no_python_row_udf().has_partial_agg()
    assert "CartesianProduct" not in pa.plan


def test_pipe5b_band_join_no_cartesian(spark):
    pa = plan_asserts(_df(spark, "pipe5b_incremental_dedup_wide"))
    pa.no_python_row_udf().has_partial_agg()
    assert "CartesianProduct" not in pa.plan


def test_pipe7_single_corpus_scan_shape(spark):
    # one source-keyed window over integer sums, broadcast budget
    # table, no cartesian beyond the 1-row totals attach.
    pa = plan_asserts(_df(spark, "pipe7_temperature_mixture"))
    pa.no_python_row_udf().has_partial_agg().has_broadcast_join(1)


def test_s6_s7_adc_plans_stay_jvm_side(spark):
    # PQ/IVF-PQ: codebooks, LUTs and probe tables all broadcast; the
    # ADC scan is integer lookups (no row-Python anywhere); the only
    # nested-loop products are broadcast-tiny (LUT x codes).
    for name in ("s6_pq_adc_rerank", "s7_ivfpq_adc_rerank"):
        pa = plan_asserts(_df(spark, name))
        pa.no_python_row_udf().has_broadcast_exchange(2)
        assert "CartesianProduct" not in pa.plan, name


def test_t23_lm_broadcast_and_no_global_window(spark):
    # the bigram LM (bg + ctx) broadcasts to the scoring scan; the
    # returned plan (classification over the checkpointed scored
    # frame) carries no single-partition global window — terciles
    # come from functions/ranks.py order statistics, not ntile().
    pa = plan_asserts(_df(spark, "t23_lm_perplexity"))
    pa.no_python_row_udf()
    assert "SinglePartition" not in pa.plan
    assert "CartesianProduct" not in pa.plan


def test_s8_cascade_broadcasts_probes_no_cartesian(spark):
    # both stages hang off one broadcast of the 20-probe set; the
    # only nested-loop product is that broadcast; shortlist/topk are
    # per-query windows (hash-partitioned by q_id, never global).
    pa = plan_asserts(_df(spark, "s8_truncated_rerank"))
    pa.no_python_row_udf().has_broadcast_exchange(1)
    assert "CartesianProduct" not in pa.plan
    assert "SinglePartition" not in pa.plan


def test_t24_vocab_broadcast_onto_word_scan(spark):
    # encoded vocab is the broadcast side; the corpus word scan joins
    # against it and rolls straight up to |sources| rows.
    pa = plan_asserts(_df(spark, "t24_tokenizer_fertility"))
    pa.no_python_row_udf().has_broadcast_join(1).has_partial_agg()


def test_dq4_semi_join_and_source_aggregates(spark):
    pa = plan_asserts(_df(spark, "dq4_dedup_drift"))
    pa.no_python_row_udf().has_partial_agg()
    assert "CartesianProduct" not in pa.plan


def test_g6_lpa_no_cartesian_no_python(spark):
    # each LPA generation is an edge-keyed join + (node, label) count
    # + per-node top-1 window; nothing cartesian, nothing row-Python.
    pa = plan_asserts(_df(spark, "g6_label_propagation"))
    pa.no_python_row_udf()
    assert "CartesianProduct" not in pa.plan


def test_e12_bucket_join_no_range_cartesian(spark):
    # the interval overlap is resolved by an hour-bucket equi-join
    # (incident side broadcast); a naive plan would show a nested-loop
    # range cross join here.
    pa = plan_asserts(_df(spark, "e12_session_incident_overlap"))
    pa.no_python_row_udf().has_broadcast_join(1)
    assert "CartesianProduct" not in pa.plan


def test_dq5_two_broadcasts_one_type_agg(spark):
    # midpoint bounds + totals each attach as 1-row broadcasts; the
    # only corpus aggregate is type-keyed with map-side partials.
    pa = plan_asserts(_df(spark, "dq5_temporal_drift"))
    pa.no_python_row_udf().has_partial_agg().has_broadcast_exchange(2)


def test_dq6_audit_no_cartesian(spark):
    # fingerprint agg + CC unroll + precedence anti-join: key-shuffled
    # joins only, nothing cartesian, nothing row-Python.
    pa = plan_asserts(_df(spark, "dq6_dedup_audit"))
    pa.no_python_row_udf()
    assert "CartesianProduct" not in pa.plan


def test_s6i_serve_scans_artifact_no_training(spark):
    # the incremental row's returned plan is the SERVE half: codebook
    # broadcast + codes-union scan + rerank — no kmeans/update stages
    # (training happened once into the artifact).
    pa = plan_asserts(_df(spark, "s6i_pq_append_serve"))
    pa.no_python_row_udf()
    assert "codes" in pa.plan  # artifact scan visible
    assert "CartesianProduct" not in pa.plan


def test_s9_probe_bounded_eval(spark):
    # two retrieval legs + a (q_id, n_id) rank join + q_id aggregate;
    # probes broadcast on both legs, never a corpus-corpus join.
    pa = plan_asserts(_df(spark, "s9_retrieval_metrics"))
    pa.no_python_row_udf().has_broadcast_exchange(2)
    assert "CartesianProduct" not in pa.plan


def test_t23b_keyed_window_only(spark):
    # per-language ntile is a lang-keyed window — the plan must not
    # contain a single-partition exchange.
    pa = plan_asserts(_df(spark, "t23b_lang_terciles"))
    pa.no_python_row_udf()
    assert "SinglePartition" not in pa.plan


def test_pipe8_manifest_rollup_shape(spark):
    # the manifest ends in a (lang, bucket) aggregate with a 1-row
    # totals broadcast over the already-asserted t3/t23 passes. The
    # ONE SinglePartition exchange is the scalar token-total combine
    # fed by a partial_sum (|partitions| rows through one task — the
    # correct global-scalar shape); any additional one would mean a
    # global window/sort crept in.
    pa = plan_asserts(_df(spark, "pipe8_ccnet_curation"))
    pa.no_python_row_udf().has_partial_agg()
    assert pa.plan.count("SinglePartition") == 1


def test_pipe9_lifecycle_composition_shape(spark):
    # the end-to-end lifecycle report: every corpus-sized pass is one
    # of the already-audited component plans — nothing cartesian,
    # nothing row-Python, model-sized sides (LM bg/ctx, PQ codebook,
    # ADC LUTs, source dims) attach as broadcasts, and the final
    # rollup keeps map-side partials.
    pa = plan_asserts(_df(spark, "pipe9_corpus_lifecycle"))
    pa.no_python_row_udf().has_partial_agg()
    assert "CartesianProduct" not in pa.plan
    assert pa.plan.count("BroadcastHashJoin") >= 4


def test_samp3_dsir_broadcast_models_and_takeordered(spark):
    # DSIR's scale contract: both bucket models attach by broadcast
    # (B-row tables), selection is a TakeOrdered top-k — the corpus
    # is never globally sorted and never cross-joined (the only
    # BroadcastNestedLoop is the 1-row totals attach).
    pa = plan_asserts(_df(spark, "samp3_dsir_select"))
    assert "CartesianProduct" not in pa.plan
    assert "TakeOrderedAndProject" in pa.plan
    pa.has_broadcast_exchange(2).no_python_row_udf()


def test_pipe5c_corpus_gate_is_broadcast_semi_no_cartesian(spark):
    # The Bloom gate's promise: the corpus fp scan reaches the
    # distinct/anti-join only through broadcast LEFT SEMI joins
    # (map-side, no corpus shuffle for the gate itself).
    pa = plan_asserts(_df(spark, "pipe5c_bloom_gate"))
    assert "CartesianProduct" not in pa.plan
    assert pa.plan.count("BroadcastHashJoin") >= 3
    assert "LeftSemi" in pa.plan
    pa.no_python_row_udf()


def test_samp4_topq_has_no_cluster_window(spark):
    # The per-cluster top-Q must be the two-level tournament, not a
    # PARTITION BY cluster window (k partitions however big the
    # corpus). The only Window allowed is kmeans' per-point
    # assignment rank, whose partition key is the point id
    # (cardinality = corpus, scale-fine).
    import re

    pa = plan_asserts(_df(spark, "samp4_cluster_balanced"))
    for m in re.finditer(r"windowspecdefinition\((\w+)#", pa.plan):
        assert m.group(1) == "id", f"window partitioned by {m.group(1)}"
    assert "CartesianProduct" not in pa.plan
    pa.no_python_row_udf()


def test_s10_hard_negatives_broadcast_probe_and_label_fused(spark):
    # The labeled probe set broadcasts against the labeled corpus
    # scan; the label inequality rides the join predicate (one
    # BroadcastNestedLoopJoin, no extra shuffle of the big side).
    pa = plan_asserts(_df(spark, "s10_hard_negatives"))
    pa.has_broadcast_exchange(1).no_python_row_udf()
    assert "n_lab" in pa.plan and "q_lab" in pa.plan
