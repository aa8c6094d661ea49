"""Partition-independence as a TESTED invariant (not just a design
discipline): every oracled query must produce value-identical results
when its parquet inputs arrive under a completely different
partitioning.

Mechanism: patch DataFrameReader.parquet to append .repartition(7) —
a round-robin redistribution that changes partition count, row
placement, AND intra-partition order for every scan — then re-run the
query and require exact frame equality (the same bit-level compare
the DuckDB parity gate uses). This would catch any order-dependent
double sum, any first()/limit() that silently depends on partition
layout, and any non-deterministic tie-break that slipped past the
md5/fixed-point discipline.

The query list spans every catalog family (relational agg, window,
as-of, sketch, dedup, text chunking, clustering, scaling, projection,
splits) rather than sampling randomly — deterministic CI beats
roulette."""

from __future__ import annotations

import pytest

from ae_data_integration_spark.catalog import load_all, resolve
from ae_data_integration_spark.oracle import compare_frames
from tests.conftest import SF_SMOKE

QUERIES = [
    "q1_pricing_summary",        # relational aggregate
    "e1_hourly_rollup",          # time-window rollup
    "e4_asof_prior_click",       # as-of join (union + last ignorenulls)
    "e7_funnel",                 # chained as-of + conditional aggs
    "sk1_cms_heavy_hitters",     # count-min sketch cells + estimates
    "sk2_kmv_distinct",          # KMV order statistics per group
    "d2_minhash_lsh",            # shingle → minhash → band join
    "d5_ngram_jaccard",          # n-gram set similarity
    "t7_chunking",               # sliding-window token chunking
    "c5_silhouette_exact",       # normalized cluster-sum silhouette
    "c1_kmeans_relational",      # iterative Lloyd's with md5 init
    "c7b_pca_projection",        # covariance → eigh → literal project
    "r1_stratified_split",       # md5-ranked per-class split
    "n1_minmax_scale",           # per-feature min-max fold-back
    "t11_decontaminate",         # broadcast eval-ngram semi join
    "t12_mixture_weights",       # fixed-point normalized weights
    "t13_length_buckets",        # integer bucket histogram
    "samp1_stratified_sample",   # md5-ranked per-stratum sample
    "t20_bpe_train",             # iterative argmax merge loop (r8)
    "t21_bpe_encode",            # literal replace chain + rollup (r8)
    "e10_activity_streaks",      # gaps-and-islands windows (r8)
    "e11_rolling_dau",           # contribution explode + distinct (r8)
    "scd3_point_in_time",        # interval-membership join (r8)
    "w5_cumulative_distinct",    # first-seen flag + running sum (r8)
    "pipe6_data_card",           # 4-operator composed data card (r8)
    "pipe4b_semantic_dedup_scaled",  # bits-from-count LSH quantizer (r9)
    "pipe5b_incremental_dedup_wide",  # wide-signature band join (r9)
    "pipe7_temperature_mixture",  # budgeted md5-order selection (r9)
    "s6_pq_adc_rerank",          # PQ codebooks + integer ADC (r9)
    "s7_ivfpq_adc_rerank",       # coarse cells + residual PQ (r9)
    "t22_bpe_batched",           # multi-merge batched trainer (r9)
    "sk5_kmv_jaccard_matrix",    # merged-KMV overlap estimates (r9)
    "d2b_minhash_lsh_wide",      # 16-perm / 2x8-band near-dup twin (r10)
    "s6q_pq_serve",              # PQ serve from persisted artifact (r10)
    "s7q_ivfpq_serve",           # IVF-PQ serve from artifact (r10)
    "t23_lm_perplexity",         # LM NLL + order-statistic terciles (r10)
    "t24_tokenizer_fertility",   # vocab-broadcast fertility report (r10)
    "s8_truncated_rerank",       # prefix-cosine cascade retrieval (r10)
    "dq4_dedup_drift",           # dedup mixture drift + KL term (r10)
    "pipe8_ccnet_curation",      # lang x perplexity-bucket manifest (r10)
    "t23q_lm_serve",             # LM artifact serve twin (r10)
    "s9_retrieval_metrics",      # recall/MRR/nDCG eval row (r10)
    "g6_label_propagation",      # majority-vote LPA communities (r10)
    "e12_session_incident_overlap",  # bucketed interval-overlap join (r10)
    "dq5_temporal_drift",        # midpoint-split mixture drift (r10)
    "s6i_pq_append_serve",       # incremental PQ index append (r10)
    "t23b_lang_terciles",        # per-language perplexity cut (r10)
    "s7i_ivfpq_append_serve",    # incremental IVF-PQ append (r10)
    "dq6_dedup_audit",           # drop provenance (exact/near) (r10)
    "pipe9_corpus_lifecycle",    # end-to-end lifecycle composition (r11)
    "s6d_index_drift",           # PQ residual-energy drift monitor (r11)
    "t25_kn5_perplexity",        # 5-gram interpolated KN filter (r11)
    "t25q_kn5_serve",            # KN artifact serve twin (r11)
    "g6b_lpa_wide",              # wide-signature LPA scale config (r11)
    "samp3_dsir_select",         # DSIR Gumbel top-k selection (r11)
    "pipe5c_bloom_gate",         # Bloom runtime-filtered exact dedup (r11)
    "samp4_cluster_balanced",    # per-cluster top-Q tournament (r11)
    "t26_logreg_train",          # full-batch GD logistic training (r11)
    "s10_hard_negatives",        # contrastive hard-negative mining (r11)
    "dq7_selection_bias",        # per-lang DSIR selection audit (r11)
    "t25k_kn5_keyed",            # forced keyed-join KN serve (r12)
    "dq8_cluster_bias",          # per-cluster samp4 selection audit (r12)
    "pipe8b_classifier_curation",  # t26-weights curation cut (r12)
    "d8_substring_spans",        # exact-substring duplicate spans (r12)
    "pipe10_span_scrub",         # complement-gap span scrub (r12)
    "samp5_temperature_mixture",  # quota-exact mixture materialization (r12)
    "s11_filtered_ann",          # pre-filtered broadcast-probe ANN (r12)
    "dq9_span_audit",            # per-source span-scrub governance (r12)
    "pipe10i_incremental_span_scrub",  # batch-vs-corpus span scrub (r12)
]


@pytest.mark.parametrize("name", QUERIES)
def test_result_invariant_under_repartition(spark, monkeypatch, name):
    registry = load_all()
    q = registry[resolve(name)]
    base = q.fn(spark, SF_SMOKE).toPandas()
    assert len(base) > 0, f"{name}: empty baseline defeats the test"

    import pyspark.sql.readwriter as rw

    orig = rw.DataFrameReader.parquet

    def parquet_repartitioned(self, *paths):
        return orig(self, *paths).repartition(7)

    monkeypatch.setattr(rw.DataFrameReader, "parquet", parquet_repartitioned)
    shuffled = q.fn(spark, SF_SMOKE).toPandas()
    monkeypatch.undo()

    diff = compare_frames(base, shuffled, rel_tol=0.0)
    assert diff == "", f"{name} not partition-independent: {diff}"
