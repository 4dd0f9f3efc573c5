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
# #2 / r6 #3 / r7 #3 / r9 #2 / r10 #5 / r11 #2 / r12 #1 / r13 #1).
# Round-14 rotation, computed from the CORRECTNESS_r01-r13 union (max
# driver round per key; after r13 the latest rows are 36×r11, 45×r12,
# 50×r13):
#   1-6:   the round-14 SQ8 scalar-quantization and BQ1 binary-
#          quantization families — never driver-checked (new this
#          round, the standing never-checked-first rule);
#   7-14:  changed-code-first: round 14 moved the training-sample
#          selection in pq_fit / enable_pq onto md5_top_n's
#          bounded-merge path (row-identical, parity-pytest-pinned —
#          the driver row proves it on current code), so the five PQ
#          queries + the residual pair rotate back despite their green
#          r13 rows; q_ivf_cell_assign rides the same rule for the
#          ann_store.py edits (size-aware k_sub, structure signal,
#          versioned docs);
#   15-50: ALL 36 r11-checked keys (VERDICT r13 #1's full list) — the
#          relational core q05-q08/q10/q12-q15/q17-q23/q27/q30, the
#          BM25/RRF family, the tokenizer statistics, and the
#          text-quality/snapshot families.
# Outside the window this round: the 45 r12-checked and the 50
# r13-checked — every one has a green driver row within the last
# two rounds and all are locally re-verifiable by tools/check_oracle.py
# on current code. After this round no key's latest driver row is
# older than r12.
_DRIVER_WINDOW = [
    # -- block 0: the round-14 SQ8 + BQ1 families — NEVER driver-checked -
    "q_sq8_codes",
    "q_sq8_topk",
    "q_sq8_recall_audit",
    "q_bq_codes",
    "q_bq_hamming_topk",
    "q_bq_recall_audit",
    # -- block 1: changed-code-first — pq.py / ann_store.py edits --------
    "q_pq_codes",
    "q_pq_adc_topk",
    "q_pq_ann_refined",
    "q_pq_recall_audit",
    "q_pq_train_error",
    "q_pq_residual_adc",
    "q_pq_residual_audit",
    "q_ivf_cell_assign",
    # -- block 2: the 36 r11-checked keys (VERDICT r13 #1) ---------------
    "q05_suffix_marker_predicate",
    "q06_regex_suffix_strip",
    "q07_word_boundary_match",
    "q08_comment_prefix_filter",
    "q09b_exact_dedup_text",
    "q10_broadcast_dim_join",
    "q12_semi_join",
    "q13_anti_join_manifest",
    "q14_cross_join_grid",
    "q14b_sweep_grid_literal",
    "q15_range_join_price_bands",
    "q17_left_outer_sentinel",
    "q18_global_avg",
    "q19_avg_of_group_min",
    "q20_grouped_count_distinct",
    "q21b_salted_pricing",
    "q21c_percentiles",
    "q22_length_bucket_group",
    "q23_rollup_revenue",
    "q27_row_number_rank",
    "q30_orderby_limit_topk",
    "q_bm25_multi_topk",
    "q_bm25_topk",
    "q_bpe_merge_pairs",
    "q_bpe_token_count",
    "q_bpe_train_merges",
    "q_chunk_documents",
    "q_corpus_diff",
    "q_edit_severity",
    "q_hybrid_rrf",
    "q_quality_percentile_filter",
    "q_quality_score",
    "q_repetition_stats",
    "q_salted_join_parity",
    "q_token_stats",
    "q_word_freq_topk",
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
