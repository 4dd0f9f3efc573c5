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
# #2 / r6 #3 / r7 #3 / r9 #2 / r10 #5 / r11 #2 / r12 #1 / r13 #1 /
# r14 #1). Round-15 rotation, computed from the CORRECTNESS_r01-r14
# union (max driver round per key; after r14 the latest rows are
# 44×r12, 43×r13, 50×r14):
#   1-6:   changed-code-first: round 15 gave the SQ8 oracle family the
#          finite-filtered universe its Spark side already used
#          (ADVICE r14 — _SQ_VECS CTE + _sq_corpus/sq_valid; hash-
#          identical on the defect-free bench corpus, and the driver
#          row proves it), and added the dim%32 guard to
#          bq_encode_kernel — sq.py / bq.py / registry/vector.py SQ8+
#          BQ1 entries all touched, so the six r14-green keys rotate
#          straight back;
#   7-50:  ALL 44 r12-checked keys (VERDICT r14 #1's full list) — the
#          relational/windowing core q09/q11/q16/q21/q24-q26b/q28/q29/
#          q31-q35, the analytic cube/grouping-sets/corr family, the
#          vector q_ivf_ann/kmeans/semantic-dedup/pca/winnow family,
#          the sampling/mixture/shard/pack families, and the corpus
#          text-statistics keys.
# Outside the window this round: the 43 r13-checked and the 44
# remaining r14-checked — every one has a green driver row within the
# last two rounds and all are locally re-verifiable by
# tools/check_oracle.py on current code. After this round no key's
# latest driver row is older than r13.
_DRIVER_WINDOW = [
    # -- block 0: changed-code-first — sq.py/bq.py/vector.py SQ8+BQ1 -----
    "q_sq8_codes",
    "q_sq8_topk",
    "q_sq8_recall_audit",
    "q_bq_codes",
    "q_bq_hamming_topk",
    "q_bq_recall_audit",
    # -- block 1: ALL 44 r12-checked keys (VERDICT r14 #1) ---------------
    "q09_exact_dedup",
    "q11_multiway_join_revenue",
    "q16_asof_join",
    "q21_pricing_summary",
    "q24_cosine_topk",
    "q25_similarity_join",
    "q26_retrieval_rank_detail",
    "q26b_retrieval_rank_summary",
    "q28_lag_prev_event",
    "q29_sliding_frame_avg",
    "q31_per_group_topk",
    "q31b_collect_ordered",
    "q32_union_all",
    "q33_except_difference",
    "q34_intersect",
    "q35_tumbling_window",
    "q_bpe_encode_corpus",
    "q_contamination_check",
    "q_corpus_profile",
    "q_corpus_shuffle",
    "q_cube_pricing",
    "q_dedup_clusters",
    "q_embed_cosine_dedup",
    "q_grouping_sets_revenue",
    "q_ivf_ann",
    "q_kmeans_clusters",
    "q_lsh_precision_audit",
    "q_media_inventory",
    "q_mixture_allocation",
    "q_mixture_schedule",
    "q_pack_sequences",
    "q_passage_dedup",
    "q_pca_projection",
    "q_quality_classifier",
    "q_semantic_dedup",
    "q_shard_manifest",
    "q_stats_corr",
    "q_stratified_split",
    "q_tfidf_top_terms",
    "q_token_entropy",
    "q_unigram_logprob",
    "q_vocab_oov_rate",
    "q_weighted_sample",
    "q_winnow_fingerprints",
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
