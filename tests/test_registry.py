"""Registry ordering contract: the round driver hash-checks exactly the
first DRIVER_WINDOW_SIZE keys of ``queries()`` (evidence: CORRECTNESS_r01
and _r02 are each the 50-key prefix of that round's registry order). These
tests make the window an enforced invariant, so adding a query can never
again silently evict a not-yet-driver-checked one (the round-2 failure
mode: q_chunk_documents lost its row when new queries pushed it past 50).
"""

from __future__ import annotations

import json
from pathlib import Path

from biodata_pipeline_spark.registry import (
    DRIVER_WINDOW_SIZE,
    ORACLE_SQL,
    SPARK_QUERIES,
)

REPO = Path(__file__).resolve().parent.parent


def _driver_checked_keys() -> set[str]:
    keys: set[str] = set()
    for path in REPO.glob("CORRECTNESS_r*.json"):
        keys.update(json.loads(path.read_text()))
    return keys


def test_every_query_has_a_driver_row_recorded_or_scheduled():
    """Every declared query either already has a CORRECTNESS row from a
    past round or sits inside the driver's first-50 window for this one."""
    window = list(SPARK_QUERIES)[:DRIVER_WINDOW_SIZE]
    covered = _driver_checked_keys() | set(window)
    missing = [k for k in SPARK_QUERIES if k not in covered]
    assert not missing, f"queries with no past or scheduled driver row: {missing}"


def test_window_is_exact_and_duplicate_free():
    window = list(SPARK_QUERIES)[:DRIVER_WINDOW_SIZE]
    assert len(window) == DRIVER_WINDOW_SIZE
    assert len(set(window)) == DRIVER_WINDOW_SIZE
    assert len(SPARK_QUERIES) >= DRIVER_WINDOW_SIZE


def test_oracle_keys_are_a_subset_of_queries():
    unknown = set(ORACLE_SQL) - set(SPARK_QUERIES)
    assert not unknown, f"oracle entries without a query: {unknown}"


def test_rows_only_set_is_exactly_the_documented_one():
    """Only genuinely non-SQL-expressible operators may skip the oracle
    (approximate estimators, hash-seeded candidates, iterative CC)."""
    rows_only = set(SPARK_QUERIES) - set(ORACLE_SQL)
    # q_ivf_ann and q_lsh_similarity_join left this set in round 5:
    # their hyperplanes/centroids are pure functions exported to the
    # oracle as DOUBLE literals (and LSH band buckets over 4-bit slices
    # equal bit-tuple equality). q_dedup_clusters left it in round 6:
    # its edges now come from the md5-family MinHash banding (the
    # q_lsh_recall_audit candidate CTEs), so the CC output is plain
    # recursive SQL. q21d_approx_percentiles joined it in round 6: the
    # GK sketch's output is engine-specific by nature; its accuracy is
    # pinned by the hash-checked q_percentile_accuracy_audit rank-window
    # bounds. The remaining four are genuinely irreproducible outside
    # the JVM — xxhash64 over unbounded domains (shingles, token hashes)
    # where the HASH VALUES matter, and HLL/CMS register layouts — but
    # each FAMILY has a hash-checked recall-audit twin in
    # registry/audits.py. q_bpe_train_merges (round 6) is rows-only
    # because the greedy argmax+fold iteration is not one SQL query;
    # its audit twin is tests/test_tokenizer.py's merge-for-merge
    # comparison against the serial textbook algorithm, and
    # q_bpe_merge_pairs hash-checks the per-iteration statistic.
    # q_bpe_encode_corpus inherits the same nature (it trains before
    # encoding); its audit twin is the encode-reproduces-training-
    # segmentation test in tests/test_tokenizer.py.
    assert rows_only == {
        "q_bpe_train_merges",
        "q_bpe_encode_corpus",
        "q_minhash_lsh_dedup",
        "q_simhash_dedup",
        "q21d_approx_percentiles",
        "q_approx_count_distinct",
        "q_cms_heavy_hitters",
        # round 7: the production MinHash-banded split guard — xxhash64
        # banding like q_minhash_lsh_dedup; its recall is hash-checked by
        # q_leakage_recall_audit (md5 family, same geometry) and the
        # exact q_split_leakage remains the bounded-slice audit twin.
        "q_split_leakage_lsh",
    }, rows_only
