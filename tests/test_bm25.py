"""BM25 + RRF: scoring semantics, determinism, and fuse behavior."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from biodata_pipeline_spark.operators.bm25 import (
    bm25_scores,
    ranked_top_n,
    rrf_fuse,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_matches_reference_formula(spark):
    docs = _docs(
        spark,
        [
            (1, "hash join hash"),      # tf(hash)=2, dl=3
            (2, "merge sort"),           # tf(merge)=1, dl=2
            (3, "scan filter scan"),     # no query terms
        ],
    )
    got = {r.doc_id: r.bm25 for r in bm25_scores(docs, ("hash", "merge")).collect()}
    assert set(got) == {1, 2}
    n, avgdl, k1, b = 3, 8 / 3, 1.2, 0.75

    def score(tf, df, dl):
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        return idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))

    assert got[1] == round(score(2, 1, 3), 9)
    assert got[2] == round(score(1, 1, 2), 9)


def test_bm25_higher_tf_wins_same_length(spark):
    docs = _docs(spark, [(1, "hash hash sort"), (2, "hash sort sort")])
    got = {r.doc_id: r.bm25 for r in bm25_scores(docs, ("hash",)).collect()}
    assert got[1] > got[2]


def test_ranked_top_n_is_deterministic_with_ties(spark):
    scored = spark.createDataFrame(
        [(3, 1.0), (1, 1.0), (2, 2.0)], "doc_id long, s double"
    )
    got = [(r.doc_id, r.rank) for r in ranked_top_n(scored, "s", 2).collect()]
    assert sorted(got, key=lambda x: x[1]) == [(2, 1), (1, 2)]


def test_rrf_fuse_full_outer_and_missing_side(spark):
    sparse = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, rank int")
    dense = spark.createDataFrame([(2, 1), (3, 2)], "doc_id long, rank int")
    got = {r.doc_id: r for r in rrf_fuse(sparse, dense).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1].rank_dense is None
    assert got[1].rrf == round(1 / 61, 9)
    assert got[2].rrf == round(1 / 62 + 1 / 61, 9)
    # doc in both lists outranks docs in one
    assert got[2].rrf > got[1].rrf and got[2].rrf > got[3].rrf


def test_bm25_no_matching_terms_is_empty(spark):
    docs = _docs(spark, [(1, "scan filter")])
    assert bm25_scores(docs, ("hash",)).count() == 0


def test_bm25_multi_matches_single_query(spark):
    """A 1-query multi batch must equal bm25_scores for the same terms."""
    from biodata_pipeline_spark.operators.bm25 import bm25_scores_multi

    docs = _docs(
        spark,
        [(1, "hash join hash"), (2, "merge sort hash"), (3, "scan filter")],
    )
    qt = spark.createDataFrame(
        [("q0", "hash"), ("q0", "merge")], "query_id string, term string"
    )
    multi = {
        r.doc_id: r.bm25 for r in bm25_scores_multi(docs, qt).collect()
    }
    single = {
        r.doc_id: r.bm25 for r in bm25_scores(docs, ("hash", "merge")).collect()
    }
    assert multi == single


def test_bm25_multi_scopes_terms_per_query(spark):
    """A doc matching only query A's terms must not appear under query B."""
    from biodata_pipeline_spark.operators.bm25 import bm25_scores_multi

    docs = _docs(spark, [(1, "hash only"), (2, "merge only")])
    qt = spark.createDataFrame(
        [("qa", "hash"), ("qb", "merge")], "query_id string, term string"
    )
    got = {(r.query_id, r.doc_id) for r in bm25_scores_multi(docs, qt).collect()}
    assert got == {("qa", 1), ("qb", 2)}
