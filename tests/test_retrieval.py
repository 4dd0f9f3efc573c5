"""Rank-metric pipeline reproduces the reference VectorTest semantics
(RAG-eval-test_model.py:119-153), cross-checked against an independent
pure-Python reimplementation."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from biodata_pipeline_spark.functions.textfn import boundary_pattern
from biodata_pipeline_spark.operators.retrieval import (
    cosine_top_k,
    retrieval_rank_metrics,
    retrieval_summary,
)

CHUNKS = [
    # (chunk_uid, chunk_text, embedding)
    (1, "glucose metabolism in pathway map00010", [1.0, 0.0, 0.0]),
    (2, "ATP synthase atpA subunit", [0.9, 0.1, 0.0]),
    (3, "the atpAB operon is different", [0.0, 1.0, 0.0]),
    (4, "more glucose metabolism text", [0.5, 0.5, 0.0]),
    (5, "unrelated content entirely", [0.0, 0.0, 1.0]),
]
QUERIES = [
    # term, embedding — 'atpA' must NOT match 'atpAB' (word boundary trap)
    ("glucose", [1.0, 0.0, 0.0]),
    ("atpA", [0.8, 0.2, 0.0]),
    ("zzz_nomatch", [0.0, 0.0, 1.0]),
]


def python_rank_metrics():
    """Independent reimplementation: rank chunks per query by cosine
    (rounded 9dp, ties by chunk_uid), collect 1-based match ranks."""
    import re

    out = {}
    n = len(CHUNKS)
    for term, qe in QUERIES:
        def cos(ce):
            d = sum(a * b for a, b in zip(qe, ce))
            return round(d / (math.sqrt(sum(a * a for a in qe)) * math.sqrt(sum(b * b for b in ce))), 9)

        ranked = sorted(CHUNKS, key=lambda c: (-cos(c[2]), c[0]))
        pat = re.compile(r"(^|\W)" + re.escape(term) + r"($|\W)")
        ranks = [i + 1 for i, c in enumerate(ranked) if pat.search(c[1])]
        if ranks:
            out[term] = (len(ranks), min(ranks), sum(ranks))
        else:
            out[term] = (0, n, n)
    return out


@pytest.fixture(scope="module")
def frames(spark):
    chunks = spark.createDataFrame(
        [(u, t, [float(x) for x in e]) for u, t, e in CHUNKS],
        "chunk_uid long, chunk_text string, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(t, boundary_pattern(t), [float(x) for x in e]) for t, e in QUERIES],
        "term string, pattern string, query_emb array<double>",
    )
    return queries, chunks


def test_detail_matches_python_reimplementation(spark, frames):
    queries, chunks = frames
    detail = {
        r.term: (r.n_matches, r.first_hit_rank, r.sum_match_rank)
        for r in retrieval_rank_metrics(queries, chunks).collect()
    }
    assert detail == python_rank_metrics()


def test_word_boundary_trap(spark, frames):
    queries, chunks = frames
    detail = {r.term: r.n_matches for r in retrieval_rank_metrics(queries, chunks).collect()}
    # 'atpA' appears in chunk 2; 'atpAB' in chunk 3 must not count
    assert detail["atpA"] == 1


def test_no_match_sentinel(spark, frames):
    queries, chunks = frames
    row = {r.term: r for r in retrieval_rank_metrics(queries, chunks).collect()}[
        "zzz_nomatch"
    ]
    assert row.n_matches == 0
    assert row.first_hit_rank == len(CHUNKS)  # sentinel = corpus size
    assert row.avg_match_rank == float(len(CHUNKS))


def test_summary_averages(spark, frames):
    queries, chunks = frames
    detail = retrieval_rank_metrics(queries, chunks)
    s = retrieval_summary(detail).collect()[0]
    py = python_rank_metrics()
    total_ranks = sum(v[2] for v in py.values())
    total_n = sum(max(v[0], 1) for v in py.values())
    assert s.avg_search_rank == pytest.approx(total_ranks / total_n)
    first_hits = [v[1] for v in py.values()]
    assert s.avg_first_hit_rank == pytest.approx(sum(first_hits) / len(first_hits))


def test_cosine_top_k_exact_and_deterministic(spark):
    import random

    rng = random.Random(7)
    corpus = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(200)]
    queries = [(j, [rng.uniform(-1, 1) for _ in range(8)]) for j in range(3)]
    cdf = spark.createDataFrame(corpus, "vec_id long, embedding array<double>")
    qdf = spark.createDataFrame(queries, "query_id long, query_emb array<double>")
    got = {
        (r.query_id, r.rank): r.vec_id
        for r in cosine_top_k(qdf, cdf, k=5, salt_buckets=4).collect()
    }

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return round(d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))), 9)

    for qid, qe in queries:
        ranked = sorted(corpus, key=lambda c: (-cos(qe, c[1]), c[0]))[:5]
        for rank, (vid, _) in enumerate(ranked, 1):
            assert got[(qid, rank)] == vid


def test_kernel_and_hof_paths_are_bit_identical(spark, frames):
    """The size-driven strategy switch must be invisible in the output:
    forcing the Arrow kernel (kernel_threshold=0) yields exactly the
    rows the default (HOF at this scale) path yields."""
    queries, chunks = frames
    hof = sorted(
        retrieval_rank_metrics(queries, chunks).collect(),
        key=lambda r: r.term,
    )
    kern = sorted(
        retrieval_rank_metrics(queries, chunks, kernel_threshold=0).collect(),
        key=lambda r: r.term,
    )
    assert [tuple(r) for r in hof] == [tuple(r) for r in kern]


def test_kernel_query_set_bound_is_enforced(spark, frames):
    """The kernel path's driver collect is gated: an over-bound query
    frame raises with the bound named instead of OOMing the driver."""
    queries, chunks = frames
    with pytest.raises(ValueError, match="driver-collect bound of 2"):
        retrieval_rank_metrics(
            queries, chunks, kernel_threshold=0, max_query_rows=2
        )


def test_cosine_top_k_kernel_is_bit_identical(spark):
    """OPTIMIZATION r15: the use_kernel scoring path (Arrow numpy fold)
    must yield exactly the HOF path's rows — ranks AND 9dp sims — on a
    corpus whose cosines are full of near-ties (unit-ish random vectors),
    so any fold-order or rounding divergence would reorder something."""
    import random

    rng = random.Random(15)
    corpus = [
        (i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(300)
    ]
    queries = [
        (j, [rng.uniform(-1, 1) for _ in range(16)]) for j in range(7)
    ]
    cdf = spark.createDataFrame(corpus, "vec_id long, embedding array<double>")
    qdf = spark.createDataFrame(
        queries, "query_id long, query_emb array<double>"
    )
    hof = sorted(
        cosine_top_k(qdf, cdf, k=10, salt_buckets=4).collect(),
        key=lambda r: (r.query_id, r.rank),
    )
    kern = sorted(
        cosine_top_k(qdf, cdf, k=10, salt_buckets=4, use_kernel=True).collect(),
        key=lambda r: (r.query_id, r.rank),
    )
    assert [tuple(r) for r in hof] == [tuple(r) for r in kern]


def test_cosine_top_k_kernel_query_bound(spark):
    """The kernel path's driver collect stays gated by MAX_QUERY_ROWS."""
    from biodata_pipeline_spark.operators import retrieval

    n = retrieval.MAX_QUERY_ROWS
    cdf = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    big = spark.range(n + 1).select(
        F.col("id").alias("query_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("query_emb"),
    )
    with pytest.raises(ValueError, match="driver-collect bound"):
        cosine_top_k(big, cdf, k=1, use_kernel=True)
