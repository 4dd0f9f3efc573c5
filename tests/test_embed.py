"""Vectorized embedding wrapper (SURVEY §2.12 vector UDF): Arrow-batched
pandas_udf → array<float>, per-worker model cache, deterministic mock —
and the full produce-embeddings→rank pipeline it exists for."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from biodata_pipeline_spark.functions.embed import (
    embed_text,
    hash_embedding_loader,
)


def test_embeddings_are_deterministic_and_typed(spark):
    df = spark.createDataFrame(
        [(0, "the quick brown fox"), (1, "spark plans are lazy"), (2, "")],
        ["id", "text"],
    )
    out = df.withColumn("emb", embed_text("text", hash_embedding_loader(dim=8)))
    assert out.schema["emb"].dataType.simpleString() == "array<float>"
    a = {r.id: r.emb for r in out.collect()}
    b = {r.id: r.emb for r in out.collect()}  # re-run: same values
    assert a == b
    assert all(len(v) == 8 for v in a.values())
    assert a[2] == [0.0] * 8  # empty text → zero vector, not null/error
    assert a[0] != a[1]


def test_same_text_same_vector_across_partitions(spark):
    rows = [(i, "identical text content") for i in range(64)]
    df = spark.createDataFrame(rows, ["id", "text"]).repartition(16)
    vecs = {
        tuple(r.emb)
        for r in df.withColumn("emb", embed_text("text")).collect()
    }
    assert len(vecs) == 1  # every worker's cached model encodes identically


def test_loader_runs_once_per_worker(spark, tmp_path):
    """The model loads per Python worker (file-append counter), not per
    batch/row — the per-executor broadcast pattern."""
    counter = str(tmp_path / "loads.log")

    def counting_loader():
        with open(counter, "a") as f:
            f.write("x\n")
        return lambda texts: pd.Series([[1.0, 2.0]] * len(texts))

    counting_loader._cache_key = f"counting:{tmp_path}"
    df = spark.range(200).withColumn("text", F.lit("t")).repartition(8)
    df.withColumn("emb", embed_text("text", counting_loader)).collect()
    df.withColumn("emb", embed_text("text", counting_loader)).collect()
    with open(counter) as f:
        n_loads = len(f.readlines())
    # 400 rows, 16 task-batches — but at most one load per reused worker
    assert 1 <= n_loads <= 32


def test_embed_feeds_retrieval_rank_metrics(spark, sf_dir):
    """The production path end-to-end: chunk documents → embed chunks and
    query terms with the SAME model → rank metrics. Mirrors the
    reference's RAG eval (RAG-eval-test_model.py:226-248) with the mock
    model as the determinism stand-in."""
    from biodata_pipeline_spark.operators.chunking import chunk_documents
    from biodata_pipeline_spark.operators.retrieval import (
        retrieval_rank_metrics,
        retrieval_summary,
    )
    from biodata_pipeline_spark.sources.tables import load_table

    loader = hash_embedding_loader(dim=12)
    docs = load_table(spark, sf_dir, "documents").limit(200)
    chunks = (
        chunk_documents(docs)
        .withColumn("chunk_uid", F.col("doc_id") * 1000 + F.col("chunk_id"))
        .withColumn("embedding", embed_text("chunk_text", loader))
        .select("chunk_uid", "chunk_text", "embedding")
    )
    terms = spark.createDataFrame(
        [("data",), ("spark",), ("zzznomatch",)], ["term"]
    ).withColumn(
        "pattern", F.concat(F.lit(r"(^|\W)"), F.col("term"), F.lit(r"($|\W)"))
    )
    queries = terms.withColumn("query_emb", embed_text("term", loader))
    detail = retrieval_rank_metrics(queries, chunks)
    rows = {r.term: r for r in detail.collect()}
    n_chunks = chunks.count()
    assert set(rows) == {"data", "spark", "zzznomatch"}
    # no-match sentinel = corpus size; matches have valid 1-based ranks
    assert rows["zzznomatch"].n_matches == 0
    assert rows["zzznomatch"].first_hit_rank == n_chunks
    for t in ("data", "spark"):
        if rows[t].n_matches:
            assert 1 <= rows[t].first_hit_rank <= n_chunks
            assert rows[t].sum_match_rank >= rows[t].first_hit_rank
    s = retrieval_summary(detail).collect()[0]
    assert s.avg_first_hit_rank > 0
