"""Retrieval: cosine top-k + retrieval-rank metrics (the flagship).

The reference scores every query against the *entire* chunk corpus
(k = corpus size), walks the ranked list collecting 1-based positions of
regex matches, takes the first hit, assigns a sentinel rank (= corpus
size) to queries with no match, and averages
(rag_evaluation/RAG-eval-test_model.py:123-153,247-248).

Spark-first design:
 - queries are tiny → ``broadcast`` them; the corpus side never shuffles
   during scoring (BroadcastNestedLoopJoin over a map-side cross product).
 - ranking uses a **two-phase top-k**: a salted local window prunes each
   scored partition to its local top-k, then a single global window ranks
   the survivors. At 1000 executors the full |Q|×|C| score stream is never
   shuffled into |Q| partitions — only |salts|×k rows per query are.
 - ties broken on rounded similarity then ids, so ranks are deterministic
   and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from biodata_pipeline_spark.functions.vector import dot, l2_norm

SIM_ROUND = 9  # ranking precision: collapses float64 ulp noise into ties


def _with_norm(df: DataFrame, emb_col: str, norm_col: str) -> DataFrame:
    """Attach each vector's L2 norm once on its own side of a pairwise
    join — per-pair scoring then needs only the dot product (same
    dot/(na·nb) arithmetic, n norms instead of n²)."""
    return df.withColumn(norm_col, l2_norm(F.col(emb_col)))


def cosine_top_k(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    query_emb: str = "query_emb",
    corpus_emb: str = "embedding",
    salt_buckets: int = 64,
) -> DataFrame:
    """Exact top-k by cosine similarity, scalable two-phase ranking.

    Output: ``query_id, corpus_id, rank, sim`` with rank 1..k per query.
    Ordering: round(sim, 9) DESC, corpus_id ASC (deterministic).
    """
    # Spread the corpus before the broadcast cross join: a compact scan can
    # arrive as one partition, which would serialize |Q|×|C| scoring work.
    corpus = _with_norm(corpus, corpus_emb, "__nc").repartition(
        corpus.sparkSession.sparkContext.defaultParallelism
    )
    queries = _with_norm(queries, query_emb, "__nq")
    scored = corpus.crossJoin(F.broadcast(queries)).select(
        F.col(query_id),
        F.col(corpus_id),
        F.round(
            dot(F.col(query_emb), F.col(corpus_emb)) / (F.col("__nq") * F.col("__nc")),
            SIM_ROUND,
        ).alias("sim"),
    )
    order = [F.col("sim").desc(), F.col(corpus_id).asc()]
    # Phase 1: local top-k within salt buckets (map-side pruning of the
    # scored stream; the global shuffle only carries salt_buckets*k rows/query).
    salted = scored.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(corpus_id)), F.lit(salt_buckets))
    )
    local_w = Window.partitionBy(query_id, "__salt").orderBy(*order)
    survivors = (
        salted.withColumn("__lr", F.row_number().over(local_w))
        .filter(F.col("__lr") <= k)
        .drop("__lr", "__salt")
    )
    # Phase 2: exact global rank over the pruned candidates.
    global_w = Window.partitionBy(query_id).orderBy(*order)
    return (
        survivors.withColumn("rank", F.row_number().over(global_w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "rank", "sim")
    )


def rank_all(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    query_emb: str = "query_emb",
    corpus_emb: str = "embedding",
    extra_corpus_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Rank the *entire* corpus per query (reference semantics: k = corpus
    size). One global window per query — reserved for evaluation workloads
    where the full ranking is genuinely required."""
    corpus = _with_norm(corpus, corpus_emb, "__nc").repartition(
        corpus.sparkSession.sparkContext.defaultParallelism
    )
    queries = _with_norm(queries, query_emb, "__nq")
    scored = corpus.crossJoin(F.broadcast(queries)).select(
        F.col(query_id),
        F.col(corpus_id),
        *[F.col(c) for c in extra_corpus_cols],
        F.round(
            dot(F.col(query_emb), F.col(corpus_emb)) / (F.col("__nq") * F.col("__nc")),
            SIM_ROUND,
        ).alias("sim"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("sim").desc(), F.col(corpus_id).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w))


SIM_BUCKETS = 1024  # coarse sim partitioning for the distributed rank


def retrieval_rank_metrics(
    queries: DataFrame,
    chunks: DataFrame,
    query_id: str = "term",
    pattern_col: str = "pattern",
    query_emb: str = "query_emb",
    chunk_id: str = "chunk_uid",
    chunk_text: str = "chunk_text",
    chunk_emb: str = "embedding",
) -> DataFrame:
    """Per-query retrieval-rank detail (the reference's VectorTest).

    For each query: rank all chunks by cosine sim, find word-boundary regex
    matches of the query pattern in chunk text, and report::

        term, n_matches, first_hit_rank, sum_match_rank, avg_match_rank

    No-match queries get the sentinel rank = corpus size
    (RAG-eval-test_model.py:145-147 — never silently dropped). All metrics
    derive from integer rank sums (exact in float64), so values are
    bit-identical across engines with no rounding needed.

    Scale design — **no per-query global window, and the scored stream is
    never shuffled whole**. A matched chunk's rank in the (sim DESC,
    chunk_id ASC) total order is ``1 + #chunks ordered above it``; split
    that count at the boundary of ``SIM_BUCKETS`` coarse sim buckets:

    1. score map-side (broadcast queries; the corpus never shuffles here);
    2. ``#chunks in strictly-higher buckets``: a per-(query, bucket)
       count with map-side partial aggregation — only |Q|×1024 total
       rows enter the shuffle, then a running sum per query;
    3. ``position within its own bucket``: ``row_number`` over
       (query, bucket) — but only for buckets that CONTAIN a match. The
       distinct (query, bucket) match set is ≤ |Q|×SIM_BUCKETS rows *by
       construction*, so it is always broadcastable, and the windowed
       subset is only those buckets' rows (worst case — every bucket
       matched — degrades to one full-stream shuffle, i.e. never worse
       than ranking everything);
    4. ``rank = above_buckets + row_number`` for matched rows, then a
       plain groupBy.

    The scored stream is persisted once (three consumers: bucket totals,
    matched-bucket set, within-bucket ranking). Degenerate sim
    distributions where one bucket holds most of a query's corpus would
    re-concentrate that bucket's window partition; with 9-dp-rounded real
    embeddings the 1024 buckets stay balanced.

    Scoring itself runs in an Arrow numpy kernel: each chunk's sims
    against ALL queries come back as one array column (the query
    embeddings — tiny by contract — are collected driver-side and closed
    over, like the kmeans centroids), which a ``posexplode`` + broadcast
    join turns back into (query, chunk) rows for the JVM-side rounding
    and regex match. The kernel accumulates dimension-by-dimension in
    ascending order — the identical IEEE-754 fold the HOF path used, so
    sims are bit-equal (IEEE multiplication is commutative, so nq·nc is
    too) and the oracle hash is unchanged. Replaces the interpreted
    per-pair lambda fold, which dominated the 100×-corpus probe.
    """
    import numpy as np
    import pandas as pd

    n_chunks = chunks.select(
        F.count("*").cast("long").alias("__n_chunks")
    )  # 1-row frame, crossJoin-broadcast as the sentinel
    corpus = chunks.repartition(
        chunks.sparkSession.sparkContext.defaultParallelism
    )
    q_rows = queries.select(query_id, pattern_col, query_emb).collect()
    if not q_rows:
        raise ValueError("retrieval_rank_metrics: empty query set")
    qmat = np.array([[float(v) for v in r[query_emb]] for r in q_rows])
    nqs = np.zeros(len(q_rows))
    for i in range(qmat.shape[1]):  # ascending-dim fold ≡ l2_norm's
        nqs += qmat[:, i] * qmat[:, i]
    nqs = np.sqrt(nqs)

    def score(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            emb = np.array(pdf["__emb"].tolist(), dtype=np.float64)
            s = np.zeros((n, len(q_rows)))
            nc = np.zeros(n)
            for i in range(emb.shape[1]):  # in-order fold: bit-parity
                nc += emb[:, i] * emb[:, i]
                s += emb[:, [i]] * qmat[:, i][None, :]
            s /= nqs[None, :] * np.sqrt(nc)[:, None]
            yield pd.DataFrame(
                {
                    "__cid": pdf["__cid"],
                    "__ctext": pdf["__ctext"],
                    "__sims": list(s),
                }
            )

    qmeta = queries.sparkSession.createDataFrame(
        [(i, r[query_id], r[pattern_col]) for i, r in enumerate(q_rows)],
        ["__qidx", query_id, pattern_col],
    )
    kernel_out = corpus.select(
        F.col(chunk_id).alias("__cid"),
        F.col(chunk_text).alias("__ctext"),
        F.col(chunk_emb).alias("__emb"),
    ).mapInPandas(score, "__cid long, __ctext string, __sims array<double>")
    bucket = F.least(
        F.greatest(F.floor((F.col("sim") + 1) * (SIM_BUCKETS / 2)), F.lit(0)),
        F.lit(SIM_BUCKETS - 1),
    ).cast("int")
    scored = (
        kernel_out.select(
            "__cid",
            "__ctext",
            F.posexplode("__sims").alias("__qidx", "__sim_raw"),
        )
        .join(F.broadcast(qmeta), "__qidx")
        .select(
            F.col(query_id),
            F.col("__cid").alias(chunk_id),
            F.round("__sim_raw", SIM_ROUND).alias("sim"),
            F.regexp_like(F.col("__ctext"), F.col(pattern_col)).alias(
                "__is_match"
            ),
        )
        .withColumn("__bucket", bucket)
        .persist()
    )
    btot = scored.groupBy(query_id, "__bucket").agg(F.count("*").alias("__bcnt"))
    w_above = (
        Window.partitionBy(query_id)
        .orderBy(F.col("__bucket").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    btot = btot.withColumn(
        "__above", F.coalesce(F.sum("__bcnt").over(w_above), F.lit(0))
    ).drop("__bcnt")
    match_buckets = (
        scored.filter(F.col("__is_match")).select(query_id, "__bucket").distinct()
    )
    in_matched = scored.join(F.broadcast(match_buckets), [query_id, "__bucket"])
    w_in = Window.partitionBy(query_id, "__bucket").orderBy(
        F.col("sim").desc(), F.col(chunk_id).asc()
    )
    matched = (
        in_matched.withColumn("__rn", F.row_number().over(w_in))
        .filter(F.col("__is_match"))
        .join(F.broadcast(btot), [query_id, "__bucket"])
        .withColumn("rank", (F.col("__above") + F.col("__rn")).cast("long"))
    )
    per_query = matched.groupBy(query_id).agg(
        F.count("*").alias("n_matches"),
        F.min("rank").alias("first_hit_rank"),
        F.sum("rank").alias("sum_match_rank"),
    )
    return (
        queries.select(query_id)
        .join(per_query, query_id, "left")
        .crossJoin(F.broadcast(n_chunks))
        .select(
            query_id,
            F.coalesce("n_matches", F.lit(0)).cast("long").alias("n_matches"),
            F.coalesce("first_hit_rank", F.col("__n_chunks"))
            .cast("long")
            .alias("first_hit_rank"),
            # no-match sentinel: one rank equal to the corpus size
            F.coalesce("sum_match_rank", F.col("__n_chunks"))
            .cast("long")
            .alias("sum_match_rank"),
        )
        .withColumn(
            "avg_match_rank",
            F.col("sum_match_rank") / F.greatest(F.col("n_matches"), F.lit(1)),
        )
    )


def retrieval_summary(detail: DataFrame) -> DataFrame:
    """Corpus-level aggregates (RAG-eval-test_model.py:149-150):
    Average Search Rank = mean over every collected rank (each no-match
    query contributes one sentinel rank), Average First Hit Rank = mean of
    per-query first hits. Pure integer sums → exact doubles."""
    return detail.agg(
        (
            F.sum("sum_match_rank")
            / F.sum(F.greatest(F.col("n_matches"), F.lit(1)))
        ).alias("avg_search_rank"),
        (F.sum("first_hit_rank") / F.count("*")).alias("avg_first_hit_rank"),
    )


def retrieve_top_k_auto(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    exact_limit: int = 100_000,
    n_cells: int = 16,
    n_probe: int = 4,
    **cols,
) -> DataFrame:
    """Strategy selection for top-k retrieval (SURVEY §4: the
    crossJoin+cosine+rank≤k → pruned-plan rewrite, driven by data size
    instead of a Catalyst rule).

    Small corpora (≤ ``exact_limit`` rows) take the exact two-phase
    ``cosine_top_k`` — one pass over every (query, vector) pair. Larger
    corpora take the IVF route: each query scores only its ``n_probe``
    nearest cells, ~n_probe/n_cells of the corpus. The count that picks the
    strategy is a metadata-cheap action (parquet row-count), mirroring how
    AQE swaps join strategies on observed sizes.
    """
    from biodata_pipeline_spark.operators.similarity import ivf_ann

    if corpus.count() <= exact_limit:
        return cosine_top_k(queries, corpus, k, **cols)
    return ivf_ann(queries, corpus, k, n_cells=n_cells, n_probe=n_probe, **cols)
