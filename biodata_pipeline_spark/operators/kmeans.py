"""Distributed Lloyd's k-means over embedding columns + SemDeDup-style
semantic dedup built on the fitted clusters.

The reference ranks chunks by embedding cosine (rag_evaluation/
RAG-eval-test_model.py:83,130,247-248) but has no clustering pass; a
training-data pipeline at 100 TB needs one — SemDeDup (Abbas et al. 2023,
arXiv:2303.09540) partitions the corpus with k-means so near-duplicate
search is within-cluster pairwise instead of all-pairs O(n²).

Spark shape (the 100 TB plan):
 - **fit** is the classic iterate-collect loop: assignment is a pure map
   stage against a broadcast centroid literal (no join, no shuffle), and
   the centroid update is ONE hash aggregate producing k×(dim+1) cells —
   map-side combined, so each iteration shuffles k rows of partials, not
   data. Centroids (k×dim floats) live driver-side between iterations,
   exactly like MLlib's KMeans driver loop.
 - **assignment/dedup** stay lazy: the returned frames are declarative
   plans; only the fit's per-iteration centroid aggregates execute
   eagerly (documented: constructing a query that embeds a fit runs
   2+iters small jobs).

Determinism / oracle parity (every step is unrolled ANSI SQL):
 - seeds = the k rows with the smallest ``(md5(cast(id as string)), id)``
   — same bytes in Spark and DuckDB;
 - squared L2 distance is the same in-order float64 fold as
   functions.vector.dot (zip_with + aggregate ≡ DuckDB
   list_sum(list_transform(...))), so distances are bit-identical and
   argmin ties break identically (lowest cluster index);
 - centroid update uses the repo determinism rule round(sum(x), 6)/count
   — never round(avg(x)) — so both engines divide identical rounded sums
   by identical integer counts and the next iteration's distances stay
   bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from biodata_pipeline_spark.functions.vector import cosine
from biodata_pipeline_spark.operators.similarity import matrix_literal

KMEANS_K = 8
KMEANS_ITERS = 2
SUM_GRAIN = 6  # centroid sums rounded before the count division


def _sqdist(emb, cent) -> F.Column:
    """||emb - cent||² as the in-order float64 left fold (bit-identical to
    DuckDB's list_sum(list_transform(range(...), i -> (a[i]-c[i])²)))."""
    diffs = F.zip_with(
        emb,
        cent,
        lambda x, c: (x.cast("double") - c) * (x.cast("double") - c),
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, v: acc + v)


def seed_centroids(
    df: DataFrame, k: int, id_col: str, emb_col: str
) -> list[list[float]]:
    """The k rows with the smallest (md5(id), id) — order-stable in any
    engine, no RNG, no wall clock. Cluster j is the j-th seed."""
    rows = (
        df.select(id_col, emb_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(k)
        .collect()
    )
    if len(rows) < k:
        raise ValueError(f"kmeans: need >= {k} rows, got {len(rows)}")
    return [[float(v) for v in r[emb_col]] for r in rows]


def assign_clusters(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Adds ``cluster`` (int, argmin of squared L2; ties → lowest index)
    and ``dist2`` (min squared distance, 6 dp). Pure map stage: the k×dim
    centroid matrix is one parsed literal (similarity.matrix_literal —
    element-wise F.lit costs ~1s driver time), distances are let-bound
    via the 1-element-transform pattern so the k folds run once."""
    cmat = matrix_literal(centroids)
    dists = F.array(
        *[_sqdist(F.col(emb_col), F.get(cmat, j)) for j in range(len(centroids))]
    )
    picked = F.get(
        F.transform(
            F.array(dists),
            lambda d: F.struct(
                (F.array_position(d, F.array_min(d)) - 1).cast("int").alias("cluster"),
                F.round(F.array_min(d), SUM_GRAIN).alias("dist2"),
            ),
        ),
        0,
    )
    return df.select(
        "*", picked["cluster"].alias("cluster"), picked["dist2"].alias("dist2")
    )


def _update_centroids(
    assigned: DataFrame,
    prev: list[list[float]],
    emb_col: str,
    grain: int = SUM_GRAIN,
) -> list[list[float]]:
    """One Lloyd update: per-cluster, per-dimension round(sum, grain)/count.
    A single hash aggregate — k×(dim+1) output cells, map-side combined —
    then a driver-side k×dim collect. Clusters that lost every point keep
    their previous centroid (carry-forward), same as the oracle's
    LEFT JOIN + COALESCE."""
    dim = len(prev[0])
    sums = [
        F.round(F.sum(F.get(F.col(emb_col), i).cast("double")), grain).alias(f"s{i}")
        for i in range(dim)
    ]
    rows = assigned.groupBy("cluster").agg(F.count("*").alias("n"), *sums).collect()
    nxt = [list(c) for c in prev]
    for r in rows:
        nxt[r["cluster"]] = [r[f"s{i}"] / r["n"] for i in range(dim)]
    return nxt


def kmeans_fit(
    df: DataFrame,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> list[list[float]]:
    """Fit centroids with ``iters`` Lloyd updates from the deterministic
    seeds. Eager: runs 1 seed job + ``iters`` aggregate jobs (each a
    k-row shuffle of partials)."""
    cents = seed_centroids(df, k, id_col, emb_col)
    for _ in range(iters):
        assigned = assign_clusters(df, cents, id_col, emb_col)
        cents = _update_centroids(assigned, cents, emb_col)
    return cents


def semantic_dedup_survivors(
    df: DataFrame,
    threshold: float,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """SemDeDup: cluster the corpus, then drop every vector whose cosine
    to a smaller-id member of the SAME cluster rounds to >= threshold.

    The cluster equi-join replaces dedup.embedding_dup_pairs' all-pairs
    comparison: candidate volume drops from n²/2 to ~n²/(2k) and the join
    shuffles on ``cluster``, so scaling k with n (k ≈ n/target_cluster)
    keeps per-task pair counts bounded — the 100 TB shape. Exact
    duplicates share bit-identical distances, hence a cluster, so planted
    copies are always caught. Returns (survivor id, cluster)."""
    cents = kmeans_fit(df, k, iters, id_col, emb_col)
    a = assign_clusters(df, cents, id_col, emb_col)
    left = a.select(
        F.col(id_col).alias("id_a"), F.col(emb_col).alias("emb_a"), "cluster"
    )
    right = a.select(
        F.col(id_col).alias("id_b"), F.col(emb_col).alias("emb_b"), "cluster"
    )
    dup_ids = (
        left.join(right, "cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.round(cosine("emb_a", "emb_b"), 9) >= F.lit(threshold))
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return a.join(dup_ids, id_col, "left_anti").select(id_col, "cluster")
