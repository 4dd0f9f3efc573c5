"""Per-iteration compile cost of the Lloyd training loop (VERDICT r11
"what's wrong" #2 / r12 #3).

The r11 vector-store rewire proved the k×dim matrix-literal expression
family never hits the codegen cache (Catalyst mints fresh lambda ids
per Column construction → Janino recompiles per call, 5-25 s at
k=64×64d). The question here: does ``kmeans_fit``'s iterate loop pay
that cliff per iteration?

Reading the code says NO — since r9 the fit assigns through
``assign_clusters_kernel`` (mapInPandas: centroids ride in a Python
closure, never in JVM codegen) and ``_update_centroids``'s aggregate
expressions are centroid-free fixed strings (identical generated source
per iteration → Janino cache hit). This probe turns that reading into
numbers, plus the counterfactual: the same loop forced through
``assign_clusters_matrix`` (the k×dim literal path), where each
iteration SHOULD recompile.

Per iteration it records wall seconds and the delta of the JVM-wide
Janino compile histogram (org.apache.spark.metrics.source.CodegenMetrics
METRIC_COMPILATION_TIME — count and total ms), so compile time is
isolated from data time, the q26b-probe discipline.

Usage: python tools/probe_kmeans_iter.py [n_vectors] [k] [iters]
Defaults: 200000 (the .scale_test100 replica) 64 6.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from biodata_pipeline_spark import get_spark  # noqa: E402


def compile_metrics(spark) -> tuple[int, int]:
    """(compilations, total_compile_ms) from the driver-JVM Janino
    histogram. Scala object vals surface as static forwarders on the
    companion class, so py4j reaches them directly."""
    cm = spark._jvm.org.apache.spark.metrics.source.CodegenMetrics
    h = cm.METRIC_COMPILATION_TIME()
    return int(h.getCount()), int(h.getSnapshot().getMean() * h.getCount() / 1e6)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 6

    from biodata_pipeline_spark.operators.kmeans import (
        _update_centroids,
        assign_clusters_kernel,
        assign_clusters_matrix,
        seed_centroids,
    )

    spark = get_spark()
    src = "/root/repo/.scale_test100/embeddings.parquet"
    # the replica's vec_ids are key-shifted (sparse) — take the first n
    # in id order rather than filtering an id range; re-spread after the
    # limit (GlobalLimit collapses to ONE partition, which would
    # single-thread every downstream stage)
    df = (
        spark.read.parquet(src)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .limit(n)
        .repartition(32)
        .persist()
    )
    n_actual = df.count()

    out: dict = {"n_vectors": n_actual, "k": k, "iters": iters, "paths": {}}
    for label, assign in (
        ("kernel (kmeans_fit's path)", assign_clusters_kernel),
        ("matrix-literal counterfactual", assign_clusters_matrix),
    ):
        cents = seed_centroids(df, k, "vec_id", "embedding")
        rows = []
        for it in range(iters):
            c0, ms0 = compile_metrics(spark)
            t0 = time.time()
            if assign is assign_clusters_kernel:
                assigned = assign(df, cents, emb_col="embedding")
            else:
                assigned = assign(df, cents, emb_col="embedding")
            cents = _update_centroids(assigned, cents, "embedding")
            wall = time.time() - t0
            c1, ms1 = compile_metrics(spark)
            rows.append(
                {
                    "iter": it,
                    "wall_s": round(wall, 3),
                    "compiles": c1 - c0,
                    "compile_ms": ms1 - ms0,
                }
            )
        out["paths"][label] = rows
        print(label, json.dumps(rows), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
