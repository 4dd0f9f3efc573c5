"""Stage decomposition of the flagship/vector HOF tail (VERDICT r9 #4).

q26 / q24 / q25 / q_embed_cosine_dedup at sf0.1: is the interpreted
dot/l2 HOF fold the dominant stage (→ route through a parity-pinned
Arrow kernel, as r9 did for winnowing), or is the cost elsewhere (→
record the negative result so the question stays closed)?

Protocol (the r9 winnow discipline, SCALING.md "optimizer-elided
measurement" trap): every stage is HONESTLY materialized with a noop
write of the stage's actual output columns — never an F.aggregate
probe over a column the optimizer can elide. Each timing is min-of-2
in one warm JVM (the deltas here are stage ratios, not headline
numbers; fresh-JVM absolute times live in bench.py).

Usage: python tools/probe_vector_kernels.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from biodata_pipeline_spark import get_spark  # noqa: E402
from biodata_pipeline_spark.operators.caching import cache_scope  # noqa: E402
from biodata_pipeline_spark.sources.tables import load_table  # noqa: E402


def t(df) -> float:
    """Min-of-2 noop-write seconds — full production of every output row."""
    out = []
    for _ in range(2):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        out.append(time.time() - t0)
    return round(min(out), 3)


def probe_q24(spark, sf_dir) -> dict:
    """cosine_top_k stages: scan+norm → HOF-scored stream → two-phase
    rank; plus a kernel-scored stream twin for the fold comparison."""
    from biodata_pipeline_spark.functions.vector import dot, l2_norm
    from biodata_pipeline_spark.operators.retrieval import cosine_top_k

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_emb"),
    )
    corpus = emb.withColumn("__nc", l2_norm(F.col("embedding"))).repartition(
        spark.sparkContext.defaultParallelism
    )
    q = queries.withColumn("__nq", l2_norm(F.col("query_emb")))
    scored = corpus.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        F.round(
            dot(F.col("query_emb"), F.col("embedding"))
            / (F.col("__nq") * F.col("__nc")),
            9,
        ).alias("sim"),
    )

    # kernel twin of the scored stream: queries collected driver-side,
    # numpy fold per Arrow batch (the _kernel_scored shape, sims only)
    import numpy as np
    import pandas as pd

    q_rows = queries.collect()
    qmat = np.array([[float(v) for v in r.query_emb] for r in q_rows])
    qids = [r.query_id for r in q_rows]
    nqs = np.sqrt((qmat * qmat).sum(axis=1))

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            s = (m @ qmat.T) / (
                np.sqrt((m * m).sum(axis=1))[:, None] * nqs[None, :]
            )
            for j, qid in enumerate(qids):
                yield pd.DataFrame(
                    {
                        "query_id": qid,
                        "vec_id": pdf["vec_id"],
                        "sim": np.round(s[:, j], 9),
                    }
                )

    kscored = emb.select("vec_id", "embedding").mapInPandas(
        score, "query_id long, vec_id long, sim double"
    )
    return {
        "scan_norm": t(corpus.select("vec_id", "__nc")),
        "hof_scored_stream": t(scored),
        "kernel_scored_stream": t(kscored),
        "full_query": t(cosine_top_k(queries, emb, k=10, salt_buckets=8)),
        "n_pairs": emb.count() * len(q_rows),
    }


def probe_q26(spark, sf_dir) -> dict:
    """retrieval_rank_metrics: which branch the size gate picks at this
    SF, chunk-build cost, then the full query on the HOF branch vs the
    kernel branch FORCED (kernel_threshold=0)."""
    from biodata_pipeline_spark.registry.vector import _flagship_inputs
    from biodata_pipeline_spark.operators.retrieval import (
        KERNEL_CORPUS_THRESHOLD,
        retrieval_rank_metrics,
    )

    res = {}
    with cache_scope():
        queries, chunks = _flagship_inputs(spark, sf_dir)
        n_chunks = chunks.count()
        res["n_chunks"] = n_chunks
        res["gate_picks"] = (
            "kernel" if n_chunks > KERNEL_CORPUS_THRESHOLD else "hof"
        )
        res["chunk_build"] = t(chunks)
        res["full_hof_branch"] = t(
            retrieval_rank_metrics(
                queries, chunks, kernel_threshold=10**12
            )
        )
        res["full_kernel_branch"] = t(
            retrieval_rank_metrics(queries, chunks, kernel_threshold=0)
        )
    return res


def probe_q25_and_dedup(spark, sf_dir) -> dict:
    """similarity_join (HOF pair join) vs similarity_join_vectorized
    (Arrow kernel) at the declared q25 bound, plus the dedup tail."""
    from biodata_pipeline_spark.operators.dedup import (
        embedding_dedup_survivors,
    )
    from biodata_pipeline_spark.operators.similarity import (
        similarity_join,
        similarity_join_vectorized,
    )
    from biodata_pipeline_spark.registry.vector import (
        EMB_COPY_BASE,
        EMB_COPY_N,
        EMB_DEDUP_THRESHOLD,
        SIM_MAX_VEC,
        SIM_THRESHOLD,
    )

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < SIM_MAX_VEC
    )
    res = {
        "n_vectors": emb.count(),
        "q25_hof_join": t(similarity_join(emb, SIM_THRESHOLD)),
        "q25_kernel_join": t(similarity_join_vectorized(emb, SIM_THRESHOLD)),
    }
    copies = emb.filter(F.col("vec_id") < EMB_COPY_N).withColumn(
        "vec_id", F.col("vec_id") + F.lit(EMB_COPY_BASE)
    )
    corpus = emb.select("vec_id", "embedding").unionByName(
        copies.select("vec_id", "embedding")
    )
    res["dedup_full_kernel"] = t(
        embedding_dedup_survivors(corpus, EMB_DEDUP_THRESHOLD)
    )
    return res


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("probe-vector-kernels")
    out = {
        "sf_dir": sf_dir,
        "q24": probe_q24(spark, sf_dir),
        "q26": probe_q26(spark, sf_dir),
        "q25_dedup": probe_q25_and_dedup(spark, sf_dir),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
