"""Streamed-IVF end-to-end latency probe (VERDICT r9 #6).

The similarity-side twin of probe_stream_ingest.py: 100 micro-batches
of embeddings (with a defect sprinkle, so the census gate does real
work) drain through the REAL Structured Streaming path (file source,
maxFilesPerTrigger=1, availableNow, foreachBatch →
process_vector_ingest_batch) into a live sample-trained
VectorIndexStore. Reports:

- per-batch add latency deciles (flat-in-index-size is the claim:
  ``add`` assigns against frozen centroids and appends one partition);
- a fixed 20-query top-10 search timed at batch 1 / 50 / 100 — the
  latency a reader pays as per-batch appends accumulate;
- the same search after ``compact`` — latency back at/below the
  batch-1 level, and the result set asserted BIT-IDENTICAL across the
  fold (the store ladder's contract, now end-to-end after streaming).

Usage: python tools/probe_vector_stream_ingest.py [n_batches] [vecs_per_batch] [k_cells]
       (default: 100 x 500 at k=16; artifacts under .probe_vector_ingest/.
       k_cells=64 is the production-shaped arm — r12 recorded that 16
       cells can never fill a core-count bucket layout, so the
       post-compact-search claim is only meaningful at k >= cores.)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from biodata_pipeline_spark import get_spark  # noqa: E402
from biodata_pipeline_spark.operators.ann_store import (  # noqa: E402
    VectorIndexStore,
)

DIM = 64
K_CELLS = 16
N_PROBE = 4
BASE_N = 20_000
N_QUERIES = 20
WORK_DIR = ".probe_vector_ingest"


def synth_vecs(spark, n: int, id_base: int = 0):
    """Deterministic synthetic embeddings (probe_ann_store's family)."""
    vid = (F.col("id") + id_base).alias("vec_id")
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda j: (
            F.pmod(F.xxhash64(F.col("id"), j), F.lit(1000)).cast("double")
            / 500.0
            - 1.0
        ).cast("float"),
    ).alias("embedding")
    return spark.range(n).select(vid, emb)


def gen_batches(spark, input_dir: str, n_batches: int, per_batch: int) -> None:
    """One FLAT parquet file per micro-batch (maxFilesPerTrigger=1 maps
    files to batches); every 10th batch carries two defective rows (a
    NULL vector and a wrong-dim vector) so the census gate exercises
    its drop path mid-stream."""
    import glob

    tmp = input_dir + "_tmp"
    for b in range(n_batches):
        batch = synth_vecs(
            spark, per_batch, id_base=1_000_000 + b * per_batch
        )
        if b % 10 == 0:
            bad = spark.createDataFrame(
                [
                    (9_000_000 + b, None),
                    (9_100_000 + b, [1.0, 2.0]),
                ],
                "vec_id long, embedding array<float>",
            )
            batch = batch.unionByName(bad)
        shutil.rmtree(tmp, ignore_errors=True)
        batch.coalesce(1).write.parquet(tmp)
        (part,) = glob.glob(f"{tmp}/part-*.parquet")
        shutil.move(part, f"{input_dir}/batch_{b:04d}.parquet")
    shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    per_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    k_cells = int(sys.argv[3]) if len(sys.argv) > 3 else K_CELLS
    # probe a constant 1/4 of the cells so the search reads the same
    # corpus fraction at every k arm (r12 rungs: n_probe=4 at k=16)
    n_probe = max(N_PROBE, k_cells // 4)
    # search-latency checkpoints scale with the run length (the r12
    # 5k/50k-batch throughput runs use 10-20 batches, not 100)
    checkpoint_batches = tuple(
        sorted({1, max(1, n_batches // 2), n_batches})
    )
    shutil.rmtree(WORK_DIR, ignore_errors=True)
    dirs = {
        k: os.path.join(WORK_DIR, k)
        for k in ("input", "index", "report", "ckpt")
    }
    os.makedirs(dirs["input"])

    spark = get_spark("probe-vector-stream")
    base = synth_vecs(spark, BASE_N).localCheckpoint()
    store = VectorIndexStore(dirs["index"])
    t0 = time.time()
    store.build(base, k=k_cells, iters=2, train_sample=25_000)
    build_secs = round(time.time() - t0, 2)
    gen_batches(spark, dirs["input"], n_batches, per_batch)

    q = synth_vecs(spark, N_QUERIES, id_base=20_000_000).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_emb"),
    ).localCheckpoint()

    def timed_query():
        walls, got = [], None
        for _ in range(2):
            t0 = time.time()
            got = sorted(
                (r.query_id, r.vec_id, r.rank, r.sim)
                for r in store.query(q, k=10, n_probe=n_probe).collect()
            )
            walls.append(time.time() - t0)
        return round(min(walls), 2), got

    from biodata_pipeline_spark.streaming.vector_ingest import (
        process_vector_ingest_batch,
    )

    latencies: list[float] = []
    query_points: dict[int, float] = {}

    def _batch(batch_df, batch_id: int) -> None:
        t0 = time.time()
        process_vector_ingest_batch(
            batch_df, batch_id, dirs["index"], dirs["report"], DIM
        )
        latencies.append(time.time() - t0)
        if len(latencies) in checkpoint_batches:
            secs, _ = timed_query()
            query_points[len(latencies)] = secs
            print(
                json.dumps({"at_batch": len(latencies), "query_secs": secs}),
                flush=True,
            )

    t_start = time.time()
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(dirs["input"])
    )
    sq = (
        stream.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", dirs["ckpt"])
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination()
    wall = time.time() - t_start

    _, before = timed_query()
    t0 = time.time()
    compact_stats = store.compact(spark)  # core-count-aware default (r12)
    compact_secs = round(time.time() - t0, 2)
    post_secs, after = timed_query()
    assert after == before, "query decisions diverged across the compaction fold"

    n_dec = max(1, len(latencies) // 10)
    deciles = [
        round(sum(latencies[i : i + n_dec]) / len(latencies[i : i + n_dec]), 2)
        for i in range(0, len(latencies) - n_dec + 1, n_dec)
    ]
    enrolled = store.vectors(spark).count()  # compaction moves the delta dir
    report = spark.read.parquet(dirs["report"])
    dropped = report.filter(F.col("defect") != "ok").agg(
        F.sum("n_vecs")
    ).collect()[0][0]
    print(
        json.dumps(
            {
                "probe": "vector_stream_ingest",
                "k_cells": k_cells,
                "n_probe": n_probe,
                "n_batches": len(latencies),
                "vecs_per_batch": per_batch,
                "build_secs": build_secs,
                "wall_secs": round(wall, 1),
                "vecs_per_sec": round(len(latencies) * per_batch / wall, 1),
                "add_latency_deciles": deciles,
                "query_secs_at_batch": query_points,
                "query_secs_post_compact": post_secs,
                "compact_secs": compact_secs,
                "compact_stats": compact_stats,
                "enrolled": enrolled,
                "defects_dropped": int(dropped or 0),
                "decisions_identical_across_fold": True,
            }
        )
    )
    shutil.rmtree(WORK_DIR, ignore_errors=True)


if __name__ == "__main__":
    main()
