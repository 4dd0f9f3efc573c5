"""Deletion-path overhead probe (r11 feature evidence).

Measures what a tombstone costs at the 200k-vector rung:

- remove() wall for a 1% deletion batch (bounded parquet append);
- query latency WITH pending tombstones (the extra anti-join before
  the rank window) vs the pre-delete baseline;
- compact() wall with the deletion fold, then query latency after
  (tombstones cleared — the anti-join disappears from the plan);
- correctness spot: deleted ids absent at every stage, ranks dense.

Usage: python tools/probe_vector_delete.py [n_vecs] [pct]
       (default 200000 1; artifacts under .probe_vector_delete/)
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
K_CELLS = 64
N_PROBE = 8
N_QUERIES = 20
WORK_DIR = ".probe_vector_delete"


def synth_vecs(spark, n: int, id_base: int = 0):
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


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    pct = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    shutil.rmtree(WORK_DIR, ignore_errors=True)
    spark = get_spark("probe-vector-delete")
    store = VectorIndexStore(os.path.join(WORK_DIR, "index"))
    base = synth_vecs(spark, n).localCheckpoint()
    t0 = time.time()
    store.build(base, k=K_CELLS, iters=2, train_sample=25_000)
    build_secs = round(time.time() - t0, 1)

    q = synth_vecs(spark, N_QUERIES, id_base=50_000_000).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_emb"),
    ).localCheckpoint()

    def timed_query():
        walls, got = [], None
        for _ in range(2):
            t0 = time.time()
            got = {
                (r.query_id, r.vec_id)
                for r in store.query(q, k=10, n_probe=N_PROBE).collect()
            }
            walls.append(time.time() - t0)
        return round(min(walls), 2), got

    # untimed warm-up: the FIRST query on a fresh store pays Arrow
    # spin-up + the interpreted/JIT warm-up (r12: at 1M the cold first
    # pass read 57.9 s vs 5.3 s warm — attributing that to "baseline"
    # made the pending-tombstone query look FASTER than no-tombstones)
    timed_query()
    q_before, hits_before = timed_query()

    # delete pct% of the corpus, including some vectors that were hits
    n_del = int(n * pct / 100)
    hit_ids = sorted({v for _, v in hits_before})[:5]
    del_ids = spark.range(n_del).select(
        (F.col("id") * int(n / n_del)).alias("vec_id")
    )
    del_ids = del_ids.unionByName(
        spark.createDataFrame([(i,) for i in hit_ids], "vec_id long")
    ).distinct()
    t0 = time.time()
    n_removed = store.remove(spark, del_ids)
    remove_secs = round(time.time() - t0, 2)

    q_pending, hits_pending = timed_query()
    dead = {r.vec_id for r in del_ids.collect()}
    assert not ({v for _, v in hits_pending} & dead), "tombstoned id in results"

    t0 = time.time()
    stats = store.compact(spark, n_buckets=16)
    compact_secs = round(time.time() - t0, 2)
    q_after, hits_after = timed_query()
    assert hits_after == hits_pending, "results changed across the fold"
    enrolled = store.vectors(spark).count()

    print(
        json.dumps(
            {
                "probe": "vector_delete",
                "n_vecs": n,
                "n_removed": n_removed,
                "build_secs": build_secs,
                "remove_secs": remove_secs,
                "query_secs_baseline": q_before,
                "query_secs_pending_tombstones": q_pending,
                "compact_secs_with_fold": compact_secs,
                "query_secs_post_compact": q_after,
                "tombstones_folded": stats.get("tombstones_folded"),
                "enrolled_after": enrolled,
                "results_stable_across_fold": True,
            }
        )
    )
    shutil.rmtree(WORK_DIR, ignore_errors=True)


if __name__ == "__main__":
    main()
