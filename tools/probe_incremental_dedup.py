"""Scale probe for the incremental near-dup gate: batch admission cost
as the accepted-set index grows.

The operator's scale claim is that admitting a batch costs batch-sized
signature work plus one equi-join against the STORED band rows — history
is joined, never re-shingled. The duplicate-heavy test replicas all
collapse to the same ~5k distinct contents, so this probe builds
DISTINCT synthetic corpora (md5-token docs, ~24 tokens each) at three
sizes, enrolls each (timed), then admits the SAME 1k-doc batch against
each index: 40% byte-identical to enrolled docs (exact index drops),
30% near (one token appended), 30% unique. Expected shape: admit cost
grows with the stored band-table SCAN (narrow longs — cheap, and
bucketable away at warehouse scale), nowhere near the cost of
re-banding the history.

Usage: python tools/probe_incremental_dedup.py [sizes ...]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from biodata_pipeline_spark import get_spark  # noqa: E402
from biodata_pipeline_spark.operators.caching import cache_scope  # noqa: E402
from biodata_pipeline_spark.operators.dedup import (  # noqa: E402
    compact_dedup_index,
    incremental_near_dup_filter,
)

THRESHOLD = 0.5
BATCH = 1000


def synth_docs(spark, n: int, id_base: int = 0):
    """n distinct ~24-token docs; token j of doc i = md5(i||j)[:6]."""
    did = (F.col("id") + id_base).alias("doc_id")
    key = (F.col("id") + id_base).cast("string")
    return (
        spark.range(n)
        .select(
            did,
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(0), F.lit(23)),
                    lambda j: F.substring(
                        F.md5(F.concat(key, F.lit("-"), j.cast("string"))),
                        1,
                        6,
                    ),
                ),
            ).alias("text"),
        )
        .repartition(32)
    )


def probe_batch(spark, corpus_n: int):
    """1k docs re-keyed out of the way: 40% exact copies of enrolled
    docs, 30% near (token appended), 30% unique."""
    src = synth_docs(spark, BATCH).withColumn(
        "__slot", F.col("doc_id") % 10
    )
    exact = src.filter(F.col("__slot") < 4)  # ids 0.. -> enrolled content
    near = src.filter((F.col("__slot") >= 4) & (F.col("__slot") < 7)).withColumn(
        "text", F.concat(F.col("text"), F.lit(" zzyzx"))
    )
    uniq = synth_docs(spark, BATCH, id_base=10_000_000_000).filter(
        F.col("doc_id") % 10 >= 7
    )
    out = exact.unionByName(near).drop("__slot").unionByName(uniq)
    return out.select((F.col("doc_id") + 50_000_000).alias("doc_id"), "text")


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [5_000, 50_000, 500_000]
    spark = get_spark("probe-incr-dedup")
    results = {}
    for n in sizes:
        idx = tempfile.mkdtemp(prefix="ndprobe_")
        try:
            docs = synth_docs(spark, n).localCheckpoint()
            t0 = time.time()
            with cache_scope():
                kept, _ = incremental_near_dup_filter(docs, idx, THRESHOLD)
                n_enrolled = kept.count()
            enroll_secs = round(time.time() - t0, 2)
            idx_rows = spark.read.parquet(f"{idx}/bands").count()
            batch = probe_batch(spark, n).localCheckpoint()
            best, admitted = None, None
            for _ in range(2):
                probe_idx = tempfile.mkdtemp(prefix="ndprobe_run_")
                shutil.rmtree(probe_idx)
                shutil.copytree(idx, probe_idx)
                t0 = time.time()
                with cache_scope():
                    k, r = incremental_near_dup_filter(
                        batch, probe_idx, THRESHOLD
                    )
                    admitted = (k.count(), r.count())
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
                shutil.rmtree(probe_idx, ignore_errors=True)
            # same admit against the COMPACTED layout (r8): fold the
            # copy into bucketed tables first, then time the admit —
            # decisions must match the parquet-layout run
            best_c, admitted_c, compact_secs = None, None, None
            for _ in range(2):
                probe_idx = tempfile.mkdtemp(prefix="ndprobe_runc_")
                shutil.rmtree(probe_idx)
                shutil.copytree(idx, probe_idx)
                t0 = time.time()
                compact_dedup_index(spark, probe_idx, n_buckets=16)
                compact_secs = round(time.time() - t0, 2)
                t0 = time.time()
                with cache_scope():
                    k, r = incremental_near_dup_filter(
                        batch, probe_idx, THRESHOLD
                    )
                    admitted_c = (k.count(), r.count())
                dt = time.time() - t0
                best_c = dt if best_c is None else min(best_c, dt)
                shutil.rmtree(probe_idx, ignore_errors=True)
            assert admitted_c == admitted, "compacted decisions diverged"
            results[n] = {
                "enroll_secs": enroll_secs,
                "n_enrolled": n_enrolled,
                "index_band_rows": idx_rows,
                "admit_secs": round(best, 2),
                "admit_secs_compacted": round(best_c, 2),
                "compact_secs": compact_secs,
                "batch_kept": admitted[0],
                "batch_dropped": admitted[1],
            }
        finally:
            shutil.rmtree(idx, ignore_errors=True)
    print(json.dumps({"probe": "incremental_dedup", "results": results}))


if __name__ == "__main__":
    main()
