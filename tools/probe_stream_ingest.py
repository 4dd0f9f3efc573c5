"""Streaming dedup-ingest throughput probe (VERDICT r7 #7, feeding #2).

Drives N micro-batches of documents through the REAL Structured
Streaming path (file source, maxFilesPerTrigger=1, availableNow,
``foreachBatch`` → ``process_dedup_ingest_batch``) with the near-dup
gate enrolling every survivor, and ``compact_dedup_index`` folding the
index every COMPACT_EVERY batches. Reports:

- docs/s end-to-end and per-batch admit latency over the run
  (decile means — the flatness claim is that late deciles do not grow
  over early ones once compaction bounds the stored side);
- index file counts at each compaction (before → after), showing the
  small-file accumulation is bounded;
- the accepted/dropped census (every doc accounted for).

Batches are ~5% near-dup against earlier batches + ~5% exact dups, so
the gate does real candidate work every batch.

Usage: python tools/probe_stream_ingest.py [n_batches] [docs_per_batch]
       (default: 100 x 500; artifacts under .probe_stream_ingest/)
"""

from __future__ import annotations

import hashlib
import json
import os
import random
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from biodata_pipeline_spark import get_spark  # noqa: E402
from biodata_pipeline_spark.operators.dedup import (  # noqa: E402
    compact_dedup_index,
    incremental_near_dup_filter,
)
from biodata_pipeline_spark.streaming.dedup_ingest import (  # noqa: E402
    process_dedup_ingest_batch,
)

COMPACT_EVERY = 25
WORK_DIR = ".probe_stream_ingest"


def _text(rng: random.Random, salt: str) -> str:
    return " ".join(
        hashlib.md5(f"{salt}:{i}:{rng.random()}".encode()).hexdigest()[:8]
        for i in range(20)
    )


def gen_batches(input_dir: str, n_batches: int, docs_per_batch: int) -> None:
    rng = random.Random(8)
    history: list[str] = []
    doc_id = 0
    for b in range(n_batches):
        ids, texts = [], []
        for _ in range(docs_per_batch):
            r = rng.random()
            if history and r < 0.05:  # exact dup of an earlier doc
                t = rng.choice(history)
            elif history and r < 0.10:  # near dup: mutate one word
                words = rng.choice(history).split()
                words[rng.randrange(len(words))] = "mutated"
                t = " ".join(words)
            else:
                t = _text(rng, f"{b}:{doc_id}")
                history.append(t)
            ids.append(doc_id)
            texts.append(t)
            doc_id += 1
        history = history[-2000:]
        pq.write_table(
            pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "text": pa.array(texts)}),
            f"{input_dir}/batch_{b:04d}.parquet",
        )


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    docs_per_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    shutil.rmtree(WORK_DIR, ignore_errors=True)
    dirs = {
        k: os.path.join(WORK_DIR, k)
        for k in ("input", "index", "accepted", "report", "ckpt")
    }
    os.makedirs(dirs["input"])
    gen_batches(dirs["input"], n_batches, docs_per_batch)

    spark = get_spark("probe-stream-ingest")
    latencies: list[float] = []
    compactions: list[dict] = []

    def _batch(batch_df, batch_id: int) -> None:
        t0 = time.time()
        process_dedup_ingest_batch(
            batch_df,
            batch_id,
            dirs["index"],
            dirs["accepted"],
            dirs["report"],
            threshold=0.5,
        )
        latencies.append(time.time() - t0)
        if (len(latencies)) % COMPACT_EVERY == 0:
            t0 = time.time()
            stats = compact_dedup_index(spark, dirs["index"], n_buckets=8)
            stats["compact_secs"] = round(time.time() - t0, 2)
            stats["at_batch"] = len(latencies)
            compactions.append(stats)
            print(json.dumps({"compaction": stats}), flush=True)

    t_start = time.time()
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(dirs["input"])
    )
    q = (
        stream.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", dirs["ckpt"])
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.time() - t_start

    accepted = spark.read.parquet(dirs["accepted"]).count()
    dropped = spark.read.parquet(dirs["report"]).count()
    deciles = [
        round(sum(chunk) / len(chunk), 2)
        for chunk in (
            latencies[i : i + max(1, len(latencies) // 10)]
            for i in range(0, len(latencies), max(1, len(latencies) // 10))
        )
    ]
    print(
        json.dumps(
            {
                "probe": "stream_dedup_ingest",
                "n_batches": len(latencies),
                "docs_per_batch": docs_per_batch,
                "total_docs": n_batches * docs_per_batch,
                "accepted": accepted,
                "dropped": dropped,
                "census_ok": accepted + dropped == n_batches * docs_per_batch,
                "wall_secs": round(wall, 1),
                "docs_per_sec": round(n_batches * docs_per_batch / wall, 1),
                "batch_latency_decile_means": deciles,
                "compactions": compactions,
            }
        )
    )


if __name__ == "__main__":
    main()
