"""Adversarial probe of the scrub_frequent_lines broadcast gate
(VERDICT r6 #2).

The 100× replica is deliberately boilerplate-heavy: every document is
replicated ~100×, so nearly EVERY distinct 8-token line window crosses
``min_count`` — the regime where an unconditional broadcast of the
frequent-line table stops being safe (at 100 TB the table is a
meaningful fraction of the distinct-line set and the driver cannot hold
it). The probe runs the scrub twice on that replica:

  broadcast  — default gate (the frequent count here still fits, so the
               gate KEEPS broadcast: the tiny-table fast path)
  hash       — gate forced over (broadcast_max_lines=0), simulating the
               100 TB regime: xxhash64 keys, no broadcast hint

and reports, per branch: wall time (min of 2), the frequent-line count
the gate saw, whether the EXECUTED flag join used a BroadcastHashJoin
(read from the materialized plan), and an order-insensitive content
hash of the output — asserted identical across branches (the gate is a
physical-plan decision, never a semantics change).

Usage: python tools/probe_scrub_gate.py [scale_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from biodata_pipeline_spark import get_spark  # noqa: E402
from biodata_pipeline_spark.operators.caching import cache_scope  # noqa: E402
from biodata_pipeline_spark.operators.dedup import (  # noqa: E402
    scrub_frequent_lines,
)

MIN_COUNT = 3


def content_hash(df) -> tuple[int, int]:
    """(row count, order-insensitive xor-style hash) of the scrub output."""
    row = df.agg(
        F.count("*").alias("n"),
        F.bit_xor(
            F.xxhash64("doc_id", "n_lines", "n_removed", "clean_text")
        ).alias("h"),
    ).collect()[0]
    return row["n"], row["h"]


def run_branch(spark, docs, max_lines: int) -> dict:
    best = None
    executed = None
    for _ in range(2):
        with cache_scope():
            t0 = time.time()
            out = scrub_frequent_lines(
                docs, min_count=MIN_COUNT, broadcast_max_lines=max_lines
            )
            n, h = content_hash(out)
            dt = time.time() - t0
            executed = out._jdf.queryExecution().executedPlan().toString()
        best = dt if best is None else min(best, dt)
    return {
        "secs": round(best, 2),
        "rows": n,
        "hash": h,
        "bhj_in_executed_plan": "BroadcastHashJoin" in executed,
    }


def main() -> None:
    scale_dir = sys.argv[1] if len(sys.argv) > 1 else ".scale_test100"
    spark = get_spark("probe-scrub-gate")
    # Simulate the 100 TB regime where the frequent table exceeds every
    # auto-broadcast threshold: the replica's ~10 MB table would
    # otherwise be AQE-converted to a broadcast (engine-chosen — fine in
    # production, but it would mask whether the HINT is gone, which is
    # what this probe exists to prove). The broadcast branch's explicit
    # hint is unaffected by the thresholds.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    docs = spark.read.parquet(os.path.join(scale_dir, "documents.parquet"))

    broad = run_branch(spark, docs, max_lines=1_000_000)
    hashed = run_branch(spark, docs, max_lines=0)

    assert (broad["rows"], broad["hash"]) == (hashed["rows"], hashed["hash"]), (
        "gate changed the scrub output"
    )
    # The hard assertion: with the gate forced over, the flag join must
    # not broadcast the frequent-line table. (The operator has no other
    # join, so any BroadcastHashJoin in the executed plan is the hint.)
    assert not hashed["bhj_in_executed_plan"], (
        "forced-over gate still broadcast the frequent-line table"
    )

    print(
        json.dumps(
            {
                "probe": "scrub_gate",
                "scale_dir": scale_dir,
                "min_count": MIN_COUNT,
                "broadcast_branch": broad,
                "hash_branch": hashed,
                "hash_over_broadcast_ratio": round(
                    hashed["secs"] / max(broad["secs"], 1e-9), 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
