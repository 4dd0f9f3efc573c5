"""Ingest-gate admission-floor decomposition at the 1M rung (VERDICT
r12 #5).

Post-XXH64-kernel, a fixed-shape 10k-doc admit against a 1M-doc index
costs ~11-14 s end-to-end (SCALING r12). This probe decomposes that
floor into the operator's own stages, each timed the way the operator
runs it (persist + materialize), two passes per stage so a JIT one-off
can't masquerade as structure:

  1. signature  — collapse_exact + shingle_hash_table (batch-sized)
  2. banding    — minhash_band_rows (batch below the kernel gate: the
                  interpreted fold over 10k rows, by design)
  3. cand_join  — the batch bands vs EVERY stored band part, the only
                  stage that touches the 1M index
  4. verify     — exact-jaccard verification of the index candidates
                  (joins the stored hash sets on candidate ids only)
  5. batch_self — the in-batch pair stage (self-join + verify + closure)

plus the untouched end-to-end admit for reference; the residual vs the
stage sum is report/closure/localCheckpoint/enroll-write overhead. The
verdict this probe exists to issue: if one stage dominates
disproportionately it is the next kernel/plan candidate; if the spread
is flat, the floor is structural (index-scan latency) and gets
recorded as closed.

Usage: python tools/probe_admit_floor.py [n_docs] [--batch B]
       (default index 1000000 docs, batch 10000)
       artifacts under .probe_admit_floor/

``--batch B`` is the round-14 amortization arm (VERDICT r13 #6): the
r13 close argued the ~58% job-barrier residue amortizes with batch
size; running the SAME decomposition at B=50000 against the 1M index
converts that argument into a measurement (barrier count flat ⇒
per-doc cost falls ~5×, or a surprise worth knowing).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

_TOOLS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_TOOLS))
sys.path.insert(0, _TOOLS)

from pyspark.sql import functions as F  # noqa: E402

from biodata_pipeline_spark import get_spark  # noqa: E402
from biodata_pipeline_spark.operators.dedup import (  # noqa: E402
    _index_component_frames,
    _read_index_delta,
    collapse_exact,
    incremental_near_dup_filter,
    minhash_band_rows,
    shingle_hash_table,
)
from probe_dedup_delete import probe_batch, synth_docs  # noqa: E402

WORK_DIR = ".probe_admit_floor"
THRESHOLD = 0.5


def staged_admit(spark, batch, index_dir: str) -> dict[str, float]:
    """The operator's read path, stage by stage, each persisted and
    materialized before the next starts (mirrors
    incremental_near_dup_filter's own persist points)."""
    walls: dict[str, float] = {}

    t0 = time.time()
    distinct, _ = collapse_exact(batch, "doc_id", "text")
    n_docs = batch.count()
    base = shingle_hash_table(distinct, "doc_id", "text", 3).persist()
    base.count()
    walls["signature"] = round(time.time() - t0, 2)

    t0 = time.time()
    bands = minhash_band_rows(base, 32, 8, n_rows=n_docs).persist()
    bands.count()
    walls["banding"] = round(time.time() - t0, 2)

    t0 = time.time()
    band_parts = _index_component_frames(spark, index_dir, "bands", None)
    cand_idx = None
    for bp in band_parts:
        c = (
            bands.join(bp.withColumnRenamed("id", "other_id"),
                       ["band", "bucket"])
            .filter(F.col("id") != F.col("other_id"))
            .select("id", "other_id")
        )
        cand_idx = c if cand_idx is None else cand_idx.unionByName(c)
    cand_idx = cand_idx.dropDuplicates(["id", "other_id"])
    tomb = _read_index_delta(spark, index_dir, "tombstones")
    if tomb is not None:
        cand_idx = cand_idx.join(
            tomb.select(F.col("id").alias("other_id")).distinct(),
            "other_id", "left_anti",
        )
    cand_idx = cand_idx.persist()
    n_cand = cand_idx.count()
    walls["cand_join"] = round(time.time() - t0, 2)
    walls["n_index_candidates"] = n_cand

    t0 = time.time()
    hash_parts = _index_component_frames(spark, index_dir, "hashes", None)
    idx_hashes = hash_parts[0]
    for hp in hash_parts[1:]:
        idx_hashes = idx_hashes.unionByName(hp)
    v = cand_idx.join(
        base.select(F.col("id"), F.col("hs").alias("__sa")), "id"
    ).join(
        idx_hashes.select(
            F.col("id").alias("other_id"), F.col("hs").alias("__sb")
        ),
        "other_id",
    )
    inter = F.size(F.array_intersect(F.col("__sa"), F.col("__sb")))
    union = F.size(F.array_union(F.col("__sa"), F.col("__sb")))
    vs_index = (
        v.withColumn(
            "jaccard",
            F.round(inter / F.greatest(union, F.lit(1)).cast("double"), 9),
        )
        .filter(F.col("jaccard") >= THRESHOLD)
        .select("id", "other_id", "jaccard")
        .persist()
    )
    n_hits = vs_index.count()
    walls["verify"] = round(time.time() - t0, 2)
    walls["n_index_hits"] = n_hits

    t0 = time.time()
    alive = bands.join(
        vs_index.select("id").distinct(), "id", "left_anti"
    )
    cand_batch = (
        alive.alias("a")
        .join(alive.alias("b"), ["band", "bucket"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("b.id").alias("id"), F.col("a.id").alias("other_id"))
        .dropDuplicates(["id", "other_id"])
    )
    vb = cand_batch.join(
        base.select(F.col("id"), F.col("hs").alias("__sa")), "id"
    ).join(
        base.select(F.col("id").alias("other_id"), F.col("hs").alias("__sb")),
        "other_id",
    )
    nb = (
        vb.withColumn(
            "jaccard",
            F.round(inter / F.greatest(union, F.lit(1)).cast("double"), 9),
        )
        .filter(F.col("jaccard") >= THRESHOLD)
        .count()
    )
    walls["batch_self"] = round(time.time() - t0, 2)
    walls["n_batch_hits"] = nb

    for df in (base, bands, cand_idx, vs_index):
        df.unpersist()
    return walls


def main() -> None:
    args = sys.argv[1:]
    batch_n = 10_000
    if "--batch" in args:
        i = args.index("--batch")
        batch_n = int(args[i + 1])
        del args[i:i + 2]
    n = int(args[0]) if args else 1_000_000
    half = batch_n // 2
    shutil.rmtree(WORK_DIR, ignore_errors=True)
    spark = get_spark("probe-admit-floor")
    idx = os.path.join(WORK_DIR, "index")

    t0 = time.time()
    per = n // 4
    for b in range(4):
        incremental_near_dup_filter(
            synth_docs(spark, per, doc_base=b * per), idx, THRESHOLD,
            batch_id=f"enroll{b}",
        )
    enroll_secs = round(time.time() - t0, 1)

    # untimed warm-up (r12 discipline: the first touch of a fresh 1M
    # store pays Arrow spin-up + JIT warm-up that is not the floor)
    incremental_near_dup_filter(
        probe_batch(spark, 9, n_twins=half, n_novel=half),
        idx, THRESHOLD, batch_id="warmup"
    )

    full_walls = []
    for tag in (1, 2):
        t0 = time.time()
        kept, rep = incremental_near_dup_filter(
            probe_batch(spark, tag, n_twins=half, n_novel=half),
            idx, THRESHOLD, batch_id=f"full{tag}"
        )
        kept.count(), rep.count()
        full_walls.append(round(time.time() - t0, 2))

    staged = [
        staged_admit(spark, probe_batch(spark, 4 + i, n_twins=half,
                                        n_novel=half), idx)
        for i in range(2)
    ]

    stage_keys = ("signature", "banding", "cand_join", "verify", "batch_self")
    sums = [round(sum(s[k] for k in stage_keys), 2) for s in staged]
    print(
        json.dumps(
            {
                "probe": "admit_floor",
                "n_docs_index": n,
                "batch_docs": batch_n,
                "enroll_secs": enroll_secs,
                "full_admit_walls": full_walls,
                "staged_runs": staged,
                "staged_sums": sums,
                "residual_vs_full": [
                    round(full_walls[i] - sums[i], 2)
                    for i in range(len(full_walls))
                ],
            }
        )
    )
    shutil.rmtree(WORK_DIR, ignore_errors=True)


if __name__ == "__main__":
    main()
