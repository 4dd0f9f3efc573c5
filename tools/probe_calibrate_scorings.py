"""Measured refine-vs-recall curves for the SQ8 / BQ1 / PQ scoring
paths at scale, plus the per-scoring calibrate() walk end-to-end
(VERDICT r14 #3 done-criterion: the funnel widths ship as measured
knobs with their curves in SCALING.md, not prose defaults).

Per rung: one store (uniform-ish synthetic corpus — BQ1's measured
worst case, the honest one to publish), all three layers attached,
then for each refine scoring the FULL curve — recall@10 vs the exact
ranking at the same n_probe, refine in 1..max — followed by
``calibrate()`` itself, whose persisted doc must land each funnel at
the curve's first crossing (the monotonicity contract measured_refine
relies on).

Recall values are deterministic (same corpus, same fits), so this
probe is meaningful on a loaded host; the walls it also prints are
magnitudes only.

Usage: python tools/probe_calibrate_scorings.py [sizes ...]
       (default 200000 1000000; target 0.9, k 10, n_probe 8)
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from biodata_pipeline_spark import get_spark  # noqa: E402
from biodata_pipeline_spark.operators.ann_store import (  # noqa: E402
    REFINE_SCORINGS,
    VectorIndexStore,
)
from tools.probe_ann_store import synth_vecs  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

K_CELLS = 64
N_PROBE = 8
TOPK = 10
TARGET = 0.9
MAX_REFINE = 64
N_SAMPLE = 32  # calibrate's default measurement sample


def rung(spark, n: int) -> dict:
    base = synth_vecs(spark, n).localCheckpoint()
    q = synth_vecs(spark, N_SAMPLE, id_base=20_000_000).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_emb"),
    ).localCheckpoint()
    path = tempfile.mkdtemp(prefix=f"calscore_{n}_")
    shutil.rmtree(path)
    store = VectorIndexStore(path)
    store.build(base, k=K_CELLS, iters=2, train_sample=25_000)
    store.enable_pq(spark, train_sample=100_000)
    store.enable_sq8(spark)
    store.enable_bq(spark)

    # exact ranking at the calibration n_probe = the truth every
    # refine funnel is measured against (measured_refine's protocol)
    truth = (
        store.query(q, TOPK, n_probe=N_PROBE)
        .select("query_id", "vec_id")
        .localCheckpoint()
    )
    n_truth = truth.count()
    out = {"n": n, "n_probe": N_PROBE, "k": TOPK, "curves": {}}
    for scoring in REFINE_SCORINGS:
        curve = []
        r = 1
        while r <= MAX_REFINE:
            t0 = time.time()
            got = store.query(
                q, TOPK, n_probe=N_PROBE, scoring=scoring, refine=r
            ).select("query_id", "vec_id")
            hits = truth.join(got, ["query_id", "vec_id"]).count()
            curve.append(
                {
                    "refine": r,
                    "recall": round(hits / n_truth, 4),
                    "wall": round(time.time() - t0, 2),
                }
            )
            r *= 2
        out["curves"][scoring] = curve

    t0 = time.time()
    cal = store.calibrate(
        spark, q, target_recall=TARGET, k=TOPK, max_refine=MAX_REFINE
    )
    out["calibrate_secs"] = round(time.time() - t0, 2)
    out["calibrate_doc"] = {
        "n_probe": cal["n_probe"],
        "n_probe_recall": cal["n_probe_recall"],
        "scorings": cal["scorings"],
    }
    # the crossing check: each persisted funnel must be the first
    # refine on ITS curve at/above target — at calibrate's n_probe,
    # which may differ from this probe's fixed N_PROBE, so this is a
    # consistency read-out, not an assert
    shutil.rmtree(path, ignore_errors=True)
    return out


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [200_000, 1_000_000]
    spark = get_spark("probe-cal-scorings")
    for n in sizes:
        print(json.dumps(rung(spark, n)))


if __name__ == "__main__":
    raise SystemExit(main())
