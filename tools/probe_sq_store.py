"""Scale probe for the SQ8 + BQ1 store layers (VectorIndexStore
enable_sq8 / enable_bq + query(scoring=...)): representation cost and
win at the ladder rungs, side-by-side with IVF-PQ on the SAME store —
the full compression ladder (float64 / SQ8 / PQ / BQ1) in one table.

The claims under test:
 - ``enable_sq8`` is one min/max scan + one encode pass — no Lloyd
   chains, so the attach should undercut ``enable_pq`` at every rung;
 - ``scoring="sq8"`` scans byte codes instead of float64 vectors —
   the candidate footprint shrinks ~8× (reported from actual component
   dir sizes; parquet bit-packs the 0-255 ints) and the query wall
   sits between adc (smaller codes) and exact (no decode);
 - recall@10 *vs the same-probe exact ranking* isolates what 8 bits
   per dimension costs — the expectation from the quantization grid is
   near-exact (the uniform synthetic corpus is the worst case for PQ's
   trained codebooks but NOT for per-dimension affine codes, which
   need no cluster structure);
 - ``sq8_refine`` (exact rescore of top refine·k) should close any
   remaining gap at the same refine budget the PQ path uses.

Usage: python tools/probe_sq_store.py [--refine R] [sizes ...]
       (default refine=8, sizes 200000 1000000)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from biodata_pipeline_spark import get_spark  # noqa: E402
from biodata_pipeline_spark.operators.ann_store import (  # noqa: E402
    VectorIndexStore,
)
from tools.probe_ann_store import N_QUERIES, synth_vecs  # noqa: E402
from tools.probe_ivfpq import _dir_bytes  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

K_CELLS = 64
N_PROBE = 8
TOPK = 10


def rung(spark, n: int, refine: int = 8) -> dict:
    base = synth_vecs(spark, n).localCheckpoint()
    q = synth_vecs(spark, N_QUERIES, id_base=20_000_000).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_emb"),
    ).localCheckpoint()
    path = tempfile.mkdtemp(prefix=f"sqstore_{n}_")
    shutil.rmtree(path)
    store = VectorIndexStore(path)
    t0 = time.time()
    store.build(base, k=K_CELLS, iters=2, train_sample=25_000)
    build_secs = round(time.time() - t0, 2)
    t0 = time.time()
    store.enable_sq8(spark)
    enable_sq8_secs = round(time.time() - t0, 2)
    t0 = time.time()
    store.enable_bq(spark)
    enable_bq_secs = round(time.time() - t0, 2)
    t0 = time.time()
    store.enable_pq(spark, train_sample=100_000)  # size-aware k_sub
    enable_pq_secs = round(time.time() - t0, 2)
    store.compact(spark)  # measure every path on the bucketed layout

    def _component_mb(prefix: str) -> float:
        return round(
            sum(
                _dir_bytes(os.path.join(path, d))
                for d in os.listdir(path)
                if d.startswith(prefix)
            ) / 1e6,
            1,
        )

    out = {
        "n": n,
        "refine": refine,
        "k_sub_chosen": len(store._pq_books(spark)[0]),
        "build_secs": build_secs,
        "enable_sq8_secs": enable_sq8_secs,
        "enable_bq_secs": enable_bq_secs,
        "enable_pq_secs": enable_pq_secs,
        "assignments_mb": _component_mb("assignments"),
        "sq_codes_mb": _component_mb("sq_codes"),
        "bq_words_mb": _component_mb("bq_words"),
        "pq_codes_mb": _component_mb("pq_codes"),
    }
    results = {}
    for scoring in ("exact", "sq8", "sq8_refine", "bq1", "bq1_refine",
                    "adc", "adc_refine"):
        walls, got = [], None
        for _ in range(2):
            t0 = time.time()
            got = {
                (r.query_id, r.vec_id)
                for r in store.query(
                    q, TOPK, n_probe=N_PROBE, scoring=scoring,
                    refine=refine,
                ).collect()
            }
            walls.append(time.time() - t0)
        results[scoring] = got
        out[f"{scoring}_query_secs"] = round(min(walls), 2)
    exact = results["exact"]
    for scoring in ("sq8", "sq8_refine", "bq1", "bq1_refine",
                    "adc", "adc_refine"):
        out[f"{scoring}_recall_vs_exact"] = round(
            len(results[scoring] & exact) / len(exact), 4
        )
    shutil.rmtree(path, ignore_errors=True)
    return out


def main() -> None:
    args = sys.argv[1:]
    refine = 8
    if "--refine" in args:
        i = args.index("--refine")
        refine = int(args[i + 1])
        del args[i:i + 2]
    sizes = [int(a) for a in args] or [200_000, 1_000_000]
    spark = get_spark("probe-sq-store")
    for n in sizes:
        print(json.dumps({"probe": "sq_store", **rung(spark, n, refine)}))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
