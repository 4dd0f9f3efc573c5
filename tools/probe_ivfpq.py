"""Scale probe for the IVF-PQ path (VectorIndexStore.enable_pq +
query(scoring=...)): representation cost and win at the ladder rungs.

The claims under test:
 - ``enable_pq`` is a bounded-cost attach (codebook fit on a 100k
   sample + one encode pass over the corpus);
 - ``scoring="adc"`` scans 4-int codes instead of 64-float vectors —
   the on-disk candidate footprint shrinks ~16-64× (reported from the
   actual component dir sizes) and the probe's query wall drops with
   it;
 - recall@10 *vs the same-probe exact ranking* isolates what the 16-bit
   representation costs (uniform synthetic vectors are PQ's documented
   worst case — no cluster structure for the codebooks to exploit);
   ``adc_refine`` then repairs most of it by re-scoring the top
   refine·k exactly.

Usage: python tools/probe_ivfpq.py [--m M] [--ksub K] [--refine R] [sizes ...]
       (default m=16, k_sub=16, refine=8, sizes 200000 1000000;
       --ksub 256 is the byte-code arm — the recall lever the r13
       SCALING entry names for when the refine funnel alone can't hold
       the target on a grown corpus)
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

from pyspark.sql import functions as F  # noqa: E402

K_CELLS = 64
N_PROBE = 8
TOPK = 10


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def rung(spark, n: int, m: int = 16, k_sub: int = 16,
         refine: int = 8, residual: bool = False) -> dict:
    base = synth_vecs(spark, n).localCheckpoint()
    q = synth_vecs(spark, N_QUERIES, id_base=20_000_000).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_emb"),
    ).localCheckpoint()
    path = tempfile.mkdtemp(prefix=f"ivfpq_{n}_")
    shutil.rmtree(path)
    store = VectorIndexStore(path)
    t0 = time.time()
    store.build(base, k=K_CELLS, iters=2, train_sample=25_000)
    build_secs = round(time.time() - t0, 2)
    t0 = time.time()
    store.enable_pq(
        spark, m=m, k_sub=k_sub, train_sample=100_000, residual=residual
    )
    enable_secs = round(time.time() - t0, 2)
    store.compact(spark)  # measure both paths on the bucketed layout
    def _component_mb(prefix: str) -> float:
        return round(
            sum(
                _dir_bytes(os.path.join(path, d))
                for d in os.listdir(path)
                if d.startswith(prefix)
            ) / 1e6,
            1,
        )

    sizes = {
        "assignments_mb": _component_mb("assignments"),
        "pq_codes_mb": _component_mb("pq_codes"),
    }
    out = {
        "n": n,
        "m": m,
        "k_sub": k_sub,
        "refine": refine,
        "residual": residual,
        "build_secs": build_secs,
        "enable_pq_secs": enable_secs,
        **sizes,
    }
    results = {}
    for scoring in ("exact", "adc", "adc_refine"):
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
    out["adc_recall_vs_exact"] = round(
        len(results["adc"] & exact) / len(exact), 4
    )
    out["refine_recall_vs_exact"] = round(
        len(results["adc_refine"] & exact) / len(exact), 4
    )
    shutil.rmtree(path, ignore_errors=True)
    return out


def main() -> None:
    args = sys.argv[1:]

    def flag(name: str, default: int) -> int:
        nonlocal_args = args
        if name in nonlocal_args:
            i = nonlocal_args.index(name)
            v = int(nonlocal_args[i + 1])
            del nonlocal_args[i:i + 2]
            return v
        return default

    m = flag("--m", 16)
    k_sub = flag("--ksub", 16)
    refine = flag("--refine", 8)
    residual = "--residual" in args
    if residual:
        args.remove("--residual")
    sizes = [int(s) for s in args] or [200_000, 1_000_000]
    spark = get_spark("probe-ivfpq")
    rows = []
    for n in sizes:
        row = rung(spark, n, m=m, k_sub=k_sub, refine=refine,
                   residual=residual)
        rows.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"probe": "ivfpq", "rows": rows}))


if __name__ == "__main__":
    main()
