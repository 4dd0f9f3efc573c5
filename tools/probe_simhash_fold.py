"""SimHash signature-stage decomposition (VERDICT r12 #6).

The r12 XXH64 banding entry (SCALING.md) scoped only MinHash; this
probe answers the same question for SimHash's signature build, which
since r8 runs as: JVM ``transform(tokens(text), xxhash64)`` (a
CodegenFallback HOF — the storm-candidate family) feeding the Arrow
vote-fold kernel (``simhash_fingerprints``). Decomposed, all paths
noop-write materialized, 3 runs each (run-to-run spread IS the
JIT-bimodality exposure):

 - ``ht_only``     — the remaining interpreted-HOF stage alone;
 - ``kernel``      — the shipped path (ht + per-row numpy vote fold);
 - ``kernel_vec``  — candidate: same kernel with the row loop replaced
   by one flat concatenate + add.reduceat (pure integer math, bit-parity
   asserted in-probe against the shipped path);
 - ``jvm_hof``     — the full 63-wide zip_with accumulator fold
   (``simhash64``), what would run without the kernel: MinHash-fold
   family, the known storm shape.

Usage: python tools/probe_simhash_fold.py [n_docs]  (default 500000)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from biodata_pipeline_spark import get_spark  # noqa: E402


def t(df) -> list[float]:
    out = []
    for _ in range(3):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        out.append(round(time.time() - t0, 2))
    return out


def _fold_vectorized(ht_df):
    """Candidate kernel: one flat (total_tokens, ) hash vector per Arrow
    batch, per-row votes via add.reduceat — no Python row loop."""

    def fold(batches):
        shifts = np.arange(63, dtype=np.uint64)
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            raws = pdf["ht"].tolist()
            fps = np.zeros(n, dtype=np.int64)
            null_mask = np.zeros(n, dtype=bool)
            arrs, offsets, rowidx = [], [], []
            pos = 0
            for r, raw in enumerate(raws):
                if raw is None:
                    null_mask[r] = True
                    continue
                a = np.asarray(raw, dtype=np.int64)
                if a.size == 0:
                    continue  # all votes negative -> fp 0
                arrs.append(a)
                offsets.append(pos)
                rowidx.append(r)
                pos += a.size
            if arrs:
                flat = np.concatenate(arrs).astype(np.uint64)
                bits = (
                    (flat[:, None] >> shifts[None, :]) & np.uint64(1)
                ).astype(np.int64)
                votes = np.add.reduceat(2 * bits - 1, offsets, axis=0)
                vals = (
                    ((votes > 0).astype(np.uint64) << shifts[None, :])
                    .sum(axis=1)
                    .astype(np.int64)
                )
                fps[np.asarray(rowidx)] = vals
            out = pd.array(fps, dtype="Int64")
            out[null_mask] = pd.NA
            yield pd.DataFrame({"id": pdf["id"], "fp": out})

    return ht_df.mapInPandas(fold, "id long, fp long")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    from biodata_pipeline_spark.functions.textfn import tokens
    from biodata_pipeline_spark.operators.dedup import (
        simhash64,
        simhash_fingerprints,
    )

    spark = get_spark("probe-simhash-fold")
    docs = (
        spark.read.parquet("/root/repo/.scale_test100/documents.parquet")
        .select("doc_id", "text")
        .limit(n)
        .repartition(32)
        .persist()  # probe rule: explicit parallelism, time only the stage
    )
    n_docs = docs.count()

    ht = docs.select(
        F.col("doc_id").alias("id"),
        F.transform(tokens(F.col("text")), lambda tk: F.xxhash64(tk)).alias(
            "ht"
        ),
    )
    ht_cached = ht.persist()
    ht_cached.count()

    # bit-parity gate on a bounded slice BEFORE timing anything
    lhs = {
        r["id"]: r["fp"]
        for r in _fold_vectorized(ht_cached.limit(20_000)).collect()
    }
    rhs = {
        r["id"]: r["fp"]
        for r in simhash_fingerprints(
            docs.limit(20_000), "doc_id", "text"
        ).collect()
    }
    assert lhs == rhs, "vectorized fold diverged from the shipped kernel"

    res = {
        "probe": "simhash_fold",
        "n_docs": n_docs,
        "ht_only_runs_sec": t(ht),
        "kernel_runs_sec": t(simhash_fingerprints(docs, "doc_id", "text")),
        "kernel_vec_runs_sec": t(_fold_vectorized(ht)),
        "jvm_hof_runs_sec": t(
            docs.select(
                F.col("doc_id").alias("id"),
                simhash64(F.col("text")).alias("fp"),
            )
        ),
    }
    res["vec_vs_shipped_steady"] = round(
        min(res["kernel_runs_sec"]) / min(res["kernel_vec_runs_sec"]), 2
    )
    res["jvm_vs_shipped_steady"] = round(
        min(res["jvm_hof_runs_sec"]) / min(res["kernel_runs_sec"]), 2
    )
    print(json.dumps(res))


if __name__ == "__main__":
    main()
