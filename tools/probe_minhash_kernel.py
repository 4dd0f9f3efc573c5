"""Banding-stage timing: Arrow XXH64 kernel vs the interpreted JVM HOF
fold (r12 — the evidence behind MINHASH_KERNEL_THRESHOLD).

Times ONLY the shared banding stage (persisted shingle table →
(id, band, bucket), noop-write materialized, min-of-2 warm) at a corpus
size where the kernel gate engages, both paths forced. Steady-state
ratio is the headline; the JVM path's run-to-run spread is the
JIT-bimodality exposure the kernel removes (SCALING r11/r12).

Usage: python tools/probe_minhash_kernel.py [n_docs]  (default 500000)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from biodata_pipeline_spark import get_spark  # noqa: E402


def t(df) -> list[float]:
    out = []
    for _ in range(3):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        out.append(round(time.time() - t0, 2))
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    from biodata_pipeline_spark.operators.dedup import (
        _minhash_band_rows_kernel,
        minhash_band_rows,
        shingle_hash_table,
    )

    spark = get_spark("probe-minhash-kernel")
    docs = (
        spark.read.parquet("/root/repo/.scale_test100/documents.parquet")
        .select("doc_id", "text")
        .limit(n)
        .repartition(32)
    )
    base = shingle_hash_table(docs, "doc_id", "text", 3).persist()
    n_rows = base.count()

    jvm = t(minhash_band_rows(base, 32, 8, n_rows=1))  # force JVM path
    kern = t(_minhash_band_rows_kernel(base, 32, 8))
    print(
        json.dumps(
            {
                "probe": "minhash_kernel",
                "n_docs": n_rows,
                "jvm_fold_runs_sec": jvm,
                "kernel_runs_sec": kern,
                "steady_ratio": round(min(jvm) / min(kern), 2),
            }
        )
    )


if __name__ == "__main__":
    main()
