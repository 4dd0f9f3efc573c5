"""Adversarial hot-bucket skew probe for the LSH banding family
(VERDICT r7 #4).

The banding operators prune mega-buckets above ``max_bucket`` but no
probe had measured a HOT-KEY regime below the prune line: one
(band, bucket) holding just under ``max_bucket`` members, with the hot
family carrying ~90% of all rows. This probe builds exactly that —
H near-identical docs (shared core + one unique token each, so
``collapse_exact`` can NOT collapse them and every band of the family
collides) next to a 10% background of distinct docs — and measures:

- ``minhash_lsh_dup_pairs``: candidate volume is inherently quadratic
  in the hot-bucket size (those pairs ARE real near-dups — emitting
  them is the contract); wall time at H and H/2 shows the quadratic
  growth is candidate-bound, not a shuffle pathology, and the
  ``max_bucket`` knob is the cap (also measured: pruned run).
- ``cross_split_leakage_lsh``: the hot family splits across train/test
  → the TRAIN-bands×TEST-bands join sees the hot bucket from both
  sides.
- ``incremental_near_dup_filter``: a fresh hot batch admitted against
  an enrolled hot index.

Output: one JSON line per scenario with wall seconds + result counts,
then a summary judgment line (quadratic-in-H candidates expected;
anything superlinear beyond that is a regression).

Usage: python tools/probe_banding_skew.py [H] (default 1500)
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
from biodata_pipeline_spark.operators.dedup import (  # noqa: E402
    cross_split_leakage_lsh,
    incremental_near_dup_filter,
    minhash_lsh_dup_pairs,
)

WORK_DIR = ".probe_banding_skew"
CORE = " ".join(f"core{i}" for i in range(30))


def hot_corpus(spark, h: int, background: int):
    """h hot docs (shared 30-token core + 1 unique token → jaccard
    ~0.94 pairwise, distinct contents) + background distinct docs."""
    hot = spark.range(h).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit(CORE + " unique"), F.col("id").cast("string")).alias(
            "text"
        ),
    )
    bg = spark.range(10_000_000, 10_000_000 + background).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("bg "),
            F.md5(F.col("id").cast("string")),
            F.lit(" body "),
            F.md5((F.col("id") * 7).cast("string")),
            F.lit(" text "),
            F.md5((F.col("id") * 13).cast("string")),
            F.lit(" words "),
            F.md5((F.col("id") * 29).cast("string")),
        ).alias("text"),
    )
    return hot.unionByName(bg).repartition(32).localCheckpoint()


def timed(label: str, fn):
    t0 = time.time()
    out = fn()
    rec = {"scenario": label, "secs": round(time.time() - t0, 2), **out}
    print(json.dumps(rec), flush=True)
    return rec


def main() -> None:
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    spark = get_spark("probe-banding-skew")
    results = []

    for hh in (h // 2, h):
        docs = hot_corpus(spark, hh, max(1, hh // 9))  # hot ≈ 90% of rows
        results.append(
            timed(
                f"minhash_pairs_hot_{hh}",
                lambda d=docs: {
                    "pairs": minhash_lsh_dup_pairs(d, threshold=0.7).count()
                },
            )
        )
    docs = hot_corpus(spark, h, max(1, h // 9))
    results.append(
        timed(
            f"minhash_pairs_hot_{h}_pruned",
            lambda: {
                "pairs": minhash_lsh_dup_pairs(
                    docs, threshold=0.7, max_bucket=h // 2
                ).count()
            },
        )
    )
    results.append(
        timed(
            f"leakage_lsh_hot_{h}",
            lambda: {
                "leaks": cross_split_leakage_lsh(
                    docs, threshold=0.7, test_fraction=0.25
                ).count()
            },
        )
    )

    shutil.rmtree(WORK_DIR, ignore_errors=True)
    idx = os.path.join(WORK_DIR, "index")
    incremental_near_dup_filter(docs, idx, 0.7, batch_id="0")
    fresh = hot_corpus(spark, h, max(1, h // 9)).withColumn(
        "doc_id", F.col("doc_id") + 20_000_000
    )
    results.append(
        timed(
            f"incremental_admit_hot_{h}",
            lambda: {
                "kept": incremental_near_dup_filter(
                    fresh, idx, 0.7, batch_id="1"
                )[0].count()
            },
        )
    )

    half = next(r for r in results if r["scenario"] == f"minhash_pairs_hot_{h//2}")
    full = next(r for r in results if r["scenario"] == f"minhash_pairs_hot_{h}")
    print(
        json.dumps(
            {
                "probe": "banding_skew",
                "hot_size": h,
                "pair_growth_vs_candidate_growth": {
                    "pairs_ratio": round(full["pairs"] / max(half["pairs"], 1), 2),
                    "secs_ratio": round(full["secs"] / max(half["secs"], 0.01), 2),
                    "note": "pairs grow ~4x (quadratic contract); wall "
                    "should grow ≲ pairs — superlinear beyond that is a "
                    "regression",
                },
                "scenarios": results,
            }
        )
    )


if __name__ == "__main__":
    main()
