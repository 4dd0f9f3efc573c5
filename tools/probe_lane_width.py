"""62-bit vs 31-bit minhash lane-stage timing at the 100x rung
(VERDICT r10 #6).

The r10 widening (audit.py: lanes became (a*h1 + b*h2 + c) mod p over
BOTH md5 halves) doubles the per-lane arithmetic — two products + two
mods instead of one. The r9 claim that the signature stage is
sub-dominant in the audit family predates it; this probe re-times, on
the 100x duplicate-heavy replica (.scale_test100, ~600k docs):

- the shingle explode + md5 base-hash projection alone (shared cost);
- the 32-lane signature groupBy with the CURRENT 62-bit family;
- the same groupBy with the r9-style 31-bit single-half family
  (a*h1 + c) mod p, reconstructed here at identical geometry;
- the full minhash_candidate_pairs_md5 pipeline wall.

Each timed via noop write, min-of-2 after a warm pass of the scan.
Verdict line: the 62/31 delta and the signature stage's share of the
full pipeline.

Usage: python tools/probe_lane_width.py [src_dir] (default .scale_test100)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from biodata_pipeline_spark import get_spark  # noqa: E402
from biodata_pipeline_spark.operators.audit import (  # noqa: E402
    MINHASH_P,
    _audit_shingles,
    md5_hex_halves,
    minhash_affine_params,
    minhash_candidate_pairs_md5,
)

NUM_LANES = 32


def noop_time(df) -> float:
    walls = []
    for _ in range(2):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        walls.append(time.time() - t0)
    return round(min(walls), 2)


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else ".scale_test100"
    spark = get_spark("probe-lane-width")
    docs = spark.read.parquet(f"{src}/documents.parquet").select(
        "doc_id", "text"
    )
    n_docs = docs.count()  # also warms the scan

    sh = _audit_shingles(docs, "doc_id", "text", 3)
    h1, h2 = md5_hex_halves(F.col("__md5"))
    hashed = sh.select("id", F.md5(F.col("sh")).alias("__md5")).select(
        "id",
        (h1 % MINHASH_P).alias("__h1"),
        (h2 % MINHASH_P).alias("__h2"),
    )
    base_secs = noop_time(hashed)

    la, lb, lc = minhash_affine_params(NUM_LANES)

    def sig(width: str):
        if width == "62":
            lanes = [
                F.min(
                    (
                        (F.lit(la[i]) * F.col("__h1")) % MINHASH_P
                        + (F.lit(lb[i]) * F.col("__h2")) % MINHASH_P
                        + F.lit(lc[i])
                    )
                    % MINHASH_P
                ).alias(f"m{i}")
                for i in range(NUM_LANES)
            ]
        else:  # the r9-style single-half family, identical geometry
            lanes = [
                F.min(
                    ((F.lit(la[i]) * F.col("__h1")) % MINHASH_P + F.lit(lc[i]))
                    % MINHASH_P
                ).alias(f"m{i}")
                for i in range(NUM_LANES)
            ]
        return hashed.groupBy("id").agg(*lanes)

    sig62_secs = noop_time(sig("62"))
    sig31_secs = noop_time(sig("31"))

    t0 = time.time()
    n_pairs = minhash_candidate_pairs_md5(docs).count()
    full_secs = round(time.time() - t0, 2)

    print(
        json.dumps(
            {
                "probe": "lane_width_100x",
                "src": src,
                "n_docs": n_docs,
                "base_hash_secs": base_secs,
                "sig62_secs": sig62_secs,
                "sig31_secs": sig31_secs,
                "widening_ratio": round(sig62_secs / sig31_secs, 3),
                "lane_only_delta_secs": round(sig62_secs - sig31_secs, 2),
                "full_pipeline_secs": full_secs,
                "n_candidate_pairs": n_pairs,
                "signature_share_of_full": round(sig62_secs / full_secs, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
