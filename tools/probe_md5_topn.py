"""Scale probe for the deterministic training-sample selection
(VERDICT r13 #4): the old ``orderBy(md5(id), id).limit(n)`` plans as
TakeOrderedAndProject — every partition ships its own top-n to the
driver, an n × P row merge that SCALING.md r13:2099 measured at
~1.8 GB for the 100k-of-1M sample — vs ``md5_top_n``'s threshold path
(count + approxQuantile ladder + verified filter + bounded sort).

Claims under test at each rung:
 - output parity: both paths return the identical id set (the
   threshold path is exact by construction — probe re-verifies);
 - wall: where does the bounded-merge path start winning, and what
   does the driver merge cost at the rung where it is load-bearing;
 - the driver-merge estimate: n × P × rowbytes for the direct path vs
   ~1.25 n candidates for the threshold path.

Usage: python tools/probe_md5_topn.py [--sample N] [sizes ...]
       (default sample 100000, sizes 200000 1000000)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from biodata_pipeline_spark import get_spark  # noqa: E402
from biodata_pipeline_spark.operators.sampling import md5_top_n  # noqa: E402
from tools.probe_ann_store import synth_vecs  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402


def _ids(df) -> set:
    return {r.vec_id for r in df.select("vec_id").collect()}


def rung(spark, n: int, sample: int) -> dict:
    base = synth_vecs(spark, n).localCheckpoint()
    parts = base.rdd.getNumPartitions()

    t0 = time.time()
    direct = base.orderBy(
        F.md5(F.col("vec_id").cast("string")), F.col("vec_id")
    ).limit(sample)
    direct_ids = _ids(direct)
    t_direct = time.time() - t0

    t0 = time.time()
    fast = md5_top_n(base, sample, "vec_id", direct_rows=0)
    fast_ids = _ids(fast)
    t_fast = time.time() - t0

    assert fast_ids == direct_ids, (
        f"parity violation at n={n}: "
        f"{len(fast_ids ^ direct_ids)} differing ids"
    )
    row_bytes = 8 + 4 * 64  # vec_id + 64 float32 components
    return {
        "n": n,
        "sample": sample,
        "partitions": parts,
        "direct_wall_s": round(t_direct, 2),
        "threshold_wall_s": round(t_fast, 2),
        "parity": True,
        "direct_merge_mb": round(sample * parts * row_bytes / 1e6, 1),
        "threshold_merge_mb": round(1.25 * sample * row_bytes / 1e6, 1),
    }


def main() -> None:
    args = sys.argv[1:]
    sample = 100_000
    if "--sample" in args:
        i = args.index("--sample")
        sample = int(args[i + 1])
        del args[i:i + 2]
    sizes = [int(s) for s in args] or [200_000, 1_000_000]
    spark = get_spark("probe-md5-topn")
    rows = []
    for n in sizes:
        row = rung(spark, n, min(sample, n))
        rows.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"probe": "md5_topn", "rows": rows}))


if __name__ == "__main__":
    main()
