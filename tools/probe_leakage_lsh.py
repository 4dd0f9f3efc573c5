"""Scale probe for the MinHash-banded split guard (VERDICT r6 #4).

Runs ``cross_split_leakage_lsh`` (threshold 0.5, 10% holdout) on the
sf0.1 base and its duplicate-heavy replicas and reports wall time
(min of 2) + flagged-train-doc counts. The 100× replica is the
adversarial case for the banded path: every content repeats ~100×, so
without the content-key grouping (one rep per (content, side)) each
bucket would hold ~100 identical signatures per doc and the candidate
join would go quadratic per cluster. Sublinear growth up the ladder is
the pass criterion; the EXACT guard is also timed at 1× for reference
(at 100× its cross-split shingle join explodes by construction — that
is why the banded variant exists).

Usage: python tools/probe_leakage_lsh.py [base_dir scale_dir ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from biodata_pipeline_spark import get_spark  # noqa: E402
from biodata_pipeline_spark.operators.caching import cache_scope  # noqa: E402
from biodata_pipeline_spark.operators.dedup import (  # noqa: E402
    cross_split_leakage,
    cross_split_leakage_lsh,
)

THRESHOLD = 0.5


def timed(fn, docs) -> tuple[float, int]:
    best, n = None, None
    for _ in range(2):
        with cache_scope():
            t0 = time.time()
            n = fn(docs, THRESHOLD, test_fraction=0.1).count()
            dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 2), n


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", ".scale_test", ".scale_test100"]
    spark = get_spark("probe-leakage-lsh")
    results = {}
    for i, d in enumerate(dirs):
        docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
        secs, n = timed(cross_split_leakage_lsh, docs)
        results[d] = {"lsh_secs": secs, "n_flagged": n}
        if i == 0:
            e_secs, e_n = timed(cross_split_leakage, docs)
            results[d]["exact_secs"] = e_secs
            results[d]["exact_flagged"] = e_n
    base = results[dirs[0]]["lsh_secs"]
    for d in dirs[1:]:
        results[d]["vs_base"] = round(results[d]["lsh_secs"] / max(base, 1e-9), 1)
    print(json.dumps({"probe": "leakage_lsh", "results": results}))


if __name__ == "__main__":
    main()
