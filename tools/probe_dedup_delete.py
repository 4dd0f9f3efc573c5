"""Deletion-path overhead for the INGEST-GATE index at the 1M-doc rung
(VERDICT r11 #5 — the SignatureStore/ingest-gate side of the vector
delete ladder).

Enrolls n synthetic docs into ``incremental_near_dup_filter``'s
persistent LSH index, then measures what a 10% tombstone load costs
the admission path:

- baseline admit wall for a fixed-shape probe batch (half near-dup
  twins of enrolled docs — blocked — half novel — admitted);
- remove() wall for the pct% deletion (one bounded parquet append);
- admit wall WITH pending tombstones (each read site anti-joins the
  tombstone set; the claim under test: noise at 10% pending);
- compact() wall with the deletion fold, then admit wall after
  (tombstones cleared, anti-joins gone from the plan);
- behavior spots: a twin of a TOMBSTONED doc admits, a twin of a
  LIVE doc stays blocked, at every stage.

Usage: python tools/probe_dedup_delete.py [n_docs] [pct]
       (default 1000000 10; artifacts under .probe_dedup_delete/)
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
    compact_dedup_index,
    incremental_near_dup_filter,
    remove_from_dedup_index,
)

WORK_DIR = ".probe_dedup_delete"
VOCAB = 50_000
WORDS = 15


def synth_docs(spark, n: int, doc_base: int = 0,
               content_base: int | None = None, suffix: str = ""):
    """(doc_id, text): 15 hash-derived words per doc. ``content_base``
    decouples the text from the doc id, so a probe batch can carry
    twins of enrolled docs under fresh ids; ``suffix`` appends one
    extra word (shingle jaccard ~0.87 vs the base text — a near-dup,
    not an exact dup)."""
    cb = content_base if content_base is not None else doc_base
    cid = F.col("id") + cb
    words = F.transform(
        F.sequence(F.lit(0), F.lit(WORDS - 1)),
        lambda j: F.concat(
            F.lit("w"), F.pmod(F.xxhash64(cid, j), F.lit(VOCAB)).cast("string")
        ),
    )
    text = F.concat(F.array_join(words, " "), F.lit(suffix))
    return spark.range(n).select(
        (F.col("id") + doc_base).alias("doc_id"), text.alias("text")
    ).repartition(32)


def probe_batch(spark, tag: int, n_twins: int = 5_000, n_novel: int = 5_000):
    """Fixed-shape admission batch: n_twins near-dups of enrolled
    contents [tag*10000, tag*10000+n_twins) + n_novel novel docs.
    ``tag`` shifts the doc ids AND both content ranges so successive
    batches are disjoint but identically shaped — in particular no
    timed batch touches contents 0/1, which the behavior spot-check
    reserves (a twin admitted by an earlier batch would otherwise
    legitimately block the spot twin and fake a deletion bug)."""
    twins = synth_docs(
        spark, n_twins,
        doc_base=100_000_000 + tag * 1_000_000,
        # content spacing scales with the batch so oversized batches
        # (probe_admit_floor --batch, r14) keep tag ranges disjoint;
        # identical to the old tag*10_000 at the default shape
        content_base=tag * max(10_000, 2 * n_twins),
        suffix=" tailword",
    )
    novel = synth_docs(
        spark, n_novel,
        doc_base=200_000_000 + tag * 1_000_000,
        content_base=500_000_000 + tag * 1_000_000,
    )
    return twins.unionByName(novel)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    pct = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    shutil.rmtree(WORK_DIR, ignore_errors=True)
    spark = get_spark("probe-dedup-delete")
    idx = os.path.join(WORK_DIR, "index")

    # enroll in 4 equal batches (the per-batch ingest shape)
    t0 = time.time()
    per = n // 4
    for b in range(4):
        incremental_near_dup_filter(
            synth_docs(spark, per, doc_base=b * per), idx, 0.5,
            batch_id=f"enroll{b}",
        )
    enroll_secs = round(time.time() - t0, 1)

    def timed_admit(tag: int):
        t0 = time.time()
        kept, rep = incremental_near_dup_filter(
            probe_batch(spark, tag), idx, 0.5, batch_id=f"probe{tag}"
        )
        n_kept, n_dropped = kept.count(), rep.count()
        return round(time.time() - t0, 2), n_kept, n_dropped

    base_secs, base_kept, base_dropped = timed_admit(1)

    # tombstone pct% of enrolled docs: every (100/pct)-th id — this
    # includes content 0's doc (id 0) but not content 1's (id 1)
    stride = int(100 / pct)
    n_del = n // stride
    del_ids = spark.range(n_del).select(
        (F.col("id") * stride).alias("doc_id")
    )
    t0 = time.time()
    n_removed = remove_from_dedup_index(spark, idx, del_ids)
    remove_secs = round(time.time() - t0, 2)

    pend_secs, pend_kept, pend_dropped = timed_admit(2)
    # a SECOND pending-phase admit separates a structural tombstone
    # cost (both slow) from the interpreted-HOF JIT bimodality the q26b
    # probe documented (one-off deopt storm → second run near baseline)
    pend2_secs, pend2_kept, pend2_dropped = timed_admit(4)

    # behavior spot: twin of tombstoned content 0 admits; twin of live
    # content 1 blocks
    spot = synth_docs(
        spark, 2, doc_base=900_000_000, content_base=0, suffix=" spotword"
    )
    kept, rep = incremental_near_dup_filter(
        spot, idx, 0.5, batch_id="spot-pending"
    )
    kept_ids = {r.doc_id for r in kept.collect()}
    assert 900_000_000 in kept_ids, "twin of tombstoned doc still blocked"
    assert 900_000_001 not in kept_ids, "twin of live doc admitted"

    t0 = time.time()
    stats = compact_dedup_index(spark, idx, n_buckets=16)
    compact_secs = round(time.time() - t0, 1)

    post_secs, post_kept, post_dropped = timed_admit(3)

    print(
        json.dumps(
            {
                "probe": "dedup_delete",
                "n_docs": n,
                "n_removed": n_removed,
                "enroll_secs_4_batches": enroll_secs,
                "admit_secs_baseline": base_secs,
                "remove_secs": remove_secs,
                "admit_secs_pending_tombstones": pend_secs,
                "admit_secs_pending_tombstones_2nd": pend2_secs,
                "compact_secs_with_fold": compact_secs,
                "admit_secs_post_compact": post_secs,
                "tombstones_folded": stats.get("tombstones_folded"),
                "admit_shape": {
                    "baseline": [base_kept, base_dropped],
                    "pending": [pend_kept, pend_dropped],
                    "pending_2nd": [pend2_kept, pend2_dropped],
                    "post_compact": [post_kept, post_dropped],
                },
            }
        )
    )
    shutil.rmtree(WORK_DIR, ignore_errors=True)


if __name__ == "__main__":
    main()
