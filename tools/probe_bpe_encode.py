"""1,000-merge BPE encode ladder (VERDICT r6 #1).

Measures the Arrow merge-rank kernel (``bpe_encode_words``) at
tokenizer-realistic merge counts — the regime the Catalyst fold stack
cannot reach (each merge adds one plan layer; ~20 is its practical
bound). The rank table is built cheaply in two rounds so it contains
second-order merges (pairs of merged symbols), exercising the kernel's
re-scan loop like a really-trained tokenizer would:

  round 1: top-half pairs of the initial char symbols by corpus count
  round 2: encode with round 1, re-count adjacent pairs, take the next
           top-half (skipping round-1 pairs)

This is NOT the greedy BPE training sequence (that is ``bpe_train``,
whose per-merge argmax is inherently sequential); it is a same-shape,
same-size rank table for measuring ENCODE throughput. Timed section:
encode the full word-frequency table with all merges and aggregate the
corpus-weighted symbol count (forces every word through the kernel).

Scale shape to verify: encode cost is vocabulary-sized — the corpus
contributes only the word-count scan — so the 100× (duplicate-heavy)
replica should cost roughly the scan growth, not 100× the encode.

The synthetic corpus has a ~31-word vocabulary (and therefore only
~158 distinct adjacent pairs — no corpus-derived table can reach 1,000
merges), so the kernel-throughput half of the ladder runs on a
SYNTHETIC vocabulary: 200k distinct md5-hex words (32 chars each, the
realistic word-table size for a 100 TB corpus) with a 3-round rank
table over the hex alphabet (16² char pairs, then 4-gram and 8-gram
pairs — second- and third-order merges, the lookup/re-scan load of a
trained tokenizer). The corpus half still reports the real end-to-end
cost at 1× and 100×.

Usage: python tools/probe_bpe_encode.py [sf_dir ...]
       (default: /root/testdata/sf0.1 .scale_test100)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from biodata_pipeline_spark import get_spark  # noqa: E402
from biodata_pipeline_spark.operators.tokenizer import (  # noqa: E402
    _initial_symbols,
    _pair_counts,
    bpe_encode_words,
    word_counts,
)

N_MERGES = 1000
SYN_WORDS = 200_000


def _top_pairs(syms_df, limit: int, seen: set) -> list[tuple[str, str]]:
    return [
        (r["p"]["a"], r["p"]["b"])
        for r in _pair_counts(syms_df)
        .orderBy(F.desc("cnt"), F.asc("p.a"), F.asc("p.b"))
        .limit(limit + len(seen))
        .collect()
        if (r["p"]["a"], r["p"]["b"]) not in seen
    ][:limit]


def build_rank_table(wc, rounds: list[int]) -> list[tuple[str, str]]:
    """Multi-round rank table: each round encodes with the merges so far
    and takes the next top pairs — so later rounds contain pairs OF
    merged symbols, like a really-trained tokenizer's deep merges."""
    merges: list[tuple[str, str]] = []
    syms = _initial_symbols(wc)
    for want in rounds:
        got = _top_pairs(syms, want, set(merges))
        if not got:
            break
        merges += got
        syms = bpe_encode_words(wc, merges).select("syms", "n")
    return merges


def timed_encode(wc, merges) -> dict:
    t0 = time.time()
    row = (
        bpe_encode_words(wc, merges)
        .select(F.size("syms").alias("k"), "n")
        .agg(F.sum(F.col("k") * F.col("n")).alias("total_syms"))
        .collect()[0]
    )
    return {
        "n_merges": len(merges),
        "total_weighted_syms": row["total_syms"],
        "encode_secs": round(time.time() - t0, 2),
    }


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.1", ".scale_test100"]
    spark = get_spark("probe-bpe-encode")
    results: dict = {}

    # --- kernel throughput at tokenizer-realistic sizes (synthetic) ---
    syn = (
        spark.range(SYN_WORDS)
        .select(F.md5(F.col("id").cast("string")).alias("w"), F.lit(1).alias("n"))
        .repartition(32)
        .localCheckpoint()
    )
    merges_1k = build_rank_table(syn, [256, 384, 512])
    r = timed_encode(syn, merges_1k)
    r["n_words"] = SYN_WORDS
    results["synthetic_200k_words"] = r

    # --- real-corpus end-to-end (scan + encode) up the ladder ---------
    merges = None
    for sf_dir in sf_dirs:
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        wc = word_counts(docs).localCheckpoint()  # vocabulary table
        n_words = wc.count()
        if merges is None:  # rank table from the base corpus, reused
            merges = build_rank_table(wc, [80, 80])  # up-ladder
        r = timed_encode(wc, merges)
        r["n_words"] = n_words
        results[sf_dir] = r
    print(json.dumps({"probe": "bpe_encode_1k", "results": results}))


if __name__ == "__main__":
    main()
