"""Tokenizer-scale BPE training probe (VERDICT r7 #1).

Round 7's honest gap: the distributed per-merge loop pays a ~0.2 s
Spark scheduler floor per merge — a real 32k vocabulary is ~2 h of pure
latency. ``bpe_train`` is now count-gated: one distributed scan builds
the word-frequency table; under ``BPE_INMEMORY_MAX_WORDS`` rows the
merge loop runs driver-side over the collected ``(word, n)`` pairs with
incremental pair-count maintenance and a lazy-deletion heap (parity
with the distributed loop is pinned merge-for-merge in
tests/test_tokenizer.py).

Measured here:

1. **Deep-merge throughput** on a tokenizer-realistic vocabulary —
   200k distinct syllable-model words (consonant-vowel syllables give
   the shared substructure natural morphology has; the real testdata
   corpus has a ~31-word vocabulary and cannot support deep merge
   lists), Zipf-ish frequencies: train 1k and 8k merges in-memory,
   report merges/sec. The distributed loop's scheduler floor alone
   (0.2 s × merges) is printed next to it — the comparison the verdict
   asked for.
2. **End-to-end gate path** on the real corpus ladder (sf0.1, 100×):
   ``bpe_train(docs, 20)`` — scan + collect + in-memory loop — against
   ``bpe_train_distributed(docs, 20)``, asserting identical merges.
   The 100× replica adds no vocabulary, so the fast path's added cost
   over 1× is the scan, which is the scale-correct shape.

Round 10 (VERDICT r9 #7): the deep-merge ladder extends to the full
32k-merge production vocabulary — the "remaining constant" question:
is the single-threaded driver loop fast enough at 32k merges that
parallelizing it buys nothing? ``--deep-only`` runs just that ladder
(no Spark session).

Usage: python tools/probe_bpe_train.py [sf_dir ...]
       (default: /root/testdata/sf0.1 .scale_test100)
       python tools/probe_bpe_train.py --deep-only
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from biodata_pipeline_spark.operators.tokenizer import (  # noqa: E402
    _bpe_train_inmemory,
    bpe_train,
    bpe_train_distributed,
)

SYN_WORDS = 200_000
SCHED_FLOOR_SECS = 0.2  # measured r7: per-merge Spark job latency


def synthetic_vocab(n_words: int) -> list[tuple[str, int]]:
    """Distinct syllable-model words (1-5 CV/CVC syllables) with
    Zipf-ish frequencies — the substructure profile BPE merges feed on,
    at a realistic word-length distribution (natural vocabularies
    average ~5-9 chars, not md5's 32)."""
    rng = random.Random(8)
    consonants = "bcdfghjklmnprstvwz"
    vowels = "aeiou"
    sylls = [c + v for c in consonants for v in vowels]
    sylls += [c + v + t for c in "bdklmnrst" for v in vowels for t in "nrst"]
    seen: set[str] = set()
    out: list[tuple[str, int]] = []
    while len(out) < n_words:
        w = "".join(
            rng.choice(sylls) for _ in range(rng.choice((1, 2, 2, 3, 3, 4, 5)))
        )
        if w in seen:
            continue
        seen.add(w)
        # Zipf-ish: rank r gets ~N/(r+1) weight
        out.append((w, max(1, n_words // (len(out) + 1))))
    return out


def main() -> None:
    deep_only = "--deep-only" in sys.argv
    sf_dirs = [a for a in sys.argv[1:] if not a.startswith("--")] or [
        "/root/testdata/sf0.1",
        ".scale_test100",
    ]
    results: dict = {}

    vocab = synthetic_vocab(SYN_WORDS)
    deep = {}
    for n_merges in (1000, 8000, 32000):
        t0 = time.time()
        merges = _bpe_train_inmemory(vocab, n_merges)
        dt = time.time() - t0
        deep[n_merges] = {
            "merges_trained": len(merges),
            "train_secs": round(dt, 2),
            "merges_per_sec": round(len(merges) / dt, 1),
            "distributed_floor_secs": round(len(merges) * SCHED_FLOOR_SECS),
        }
        print(json.dumps({"deep": deep[n_merges]}), flush=True)
    results["synthetic_200k_words"] = deep
    if deep_only:
        print(json.dumps({"probe": "bpe_train_scale", "results": results}))
        return

    from biodata_pipeline_spark import get_spark

    spark = get_spark("probe-bpe-train")
    for sf_dir in sf_dirs:
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        t0 = time.time()
        fast = bpe_train(docs, 20)
        fast_secs = time.time() - t0
        t0 = time.time()
        slow = bpe_train_distributed(docs, 20)
        slow_secs = time.time() - t0
        assert fast == slow, f"parity broken at {sf_dir}"
        results[sf_dir] = {
            "n_merges": len(fast),
            "gated_inmemory_secs": round(fast_secs, 2),
            "distributed_secs": round(slow_secs, 2),
            "speedup": round(slow_secs / fast_secs, 2),
        }
    print(json.dumps({"probe": "bpe_train_scale", "results": results}))


if __name__ == "__main__":
    main()
