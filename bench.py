"""Headline-query benchmark.

Runs the engine's representative queries at ``$SPARK_GRAFT_SF_DIR``
(default /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]``.

Output protocol (VERDICT r5 #1): the driver records only the LAST
~2000 bytes of stdout, and the round-4 per-run detail grew the payload
past that window, so BENCH_r05.json failed to parse. We now print TWO
JSON lines: first the fat payload (per-run timings, totals — for humans
and SCALING.md), then a compact final line — min-only ``queries`` plus
totals, guaranteed under ~1.8 KB — as the LAST stdout line, which is
what the driver parses.

Each query is materialized via a cheap count-style action (``foreach`` of
nothing would skip result production; ``count`` on the final frame forces
the full plan including output projection for aggregates; for wide detail
outputs we use ``df.write.format("noop")`` so rows are fully produced but
not collected to the driver).

Execution model (round 7, VERDICT r6 #5): cost-ordered BATCHES of
``BATCH_SIZE`` queries, each batch in a FRESH python+JVM subprocess
(``SPARK_GRAFT_BENCH_KEYS`` re-invokes this script on a subset). One
JVM running the whole ~52-query × 3-pass sequence accumulates code
cache / GC history that the r6 harness fought with a per-query
System.gc() nudge — which the r7 bisect identified as the r5→r6 drift
itself (see release_accumulated). Set ``SPARK_GRAFT_BENCH_BATCHED=0``
for the legacy single-JVM mode.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from biodata_pipeline_spark import get_spark  # noqa: E402
from biodata_pipeline_spark.operators.caching import cache_scope  # noqa: E402
from biodata_pipeline_spark.registry import SPARK_QUERIES  # noqa: E402

HEADLINE = [
    "q21_pricing_summary",        # TPC-H Q1-style scan+agg on the fact table
    "q11_multiway_join_revenue",  # 4-way join + agg
    "q09_exact_dedup",            # distinct shuffle
    "q27_row_number_rank",        # window
    "q37_session_window",         # sessionization (2 windows, 1 shuffle)
    "q30_orderby_limit_topk",     # JSON extract + global top-k
    "q24_cosine_topk",            # vector top-k (two-phase)
    "q26_retrieval_rank_detail",  # flagship retrieval-rank pipeline
    "q_minhash_lsh_dedup",        # MinHash+LSH near-dup
    "q_chunk_documents",          # chunk explode
    "q16_asof_join",              # as-of join (union-and-carry)
    "q_lsh_similarity_join",      # hyperplane-LSH similarity (scale path)
    "q_simhash_dedup",            # SimHash near-dup bands
    # round 2 additions — regression coverage for these families:
    "q25_similarity_join",        # exact pairwise cosine join (bounded)
    "q_ngram_jaccard_dedup",      # n-gram Jaccard near-dup (shingle equi-join)
    "q_quality_score",            # textops: pure-Column quality scoring
    "q_word_freq_topk",           # vocab build: explode + partial agg
    "q_cube_pricing",             # CUBE: one Expand, one shuffle
    "q_repetition_stats",         # per-row repetition filters (zero shuffle)
    # round 3 additions:
    "q_tfidf_top_terms",          # two hash aggs + broadcast idf join
    "q_contamination_check",      # shingle semi-join vs benchmark slice
    "q_vocab_oov_rate",           # broadcast vocab + per-doc rollup
    "q_media_inventory",          # Arrow mapInPandas binary decode
    "q_unigram_logprob",          # LM scoring: tf table + bounded-vocab broadcast
    "q_embed_quantize",           # int8 quantization: per-row array math
    # round 4 additions:
    "q_weighted_sample",          # A-ES weighted top-k (TakeOrdered, no sort)
    "q_passage_dedup",            # token-window substring-dedup audit
    "q_quality_classifier",       # hashing-trick linear scorer (1 shuffle)
    "q_pca_projection",           # power iteration: partial-sum-only shuffles
    # round 5 additions:
    "q_bpe_merge_pairs",          # char-pair counts: alphabet²-bounded shuffle
    "q_dedup_survivors_best",     # CC clusters + quality-max survivor window
    "q_ann_bucket_recall",        # bounded exact-top1 vs sign-bit buckets
    "q_bm25_topk",                # sparse keyword ranker (2 hash aggs)
    "q_hybrid_rrf",               # BM25 x cosine reciprocal-rank fusion
    "q_corpus_diff",              # fingerprint-narrow full-outer snapshot diff
    "q_quality_percentile_filter",  # count-above percentile gate per lang
    # round 6 additions (VERDICT r5 #3): every declared query whose sf0.1
    # min-of-2 exceeds ~1 s is in the headline — a constant-cost audit can
    # still regress, so the most expensive queries get regression coverage
    # by construction:
    "q_lsh_recall_audit",         # 6.0 s — most expensive declared query
    "q_dedup_cc_audit",           # 3.5 s — CC vs reachability oracle
    "q_dedup_clusters",           # 3.1 s — production CC clustering
    "q_lsh_pair_recall_audit",    # 2.8 s — LSH pair recall vs exact
    "q_simhash_recall_audit",     # 1.5 s — SimHash pigeonhole recall
    "q_bm25_multi_topk",          # 1.3 s — batched BM25 ranking
    # round 6 additions (new operators over the ~1 s line):
    "q_shard_manifest",           # 1.3 s — distributed prefix-sum sharding
    "q_bpe_train_merges",         # 3.7 s — full BPE merge loop (20 iters)
    "q_split_leakage",            # 1.4 s — cross-split near-dup guard
    "q_line_dedup_scrub",         # 1.2 s — corpus-frequency line scrub
    "q_bpe_encode_corpus",        # 3.1 s — train 10 merges + encode vocab
    "q_edit_severity",            # 1.2 s — graded snapshot-edit census
    # round 7 additions (new operators over the ~1 s line):
    "q_split_leakage_lsh",        # 3.3 s — banded split guard (full corpus)
    "q_leakage_recall_audit",     # cross-split banding recall vs exact
    "q_bpe_step_argmax",          # pinned-fold step-k pair-count argmax
    "q_bpe_encode_pinned",        # Arrow encode kernel, pinned merges
    "q_bpe_pack_ids",             # tokenize→ids→pack composition
    "q_passage_scrub",            # sliding-window passage removal
    # round 9 additions (the >1 s policy, applied to the kmeans family
    # after the matrix-literal assignment rewire — before it these ran
    # 5-6 s and were missing from the headline entirely):
    "q_kmeans_clusters",          # 1.7 s — Lloyd fit + matrix assignment
    "q_ivf_cell_assign",          # 1.5 s — IVF large-k assignment path
    "q_semantic_dedup",           # 2.3 s — SemDeDup within-cluster dedup
    # round 9 policy sweep: ALL remaining declared queries were timed at
    # sf0.1 (fresh JVM, min-of-2) and every one over the ~1 s line joins
    # the headline — this is how the kmeans gap above was found, run to
    # closure. The 57 declared queries not listed here all measured
    # under 1 s.
    "q_winnow_fingerprints",      # 3.6 s — rolling-hash winnowing
    "q_lsh_precision_audit",      # 2.7 s — LSH precision vs exact
    "q_percentile_accuracy_audit",  # 2.7 s — GK sketch vs exact ranks
    "q26b_retrieval_rank_summary",  # 2.8 s — flagship corpus summary
    "q_stats_corr",               # 2.4 s — grouped Pearson corr matrix
    "q21c_percentiles",           # 2.1 s — exact grouped percentiles
    "q_embed_cosine_dedup",       # 2.0 s — embedding-cosine dedup
    "q21d_approx_percentiles",    # 1.4 s — approx-sketch percentile swap
    "q_dup_source_matrix",        # 1.1 s — cross-source dup matrix
    "q_ivf_ann",                  # 1.2 s — IVF ANN probe path
    # round 12 additions (the >1 s policy): the product-quantization
    # family. The deterministic codebook fit (~3 s of m×iters small
    # Lloyd jobs) is memoized per (session, sf_dir) — within one batch
    # JVM only the FIRST q_pq_* key pays it; the others measure their
    # own encode/score stage (registry/vector.py::_pq_books_for):
    "q_pq_codes",                 # 0.3 s (+fit) — Arrow encode kernel
    "q_pq_adc_topk",              # 0.6 s — codes-only ADC top-10
    "q_pq_ann_refined",           # 0.9 s — ADC shortlist + exact refine
    "q_pq_recall_audit",          # 2.8 s — PQ vs exact recall, 2 variants
    "q_pq_train_error",           # 0.6 s — per-subspace quantization error
    "q_pq_residual_adc",          # r13 — residual-ADC top-10 (+cell fit)
    "q_pq_residual_audit",        # r13 — residual vs exact recall, 2 variants
    # round 14 additions (the >1 s policy): the SQ8 scalar-quantization
    # family. The one-scan min/max fit is memoized per (session,
    # sf_dir) like the PQ books — only the first q_sq8_* key pays it.
    # Per-key estimates = the archived BENCH_FULL_latest walls (r15
    # sync, VERDICT r14 #7 — the host's noise band is ±30%, read them
    # as magnitudes):
    "q_sq8_codes",                # 0.3 s (+fit) — affine byte encode kernel
    "q_sq8_topk",                 # 0.8 s — reconstruction-cosine top-10
    "q_sq8_recall_audit",         # 3.7 s — SQ8 vs exact recall, 2 variants
    # the BQ1 binary-quantization family (median fit memoized the same
    # way — only the first q_bq_* key pays its ranked scan):
    "q_bq_codes",                 # 0.3 s (+fit) — packed-word encode kernel
    "q_bq_hamming_topk",          # 0.8 s — integer xor/popcount top-10
    "q_bq_recall_audit",          # 3.4 s — BQ1 vs exact recall, 2 variants
]


def run_one(spark, name: str, sf_dir: str) -> float:
    # cache_scope (VERDICT r5 #8): release operator-internal persists the
    # way a library user sharing the session would — scoped unpersist of
    # exactly the frames this query registered, instead of the blanket
    # spark.catalog.clearCache() a co-tenant workload cannot safely call.
    with cache_scope():
        t0 = time.time()
        df = SPARK_QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        elapsed = time.time() - t0
    return elapsed


def release_accumulated(spark) -> None:
    """Between-queries housekeeping — deliberately NO forced full GC.

    History (VERDICT r6 #5, resolved by bisection): round 6 added a
    ``gc.collect()`` + ``System.gc()`` nudge here to stop the 140-query
    single-JVM sequence from degrading 2-4× late in the run; the r7
    bisect showed the nudge ITSELF was the broad r5→r6 ~1.18× drift —
    a full System.gc() per query taxes the NEXT query ~0.1-0.3 s
    (allocator / code-cache cold start), uniformly across unrelated
    queries. Measured on the r5 36-key subset, same machine, same day,
    isolated JVMs:

        r5 code, its own harness (clearCache only)   31.5 s
        current code + System.gc nudge               34.8 s  ← the drift
        current code, clearCache only                30.7 s  ← drift gone
        (r5-recorded numbers: 29.5 s — the ~4% residual is day noise)

    Batched mode retires the accumulation problem the nudge was written
    for — each fresh JVM runs only ~BATCH_SIZE queries — so this
    reverts to the r5 behavior: release broadcast/localCheckpoint
    blocks via a cache clear, let the JVM GC on its own schedule."""
    spark.catalog.clearCache()


FULL_PAYLOAD_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL_latest.json"
)


def full_payload_path_for_cpus(cpus: int, base_dir: str | None = None) -> str:
    """Per-core-count full-payload file (VERDICT r15 "what's wrong" #1):
    the driver runs the full headline at 32 AND 8 cores, and the second
    run used to clobber BENCH_FULL_latest.json, destroying the 32-core
    per-key detail. Each core count now also writes its own file; the
    legacy "latest" path is kept for tooling that reads it, and
    prev_bench nonce-matches across ALL of them."""
    if base_dir is None:
        base_dir = os.path.dirname(os.path.abspath(__file__))
    return os.path.join(base_dir, f"BENCH_FULL_c{cpus}.json")


def full_payload_candidates(base_dir: str | None = None) -> list[str]:
    import glob

    if base_dir is None:
        base_dir = os.path.dirname(os.path.abspath(__file__))
    paths = [os.path.join(base_dir, os.path.basename(FULL_PAYLOAD_PATH))]
    paths.extend(
        sorted(glob.glob(os.path.join(base_dir, "BENCH_FULL_c*.json")))
    )
    return paths

# Cumulative fresh-JVM anchor walls, per key (VERDICT r14 #2 — shipped
# r15 after two consecutive false "regression" verdicts): the anchor's
# 5-keys-in-one-fresh-JVM walls pay a per-JVM JIT/Arrow/codegen
# warm-up constant the 12-key batched main run amortizes away
# (q_bpe_pack_ids measured 6.2 s fresh vs 3.6 s warm in the SAME r14
# run), so comparing fresh walls against prev's WARM walls trips the
# regression gate on the constant, not the plan. This file keeps each
# key's last CLEAN-host fresh-JVM wall (same regime: ANCHOR_N-key
# fresh-JVM batch, warm-up + min-of-2) so the regression arm can
# compare fresh-to-fresh; it only updates from runs whose own
# contention evidence is clean, so a loaded day can read the baseline
# but never poison it.
ANCHOR_FRESH_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BENCH_ANCHOR_FRESH.json"
)


def anchor_fresh_baseline(base_dir: str | None = None) -> dict[str, float]:
    """Per-key fresh-JVM anchor seconds from the last clean-host
    measurement of each key (empty when never seeded)."""
    if base_dir is None:
        base_dir = os.path.dirname(os.path.abspath(__file__))
    path = os.path.join(base_dir, os.path.basename(ANCHOR_FRESH_PATH))
    try:
        with open(path) as f:
            doc = json.load(f)
        return {k: float(v) for k, v in doc.get("keys", {}).items()}
    except (OSError, json.JSONDecodeError, TypeError, ValueError):
        return {}


def update_anchor_fresh_baseline(
    fresh: dict[str, float],
    cal_factor: float,
    load1_per_cpu: float,
    base_dir: str | None = None,
) -> bool:
    """Fold this run's fresh-JVM walls into the baseline — ONLY when
    the run's own contention evidence is clean (calibration factor and
    loadavg below the anchor-contended gates): a loaded host may
    consult the baseline but never write it. Returns whether the file
    was updated."""
    if cal_factor >= CAL_CONTENDED or load1_per_cpu >= 1.5:
        return False
    if base_dir is None:
        base_dir = os.path.dirname(os.path.abspath(__file__))
    path = os.path.join(base_dir, os.path.basename(ANCHOR_FRESH_PATH))
    keys = anchor_fresh_baseline(base_dir)
    keys.update(
        {k: round(float(v), 3) for k, v in fresh.items() if v is not None}
    )
    try:
        with open(path, "w") as f:
            json.dump(
                {
                    "keys": keys,
                    "regime": f"fresh-JVM batch of <= {ANCHOR_N} keys, "
                    "1 warm-up + min-of-2",
                },
                f,
                indent=1,
                sort_keys=True,
            )
    except OSError:
        return False
    return True


def prev_bench(base_dir: str | None = None) -> tuple[int, dict[str, float]] | None:
    """Latest recorded BENCH_r{N}.json (round number, per-query secs) —
    the anchor for the shared-key subtotal, so round-over-round totals
    compare the SAME query set even as HEADLINE grows.

    The driver keeps only ~2000 bytes of stdout, and at 67 headline
    keys the compact line's per-query dict gets truncated to the 20
    slowest (the r9 artifact) — so bench.py now ALSO writes the full
    fat payload to BENCH_FULL_latest.json on every full-headline run.
    Both the compact line and the full payload carry the same run
    ``nonce``; when they match, the file's complete per-query dict
    replaces the truncated one. (ADVICE r10: the previous
    total-within-20ms heuristic could silently substitute a manual
    re-run's numbers; the nonce is an identity, not a coincidence.
    Pre-r11 artifacts have no nonce — for those only, fall back to
    the total match.)"""
    import glob
    import re

    if base_dir is None:
        base_dir = os.path.dirname(os.path.abspath(__file__))
    best = None
    for path in glob.glob(os.path.join(base_dir, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        if best is None or rnd > best[0]:
            try:
                with open(path) as f:
                    doc = json.load(f)
                # the driver wraps bench.py's JSON line under "parsed"
                parsed = doc.get("parsed", doc)
                best = (rnd, parsed.get("queries", {}), parsed.get("value"),
                        parsed.get("nonce"))
            except (OSError, json.JSONDecodeError, AttributeError):
                continue
    if best is None:
        return None
    rnd, queries, value, nonce = best
    # scan every full-payload file (legacy "latest" + per-core-count) for
    # the one belonging to the SAME run as the driver artifact — the
    # driver's 8-core re-run writes its own BENCH_FULL_c8.json instead of
    # destroying the 32-core record (VERDICT r15 "what's wrong" #1)
    for full_payload_path in full_payload_candidates(base_dir):
        try:
            with open(full_payload_path) as f:
                full = json.load(f)
            same_run = (
                full.get("nonce") == nonce
                if nonce is not None
                # legacy artifacts (pre-nonce): total-proximity heuristic
                else value is not None
                and abs(full.get("value", -1) - value) < 0.02
            )
            if same_run and set(queries) <= set(full.get("queries", {})):
                queries = full["queries"]
                break
        except (OSError, json.JSONDecodeError, TypeError):
            continue
    return rnd, queries


def bench_round(path: str) -> dict[str, float] | None:
    """Per-query min-of-2 seconds recorded in a specific BENCH_r{N}.json
    — reconstructed from the fat payload's "runs" when the compact
    "queries" dict was truncated by the driver's tail capture (the r05
    case)."""
    import re

    try:
        with open(path) as f:
            doc = json.load(f)
    except (OSError, json.JSONDecodeError):
        return None
    parsed = doc.get("parsed") or {}
    if parsed.get("queries"):
        return parsed["queries"]
    tail = doc.get("tail", "")
    m = re.search(r'"runs": (\{.*?\]\}), "run1_total"', tail)
    if not m:
        return None
    try:
        runs = json.loads(m.group(1))
    except json.JSONDecodeError:
        return None
    return {k: min(v) for k, v in runs.items()}


def run_inprocess(keys: list[str], sf_dir: str, sf: float) -> dict:
    """Warm up + time ``keys`` in THIS process's single JVM; returns the
    fat payload (no cross-round comparisons — the caller adds those)."""
    spark = get_spark("bench")
    # Warm-up: run every query once at the TARGET SF so the timed runs
    # measure steady-state execution. Warming at a smaller SF is not
    # enough: AQE picks different plan shapes per input size, so the
    # target-SF codegen classes can still JIT-compile inside the timed
    # run (observed: q26 at 12-15 s cold vs 3.5 s steady-state).
    warmups = int(os.environ.get("SPARK_GRAFT_BENCH_WARMUPS", "1"))
    for _ in range(warmups):
        for name in keys:
            try:
                run_one(spark, name, sf_dir)
            except Exception:
                pass
            release_accumulated(spark)
    # Steady-state timing: min of two timed runs per query (run_one's
    # cache_scope unpersists each query's internal frames on exit, so
    # both runs rebuild them — the min discards transient GC pauses /
    # host-contention outliers).
    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    for name in keys:
        runs[name] = [round(run_one(spark, name, sf_dir), 3) for _ in range(2)]
        timings[name] = min(runs[name])
        release_accumulated(spark)
    return {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        # per-run detail (VERDICT r4): "queries" is min-of-two; "runs"
        # exposes both raw timings so rounds stay comparable to the
        # single-run r1-r3 series (compare runs[0] to those).
        "runs": runs,
        "run1_total": round(sum(r[0] for r in runs.values()), 3),
        "sf": sf,
    }


BATCH_SIZE = 12


def run_batched(keys: list[str], sf_dir: str, sf: float) -> dict:
    """Drift control (VERDICT r6 #5): the one-JVM 48-query sequence was
    the prime suspect for the broad r5→r6 ~1.18× drift (accumulated JVM
    state — code cache, GC history, broadcast/cleaner backlog — taxing
    late queries). Run the headline in cost-ordered batches, each in a
    FRESH python+JVM subprocess (SPARK_GRAFT_BENCH_KEYS subsets this
    same script), and merge. Cost order (cheapest first, by the prior
    round's timings; unknown new queries last) keeps each JVM's
    lifetime workload comparable round-over-round."""
    import subprocess

    prev = prev_bench()
    cost = prev[1] if prev else {}
    ordered = sorted(keys, key=lambda k: (cost.get(k, float("inf")), k))
    batches = [
        ordered[i : i + BATCH_SIZE] for i in range(0, len(ordered), BATCH_SIZE)
    ]
    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    batch_info = []
    for batch in batches:
        env = dict(os.environ)
        env["SPARK_GRAFT_BENCH_KEYS"] = ",".join(batch)
        env["SPARK_GRAFT_BENCH_CHILD"] = "1"
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            capture_output=True,
            text=True,
            env=env,
        )
        line = next(
            (
                ln
                for ln in proc.stdout.splitlines()
                if ln.startswith('{"metric"')
            ),
            None,
        )
        if line is None:
            raise RuntimeError(
                f"bench batch failed: {proc.stderr[-800:]}"
            )
        child = json.loads(line)
        timings.update(child["queries"])
        runs.update(child["runs"])
        batch_info.append(
            {"keys": batch, "total": round(sum(child["queries"].values()), 3)}
        )
    return {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "runs": runs,
        "run1_total": round(sum(r[0] for r in runs.values()), 3),
        "batches": batch_info,
        "sf": sf,
    }


ANCHOR_N = 5
ANCHOR_RATIO = 1.15

# Single-thread calibration spin: steady-state seconds on this host when
# idle (measured 2026-08-15, min-of-3 after a warm pass: 0.77-0.85 s).
# Under host contention the spin shares timeslices and the measured time
# scales with the co-tenant load — a factor >= CAL_CONTENDED means the
# anchor child itself ran on a loaded host and its numbers can't refute
# or confirm a regression (VERDICT r10 #2: r10's anchor produced
# fresh 71.7 >> main 41.1 >> prev 12.4, outside its own decision table,
# exactly because single-shot fresh-JVM timings under load eat
# codegen-compile + contention; the calibration spin makes that state
# self-evident in the artifact instead of needing a judge idle re-run).
CAL_IDLE_SEC = 0.8
CAL_CONTENDED = 2.0

# Multi-core calibration spin (VERDICT r15 "what's wrong" #5): the
# single-thread spin can find one free core on a box whose OTHER 31
# cores are owned by a co-tenant — exactly the load that crushes a
# 32-way local[32] batch — so the two anchor arms disagreed (c32
# "regression" vs c8 "host-load") three rounds running. The MT spin
# runs ncpu threads of cache-resident matmuls; any co-tenant steals
# timeslices from SOME thread and the barrier wall inflates.
# Idle reference measured 2026-08-18 on this 32-core box: min-of-3
# walls 0.77-1.31 s across repeated trials (scheduler jitter band);
# 1.0 s is the center. The band means the MT factor is only a GATE at
# CAL_CONTENDED (2.0x) — never a fine-grained correction.
CAL_MT_IDLE_SEC = 1.0


def calibrate_host_mt(n_threads: int | None = None) -> float:
    """ncpu-thread barrier spin; returns steady wall seconds (min-of-3
    after one warm pass). Compute-bound 192x192 matmuls stay inside L2
    so the idle wall does not depend on memory-bandwidth co-tenancy,
    only on core availability."""
    from concurrent.futures import ThreadPoolExecutor

    import numpy as np

    n = n_threads or os.cpu_count() or 1
    rng = np.random.default_rng(0)
    mats = [rng.random((192, 192)) for _ in range(n)]

    def spin_one(a):
        b = a.copy()
        for _ in range(60):
            b = a @ b
            b /= np.abs(b).max()
        return float(b[0, 0])

    def run() -> float:
        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=n) as ex:
            list(ex.map(spin_one, mats))
        return time.perf_counter() - t0

    run()
    return round(min(run() for _ in range(3)), 3)


def calibrate_host() -> float:
    """Fixed single-thread numpy workload; returns steady seconds
    (min-of-3 after one warm pass — the warm pass eats page-in/BLAS
    init, observed 3.8 s cold vs 0.8 s steady on the idle host)."""
    import numpy as np

    rng = np.random.default_rng(0)
    a = rng.random(2_000_000)

    def spin() -> float:
        t0 = time.perf_counter()
        s = 0.0
        for _ in range(60):
            s = float(np.sqrt(a + s).sum()) / 2_000_000
        return time.perf_counter() - t0

    spin()
    return round(min(spin() for _ in range(3)), 3)


def classify_anchor(
    main_total: float,
    fresh_total: float,
    prev_total: float,
    cal_factor: float,
    load1_per_cpu: float,
) -> str:
    """Machine-readable anchor verdict (VERDICT r10 #1).

    Decision table, in order:
      fresh ~ prev (<=1.3x)          -> "host-load": the fresh idle-style
        re-run lands back near last round, so the main run's drift was
        environment, not the plan.
      anchor itself contended        -> "anchor-contended": calibration
        spin >= CAL_CONTENDED x idle or 1-min loadavg >= 1.5/cpu means
        the fresh numbers were ALSO taken under load and classify
        nothing (the r10 signature: fresh >> main >> prev).
      fresh ~ main, both >> prev     -> "regression": reproducible in a
        fresh JVM on a quiet host — the plan really got slower.
      otherwise                      -> "inconclusive".
    """
    ratio_fresh = fresh_total / prev_total if prev_total else float("inf")
    # 0.5 s absolute slack: sub-second anchor sets can exceed the 1.3x
    # ratio on pure noise without evidencing anything
    if ratio_fresh <= 1.3 or fresh_total - prev_total <= 0.5:
        return "host-load"
    if cal_factor >= CAL_CONTENDED or load1_per_cpu >= 1.5:
        return "anchor-contended"
    if fresh_total >= 0.7 * main_total:
        return "regression"
    return "inconclusive"


def wait_for_idle(
    ncpu: int,
    target_load1_per_cpu: float = 0.15,
    max_wait_sec: float = 120.0,
    poll_sec: float = 5.0,
    _getloadavg=None,
    _sleep=None,
) -> bool:
    """Block (bounded) until the 1-min loadavg drains below
    ``target_load1_per_cpu`` — the anchor's pre-condition. Returns
    whether the target was reached; on timeout the anchor proceeds and
    its recorded loadavg/calibration still witness the contention.
    ``_getloadavg``/``_sleep`` are test seams."""
    getloadavg = _getloadavg or os.getloadavg
    sleep = _sleep or time.sleep
    waited = 0.0
    while getloadavg()[0] / ncpu > target_load1_per_cpu:
        if waited >= max_wait_sec:
            return False
        sleep(poll_sec)
        waited += poll_sec
    return True


def anchor_drifted(
    timings: dict[str, float], prev_queries: dict[str, float], sf_dir: str
) -> dict | None:
    """Idle-anchor protocol (VERDICT r9 #5, hardened r11 per r10 #1): a
    co-tenant driver run must carry its own refutation. After the full
    run, re-time the most drifted shared keys (this/prev ratio >
    ANCHOR_RATIO, worst ANCHOR_N) in ONE fresh JVM via the batch-child
    mechanism (the child warms every key once at the target SF, then
    reports min-of-2 steady-state — see run_inprocess), and report
    main-run vs fresh-JVM numbers side by side WITH contention evidence
    (1-min loadavg before/after, single-thread calibration factor) and
    an explicit ``verdict`` field from classify_anchor's decision
    table. r10's anchor emitted numbers outside its documented
    patterns because the host was loaded during the anchor itself;
    now that state is detected and named rather than left for a judge
    idle re-run. Skipped when nothing drifts past the ratio gate."""
    import subprocess

    drifted = sorted(
        (
            (timings[k] / prev_queries[k], k)
            for k in timings
            if prev_queries.get(k, 0) > 0.3  # sub-noise keys can't anchor
            and timings[k] / prev_queries[k] > ANCHOR_RATIO
        ),
        reverse=True,
    )[:ANCHOR_N]
    if not drifted:
        return None
    keys = [k for _, k in drifted]
    ncpu = os.cpu_count() or 1
    # settle before anchoring (r12): the anchor runs right after the
    # main run's 32-thread batches, and the residual load inflated a
    # quiet-host 1.14x into a 1.75x "regression" verdict (the 5 r12
    # anchor keys re-ran at 2.81 s on a genuinely idle host vs the
    # anchor's 4.33 s ten minutes earlier — same code, same keys). The
    # anchor's entire value is an idle-style measurement, so wait
    # (bounded) for the 1-min loadavg to drain before calibrating.
    settled = wait_for_idle(ncpu)
    load_before = os.getloadavg()
    cal_before = calibrate_host()
    cal_mt_before = calibrate_host_mt()
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env["SPARK_GRAFT_BENCH_KEYS"] = ",".join(keys)
    env["SPARK_GRAFT_BENCH_CHILD"] = "1"
    # the anchor's refutation power rests on the child's warm-up +
    # min-of-2 discipline — pin it against any driver env override
    env["SPARK_GRAFT_BENCH_WARMUPS"] = "1"
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        capture_output=True,
        text=True,
        env=env,
    )
    load_after = os.getloadavg()
    cal_after = calibrate_host()
    cal_mt_after = calibrate_host_mt()
    line = next(
        (ln for ln in proc.stdout.splitlines() if ln.startswith('{"metric"')),
        None,
    )
    if line is None:
        return {"error": proc.stderr[-400:]}
    fresh = json.loads(line)["queries"]
    main_total = round(sum(timings[k] for k in keys), 3)
    fresh_total = round(sum(fresh.get(k, 0.0) for k in keys), 3)
    prev_total = round(sum(prev_queries[k] for k in keys), 3)
    # the combined factor: contended when EITHER spin says so — the ST
    # spin sees a fully-saturated box, the MT spin sees partial co-tenant
    # occupancy the ST spin dodges by finding one free core
    cal_factor = round(
        max(
            max(cal_before, cal_after) / CAL_IDLE_SEC,
            max(cal_mt_before, cal_mt_after) / CAL_MT_IDLE_SEC,
        ),
        2,
    )
    # load_after's 1-min window covers the anchor child's own Spark work
    # (local[32] can legitimately push it to ~1.0/cpu); load_before is
    # the cleaner co-tenant signal, taken after the main run's last
    # child exited but before ours started
    load1_per_cpu = round(load_before[0] / ncpu, 3)
    baseline = anchor_fresh_baseline()
    out = compare_anchor(
        keys, timings, fresh, prev_queries, baseline,
        cal_factor, load1_per_cpu,
    )
    # fold this run's fresh walls into the baseline AFTER comparing
    # against the old one — clean-host gated inside
    out["baseline_updated"] = update_anchor_fresh_baseline(
        {k: fresh.get(k) for k in keys}, cal_factor, load1_per_cpu
    )
    out.update(
        {
            "loadavg_before": [round(x, 2) for x in load_before],
            "loadavg_after": [round(x, 2) for x in load_after],
            "ncpu": ncpu,
            "calibration_sec": {"before": cal_before, "after": cal_after},
            "calibration_mt_sec": {
                "before": cal_mt_before,
                "after": cal_mt_after,
            },
            "calibration_factor_vs_idle": cal_factor,
            "settled_before_anchor": settled,
        }
    )
    return out


def compare_anchor(
    keys: list[str],
    timings: dict[str, float],
    fresh: dict[str, float],
    prev_queries: dict[str, float],
    baseline: dict[str, float],
    cal_factor: float,
    load1_per_cpu: float,
) -> dict:
    """The anchor's verdict arithmetic, pure (seam-tested): totals over
    the drifted keys, plus TWO classifications —

      ``verdict``: fresh-to-fresh (VERDICT r14 #2) — this run's
        fresh-JVM walls against the stored CLEAN-host fresh-JVM walls
        for the same keys (like-for-like: both pay the per-JVM warm-up
        constant), computed over the baseline-covered subset. Falls
        back to the warm arm when no key is covered (cold start:
        baseline never seeded).
      ``verdict_warm_baseline``: the r11-r14 arm (fresh vs prev's warm
        walls) — kept alongside for cross-validation; its known blind
        spot is the warm-up constant (two false "regression" rounds).
    """
    main_total = round(sum(timings[k] for k in keys), 3)
    fresh_total = round(sum(fresh.get(k, 0.0) for k in keys), 3)
    prev_total = round(sum(prev_queries[k] for k in keys), 3)
    warm_verdict = classify_anchor(
        main_total, fresh_total, prev_total, cal_factor, load1_per_cpu
    )
    covered = [k for k in keys if baseline.get(k, 0) > 0]
    out = {
        "keys": {
            k: {
                "main": timings[k],
                "fresh_jvm": fresh.get(k),
                "prev": prev_queries[k],
                "fresh_baseline": baseline.get(k),
            }
            for k in keys
        },
        "main_total": main_total,
        "fresh_total": fresh_total,
        "prev_total": prev_total,
        "n_baseline_covered": len(covered),
        "fresh_baseline_total": None,
        "verdict_warm_baseline": warm_verdict,
    }
    if covered:
        base_cov = round(sum(baseline[k] for k in covered), 3)
        fresh_cov = round(sum(fresh.get(k, 0.0) for k in covered), 3)
        main_cov = round(sum(timings[k] for k in covered), 3)
        out["fresh_baseline_total"] = base_cov
        out["fresh_covered_total"] = fresh_cov
        out["verdict"] = classify_anchor(
            main_cov, fresh_cov, base_cov, cal_factor, load1_per_cpu
        )
    else:
        out["verdict"] = warm_verdict
    return out


def main() -> None:
    import uuid

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    # Key subset (drift experiments / external orchestration): replaces
    # HEADLINE for this invocation, batched or not.
    keys_env = os.environ.get("SPARK_GRAFT_BENCH_KEYS")
    keys = [k for k in keys_env.split(",") if k] if keys_env else list(HEADLINE)
    # Batch child (one fresh JVM): print the fat payload only — the
    # batched parent merges and owns the final compact line.
    if os.environ.get("SPARK_GRAFT_BENCH_CHILD") == "1":
        print(json.dumps(run_inprocess(keys, sf_dir, sf)))
        return
    if os.environ.get("SPARK_GRAFT_BENCH_BATCHED", "1") != "0":
        payload = run_batched(keys, sf_dir, sf)
    else:
        payload = run_inprocess(keys, sf_dir, sf)
    # run identity: the same nonce goes into the compact line (driver
    # artifact) and the full payload file, so prev_bench can prove they
    # are the same run instead of guessing from a float total
    payload["nonce"] = uuid.uuid4().hex[:12]
    payload["cpus"] = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    timings = payload["queries"]
    prev = prev_bench()
    if prev is not None:
        rnd, prev_queries = prev
        shared = sorted(set(timings) & set(prev_queries))
        payload["shared_with_prev"] = {
            "prev_round": rnd,
            "n_shared": len(shared),
            "this_total": round(sum(timings[k] for k in shared), 3),
            "prev_total": round(sum(prev_queries[k] for k in shared), 3),
        }
        # idle-anchor re-run of the most drifted keys, fresh JVMs
        # (default on — the driver's artifact must self-refute drift;
        # SPARK_GRAFT_BENCH_ANCHOR=0 disables for quick local loops)
        if os.environ.get("SPARK_GRAFT_BENCH_ANCHOR", "1") != "0":
            anchor = anchor_drifted(timings, prev_queries, sf_dir)
            if anchor is not None:
                payload["anchor"] = anchor
    # the r5 anchor (VERDICT r6 #5): r5's best-of-2 numbers were the
    # series' fastest; report the shared-key subtotal against them too
    here = os.path.dirname(os.path.abspath(__file__))
    r5 = bench_round(os.path.join(here, "BENCH_r05.json"))
    if r5:
        shared5 = sorted(set(timings) & set(r5))
        payload["shared_with_r5"] = {
            "n_shared": len(shared5),
            "this_total": round(sum(timings[k] for k in shared5), 3),
            "r5_total": round(sum(r5[k] for k in shared5), 3),
        }
    # Fat payload first (per-run detail for humans / SCALING.md) ...
    print(json.dumps(payload))
    # ... persisted in-repo on full-headline runs, so the driver's 2 KB
    # stdout tail can never again lose the per-query detail (see
    # prev_bench) — subset runs skip the write to avoid clobbering the
    # round artifact with partial data
    if keys_env is None:
        for path in (
            FULL_PAYLOAD_PATH,
            full_payload_path_for_cpus(payload["cpus"]),
        ):
            try:
                with open(path, "w") as f:
                    json.dump(payload, f)
            except OSError:
                pass
    # ... then the compact headline line LAST, sized to fit entirely in
    # the driver's 2000-byte stdout tail capture (VERDICT r5 #1): drop
    # "runs", round per-query values to 2dp, and shed the comparison
    # block if the query list ever grows past the budget.
    compact = {
        "metric": payload["metric"],
        "value": payload["value"],
        "unit": payload["unit"],
        "queries": {k: round(v, 2) for k, v in timings.items()},
        "sf": payload["sf"],
        "nonce": payload["nonce"],
    }
    if "shared_with_prev" in payload:
        compact["shared_with_prev"] = payload["shared_with_prev"]
    if "shared_with_r5" in payload:
        compact["shared_with_r5"] = payload["shared_with_r5"]
    if "anchor" in payload and "keys" in payload["anchor"]:
        # tiny summary only — the fat payload carries per-key detail
        compact["anchor"] = {
            "n": len(payload["anchor"]["keys"]),
            "main_total": payload["anchor"]["main_total"],
            "fresh_total": payload["anchor"]["fresh_total"],
            "prev_total": payload["anchor"]["prev_total"],
            "fresh_base": payload["anchor"].get("fresh_baseline_total"),
            "verdict": payload["anchor"]["verdict"],
            "verdict_warm": payload["anchor"].get("verdict_warm_baseline"),
            "cal_factor": payload["anchor"]["calibration_factor_vs_idle"],
        }
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1800:
        compact.pop("shared_with_r5", None)
        line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1800:
        # drop sub-0.3s keys from the per-query dict (their totals are
        # already inside "value" / the shared subtotals; the fat payload
        # and SCALING.md keep full detail) — gentler than losing the
        # round-over-round comparison blocks or whole expensive keys
        compact["queries"] = {
            k: v for k, v in compact["queries"].items() if v >= 0.3
        }
        compact["queries_floor"] = 0.3
        compact["n_queries_total"] = len(timings)
        line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1800:
        compact.pop("shared_with_prev", None)
        line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1800:  # last resort: keep only the 20 slowest queries
        top = dict(sorted(compact["queries"].items(), key=lambda kv: -kv[1])[:20])
        compact["queries"] = top
        compact["queries_truncated_to_slowest"] = 20
        line = json.dumps(compact, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
