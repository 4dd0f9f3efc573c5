"""Persistent incremental IVF index — similarity search's counterpart
of the dedup ``SignatureStore``.

At 100 TB you never re-cluster the historical embedding corpus to make
new vectors searchable: the index at ``path`` persists the trained
centroids (a k×dim artifact, kBs) and the cell-assigned vectors
(``assignments/``: one (vec_id, embedding, cell) row per vector,
appended per batch), so

  * ``add`` costs one broadcast-centroid assignment map over the NEW
    batch only — history untouched;
  * ``query`` probes each query's ``n_probe`` nearest cells and ranks
    only those vectors — an equi-join on cell id, scanning
    ~n_probe/k of the corpus, never all of it;
  * ``compact`` folds the per-batch appends into a bucketed table on
    (cell) via the shared index-maintenance machinery
    (``compact_dedup_index``), so a thousand-batch index keeps a
    bounded file count and the probe join needs no stored-side shuffle
    past the broadcast threshold;
  * ``cell_stats`` reports per-cell occupancy — the drift signal that
    tells an operator when the frozen centroids have stopped fitting
    the data and a re-``build`` is due (the standard IVF maintenance
    trade: adds are cheap because the coarse quantizer is frozen);
  * ``enable_pq`` attaches a product-quantization layer (IVF-PQ, the
    billion-scale shape): enrolled vectors get m-int codes in a
    parallel ``pq_codes/`` component, and ``query(scoring="adc")`` /
    ``"adc_refine"`` probes scan codes instead of float vectors —
    16-64× less candidate I/O, with the refine variant re-scoring the
    top refine·k exactly (see operators/pq.py).

Everything is deterministic: centroids come from ``kmeans_fit``
(md5-seeded, no RNG), assignment is ``assign_clusters``'s argmin with
its tie-break, ranking reuses the 9dp-rounded cosine with id
tie-breaks.

Reference anchor: the reference embeds chunks and brute-force ranks the
whole corpus per query (rag_evaluation/RAG-eval-test_model.py:119-153);
this is the layout that keeps that query answerable when the corpus no
longer fits a scan per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from biodata_pipeline_spark.functions.vector import dot, l2_norm
from biodata_pipeline_spark.operators.dedup import (
    SignatureStore,
    _index_component_frames,
    compact_dedup_index,
)
from biodata_pipeline_spark.operators.kmeans import (
    assign_clusters_kernel,
    kmeans_fit,
)
from biodata_pipeline_spark.operators.pq import (
    PQ_ITERS,
    PQ_M,
    _minus_centroid,
    pq_encode_kernel,
    pq_fit,
    recommended_k_sub,
)
from biodata_pipeline_spark.operators.similarity import SIM_ROUND


def _store_doc_versions(spark, store_path: str, name: str) -> list[int]:
    """Committed versions of a store doc (``{name}_v{n}.json`` under the
    store path), ascending; version 0 stands for a legacy unversioned
    ``{name}.json``. No Spark job — one directory listing."""
    import re

    from biodata_pipeline_spark.operators.dedup import _fs_path

    fs, base = _fs_path(spark, store_path)
    if not fs.exists(base):
        return []
    pat = re.compile(rf"^{re.escape(name)}_v(\d+)\.json$")
    versions = []
    for st in fs.listStatus(base):
        fname = st.getPath().getName()
        m = pat.match(fname)
        if m:
            versions.append(int(m.group(1)))
        elif fname == f"{name}.json":
            versions.append(0)
    return sorted(versions)


def _read_store_doc(spark, store_path: str, name: str) -> dict | None:
    """One small JSON document under the store path, read via the
    filesystem API — no Spark job. Returns None when absent. Store-level
    facts (the PQ books etag, the calibration record) live in these docs
    rather than the compaction meta because ``compact_dedup_index``
    rebuilds its meta fresh on every fold and would silently drop
    foreign keys.

    Docs are versioned single files ``{name}_v{n}.json`` (the
    ``_read_index_meta`` discipline, r13 advice): the read takes the
    HIGHEST committed version, so a writer crash at any point leaves
    the previous doc readable — there is no window where the doc is
    absent and a consumer silently takes a legacy default (the exact
    failure the old delete-then-rename flip allowed: a residual PQ
    store scored as raw PQ, wrong sims, no error). Legacy unversioned
    ``{name}.json`` files from older stores read as version 0."""
    import json

    from biodata_pipeline_spark.operators.dedup import _fs_path

    versions = _store_doc_versions(spark, store_path, name)
    if not versions:
        return None
    v = versions[-1]
    fname = f"{name}.json" if v == 0 else f"{name}_v{v}.json"
    fs, hp = _fs_path(spark, f"{store_path}/{fname}")
    stream = fs.open(hp)
    try:
        text = spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()
    return json.loads(text)


def _write_store_doc(spark, store_path: str, name: str, doc: dict) -> None:
    """Atomic doc replace with NO missing-doc window (r13 advice): write
    ``{name}_v{n+1}.json.tmp``, rename to its final name — a pure rename
    of a NEW name, nothing is deleted first — then best-effort prune the
    superseded versions (and any orphaned ``.tmp``). A crash before the
    rename leaves the old doc current; a crash after it leaves two
    committed versions and the read's highest-version rule picks the new
    one. The old fixed-filename flip had to delete the live doc before
    renaming over it, and a crash in that window silently demoted the
    store to the legacy no-doc path."""
    import json
    import re

    from biodata_pipeline_spark.operators.dedup import _fs_path

    versions = _store_doc_versions(spark, store_path, name)
    new_v = (versions[-1] if versions else 0) + 1
    fs, tmp = _fs_path(spark, f"{store_path}/{name}_v{new_v}.json.tmp")
    _, final = _fs_path(spark, f"{store_path}/{name}_v{new_v}.json")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(json.dumps(doc).encode("utf-8")))
    finally:
        out.close()
    if not fs.rename(tmp, final):
        raise IOError(f"store doc flip failed: {tmp} -> {final}")
    # prune superseded versions + orphaned tmps — storage hygiene only;
    # a failure here never affects what readers see
    fs2, base = _fs_path(spark, store_path)
    pat = re.compile(
        rf"^{re.escape(name)}(_v(\d+))?\.json(\.tmp)?$"
    )
    for st in fs2.listStatus(base):
        fname = st.getPath().getName()
        m = pat.match(fname)
        if not m:
            continue
        v = int(m.group(2)) if m.group(2) else 0
        is_tmp = bool(m.group(3))
        if v < new_v or (is_tmp and v <= new_v):
            fs2.delete(st.getPath(), False)


def _books_etag(books: list[list[list[float]]]) -> str:
    """Content hash of the PQ codebooks — the cross-instance staleness
    guard (r12 advice): a content etag (not a counter) means an
    idempotent retrain on the same corpus keeps caches valid, while ANY
    book change — from this process or another — is detected."""
    import hashlib
    import json

    return hashlib.md5(
        json.dumps(books, separators=(",", ":")).encode()
    ).hexdigest()


def _layer_etag(doc: "dict | None") -> "str | None":
    """Content hash of an SQ8/BQ1 layer doc (bounds / thresholds) —
    ``_books_etag``'s sibling for the layers whose doc IS the codebook.
    None when the layer is absent or disabled, so "layer off" and
    "layer on with these parameters" always fingerprint differently."""
    import hashlib
    import json

    if doc is None or doc.get("disabled"):
        return None
    return hashlib.md5(
        json.dumps(doc, sort_keys=True, separators=(",", ":")).encode()
    ).hexdigest()


# structure_ratio at or above this reads "structure-free": residual
# quantization measured at parity-at-best with raw codes on such
# corpora (the r13 1M uniform arm; fixture + rung measurements in
# SCALING.md r14), so enable_pq(residual=True) warns — k_sub is the
# binding recall lever there, not the residual representation.
STRUCTURE_PARITY_RATIO = 0.8

# Cap on the structure-probe sample when enable_pq trains on the full
# corpus (train_sample=None): the probe's cost must stay bounded even
# when the fit is deliberately unbounded (ADVICE r14). Matches the
# production fit path's 100k md5_top_n operating point.
STRUCTURE_PROBE_CAP = 100_000


def _structure_ratio(
    sample: DataFrame,
    cents: list[list[float]],
    emb_col: str = "emb",
    cell_col: str = "cell",
) -> float | None:
    """Measured cluster-structure signal on the (bounded) training
    sample: RMS of the cell residuals over RMS of the centered corpus —
    ``sqrt( E‖x − centroid(cell)‖² / Σ_i Var(x_i) )`` (VERDICT r13 #3).

    ≪ 1 means the coarse cells absorb most of the spread (real cluster
    structure — residual PQ's measured win case: the same m × k_sub
    budget quantizes a fraction of the spread); ≈ 1 means the cells
    explain almost nothing (structure-free — residual measured at
    parity with raw, SCALING.md r13/r14). Cost: one shuffle of
    sample × dim (i, x, r) rows into ≤ dim groups with map-side
    partial aggregation — the interpreted ``zip_with`` subtract runs
    on the BOUNDED sample only, per the r13 residual-fit discipline.
    Returns None on an empty sample or zero corpus variance (a
    constant corpus has no structure to speak of)."""
    import math

    withr = _minus_centroid(
        sample.select(
            F.col(emb_col).cast("array<double>").alias("__x"),
            F.col(cell_col),
        ),
        cents,
        "__x",
        cell_col=cell_col,
    )
    per_dim = (
        withr.select(
            F.posexplode(
                F.arrays_zip(
                    F.col("__x").alias("x"),
                    F.col("__rvec").alias("r"),
                )
            ).alias("i", "z")
        )
        .groupBy("i")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("z.x")).alias("sx"),
            F.sum(F.col("z.x") * F.col("z.x")).alias("sxx"),
            F.sum(F.col("z.r") * F.col("z.r")).alias("srr"),
        )
        .collect()  # ≤ dim rows — driver-sized by design
    )
    if not per_dim or not per_dim[0]["n"]:
        return None
    n = per_dim[0]["n"]
    corpus_var = sum(r["sxx"] / n - (r["sx"] / n) ** 2 for r in per_dim)
    resid_msq = sum(r["srr"] / n for r in per_dim)
    if corpus_var <= 0:
        return None
    return round(math.sqrt(resid_msq / corpus_var), 4)


def recommended_n_probe(n_cells: int, target_recall: float = 0.9) -> int:
    """Conservative no-measurement n_probe fallback (VERDICT r9 #3).

    Heuristic, not a guarantee (ADVICE r10): on the r10 operating-curve
    sweep (``tools/probe_ann_store.py --sweep``; tables in SCALING.md)
    the probed fraction ``n_probe / n_cells`` EMPIRICALLY held as a
    lower bound on recall@10 at every measured point (k=16: n_probe 8
    → 0.85 vs fraction 0.5, 16 → 1.0; k=64: 32 → 0.945 vs 0.5; k=256:
    32 → 0.65 vs 0.125), because centroid ranking preferentially probes
    the cells that hold a query's near neighbours even on a
    structure-free corpus. It is NOT provable on arbitrary data —
    adversarial placements can leave true neighbours in unprobed cells
    — and ``ceil(target * n_cells)`` is near-exhaustive at high
    targets (0.9 → probing 90% of cells forfeits most of the IVF
    speedup). Use ``measured_n_probe`` to ride the actual per-corpus
    curve: the measured crossing sits far below this fallback (0.9
    reached at 32/64 cells even on uniform synthetics).
    The reference anchor is recall 1.0 semantics (it retrieves with
    k = corpus size, RAG-eval-test_model.py:247-248): target 1.0
    returns n_probe = n_cells, the exhaustive-exact setting."""
    import math

    if not 0.0 < target_recall <= 1.0:
        raise ValueError(f"target_recall must be in (0, 1], got {target_recall}")
    return max(1, min(n_cells, math.ceil(target_recall * n_cells)))


def recommended_scoring(
    pq: "dict | None",
    sq8_attached: bool,
    bq1_attached: bool,
) -> dict:
    """The SCALING.md compression-ladder operating rule as a decision
    the store makes from its MEASURED signals instead of prose
    (VERDICT r14 #4): which ``query(scoring=...)`` an operator should
    ship for this corpus, given what is attached and the
    structure_ratio measured at the last ``enable_pq``.

    The measured ladder behind each branch (1M-rung tables, SCALING.md
    r13/r14): PQ's refined recall holds the target only when the
    coarse cells absorb real spread (structure_ratio ≪ 1 — clustered
    fixture 0.028; refined recall 0.975 at k_sub=256), and collapses
    on structure-free corpora (ratio 0.890 uniform — the regime where
    SQ8 measured recall 1.0 at 8× less scan I/O than float64). BQ1 is
    the cheapest scan (4.8× fewer bytes than PQ codes) but needs its
    refine funnel — 0.17 codes-only vs 0.41+ refined worst-case — so
    alone it ranks with a wide funnel, and next to a higher-resolution
    layer its role is the coarse FIRST pass. Returns ``{"scoring",
    "why"}`` plus ``"coarse_filter": "bq1"`` when a BQ1 layer can
    serve that coarse-first role in front of the primary
    recommendation. Calibrate the funnel widths with ``calibrate()``
    (per-scoring measured refine since r15)."""
    sr = pq.get("structure_ratio") if pq else None
    bq_note = (
        " BQ1 stays attached as the coarse first-pass filter "
        "(coarse_filter)."
        if bq1_attached
        else ""
    )
    if pq and sr is not None and sr < STRUCTURE_PARITY_RATIO:
        out = {
            "scoring": "adc_refine",
            "why": (
                f"measured structure_ratio {sr} < "
                f"{STRUCTURE_PARITY_RATIO}: the coarse cells absorb "
                "most of the spread — PQ's measured win regime "
                "(smallest codes per candidate at target recall; "
                "SCALING.md ladder)." + bq_note
            ),
        }
    elif sq8_attached:
        out = {
            "scoring": "sq8_refine",
            "why": (
                (
                    f"measured structure_ratio {sr} >= "
                    f"{STRUCTURE_PARITY_RATIO} (structure-free): PQ "
                    "measured parity-at-best here while SQ8 held "
                    "near-exact recall at 8x less scan I/O than raw "
                    "(SCALING.md ladder)."
                    if sr is not None
                    else "no measured cluster structure on the books: "
                    "SQ8 is the near-exact default at 8x less scan "
                    "I/O than raw (SCALING.md ladder)."
                )
                + bq_note
            ),
        }
    elif pq and sr is not None:  # structure-free, and no SQ8 to fall to
        out = {
            "scoring": "exact",
            "why": (
                f"measured structure_ratio {sr} >= "
                f"{STRUCTURE_PARITY_RATIO} (structure-free) and no SQ8 "
                "layer attached: the PQ codes measured parity-at-best "
                "in this regime — enable_sq8() for the byte layer, "
                "then re-describe." + bq_note
            ),
        }
    elif pq:  # legacy layer that never measured the signal
        out = {
            "scoring": "adc_refine",
            "why": (
                "PQ attached but structure_ratio unmeasured (legacy "
                "layer): re-run enable_pq() to measure it; until then "
                "adc_refine with a calibrated funnel is the attached "
                "compressed path." + bq_note
            ),
        }
    elif bq1_attached:
        out = {
            "scoring": "bq1_refine",
            "why": (
                "only the 1-bit layer is attached: integer Hamming "
                "scan with a WIDE exact-refine funnel (the funnel is "
                "BQ1's primary recall lever — SCALING.md r14: 0.17 "
                "codes-only vs 0.41+ refined on the worst case); "
                "calibrate() measures the width."
            ),
        }
    else:
        out = {
            "scoring": "exact",
            "why": "no compressed layer attached.",
        }
    if bq1_attached and out["scoring"] != "bq1_refine":
        out["coarse_filter"] = "bq1"
    return out


def measured_n_probe(
    store: "VectorIndexStore",
    queries: DataFrame,
    target_recall: float = 0.9,
    k: int = 10,
    query_id: str = "query_id",
    query_emb: str = "query_emb",
    max_sample: int = 32,
    with_recall: bool = False,
) -> "int | tuple[int, float]":
    """Cheapest n_probe whose MEASURED recall@k on a bounded query
    sample meets ``target_recall`` (VERDICT r10 #4) — the setting a
    user would actually ship, vs ``recommended_n_probe``'s
    near-exhaustive no-measurement fallback. With ``with_recall`` the
    return is ``(n_probe, measured_recall)`` — the number the caller
    persists (``VectorIndexStore.calibrate``) or logs.

    Protocol: take a deterministic ``max_sample``-query slice (ordered
    by ``query_id`` — bounded driver-side state, the centroid-collect
    discipline), compute exact ground truth by probing ALL cells (at
    n_probe = n_cells the IVF ranking IS the exact ranking), then walk
    n_probe up in powers of two measuring micro-averaged recall@k
    (|ivf ∩ truth| / |truth| over the sample) and return the first
    setting at or above target. Per-query recall is monotone
    nondecreasing in n_probe — candidates only grow, and an exact
    top-k member can never be displaced from a candidate-subset top-k
    by items that all rank above it globally (there are < k of those)
    — so the first crossing is the cheapest and the walk terminates at
    n_cells with recall exactly 1.0.

    Cost: O(log n_cells) bounded IVF queries plus one exhaustive pass
    over the sample — a calibration you run once per corpus/store, not
    per query batch."""
    if not 0.0 < target_recall <= 1.0:
        raise ValueError(f"target_recall must be in (0, 1], got {target_recall}")
    spark = queries.sparkSession
    n_cells = len(store.centroids(spark))
    sample = (
        queries.select(query_id, query_emb)
        .orderBy(query_id)
        .limit(max_sample)
        .localCheckpoint()
    )
    truth = (
        store.query(sample, k, n_probe=n_cells,
                    query_id=query_id, query_emb=query_emb)
        .select(query_id, store.id_col)
        .localCheckpoint()  # reused once per sweep step
    )
    n_truth = truth.count()
    if n_truth == 0:
        return (1, 1.0) if with_recall else 1
    n_probe = 1
    while n_probe < n_cells:
        got = store.query(sample, k, n_probe=n_probe,
                          query_id=query_id, query_emb=query_emb)
        hits = truth.join(
            got.select(query_id, store.id_col), [query_id, store.id_col]
        ).count()
        recall = hits / n_truth
        if recall >= target_recall:
            return (n_probe, recall) if with_recall else n_probe
        n_probe = min(n_probe * 2, n_cells)
    # at n_probe = n_cells the IVF ranking IS the ground truth above
    return (n_cells, 1.0) if with_recall else n_cells


# The three refine-funnel scoring paths and, per path, where a
# cap-hit-below-target shortfall actually lives — the advice the cap
# warning names (r15: the funnel calibration covers every compressed
# representation, not just PQ; for BQ1 the funnel IS the primary
# recall lever, so its advice is "widen the funnel" first).
REFINE_SCORINGS = ("adc_refine", "sq8_refine", "bq1_refine")

_REFINE_CAP_ADVICE = {
    "adc_refine": (
        "raising refine further cannot close this; the shortfall lives "
        "in m / k_sub (code resolution): retrain with enable_pq(m=...) "
        "/ enable_pq(k_sub=...) per the SCALING.md grid"
    ),
    "sq8_refine": (
        "the byte reconstruction itself is losing rank information — "
        "check sq_drift() (out-of-bounds clamping after corpus drift) "
        "and re-run enable_sq8 to refit, or score exact"
    ),
    "bq1_refine": (
        "the 1-bit funnel needs more width than the cap allows: raise "
        "max_refine (the funnel is BQ1's primary recall lever — "
        "SCALING.md r14 measured 0.17 codes-only vs 0.41+ refined), or "
        "step up the ladder to sq8/adc scoring"
    ),
}


def measured_refine(
    store: "VectorIndexStore",
    queries: DataFrame,
    scoring: str = "adc_refine",
    target_recall: float = 0.9,
    k: int = 10,
    n_probe: int = 4,
    query_id: str = "query_id",
    query_emb: str = "query_emb",
    max_sample: int = 32,
    max_refine: int = 64,
    with_recall: bool = False,
) -> "int | tuple[int, float]":
    """Cheapest ``refine`` multiplier whose MEASURED recall@k (against
    the exact ranking at the same ``n_probe``) meets ``target_recall``
    on a bounded query sample — ``measured_n_probe``'s sibling for the
    compressed-representation paths (``scoring`` picks which:
    ``adc_refine`` / ``sq8_refine`` / ``bq1_refine``): n_probe prices
    the probe, refine prices the representation, and the two
    calibrations compose (total recall ≈ probe recall × this one).

    Monotonicity (why first crossing = cheapest): the refine·k
    shortlist — ordered by the compressed score, whichever
    representation produced it — only grows with refine, and the final
    top-k is the exact re-ranking of that shortlist; a true top-k
    member in the shortlist can only be displaced by candidates with a
    strictly higher exact sim, which are themselves true top-k members,
    so every shortlisted true hit survives and hits = |shortlist ∩
    exact top-k|, monotone nondecreasing in refine. The argument never
    touches HOW the shortlist was ranked, so it covers all three
    representations identically. The walk doubles refine and
    terminates at ``max_refine`` (a shortlist that saturates the
    probed candidates returns the exact-at-n_probe ranking, recall 1.0
    vs that truth). Cost: O(log max_refine) bounded queries — run once
    per corpus/store, not per query batch. If the measured crossing
    never arrives the cap is returned AND a RuntimeWarning names the
    recall shortfall (r12 advice: a bare ``max_refine`` was
    indistinguishable from "target met exactly at the cap") with
    per-representation advice on where the shortfall lives
    (``_REFINE_CAP_ADVICE``). With ``with_recall`` the return is
    ``(refine, measured_recall)``, the unambiguous programmatic
    form."""
    if scoring not in REFINE_SCORINGS:
        raise ValueError(
            f"measured_refine: scoring must be one of {REFINE_SCORINGS}, "
            f"got {scoring!r}"
        )
    if not 0.0 < target_recall <= 1.0:
        raise ValueError(f"target_recall must be in (0, 1], got {target_recall}")
    sample = (
        queries.select(query_id, query_emb)
        .orderBy(query_id)
        .limit(max_sample)
        .localCheckpoint()
    )
    truth = (
        store.query(sample, k, n_probe=n_probe,
                    query_id=query_id, query_emb=query_emb)
        .select(query_id, store.id_col)
        .localCheckpoint()  # reused once per walk step
    )
    n_truth = truth.count()
    if n_truth == 0:
        return (1, 1.0) if with_recall else 1
    refine = 1
    while True:
        got = store.query(
            sample, k, n_probe=n_probe, scoring=scoring,
            refine=refine, query_id=query_id, query_emb=query_emb,
        )
        hits = truth.join(
            got.select(query_id, store.id_col), [query_id, store.id_col]
        ).count()
        recall = hits / n_truth
        if recall >= target_recall or refine >= max_refine:
            if recall < target_recall:
                import warnings

                warnings.warn(
                    f"measured_refine[{scoring}]: recall {recall:.4f} "
                    f"at the max_refine={max_refine} cap is below the "
                    f"{target_recall} target — "
                    + _REFINE_CAP_ADVICE[scoring],
                    RuntimeWarning,
                    stacklevel=2,
                )
            return (refine, recall) if with_recall else refine
        refine = min(refine * 2, max_refine)


def measured_pq_refine(
    store: "VectorIndexStore",
    queries: DataFrame,
    target_recall: float = 0.9,
    k: int = 10,
    n_probe: int = 4,
    query_id: str = "query_id",
    query_emb: str = "query_emb",
    max_sample: int = 32,
    max_refine: int = 64,
    with_recall: bool = False,
) -> "int | tuple[int, float]":
    """``measured_refine`` at ``scoring="adc_refine"`` — the original
    IVF-PQ form, kept as the named entry point (r12-r14 callers and
    SCALING.md tables reference it)."""
    return measured_refine(
        store, queries, scoring="adc_refine",
        target_recall=target_recall, k=k, n_probe=n_probe,
        query_id=query_id, query_emb=query_emb,
        max_sample=max_sample, max_refine=max_refine,
        with_recall=with_recall,
    )


# Above this many enrolled index rows, query() scores candidates in the
# Arrow kernel instead of the interpreted JVM HOF fold (see query()).
KERNEL_INDEX_THRESHOLD = 100_000


def _score_candidates_kernel(
    cand: DataFrame, query_id: str, id_col: str
) -> DataFrame:
    """Arrow-vectorized cosine scoring of (query, candidate) rows —
    bit-parity twin of ``round(dot(__qe, emb) / (__nq * l2_norm(emb)),
    SIM_ROUND)``: the dot and the candidate norm accumulate
    dimension-by-dimension in ASCENDING order (the identical IEEE-754
    float64 fold), ``sqrt`` is IEEE-exact, the denominator multiplies
    ``__nq * nc`` before the divide exactly as the JVM expression does,
    and the 9dp rounding stays JVM-side (numpy would round half-even
    where Spark rounds half-up). Input rows carry
    (query_id, id, __qe, __nq, emb); output (query_id, id, sim)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    in_fields = {f.name: f for f in cand.schema.fields}
    out_schema = StructType(
        [
            in_fields[query_id],
            in_fields[id_col],
            StructField("__sim_raw", DoubleType()),
        ]
    )

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                yield pd.DataFrame(
                    {query_id: pdf[query_id], id_col: pdf[id_col],
                     "__sim_raw": pd.Series([], dtype="float64")}
                )
                continue
            qe = np.array(pdf["__qe"].tolist(), dtype=np.float64)
            emb = np.array(pdf["emb"].tolist(), dtype=np.float64)
            n = len(pdf)
            s, nc = np.zeros(n), np.zeros(n)
            for i in range(emb.shape[1]):  # ascending-dim: JVM bit-parity
                s += qe[:, i] * emb[:, i]
                nc += emb[:, i] * emb[:, i]
            sim = s / (pdf["__nq"].to_numpy() * np.sqrt(nc))
            yield pd.DataFrame(
                {query_id: pdf[query_id], id_col: pdf[id_col],
                 "__sim_raw": sim}
            )

    return (
        cand.select(query_id, id_col, "__qe", "__nq", "emb")
        .mapInPandas(score, out_schema)
        .select(
            query_id, id_col,
            F.round(F.col("__sim_raw"), SIM_ROUND).alias("sim"),
        )
    )


def _score_candidates_pq_kernel(
    cand: DataFrame, query_id: str, id_col: str,
    codebooks: list[list[list[float]]],
) -> DataFrame:
    """Arrow ADC scoring of (query, candidate-codes) rows — the IVF-PQ
    probe's scorer: candidates arrive as ``m`` small ints, the codeword
    rows are gathered from the broadcast codebook array, and the cosine
    estimate accumulates per subspace in the engine's subspace-grouped
    IEEE-754 fold (bit-equal to ``pq.pq_adc_scores`` / the LUT kernel —
    see operators/pq.py for why the grouping is pinned). Rounding stays
    JVM-side. Input rows carry (query_id, id, __qe, __nq, codes);
    output (query_id, id, sim)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    m = len(codebooks)
    sd = len(codebooks[0][0])
    C = np.array(codebooks, dtype=np.float64)  # (m, k_sub, sd)
    in_fields = {f.name: f for f in cand.schema.fields}
    out_schema = StructType(
        [
            in_fields[query_id],
            in_fields[id_col],
            StructField("__sim_raw", DoubleType()),
        ]
    )

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                yield pd.DataFrame(
                    {query_id: pdf[query_id], id_col: pdf[id_col],
                     "__sim_raw": pd.Series([], dtype="float64")}
                )
                continue
            qe = np.array(pdf["__qe"].tolist(), dtype=np.float64)
            cd = np.array(pdf["codes"].tolist(), dtype=np.int64)
            n = len(pdf)
            s, cn = np.zeros(n), np.zeros(n)
            for j in range(m):  # subspace order = the grouped fold
                crow = C[j, cd[:, j], :]  # (n, sd) gathered codewords
                sj, nj = np.zeros(n), np.zeros(n)
                for i in range(sd):  # ascending-dim: JVM bit-parity
                    sj += qe[:, j * sd + i] * crow[:, i]
                    nj += crow[:, i] * crow[:, i]
                s += sj
                cn += nj
            sim = s / (pdf["__nq"].to_numpy() * np.sqrt(cn))
            yield pd.DataFrame(
                {query_id: pdf[query_id], id_col: pdf[id_col],
                 "__sim_raw": sim}
            )

    return (
        cand.select(query_id, id_col, "__qe", "__nq", "codes")
        .mapInPandas(score, out_schema)
        .select(
            query_id, id_col,
            F.round(F.col("__sim_raw"), SIM_ROUND).alias("sim"),
        )
    )


def _score_candidates_rpq_kernel(
    cand: DataFrame, query_id: str, id_col: str,
    codebooks: list[list[list[float]]],
    centroids: list[list[float]],
) -> DataFrame:
    """Residual-ADC twin of ``_score_candidates_pq_kernel`` (round 13):
    candidates additionally carry ``cell``, and the estimate
    reconstructs cos(q, centroid[cell] + Σ_j row_j) with the
    centroid-extended grouped fold of ``pq.pq_residual_scores`` —
    numerator: the in-order q·centroid dot first, then the subspace
    partials in order; denominator: the centroid norm, the 2·cross
    terms in subspace order, then the row norms — so sims are bit-equal
    to the declarative form and the LUT kernel. Input rows carry
    (query_id, id, __qe, __nq, cell, codes); output (query_id, id, sim)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    m = len(codebooks)
    sd = len(codebooks[0][0])
    dim = m * sd
    C = np.array(codebooks, dtype=np.float64)  # (m, k_sub, sd)
    CC = np.array(centroids, dtype=np.float64)  # (k_cells, dim)
    in_fields = {f.name: f for f in cand.schema.fields}
    out_schema = StructType(
        [
            in_fields[query_id],
            in_fields[id_col],
            StructField("__sim_raw", DoubleType()),
        ]
    )

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                yield pd.DataFrame(
                    {query_id: pdf[query_id], id_col: pdf[id_col],
                     "__sim_raw": pd.Series([], dtype="float64")}
                )
                continue
            qe = np.array(pdf["__qe"].tolist(), dtype=np.float64)
            cd = np.array(pdf["codes"].tolist(), dtype=np.int64)
            cg = CC[pdf["cell"].to_numpy(dtype=np.int64)]  # (n, dim)
            n = len(pdf)
            s, d = np.zeros(n), np.zeros(n)
            for i in range(dim):  # numerator starts at the q·cent dot
                s += qe[:, i] * cg[:, i]
            for i in range(dim):
                d += cg[:, i] * cg[:, i]
            rows = [C[j, cd[:, j], :] for j in range(m)]  # (n, sd) each
            for j in range(m):  # subspace order = the grouped fold
                sj = np.zeros(n)
                for i in range(sd):  # ascending-dim: JVM bit-parity
                    sj += qe[:, j * sd + i] * rows[j][:, i]
                s += sj
            for j in range(m):
                crj = np.zeros(n)
                for i in range(sd):
                    crj += cg[:, j * sd + i] * rows[j][:, i]
                d += 2.0 * crj
            for j in range(m):
                nj = np.zeros(n)
                for i in range(sd):
                    nj += rows[j][:, i] * rows[j][:, i]
                d += nj
            sim = s / (pdf["__nq"].to_numpy() * np.sqrt(d))
            yield pd.DataFrame(
                {query_id: pdf[query_id], id_col: pdf[id_col],
                 "__sim_raw": sim}
            )

    return (
        cand.select(query_id, id_col, "__qe", "__nq", "cell", "codes")
        .mapInPandas(score, out_schema)
        .select(
            query_id, id_col,
            F.round(F.col("__sim_raw"), SIM_ROUND).alias("sim"),
        )
    )


def _score_candidates_sq_kernel(
    cand: DataFrame, query_id: str, id_col: str, bounds: dict
) -> DataFrame:
    """Arrow SQ8 scoring of (query, candidate-codes) rows — the byte
    probe's scorer (round 14): candidates arrive as dim uint8 codes,
    the midpoint decode ``mn + (c + ½)·rg/256`` runs in the same
    float64 ops as the declarative ``sq_decode`` expression, and the
    cosine accumulates dimension-by-dimension in ASCENDING order (the
    ``_score_candidates_kernel`` bit-parity fold) against the exact
    query side. Rounding stays JVM-side. Input rows carry
    (query_id, id, __qe, __nq, codes); output (query_id, id, sim)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    mn = np.array(bounds["vmin"], dtype=np.float64)
    rg = np.array(
        [hi - lo for lo, hi in zip(bounds["vmin"], bounds["vmax"])],
        dtype=np.float64,
    )
    dim = len(mn)
    in_fields = {f.name: f for f in cand.schema.fields}
    out_schema = StructType(
        [
            in_fields[query_id],
            in_fields[id_col],
            StructField("__sim_raw", DoubleType()),
        ]
    )

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                yield pd.DataFrame(
                    {query_id: pdf[query_id], id_col: pdf[id_col],
                     "__sim_raw": pd.Series([], dtype="float64")}
                )
                continue
            qe = np.array(pdf["__qe"].tolist(), dtype=np.float64)
            cd = np.array(pdf["codes"].tolist(), dtype=np.float64)
            recon = mn + (cd + 0.5) * rg / 256.0  # sq_decode, exactly
            n = len(pdf)
            s, nc = np.zeros(n), np.zeros(n)
            for i in range(dim):  # ascending-dim: JVM bit-parity
                s += qe[:, i] * recon[:, i]
                nc += recon[:, i] * recon[:, i]
            sim = s / (pdf["__nq"].to_numpy() * np.sqrt(nc))
            yield pd.DataFrame(
                {query_id: pdf[query_id], id_col: pdf[id_col],
                 "__sim_raw": sim}
            )

    return (
        cand.select(query_id, id_col, "__qe", "__nq", "codes")
        .mapInPandas(score, out_schema)
        .select(
            query_id, id_col,
            F.round(F.col("__sim_raw"), SIM_ROUND).alias("sim"),
        )
    )


def _score_candidates_bq_kernel(
    cand: DataFrame, query_id: str, id_col: str, thresholds: dict
) -> DataFrame:
    """Arrow BQ1 scoring of (query, candidate-words) rows — the binary
    probe's scorer (round 14): candidates arrive as dim/32 packed
    words, the query side packs under the SAME thresholds inside the
    kernel (symmetric encoding, float comparisons + exact integer
    packing — bit-parity with bq_encode by construction), and the
    score is the normalized Hamming similarity ``(dim − h) / dim`` —
    h and dim are exact integers and dim is a power of two, so the
    division itself is exact; rounding stays JVM-side (house style).
    Input rows carry (query_id, id, __qe, __nq, words); output
    (query_id, id, sim). ``__nq`` rides along unused — Hamming needs
    no norms — keeping the candidate shape shared with every other
    scorer."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    from biodata_pipeline_spark.operators.bq import BQ_WORD_BITS, _pop8

    thr = np.array(thresholds["thr"], dtype=np.float64)
    dim = len(thr)
    n_words = dim // BQ_WORD_BITS
    pow2 = (np.int64(1) << np.arange(BQ_WORD_BITS, dtype=np.int64))
    pop8 = _pop8()
    in_fields = {f.name: f for f in cand.schema.fields}
    out_schema = StructType(
        [
            in_fields[query_id],
            in_fields[id_col],
            StructField("__sim_raw", DoubleType()),
        ]
    )

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                yield pd.DataFrame(
                    {query_id: pdf[query_id], id_col: pdf[id_col],
                     "__sim_raw": pd.Series([], dtype="float64")}
                )
                continue
            qe = np.array(pdf["__qe"].tolist(), dtype=np.float64)
            qbits = (qe > thr).astype(np.int64)
            qw = np.stack(
                [
                    qbits[:, w * BQ_WORD_BITS:(w + 1) * BQ_WORD_BITS] @ pow2
                    for w in range(n_words)
                ],
                axis=1,
            )
            vw = np.array(pdf["words"].tolist(), dtype=np.int64)
            x = np.bitwise_xor(qw, vw)
            h = pop8[x.view(np.uint8)].reshape(len(pdf), -1).sum(axis=1)
            yield pd.DataFrame(
                {query_id: pdf[query_id], id_col: pdf[id_col],
                 "__sim_raw": (dim - h) / float(dim)}
            )

    return (
        cand.select(query_id, id_col, "__qe", "words")
        .mapInPandas(score, out_schema)
        .select(
            query_id, id_col,
            F.round(F.col("__sim_raw"), SIM_ROUND).alias("sim"),
        )
    )


def _assign_cells(
    df: DataFrame,
    cents: list[list[float]],
    emb_col: str,
) -> DataFrame:
    """Nearest-centroid assignment built for LARGE k — since r9 the
    engine-wide bulk path ``kmeans.assign_clusters_kernel`` (this
    module's matrix-literal fold seeded the family: at k=64 the
    unrolled per-centroid chains cost ~50 s of codegen compile,
    measured by tools/probe_ann_store.py; the Arrow kernel then beat
    the fold 3-10× at 200k vectors). Decision-identical to
    ``assign_clusters``: argmin of the UNROUNDED in-order float64
    squared-L2 fold (rounding before the argmin would flip assignments
    whose two nearest centroids differ by <0.5e-6 — ADVICE r9; parity
    is pytest-pinned), ties → lowest index; null embeddings excluded
    (the geometry contract). Adds ``cluster``."""
    return assign_clusters_kernel(df, cents, emb_col=emb_col)


def _fit_quantizer(
    df: DataFrame,
    k: int,
    iters: int,
    id_col: str,
    emb_col: str,
) -> list[list[float]]:
    """Lloyd's loop with the large-k assignment path — identical to
    ``kmeans_fit`` now that the fit iterates through the Arrow
    assignment kernel everywhere; kept as the store's internal name."""
    return kmeans_fit(df, k, iters, id_col, emb_col)


class VectorIndexStore:
    """Persistent IVF state under ``path``: ``centroids/`` (the trained
    coarse quantizer) + ``assignments/`` (cell-assigned vectors,
    appended per batch, compactable)."""

    def __init__(self, path: str, id_col: str = "vec_id",
                 emb_col: str = "embedding"):
        self.path = path
        self.id_col, self.emb_col = id_col, emb_col
        # query()'s kernel-gate row count, cached per instance: index
        # size only changes on add/compact, so re-counting every query()
        # call paid one Spark job per index part per call (ADVICE r11).
        # Invalidated by add()/compact(); an out-of-band writer to the
        # same path from ANOTHER instance/process is outside this
        # cache's contract (the gate only picks a scoring path — a stale
        # count degrades throughput on one call, never correctness).
        self._n_rows_cache: int | None = None
        # trained PQ codebooks, read once per instance (m×k_sub rows —
        # driver-sized by design, like the coarse quantizer); refreshed
        # by enable_pq(). Unlike the row-count gate, a stale entry here
        # would change RESULTS (old books scoring new codes), so every
        # ``_pq_books`` call validates the cache against the persisted
        # content etag (``pq_etag.json`` — one tiny FS read, no Spark
        # job) and reloads on mismatch: a re-enable from ANOTHER
        # instance/process can no longer make this instance silently
        # encode or score under retired books (r12 advice).
        self._pq_cache: list[list[list[float]]] | None = None
        self._pq_cache_etag: str | None = None
        # whether the cached books quantize residuals (persisted in the
        # same pq_etag doc; False for legacy stores without the doc)
        self._pq_cache_residual: bool = False

    # -- build / maintain -------------------------------------------------
    def build(
        self,
        vecs: DataFrame,
        k: int = 16,
        iters: int = 4,
        batch_id: str | None = "build",
        train_sample: int | None = None,
    ) -> list[list[float]]:
        """Train the coarse quantizer on ``vecs`` and enroll them as the
        index's first batch. Overwrites any previous centroids — a
        rebuild invalidates stored assignments, so it also expects the
        caller to start from a fresh ``path`` (asserted). The default
        enrollment label is the non-numeric ``"build"``: streaming
        epochs count 0, 1, 2, ... and a numeric default collided with
        epoch 0 — the stream's first microbatch would silently
        partition-overwrite the entire initial enrollment (caught by
        the vector-ingest streaming test).

        ``train_sample`` is the 100 TB shape: Lloyd's loop iterates
        ``iters`` times, and running every iteration over the full
        corpus re-scans 100 TB per iteration for a quantizer whose
        quality saturates at a bounded training set (FAISS trains IVF
        coarse quantizers on ~max(10k, 50·k) points for exactly this
        reason). With ``train_sample=n`` the full corpus is scanned
        ONCE for a deterministic sample — the n rows with the smallest
        ``(md5(id), id)``, the same order-stable rule as
        ``seed_centroids``, a distributed partial top-n, no RNG — the
        sample is cached and the merge loop iterates over it alone;
        only the final enrollment assignment touches every vector
        (unavoidable: each one needs a cell). Queries stay exactly as
        correct — candidate scoring is exact cosine regardless of where
        the centroids came from; n_probe=k remains exhaustive-exact —
        only cell-boundary placement (recall at small n_probe) can
        differ, measured by tools/probe_ann_store.py's recall ladder.
        """
        spark = vecs.sparkSession
        if train_sample is not None:
            from biodata_pipeline_spark.operators.sampling import (
                md5_top_n,
            )

            # bounded-merge selection (r14): identical rows to the old
            # orderBy(md5, id).limit(n), but the TakeOrdered driver
            # merge no longer grows with corpus size × partition count
            sample = md5_top_n(
                vecs.filter(F.col(self.emb_col).isNotNull())
                .select(self.id_col, self.emb_col),
                train_sample,
                self.id_col,
            ).persist()  # Lloyd re-reads it iters+1 times; bounded rows
            try:
                cents = _fit_quantizer(
                    sample, k, iters, self.id_col, self.emb_col
                )
            finally:
                sample.unpersist()
        else:
            cents = _fit_quantizer(
                vecs, k, iters, self.id_col, self.emb_col
            )
        spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
            "cell int, centroid array<double>",
        ).coalesce(1).write.mode("error").parquet(f"{self.path}/centroids")
        self.add(vecs, batch_id=batch_id)
        return cents

    def centroids(self, spark) -> list[list[float]]:
        from biodata_pipeline_spark.operators.dedup import _is_store_missing

        try:
            rows = (
                spark.read.parquet(f"{self.path}/centroids")
                .orderBy("cell")
                .collect()
            )  # k rows — the coarse quantizer is driver-sized by design
        except AnalysisException as e:
            if _is_store_missing(e):
                raise ValueError(
                    f"no index at {self.path}: build() trains the coarse "
                    "quantizer before add/query can run"
                ) from e
            raise
        return [list(r.centroid) for r in rows]

    def add(self, vecs: DataFrame, batch_id: str | None = None) -> int:
        """Assign NEW vectors to their nearest stored centroid and
        append them — one broadcast-assignment map, no history read.
        ``batch_id`` gives the same per-batch idempotent overwrite as
        the dedup index. Returns rows enrolled (null embeddings are
        excluded by the assignment's geometry contract)."""
        spark = vecs.sparkSession
        cents = self.centroids(spark)
        assigned = _assign_cells(vecs, cents, self.emb_col).select(
            F.col(self.id_col).alias("id"),
            F.col(self.emb_col).cast("array<double>").alias("emb"),
            F.col("cluster").alias("cell"),
        ).localCheckpoint()  # materialize before mutating the store
        if batch_id is None:
            assigned.write.mode("append").parquet(f"{self.path}/assignments")
        else:
            SignatureStore._write_batch(
                spark, assigned, f"{self.path}/assignments", batch_id
            )
        if self.pq_enabled(spark):
            # same batch_id for both components: a crash between the two
            # writes is repaired by REPLAYING the batch (the store-wide
            # idempotent-overwrite contract) — until then the ADC path
            # simply lacks this batch's candidates while the exact path
            # has them; never a wrong result, only a visibly thinner
            # approximate index.
            books = self._pq_books(spark)  # also refreshes the residual flag
            coded = pq_encode_kernel(
                assigned, books, emb_col="emb",
                centroids=cents if self._pq_cache_residual else None,
            ).select("id", "cell", "codes")
            if batch_id is None:
                coded.write.mode("append").parquet(f"{self.path}/pq_codes")
            else:
                SignatureStore._write_batch(
                    spark, coded, f"{self.path}/pq_codes", batch_id
                )
        if self.sq_enabled(spark):
            # same crash contract as the PQ block above: a missing
            # batch in sq_codes/ is a thinner byte index, repaired by
            # replaying the batch. Values beyond the fitted bounds
            # clamp to 0/255 (the SQ drift semantics — enable_sq8
            # refits when it matters).
            from biodata_pipeline_spark.operators.sq import (
                sq_encode_kernel,
            )

            sq_coded = sq_encode_kernel(
                assigned, self._sq_bounds(spark),
                emb_col="emb", codes_col="codes",
            ).select("id", "cell", "codes")
            if batch_id is None:
                sq_coded.write.mode("append").parquet(
                    f"{self.path}/sq_codes"
                )
            else:
                SignatureStore._write_batch(
                    spark, sq_coded, f"{self.path}/sq_codes", batch_id
                )
        if self.bq_enabled(spark):
            # same crash contract again: a missing batch in bq_words/
            # is a thinner binary index, repaired by replaying the
            # batch. New data encodes under the FITTED thresholds (a
            # drifted corpus just biases bits toward one side — re-run
            # enable_bq to refit when it matters).
            from biodata_pipeline_spark.operators.bq import (
                bq_encode_kernel,
            )

            bq_coded = bq_encode_kernel(
                assigned, self._bq_thresholds(spark),
                emb_col="emb", words_col="words",
            ).select("id", "cell", "words")
            if batch_id is None:
                bq_coded.write.mode("append").parquet(
                    f"{self.path}/bq_words"
                )
            else:
                SignatureStore._write_batch(
                    spark, bq_coded, f"{self.path}/bq_words", batch_id
                )
        self._n_rows_cache = None  # index grew: re-count at next query()
        return assigned.count()

    # -- product quantization (the code-compressed probe path) -------------
    def pq_enabled(self, spark) -> bool:
        from biodata_pipeline_spark.operators.dedup import _fs_path

        fs, hp = _fs_path(spark, f"{self.path}/pq/codebooks")
        return bool(fs.exists(hp))

    def enable_pq(
        self,
        spark,
        m: int = PQ_M,
        k_sub: int | None = None,
        iters: int = PQ_ITERS,
        train_sample: int | None = None,
        residual: bool = False,
    ) -> int:
        """Attach a PQ layer: train ``m`` per-subspace codebooks on the
        enrolled live corpus (bounded by ``train_sample`` at scale, the
        coarse-quantizer discipline), encode every live vector, and
        persist ``pq/codebooks`` + ``pq_codes/`` (batch semantics
        identical to ``assignments/``). From here ``add`` encodes each
        new batch on enroll and ``query(scoring="adc"/"adc_refine")``
        scans m-int codes instead of dim-float vectors — at 100 TB the
        probe's candidate I/O shrinks 16-64×, which is the point.
        Re-running retrains and fully re-encodes (idempotent).
        Returns vectors encoded. Tombstoned ids are excluded from
        training and encoding; codes for ids removed LATER are masked
        by the same read-time anti-join as everything else and fold out
        at compaction.

        ``k_sub=None`` (the default) resolves size-aware via
        ``recommended_k_sub(live rows)``: 256 — FAISS's 8-bit standard,
        the measured 1M operating point (refined recall 0.975 vs 0.615
        at k_sub=16, SCALING.md) — once the corpus clears
        ``KSUB_BYTE_CODE_ROWS``, else 16. Pass k_sub explicitly to pin
        a representation across growth.

        ``residual=True`` quantizes each vector's RESIDUAL against its
        cell centroid (FAISS IndexIVFPQ's encode_residual form — within
        a cell the residual spread is a fraction of the corpus spread,
        so the same m × k_sub budget buys finer resolution; measured at
        the 1M rung in SCALING.md r13). The flag persists with the
        books' etag, every later ``add`` encodes residuals, and
        ``query(scoring="adc"/"adc_refine")`` scores with the
        centroid-extended grouped fold (``pq.pq_residual_scores``'s
        bit-parity contract)."""
        from biodata_pipeline_spark.operators.dedup import _fs_path

        cents = self.centroids(spark)  # raises if the store is missing
        dim = len(cents[0])
        parts = _index_component_frames(spark, self.path, "assignments")
        full = parts[0].select("id", "emb", "cell")
        for p in parts[1:]:
            full = full.unionByName(p.select("id", "emb", "cell"))
        live = self._minus_tombstones(
            spark, full.dropDuplicates(["id"])
        )
        if k_sub is None:
            # size-aware default (VERDICT r13 #2, the m-fix one knob
            # later): the byte-code arm once the live corpus clears the
            # measured rung where 4-bit codes stop holding target
            # recall — the store picks the production operating point
            # instead of leaving it in SCALING.md prose. An explicit
            # k_sub always wins (the declared registry family pins 16:
            # its oracle replays every Lloyd chain).
            k_sub = recommended_k_sub(live.count())
        # ONE bounded training sample serves the codebook fit and the
        # structure probe. Sampling before pq_fit's validity filter is
        # row-identical to the old sample-inside-pq_fit order: enrolled
        # rows passed the geometry contract at add(), so the filter is
        # a no-op on store rows (the r13 residual path set the
        # precedent). The interpreted zip_with subtract stays off every
        # full-corpus pass: only the bounded sample is subtracted here;
        # the full-corpus ENCODE below fuses the subtraction into the
        # Arrow kernel (bit-identical: the same correctly-rounded
        # float64 op on the same operands is deterministic). Before
        # these moves a residual attach cost 5× the raw one at the 1M
        # rung (SCALING r13); the sample selection itself rides
        # md5_top_n's bounded-merge path (r14).
        from biodata_pipeline_spark.operators.sampling import md5_top_n

        sample = (
            live
            if train_sample is None
            else md5_top_n(live, train_sample, "id")
        ).persist()  # structure probe + m×(1+iters) Lloyd passes
        try:
            # The structure probe is ALWAYS bounded (ADVICE r14): with
            # train_sample=None the fit deliberately uses the full
            # corpus, but the probe's interpreted zip_with subtract +
            # corpus×dim posexplode shuffle must not ride along as a
            # full-corpus pass — cap it at the same 100k deterministic
            # sample the production fit path uses. The ratio is a
            # variance RATIO: the md5_top_n sample is
            # content-hash-uniform, so the capped estimate tracks the
            # full-corpus value (fixture-pinned in tests).
            probe_src = (
                sample
                if train_sample is not None
                else md5_top_n(live, STRUCTURE_PROBE_CAP, "id")
            )
            structure = _structure_ratio(probe_src, cents)
            if (
                residual
                and structure is not None
                and structure >= STRUCTURE_PARITY_RATIO
            ):
                import warnings

                warnings.warn(
                    f"enable_pq(residual=True) on a structure-free "
                    f"corpus (structure_ratio {structure} >= "
                    f"{STRUCTURE_PARITY_RATIO}: the coarse cells "
                    "explain almost none of the spread) — residual "
                    "codes measured at parity-at-best with raw here; "
                    "k_sub is the binding recall lever (SCALING.md "
                    "r13/r14)",
                    RuntimeWarning,
                    stacklevel=2,
                )
            fit_src = (
                _minus_centroid(sample, cents, "emb", cell_col="cell")
                if residual
                else sample
            )
            enc_col = "__rvec" if residual else "emb"
            books = pq_fit(
                fit_src.select(
                    F.col("id").alias(self.id_col),
                    F.col(enc_col).alias(self.emb_col),
                ),
                m=m, k_sub=k_sub, iters=iters,
                id_col=self.id_col, emb_col=self.emb_col,
                dim=dim, train_sample=None,
            )
        finally:
            sample.unpersist()
        rows = [
            (j, c, [float(x) for x in books[j][c]])
            for j in range(m)
            for c in range(k_sub)
        ]
        coded = pq_encode_kernel(
            live, books, emb_col="emb",
            centroids=cents if residual else None,
        ).select(
            "id", "cell", "codes"
        ).localCheckpoint()  # materialize BEFORE any store mutation
        n = coded.count()
        # Mutation order makes every crash window VISIBLE, never
        # silently wrong: (1) retire ALL old code state FIRST — old
        # codes under NEW codebooks would score garbage sims without
        # any error, so the codes must go dark before the books can
        # change (an ADC query in the window raises "no PQ codes", the
        # recovery is re-running enable_pq, which is idempotent);
        # (2) overwrite the codebooks; (3) write the fresh full encode
        # (supersedes any per-batch deltas from earlier adds). A crash
        # mid-(3) leaves a partial batch — consistent with the new
        # books, just thinner — repaired by the same re-run, the
        # store-wide replay contract.
        #
        # "All old code state" includes the COMPACTED pq_codes table
        # when a compaction ran since the last enable (r12 review: the
        # delta-dir delete alone left the compacted table live in the
        # meta, so a retrain-after-compact gave every previously
        # enrolled id two CONFLICTING code rows and dropDuplicates
        # picked an arbitrary survivor). See _retire_codes_component
        # for the retirement order (shared with enable_sq8 since r14).
        self._retire_codes_component(spark, "pq_codes")
        spark.createDataFrame(
            rows, "sub int, code int, centroid array<double>"
        ).coalesce(1).write.mode("overwrite").parquet(
            f"{self.path}/pq/codebooks"
        )
        SignatureStore._write_batch(
            spark, coded, f"{self.path}/pq_codes", "pq_enable"
        )
        etag = _books_etag(books)
        _write_store_doc(
            spark, self.path, "pq_etag",
            {
                "etag": etag,
                "residual": bool(residual),
                # the measured structure signal the residual operating
                # rule depends on (VERDICT r13 #3) — persisted so
                # describe() can surface it without re-measuring
                "structure_ratio": structure,
            },
        )
        # the books changed: any persisted refine calibration measured
        # against the old codes is void — recorded by fingerprint drift
        # (calibrate() compares books_etag), nothing to delete here
        self._pq_cache = books
        self._pq_cache_etag = etag
        self._pq_cache_residual = bool(residual)
        return n

    def _pq_books(self, spark) -> list[list[list[float]]]:
        doc = _read_store_doc(spark, self.path, "pq_etag")
        current = doc["etag"] if doc else None
        self._pq_cache_residual = bool(doc.get("residual")) if doc else False
        if (
            self._pq_cache is not None
            and current is not None
            and self._pq_cache_etag != current
        ):
            # another writer retrained the books under this path —
            # drop the cache and fall through to a fresh read
            self._pq_cache = None
            self._pq_cache_etag = None
        if self._pq_cache is None:
            try:
                rows = (
                    spark.read.parquet(f"{self.path}/pq/codebooks")
                    .orderBy("sub", "code")
                    .collect()
                )  # m×k_sub rows — driver-sized by design
            except AnalysisException as e:
                from biodata_pipeline_spark.operators.dedup import (
                    _is_store_missing,
                )

                if _is_store_missing(e):
                    raise ValueError(
                        f"no PQ layer at {self.path}: enable_pq() trains "
                        "the codebooks before ADC scoring can run"
                    ) from e
                raise
            m = max(r["sub"] for r in rows) + 1
            books: list[list[list[float]]] = [[] for _ in range(m)]
            for r in rows:  # (sub, code)-ordered: code index == position
                books[r["sub"]].append(list(r["centroid"]))
            loaded = _books_etag(books)
            if current is not None and loaded != current:
                # enable_pq crashed between the codebook overwrite and
                # the etag flip: the on-disk state is half-committed.
                # Fail loudly — scoring under it could silently mix
                # books and codes from different trainings.
                raise ValueError(
                    f"PQ codebooks at {self.path} do not match the "
                    "persisted etag (a crashed enable_pq?): re-run "
                    "enable_pq() to restore a consistent PQ layer"
                )
            self._pq_cache = books
            self._pq_cache_etag = loaded
        return self._pq_cache

    def _retire_codes_component(self, spark, comp: str) -> None:
        """Retire ALL state of a code component (``pq_codes`` /
        ``sq_codes``) ahead of a re-encode — delta dirs AND the
        compacted table when a compaction ran since the last enable.
        Retirement order: flip the meta pointer minus the component's
        keys first (readers stop seeing the table — the atomic
        single-file rename the compaction machinery uses), then
        drop/delete the now-unreferenced table dirs and the delta dir;
        a crash between the two leaves storage-only orphans, never
        readable stale codes (the sweep also clears versioned dirs a
        crashed prior retirement left)."""
        import re as _re

        from biodata_pipeline_spark.operators.dedup import (
            _fs_path,
            _read_index_meta,
            _write_index_meta,
        )

        meta = _read_index_meta(spark, self.path)
        if meta is not None and f"{comp}_table" in meta:
            new_meta = {
                k: v for k, v in meta.items()
                if not k.startswith(f"{comp}_")
            }
            new_meta["version"] = int(meta["version"]) + 1
            _write_index_meta(spark, self.path, new_meta)
            spark.sql(f"DROP TABLE IF EXISTS {meta[f'{comp}_table']}")
            tfs, thp = _fs_path(spark, meta[f"{comp}_path"])
            if tfs.exists(thp):
                tfs.delete(thp, True)
        dfs, dbase = _fs_path(spark, self.path)
        if dfs.exists(dbase):
            for st in dfs.listStatus(dbase):
                if _re.match(rf"^{comp}_v\d+$", st.getPath().getName()):
                    dfs.delete(st.getPath(), True)
        fs, hp = _fs_path(spark, f"{self.path}/{comp}")
        if fs.exists(hp):
            fs.delete(hp, True)

    # -- scalar quantization (the byte-per-dimension probe path, r14) -------
    def sq_enabled(self, spark) -> bool:
        doc = _read_store_doc(spark, self.path, "sq_meta")
        return doc is not None and not doc.get("disabled")

    def _sq_bounds(self, spark) -> dict:
        doc = _read_store_doc(spark, self.path, "sq_meta")
        if doc is None or doc.get("disabled"):
            raise ValueError(
                f"no SQ8 layer at {self.path}: enable_sq8() fits the "
                "bounds before byte scoring can run"
                + (
                    " (a prior enable_sq8 did not complete — re-run it)"
                    if doc is not None
                    else ""
                )
            )
        return doc

    def enable_sq8(self, spark) -> int:
        """Attach an SQ8 layer (PQ's simpler, stronger-recall sibling —
        see operators/sq.py): per-dimension [min, max] bounds over the
        live corpus in ONE scan (no Lloyd chains, no training sample),
        every live vector encoded to dim bytes in ``sq_codes/``
        (batch semantics identical to ``pq_codes/``), and
        ``query(scoring="sq8"/"sq8_refine")`` scans bytes instead of
        floats — 8× less candidate I/O vs float64 rows at near-exact
        recall. From here ``add`` byte-encodes each new batch on enroll
        (values beyond the fitted bounds CLAMP — the standard SQ drift
        semantics; re-run enable_sq8 to refit when ``describe`` shows
        the corpus has drifted). Re-running refits and fully re-encodes
        (idempotent). Coexists with a PQ layer: the two code components
        are independent.

        Mutation order — every crash window VISIBLE, never silently
        wrong. The bounds doc IS the codebook here, and unlike
        ``pq_etag`` (where a missing doc meant dangerous legacy
        semantics) a disabled ``sq_meta`` is the SAFE direction: the
        layer just reads as off. So: (1) flip the doc to a
        ``disabled`` tombstone — byte scoring goes dark immediately;
        (2) retire all old sq code state; (3) write the fresh full
        encode; (4) flip the doc to the new bounds LAST. A crash
        before (1) leaves the old consistent layer; between (1) and
        (4) the layer is visibly disabled ("re-run enable_sq8");
        after (4) the new layer is consistent — at no point can bytes
        be scored under bounds they were not encoded with (the
        new-codes-under-old-doc window a codes-before-doc order would
        open)."""
        from biodata_pipeline_spark.operators.sq import (
            sq_encode_kernel,
            sq_fit,
        )

        cents = self.centroids(spark)  # raises if the store is missing
        dim = len(cents[0])
        parts = _index_component_frames(spark, self.path, "assignments")
        full = parts[0].select("id", "emb", "cell")
        for p in parts[1:]:
            full = full.unionByName(p.select("id", "emb", "cell"))
        live = self._minus_tombstones(spark, full.dropDuplicates(["id"]))
        bounds = sq_fit(live, id_col="id", emb_col="emb", dim=dim)
        coded = sq_encode_kernel(
            live, bounds, emb_col="emb", codes_col="codes"
        ).select("id", "cell", "codes").localCheckpoint()
        n = coded.count()  # materialized BEFORE any store mutation
        if _read_store_doc(spark, self.path, "sq_meta") is not None:
            _write_store_doc(
                spark, self.path, "sq_meta", {"disabled": True}
            )
        self._retire_codes_component(spark, "sq_codes")
        SignatureStore._write_batch(
            spark, coded, f"{self.path}/sq_codes", "sq_enable"
        )
        _write_store_doc(spark, self.path, "sq_meta", bounds)
        return n

    # -- binary quantization (the 1-bit Hamming probe path, r14) ------------
    def bq_enabled(self, spark) -> bool:
        doc = _read_store_doc(spark, self.path, "bq_meta")
        return doc is not None and not doc.get("disabled")

    def _bq_thresholds(self, spark) -> dict:
        doc = _read_store_doc(spark, self.path, "bq_meta")
        if doc is None or doc.get("disabled"):
            raise ValueError(
                f"no BQ1 layer at {self.path}: enable_bq() fits the "
                "thresholds before Hamming scoring can run"
                + (
                    " (a prior enable_bq did not complete — re-run it)"
                    if doc is not None
                    else ""
                )
            )
        return doc

    def enable_bq(self, spark, train_sample: int | None = 100_000) -> int:
        """Attach a BQ1 layer (the 1-bit end of the curve — see
        operators/bq.py): per-dimension lower-median thresholds fit on
        the bounded md5_top_n training sample (a median is a ranked
        selection — one per-dimension sort, so unlike SQ8's min/max
        scan the fit cost is bounded by SAMPLING, the pq_fit
        discipline; thresholds saturate on ~100k rows exactly as
        codebooks do), every live vector packed to dim/32 words in
        ``bq_words/`` (batch semantics identical to ``sq_codes/``),
        and ``query(scoring="bq1"/"bq1_refine")`` scans 8-byte words
        with integer xor/popcount — the cheapest candidate scan the
        store has. ``add`` packs each new batch on enroll under the
        fitted thresholds; re-running refits and fully re-encodes
        (idempotent). Coexists with the PQ and SQ8 layers.

        Mutation order: the ``enable_sq8`` disable-first protocol
        verbatim — the thresholds doc IS the codebook and a disabled
        ``bq_meta`` is the safe direction, so (1) tombstone the doc,
        (2) retire old word state, (3) write the fresh encode, (4)
        flip the doc to the new thresholds LAST. Every crash window is
        visibly off, never silently wrong."""
        from biodata_pipeline_spark.operators.bq import (
            bq_encode_kernel,
            bq_fit,
        )
        from biodata_pipeline_spark.operators.sampling import md5_top_n

        cents = self.centroids(spark)  # raises if the store is missing
        dim = len(cents[0])
        parts = _index_component_frames(spark, self.path, "assignments")
        full = parts[0].select("id", "emb", "cell")
        for p in parts[1:]:
            full = full.unionByName(p.select("id", "emb", "cell"))
        live = self._minus_tombstones(spark, full.dropDuplicates(["id"]))
        fit_src = (
            live if train_sample is None
            else md5_top_n(live, train_sample, "id")
        )
        thr = bq_fit(fit_src, id_col="id", emb_col="emb", dim=dim)
        coded = bq_encode_kernel(
            live, thr, emb_col="emb", words_col="words"
        ).select("id", "cell", "words").localCheckpoint()
        n = coded.count()  # materialized BEFORE any store mutation
        if _read_store_doc(spark, self.path, "bq_meta") is not None:
            _write_store_doc(
                spark, self.path, "bq_meta", {"disabled": True}
            )
        self._retire_codes_component(spark, "bq_words")
        SignatureStore._write_batch(
            spark, coded, f"{self.path}/bq_words", "bq_enable"
        )
        _write_store_doc(spark, self.path, "bq_meta", thr)
        return n

    def sq_drift(self, spark) -> dict:
        """Measured drift signal for the SQ8 layer — the 'refit when
        the corpus has drifted' rule as a number instead of prose (the
        structure_ratio discipline): the fraction of LIVE vectors
        carrying at least one value OUTSIDE the fitted [min, max]
        bounds — exactly the rows whose codes saturated at 0/255 under
        the clamp semantics, i.e. the rows the byte representation can
        no longer tell apart at the range edge. One column-pruned scan
        + one agg; call it between batches, not per query. Returns
        ``{"n_live", "n_clamped", "frac_clamped"}`` — at fit time the
        fraction is 0 by construction (the bounds COVER the fit
        corpus), so any growth is pure post-fit drift; re-run
        ``enable_sq8`` when it stops being a tail."""
        bounds = self._sq_bounds(spark)
        mnlit = F.array(*[F.lit(float(v)) for v in bounds["vmin"]])
        mxlit = F.array(*[F.lit(float(v)) for v in bounds["vmax"]])
        parts = _index_component_frames(spark, self.path, "assignments")
        full = parts[0].select("id", "emb")
        for p in parts[1:]:
            full = full.unionByName(p.select("id", "emb"))
        live = self._minus_tombstones(spark, full.dropDuplicates(["id"]))
        emb = F.col("emb").cast("array<double>")
        clamped = (
            F.exists(
                F.zip_with(emb, mnlit, lambda x, m: x < m), lambda b: b
            )
            | F.exists(
                F.zip_with(emb, mxlit, lambda x, m: x > m), lambda b: b
            )
        )
        row = live.agg(
            F.count("*").alias("n"),
            F.sum(clamped.cast("long")).alias("c"),
        ).collect()[0]
        n, c = row["n"], row["c"] or 0
        return {
            "n_live": n,
            "n_clamped": c,
            "frac_clamped": round(c / n, 6) if n else 0.0,
        }

    def bq_drift(self, spark) -> dict:
        """Measured drift signal for the BQ1 layer: per-dimension bit
        balance. Under the fitted lower-median thresholds each
        dimension splits the fit corpus ~50/50 by construction; as the
        corpus drifts, dimensions polarize and carry less Hamming
        signal. Reports the worst per-dimension |P(bit=1) − 0.5| and
        the mean — re-run ``enable_bq`` when dimensions saturate. One
        scan into ≤ dim groups."""
        thr = self._bq_thresholds(spark)["thr"]
        thrlit = F.array(*[F.lit(float(t)) for t in thr])
        parts = _index_component_frames(spark, self.path, "assignments")
        full = parts[0].select("id", "emb")
        for p in parts[1:]:
            full = full.unionByName(p.select("id", "emb"))
        live = self._minus_tombstones(spark, full.dropDuplicates(["id"]))
        emb = F.col("emb").cast("array<double>")
        rows = (
            live.select(
                F.posexplode(
                    F.zip_with(emb, thrlit, lambda x, t: (x > t).cast("long"))
                ).alias("i", "bit")
            )
            .groupBy("i")
            .agg(F.avg("bit").alias("p1"))
            .collect()  # ≤ dim rows — driver-sized by design
        )
        if not rows:
            return {"n_dims": 0, "max_imbalance": None, "mean_imbalance": None}
        devs = [abs(r["p1"] - 0.5) for r in rows]
        return {
            "n_dims": len(devs),
            "max_imbalance": round(max(devs), 4),
            "mean_imbalance": round(sum(devs) / len(devs), 4),
        }

    # -- delete ------------------------------------------------------------
    def remove(self, spark, ids) -> int:
        """Tombstone ``ids`` (a DataFrame carrying ``self.id_col``, or a
        plain iterable of ids) — the 100 TB deletion path: one bounded
        parquet append, NO rewrite of the assignment history. A
        tombstoned id is immediately invisible to ``query`` /
        ``vectors`` / ``cell_stats`` (candidates anti-join the
        tombstone set BEFORE ranking, so a removed vector can't eat a
        top-k rank), and the next ``compact`` physically drops its rows
        while folding the layout anyway, then clears the tombstones.

        Removal wins until a compact has run: an id removed and then
        re-``add``-ed before the next compaction stays invisible (the
        pending tombstone masks it, and that compaction drops the
        re-added rows with the old ones). To resurrect an id, compact
        first, then add. Removing an id that was never enrolled is a
        no-op. Returns the number of ids tombstoned. Delegates to the
        shared ``remove_from_dedup_index`` (one tombstone mechanism
        across the ingest index, SignatureStore, and this store)."""
        from biodata_pipeline_spark.operators.dedup import (
            remove_from_dedup_index,
        )

        if isinstance(ids, DataFrame):
            ids = ids.select(self.id_col)
        return remove_from_dedup_index(spark, self.path, ids)

    def _tombstones(self, spark) -> DataFrame | None:
        from biodata_pipeline_spark.operators.dedup import _read_index_delta

        return _read_index_delta(spark, self.path, "tombstones")

    def _minus_tombstones(
        self, spark, df: DataFrame, id_name: str = "id"
    ) -> DataFrame:
        tomb = self._tombstones(spark)
        if tomb is None:
            return df
        dead = tomb.select(F.col("id").alias(id_name)).distinct()
        return df.join(dead, id_name, "left_anti")

    def compact(self, spark, n_buckets: int | None = None) -> dict:
        """Fold per-batch assignment appends into ONE bucketed table on
        (cell) — bounded file count, shuffle-free probe join past the
        broadcast threshold. Same contract as the dedup index: run
        between batches; query results identical across the fold.
        Pending tombstones are folded in (their rows leave the physical
        layout) and then cleared by the shared machinery — see
        ``compact_dedup_index``'s crash-window note. When a PQ layer is
        attached its code table folds in the same pass (same bucketing
        on cell, same tombstone drop), so both probe paths keep the
        bounded-file-count / shuffle-free-join contract."""
        self._n_rows_cache = None  # fold drops tombstoned rows
        parts = {"assignments": ["cell"]}
        if self.pq_enabled(spark):
            parts["pq_codes"] = ["cell"]
        if self.sq_enabled(spark):
            parts["sq_codes"] = ["cell"]
        if self.bq_enabled(spark):
            parts["bq_words"] = ["cell"]
        return compact_dedup_index(
            spark, self.path, n_buckets=n_buckets, parts=parts,
        )

    def vectors(self, spark) -> DataFrame:
        """Every enrolled, not-tombstoned vector as (id, emb) —
        compacted table plus deltas, with crash-stale duplicates
        dropped (byte-identical by the replay contract, so any
        survivor is the row)."""
        parts = _index_component_frames(spark, self.path, "assignments")
        if not parts:
            raise ValueError(f"no index at {self.path}")
        full = parts[0].select("id", "emb")
        for p in parts[1:]:
            full = full.unionByName(p.select("id", "emb"))
        return self._minus_tombstones(spark, full.dropDuplicates(["id"]))

    def rebuild(
        self,
        spark,
        new_path: str,
        k: int = 16,
        iters: int = 4,
        train_sample: int | None = None,
    ) -> "VectorIndexStore":
        """The maintenance action ``cell_stats`` drift points at:
        retrain the coarse quantizer on the enrolled corpus (bounded
        sample via ``train_sample`` — at scale always) and re-enroll
        every vector under the new centroids, into a NEW store at
        ``new_path``. This store stays fully live throughout — a
        rebuild at 100 TB runs for hours alongside serving, so the
        switch is the caller's pointer flip from old path to new, and
        batches enrolled here after the rebuild started must be
        re-``add``-ed to the new store before the flip (the same
        run-behind contract as any reindex). The new store carries NO
        PQ layer — codes are functions of the codebooks, which should
        retrain on the re-clustered corpus: call ``enable_pq`` on the
        result. Returns the new store."""
        new = VectorIndexStore(
            new_path, id_col=self.id_col, emb_col=self.emb_col
        )
        corpus = self.vectors(spark).select(
            F.col("id").alias(self.id_col),
            F.col("emb").alias(self.emb_col),
        )
        new.build(
            corpus, k=k, iters=iters, train_sample=train_sample
        )
        return new

    def describe(self, spark) -> dict:
        """Operational snapshot for maintenance decisions: live row
        count, coarse-quantizer size, pending tombstones, compaction
        version, the PQ layer's shape (or None), and the persisted
        calibration record with its staleness verdict. Runs a few small
        jobs — a maintenance call, not a query-path one; the numbers an
        operator reads before choosing between ``compact``, ``rebuild``,
        ``enable_pq`` retrain and re-``calibrate``."""
        from biodata_pipeline_spark.operators.dedup import (
            _read_index_meta,
        )

        tomb = self._tombstones(spark)
        meta = _read_index_meta(spark, self.path) or {}
        out = {
            "n_live_vectors": self.vectors(spark).count(),
            "n_cells": len(self.centroids(spark)),
            "n_pending_tombstones": (
                tomb.select("id").distinct().count()
                if tomb is not None
                else 0
            ),
            "compaction_version": int(meta.get("version", 0)),
            "pq": None,
            "sq8": None,
            "bq1": None,
            "calibration": None,
            # always present (r13 advice: callers probing staleness on an
            # uncalibrated store hit KeyError when this key was conditional)
            "calibration_stale": None,
        }
        if self.pq_enabled(spark):
            books = self._pq_books(spark)
            pq_doc = _read_store_doc(spark, self.path, "pq_etag") or {}
            out["pq"] = {
                "m": len(books),
                "k_sub": len(books[0]),
                "subdim": len(books[0][0]),
                "residual": self._pq_cache_residual,
                # the size-aware production default for THIS corpus —
                # an attached layer whose k_sub sits below it is the
                # "retrain with enable_pq()" signal (VERDICT r13 #2)
                "recommended_k_sub": recommended_k_sub(
                    out["n_live_vectors"]
                ),
                # measured at the last enable_pq: ≪1 = real cluster
                # structure (residual's win case), ≈1 = structure-free
                # (residual parity; k_sub is the lever) — None on
                # legacy layers that never measured it
                "structure_ratio": pq_doc.get("structure_ratio"),
            }
        if self.sq_enabled(spark):
            b = self._sq_bounds(spark)
            out["sq8"] = {"dim": len(b["vmin"])}
        if self.bq_enabled(spark):
            t = self._bq_thresholds(spark)
            out["bq1"] = {"dim": len(t["thr"])}
        cal = _read_store_doc(spark, self.path, "calibration")
        if cal is not None:
            out["calibration"] = cal
            out["calibration_stale"] = not self._calibration_fresh(
                cal.get("fingerprint", {}),
                self._fingerprint(spark, n_rows=out["n_live_vectors"]),
            )
        # the ladder's operating rule, decided from the measured
        # signals above (VERDICT r14 #4)
        out["recommended_scoring"] = recommended_scoring(
            out["pq"], out["sq8"] is not None, out["bq1"] is not None
        )
        return out

    # relative live-row drift beyond which a persisted calibration no
    # longer speaks for the corpus (the recall curve moves with cell
    # occupancy, not with compaction — folding is result-identical, so
    # compaction_version is deliberately NOT part of the fingerprint)
    CALIBRATION_MAX_DRIFT = 0.2

    def _fingerprint(self, spark, n_rows: int | None = None) -> dict:
        """What the calibration was measured AGAINST: live row count,
        quantizer size, and a content etag per attached compressed
        layer — PQ books, SQ8 bounds, BQ1 thresholds (each None when
        the layer is off). Attaching, detaching, or refitting ANY
        scored representation changes the fingerprint, because the
        calibration record now speaks for every attached layer's
        refine funnel (r15), not just PQ's."""
        doc = _read_store_doc(spark, self.path, "pq_etag")
        return {
            "n_rows": (
                self.vectors(spark).count() if n_rows is None else n_rows
            ),
            "n_cells": len(self.centroids(spark)),
            "books_etag": doc["etag"] if doc else None,
            "sq_etag": _layer_etag(
                _read_store_doc(spark, self.path, "sq_meta")
            ),
            "bq_etag": _layer_etag(
                _read_store_doc(spark, self.path, "bq_meta")
            ),
        }

    def _calibration_fresh(self, measured: dict, current: dict) -> bool:
        if measured.get("n_cells") != current.get("n_cells"):
            return False
        # any representation change moves its refine curve: retrained
        # PQ books, refit SQ8 bounds / BQ1 thresholds, or a layer
        # newly attached since the record was measured (legacy records
        # without the sq/bq keys read None — fresh only while those
        # layers stay off)
        for key in ("books_etag", "sq_etag", "bq_etag"):
            if measured.get(key) != current.get(key):
                return False
        old_n = measured.get("n_rows") or 0
        new_n = current.get("n_rows") or 0
        drift = abs(new_n - old_n) / max(old_n, 1)
        return drift <= self.CALIBRATION_MAX_DRIFT

    def calibrate(
        self,
        spark,
        queries: DataFrame,
        target_recall: float = 0.9,
        k: int = 10,
        query_id: str = "query_id",
        query_emb: str = "query_emb",
        max_sample: int = 32,
        max_refine: int = 64,
        force: bool = False,
    ) -> dict:
        """Calibrate-once semantics for the store's measured knobs
        (VERDICT r12 #4; extended to every attached representation in
        r15 per VERDICT r14 #3): run ``measured_n_probe``, then — for
        EACH attached compressed layer — ``measured_refine`` at that
        n_probe (``adc_refine`` for PQ, ``sq8_refine`` for SQ8,
        ``bq1_refine`` for BQ1; the per-path walk lands in
        ``doc["scorings"]``), persist the settings WITH their measured
        recalls and the corpus fingerprint they were measured against,
        and on every later call — including from a fresh instance or
        process — return the stored record without re-measuring, as
        long as the fingerprint is still fresh (same quantizer, same
        layer etags — attaching or refitting ANY scored layer
        re-measures — live-row drift within ``CALIBRATION_MAX_DRIFT``).

        The point is cost: the measurement is O(log n_cells ·
        log max_refine) bounded queries — 454 s at the 1M rung
        (SCALING.md) — and its result is a per-corpus constant, so
        paying it once per corpus *state* rather than once per process
        is the difference between a knob and a tax. Returns the
        calibration dict; ``reused`` says whether a stored record was
        served. ``force`` is the unconditional override — re-measure
        regardless of the stored record (e.g. after a workload shift
        the fingerprint can't see).

        Reuse requires the stored record's measurement budget to COVER
        the request (r13 advice): ``max_sample``/``max_refine`` persist
        in the doc, and a stored record only serves calls asking for at
        most that sample size and refine cap — a call with a LARGER
        budget re-measures rather than silently inheriting a
        possibly-cap-limited record (legacy docs without the fields
        re-measure). A reused record whose measured refine recall sits
        below the target re-raises the cap warning so the shortfall
        stays visible across processes, not just in the process that
        first measured it."""
        fp = self._fingerprint(spark)
        # which refine funnels this corpus state needs measured
        attached = []
        if self.pq_enabled(spark):
            attached.append("adc_refine")
        if self.sq_enabled(spark):
            attached.append("sq8_refine")
        if self.bq_enabled(spark):
            attached.append("bq1_refine")
        stored = _read_store_doc(spark, self.path, "calibration")
        if (
            not force
            and stored is not None
            and stored.get("target_recall") == target_recall
            and stored.get("k") == k
            and (stored.get("max_sample") or 0) >= max_sample
            and (
                not attached
                or (stored.get("max_refine") or 0) >= max_refine
            )
            # a record measured before the per-scoring extension does
            # not speak for attached non-PQ layers: re-measure
            and all(
                sc in (stored.get("scorings") or {})
                for sc in attached
                if sc != "adc_refine" or stored.get("refine") is None
            )
            and self._calibration_fresh(stored.get("fingerprint", {}), fp)
        ):
            # re-raise every cap shortfall so it stays visible in this
            # process too (r13 advice, per-scoring since r15)
            shortfalls = {
                sc: rec.get("recall")
                for sc, rec in (stored.get("scorings") or {}).items()
                if rec.get("recall") is not None
                and rec["recall"] < target_recall
            }
            rr = stored.get("refine_recall")
            if not shortfalls and rr is not None and rr < target_recall:
                shortfalls = {"adc_refine": rr}  # legacy record shape
            if shortfalls:
                import warnings

                detail = ", ".join(
                    f"{sc}={r}" for sc, r in sorted(shortfalls.items())
                )
                warnings.warn(
                    f"calibrate: reused record's refine recall ({detail})"
                    f" is below the {target_recall} target (measured at "
                    f"the max_refine={stored.get('max_refine')} cap) — "
                    "per-path advice: "
                    + "; ".join(
                        _REFINE_CAP_ADVICE[sc]
                        for sc in sorted(shortfalls)
                    )
                    + "; or pass force=True to re-measure",
                    RuntimeWarning,
                    stacklevel=2,
                )
            return {**stored, "reused": True}
        n_probe, np_recall = measured_n_probe(
            self, queries, target_recall, k,
            query_id=query_id, query_emb=query_emb,
            max_sample=max_sample, with_recall=True,
        )
        doc = {
            "target_recall": target_recall,
            "k": k,
            "n_probe": n_probe,
            "n_probe_recall": round(np_recall, 4),
            "refine": None,
            "refine_recall": None,
            # per-scoring refine funnels, one entry per attached layer
            # (r15): {"adc_refine"/"sq8_refine"/"bq1_refine":
            #         {"refine": int, "recall": float}}
            "scorings": {},
            # the measurement budget: reuse only serves requests this
            # record covers (r13 advice)
            "max_sample": max_sample,
            "max_refine": max_refine if attached else None,
            "fingerprint": fp,
        }
        for sc in attached:
            refine, rf_recall = measured_refine(
                self, queries, scoring=sc,
                target_recall=target_recall, k=k, n_probe=n_probe,
                query_id=query_id, query_emb=query_emb,
                max_sample=max_sample, max_refine=max_refine,
                with_recall=True,
            )
            doc["scorings"][sc] = {
                "refine": refine,
                "recall": round(rf_recall, 4),
            }
        if "adc_refine" in doc["scorings"]:
            # legacy top-level form: the PQ funnel (r12-r14 callers)
            doc["refine"] = doc["scorings"]["adc_refine"]["refine"]
            doc["refine_recall"] = doc["scorings"]["adc_refine"]["recall"]
            rf_recall = doc["refine_recall"]
            if rf_recall < target_recall:
                cur_k_sub = len(self._pq_books(spark)[0])
                rec = recommended_k_sub(fp["n_rows"])
                if cur_k_sub < rec:
                    import warnings

                    warnings.warn(
                        f"calibrate: refine recall {rf_recall:.4f} "
                        f"missed the {target_recall} target and the "
                        f"attached PQ layer's k_sub={cur_k_sub} sits "
                        f"below the size-aware recommendation {rec} "
                        f"for {fp['n_rows']} live rows — retrain with "
                        f"enable_pq(k_sub={rec}) (or k_sub=None for "
                        "the size-aware default), then re-calibrate",
                        RuntimeWarning,
                        stacklevel=2,
                    )
        _write_store_doc(spark, self.path, "calibration", doc)
        return {**doc, "reused": False}

    def cell_stats(self, spark) -> DataFrame:
        """(cell, n_vecs) occupancy — the drift report. A cell running
        hot (≫ corpus/k) means the frozen quantizer no longer fits the
        incoming distribution and probe cost for queries near that cell
        degrades toward a scan: time to ``rebuild`` into a fresh path
        (bigger k, current data distribution)."""
        parts = _index_component_frames(spark, self.path, "assignments")
        if not parts:
            raise ValueError(f"no index at {self.path}")
        full = parts[0].select("id", "cell")
        for p in parts[1:]:
            full = full.unionByName(p.select("id", "cell"))
        return (
            self._minus_tombstones(spark, full)
            .groupBy("cell")
            .agg(F.count("*").alias("n_vecs"))
        )

    # -- search -----------------------------------------------------------
    def query_calibrated(
        self,
        queries: DataFrame,
        k: int,
        scoring: str | None = None,
        query_id: str = "query_id",
        query_emb: str = "query_emb",
    ) -> DataFrame:
        """``query`` riding the persisted calibration (r15 — the other
        half of calibrate-once: measure once per corpus state, then
        every query ships the measured knobs without the caller
        re-plumbing numbers). Resolves n_probe from the stored record
        and, for a ``*_refine`` scoring, the refine width from that
        scoring's measured funnel (``doc["scorings"]``); with
        ``scoring=None`` the representation itself comes from
        ``recommended_scoring`` (upgraded to its ``_refine`` arm when
        that funnel was calibrated — the measured-win form).

        Raises when no calibration record exists, when it has gone
        stale (corpus drift / layer refit — re-run ``calibrate()``),
        or when the requested refine scoring was never measured (layer
        attached after the record: ``calibrate()`` would have caught
        it via the fingerprint, so this arises only with an explicit
        scoring naming a detached layer's path)."""
        spark = queries.sparkSession
        cal = _read_store_doc(spark, self.path, "calibration")
        if cal is None:
            raise ValueError(
                f"no calibration record at {self.path}: run "
                "calibrate() first (query_calibrated is the "
                "measured-knob path; plain query() takes explicit "
                "n_probe/refine)"
            )
        if not self._calibration_fresh(
            cal.get("fingerprint", {}), self._fingerprint(spark)
        ):
            raise ValueError(
                f"calibration record at {self.path} is stale (corpus "
                "drift or a layer attach/refit since it was measured) "
                "— re-run calibrate()"
            )
        scorings = cal.get("scorings") or {}
        if scoring is None:
            rec = recommended_scoring(
                self.describe(spark)["pq"],
                self.sq_enabled(spark),
                self.bq_enabled(spark),
            )["scoring"]
            scoring = rec
        if scoring.endswith("_refine"):
            entry = scorings.get(scoring)
            if entry is None and scoring == "adc_refine" and cal.get(
                "refine"
            ) is not None:
                entry = {"refine": cal["refine"]}  # legacy record shape
            if entry is None:
                raise ValueError(
                    f"calibration record has no measured funnel for "
                    f"{scoring!r} — re-run calibrate() with the layer "
                    "attached"
                )
            return self.query(
                queries, k, n_probe=cal["n_probe"], scoring=scoring,
                refine=entry["refine"], query_id=query_id,
                query_emb=query_emb,
            )
        return self.query(
            queries, k, n_probe=cal["n_probe"], scoring=scoring,
            query_id=query_id, query_emb=query_emb,
        )

    def query(
        self,
        queries: DataFrame,
        k: int,
        n_probe: int = 4,
        query_id: str = "query_id",
        query_emb: str = "query_emb",
        kernel_threshold: int = KERNEL_INDEX_THRESHOLD,
        scoring: str = "exact",
        refine: int = 4,
    ) -> DataFrame:
        """Top-``k`` per query over the stored index: rank stored
        centroids per query (a |Q|×k cross-join against the broadcast
        k-row centroid frame — constant codegen footprint in k, see the
        inline note), probe the ``n_probe`` best cells, equi-join
        candidates on cell — each index part joined separately so the
        compacted bucketed scan keeps its partitioning — score, then
        the per-query rank window. Returns (query_id, vec_id, rank,
        sim) with the engine's standard tie-breaks.

        ``scoring`` picks the candidate representation (the IVF-PQ
        trade, requires ``enable_pq`` for the last two):
         - ``"exact"``: full float vectors, exact cosine (Arrow kernel
           above ``kernel_threshold`` index rows, all-JVM fold below);
         - ``"adc"``: candidates scanned as m-int PQ codes and scored
           asymmetrically — 16-64× less candidate I/O, sim is the ADC
           estimate;
         - ``"adc_refine"``: ADC first, then the top ``refine``·k live
           candidates per query re-scored exactly against their stored
           vectors — the standard recall repair; the full-vector read
           touches refine·k rows per query instead of every candidate;
         - ``"sq8"`` / ``"sq8_refine"`` (requires ``enable_sq8``):
           candidates scanned as dim byte codes, scored against the
           midpoint reconstruction — near-exact recall at ~8× less
           candidate I/O than float64 rows;
         - ``"bq1"`` / ``"bq1_refine"`` (requires ``enable_bq``):
           candidates scanned as dim/32 packed words, ranked by
           integer Hamming (sim is the normalized ``(dim−h)/dim``) —
           the cheapest scan; pair with the refine arm, which repairs
           what 1 bit/dim costs.

        ``n_probe=4`` is a throughput default, not a recall promise:
        calibrate with ``measured_n_probe(store, queries, target)`` —
        the cheapest setting whose measured recall@k meets the target
        on a bounded query sample — or fall back to
        ``recommended_n_probe(n_cells, target)``, the conservative
        no-measurement heuristic (near-exhaustive at high targets; the
        r10 operating-curve tables are in SCALING.md)."""
        if scoring not in (
            "exact", "adc", "adc_refine", "sq8", "sq8_refine",
            "bq1", "bq1_refine",
        ):
            raise ValueError(f"unknown scoring {scoring!r}")
        if scoring.endswith("_refine") and refine < 1:
            # rank<=refine*k would silently return ZERO rows per query
            raise ValueError(
                f"{scoring} needs refine >= 1, got {refine}"
            )
        from pyspark.sql import Window

        spark = queries.sparkSession
        import math

        cents = self.centroids(spark)
        n_cells = len(cents)
        n_probe = min(n_probe, n_cells)
        # rank cells by cosine == dot against unit-normalized centroids
        unit = []
        for c in cents:
            nrm = math.sqrt(sum(x * x for x in c)) or 1.0
            unit.append([x / nrm for x in c])
        # Cell ranking rides a |Q|×k cross-join against a k-row centroid
        # frame, NOT a k×dim matrix literal (rewired r11): the literal
        # form generated k×dim constants of codegen that RECOMPILED on
        # every query() call — Catalyst mints fresh lambda-variable ids
        # per Column construction, so the generated source never hits
        # the codegen cache, and at k=64×64d Janino spent 5-25 s per
        # call compiling code that scores 20 rows (measured by
        # tools/probe_vector_delete.py; the q26b probe documents the
        # naming-counter mechanism). The join form's codegen footprint
        # is CONSTANT in k — one zip_with fold over two array columns —
        # while the broadcast k-row frame carries the data. Sims are
        # bit-identical (same in-order dot fold over the same doubles,
        # same SIM_ROUND), and row_number over (sim DESC, cell ASC)
        # keeps the lowest-cell tie-break (ADVICE r9) — pytest pins
        # exhaustive-probe == brute-force across this rewrite.
        cdf = spark.createDataFrame(
            [(i, unit[i]) for i in range(n_cells)],
            "cell int, __cu array<double>",
        )
        cell_rank = Window.partitionBy(query_id).orderBy(
            F.col("__csim").desc(), F.col("cell")
        )
        # One row per query_id BEFORE the cell cross-join (ADVICE r11):
        # the cell-rank window partitions by query_id, so duplicate
        # query_id rows would SHARE one window — each cell appearing
        # once per duplicate, the top-n_probe rows covering only
        # ~n_probe/dups distinct cells, a silent recall drop. Retried /
        # unioned query batches (identical rows) collapse
        # deterministically; duplicate ids with CONFLICTING embeddings
        # are a contract violation (the final rank window already
        # assumes query_id is a key) — one row wins, and the whole
        # pipeline (probe set, scoring, ranking) stays coherent with
        # that row's embedding.
        qcells = (
            queries.select(
                F.col(query_id),
                F.col(query_emb).cast("array<double>").alias("__qe"),
                l2_norm(F.col(query_emb)).alias("__nq"),
            )
            .dropDuplicates([query_id])
            .crossJoin(F.broadcast(cdf))
            .withColumn(
                "__csim", F.round(dot(F.col("__qe"), F.col("__cu")), SIM_ROUND)
            )
            .withColumn("__crk", F.row_number().over(cell_rank))
            .filter(F.col("__crk") <= n_probe)
            .select(query_id, "__qe", "__nq", "cell")
        ).localCheckpoint()  # reused: the probed-cell list + the join side
        # push the probed-cell set into the scan as an IN filter: the
        # list is ≤ queries × n_probe values (driver-bounded by the
        # query batch the caller chose), and the compacted layout is
        # sorted by cell, so parquet row-group stats prune everything
        # outside the probed cells — without this the scan read the
        # WHOLE index and the join did the filtering (measured at 1M
        # vectors: the bucketed scan was 2× slower than parquet because
        # its 16 files capped parallelism on a full scan it never
        # needed to do)
        probed = sorted(
            {r["cell"] for r in qcells.select("cell").distinct().collect()}
        )

        aparts_memo: list = []

        def _aparts():
            # the assignments component frames, listed ONCE per query()
            # call (r12 review: the exact path listed them in both the
            # candidate build and the row-count gate — each listing
            # re-reads the meta file and parquet footers)
            if not aparts_memo:
                aparts_memo.append(
                    _index_component_frames(spark, self.path, "assignments")
                )
            return aparts_memo[0]

        def _cand_from(parts, part_name: str, value_col: str,
                       keep_cell: bool = False):
            if not parts:
                if part_name == "assignments":
                    raise ValueError(f"no index at {self.path}")
                layer = {
                    "sq_codes": "SQ8 codes at {p}: enable_sq8() first",
                    "bq_words": "BQ1 words at {p}: enable_bq() first",
                }.get(part_name, "PQ codes at {p}: enable_pq() first")
                raise ValueError("no " + layer.format(p=self.path))
            extra = ["cell"] if keep_cell else []
            cand = None
            for p in parts:
                s = p.filter(F.col("cell").isin(probed)).join(
                    F.broadcast(qcells), "cell"
                ).select(
                    query_id,
                    F.col("id").alias(self.id_col),
                    "__qe",
                    "__nq",
                    *extra,
                    value_col,
                )
                cand = s if cand is None else cand.unionByName(s)
            return cand

        def _exact_scored(cand):
            # Candidate scoring switches on observed index size (the
            # retrieval-family discipline, rewired r11). The JVM
            # aggregate/zip_with fold is a CodegenFallback expression —
            # INTERPRETED per row — and at 200k enrolled vectors its
            # cost turned bimodal under JIT pressure (instrumented: one
            # run's scoring stage burned 1288 s of executor CPU where
            # the identical plan takes ~11 s steady —
            # tools/probe_vector_delete caught 3 s ↔ 72 s swings).
            # Above the gate, score in the Arrow kernel with the
            # ascending-dimension float64 fold — the exact IEEE
            # sequence the HOF fold evaluates, so sims are bit-equal
            # (the similarity_join_vectorized contract); rounding stays
            # JVM-side (numpy rounds half-even, Spark half-up). Below
            # the gate the all-JVM fold avoids the ~0.7 s Arrow
            # spin-up. The count is cached on the instance (invalidated
            # by add/compact — ADVICE r11: re-counting per query() call
            # was one Spark job per index part per call, and the
            # footer-only claim doesn't hold for the bucketed-table
            # scan path).
            if self._n_rows_cache is None:
                self._n_rows_cache = sum(p.count() for p in _aparts())
            if self._n_rows_cache > kernel_threshold:
                return _score_candidates_kernel(cand, query_id, self.id_col)
            return cand.select(
                query_id,
                self.id_col,
                F.round(
                    dot(F.col("__qe"), F.col("emb"))
                    / (F.col("__nq") * l2_norm(F.col("emb"))),
                    SIM_ROUND,
                ).alias("sim"),
            )

        def _rank(scored, kk: int):
            # The shared compaction contract tolerates duplicate index
            # rows (crash-stale deltas, a batch replayed
            # post-compaction) as "decision-neutral: candidates are
            # deduplicated and exactly verified" — make that true HERE
            # too, as the dedup path does: without this a duplicated
            # vector occupies two adjacent ranks and displaces a
            # legitimate top-k result (ADVICE r9). Duplicate rows are
            # byte-identical by contract, so any survivor carries the
            # same sim. Tombstone filter BEFORE the rank window: a
            # removed vector must not occupy a rank and displace a live
            # top-k result — nor, on the refine path, eat one of the
            # refine·k exact-rescore slots.
            w = Window.partitionBy(query_id).orderBy(
                F.col("sim").desc(), F.col(self.id_col)
            )
            return (
                self._minus_tombstones(
                    spark, scored.dropDuplicates([query_id, self.id_col]),
                    id_name=self.id_col,
                )
                .withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= kk)
                .select(query_id, self.id_col, "rank", "sim")
            )

        def _exact_refine(approx_scored):
            # the top refine·k LIVE approximate candidates per query,
            # re-scored exactly — the shared recall-repair tail of
            # adc_refine and sq8_refine. The full-vector join stays
            # inside the probed cells (the candidate came from one),
            # so the assignments scan keeps the same IN-filter
            # row-group pruning as the exact path — it just reads
            # refine·k rows per query instead of every candidate in
            # the probed cells.
            cand_ids = _rank(approx_scored, refine * k).select(
                query_id, self.id_col
            )
            embf = None
            for p in _aparts():
                s = p.filter(F.col("cell").isin(probed)).select(
                    F.col("id").alias(self.id_col), "emb"
                )
                embf = s if embf is None else embf.unionByName(s)
            embf = embf.dropDuplicates([self.id_col])
            qmeta = qcells.select(
                query_id, "__qe", "__nq"
            ).dropDuplicates([query_id])
            recand = (
                cand_ids.join(embf, self.id_col)
                .join(F.broadcast(qmeta), query_id)
                .select(query_id, self.id_col, "__qe", "__nq", "emb")
            )
            return _rank(_exact_scored(recand), k)

        if scoring == "exact":
            return _rank(
                _exact_scored(_cand_from(_aparts(), "assignments", "emb")), k
            )

        if scoring in ("sq8", "sq8_refine"):
            bounds = self._sq_bounds(spark)
            scand = _cand_from(
                _index_component_frames(spark, self.path, "sq_codes"),
                "sq_codes",
                "codes",
            ).filter(
                F.col("codes").isNotNull()  # defective rows: no codes
            )
            sqs = _score_candidates_sq_kernel(
                scand, query_id, self.id_col, bounds
            )
            if scoring == "sq8":
                return _rank(sqs, k)
            return _exact_refine(sqs)

        if scoring in ("bq1", "bq1_refine"):
            thr = self._bq_thresholds(spark)
            bcand = _cand_from(
                _index_component_frames(spark, self.path, "bq_words"),
                "bq_words",
                "words",
            ).filter(
                F.col("words").isNotNull()  # defective rows: no words
            )
            bqs = _score_candidates_bq_kernel(
                bcand, query_id, self.id_col, thr
            )
            if scoring == "bq1":
                return _rank(bqs, k)
            return _exact_refine(bqs)

        books = self._pq_books(spark)  # refreshes the residual flag too
        residual = self._pq_cache_residual
        ccand = _cand_from(
            _index_component_frames(spark, self.path, "pq_codes"),
            "pq_codes",
            "codes",
            keep_cell=residual,
        ).filter(
            F.col("codes").isNotNull()  # defective-element rows: no codes
        )
        if residual:
            adc = _score_candidates_rpq_kernel(
                ccand, query_id, self.id_col, books, cents
            )
        else:
            adc = _score_candidates_pq_kernel(
                ccand, query_id, self.id_col, books
            )
        if scoring == "adc":
            return _rank(adc, k)
        return _exact_refine(adc)
