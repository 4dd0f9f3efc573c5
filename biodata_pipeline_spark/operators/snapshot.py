"""Corpus snapshot diffing — what changed between two corpus versions.

A recurring-ingest pipeline (the reference's re-runnable generation step,
generate_narratives_from_data.py:55-60, decides per-output-file whether
work is already done) needs the table-level version of that decision:
given yesterday's corpus and today's crawl, which documents are new,
which disappeared, which changed content. The diff drives incremental
embedding/scoring (only ``added``/``changed`` rows re-enter the expensive
stages) and is the audit artifact for data versioning.

Scale shape: one full outer join on the id — both sides project down to
``(id, fingerprint, payload-size)`` before the shuffle, so the join
carries ~32 bytes/row regardless of document size, and content equality
is a fingerprint compare, not a text compare. At 100 TB the ids are
hash-partitioned; no skew (ids are unique per side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Column
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    fingerprint: Column | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Row-level diff of two corpus snapshots.

    Returns one row per document that is NOT unchanged:
    ``(doc_id, status, chars_old, chars_new)`` with status in
    ``added`` (only in new), ``removed`` (only in old), ``changed``
    (present in both, fingerprint differs). ``chars_*`` are null on the
    side where the document does not exist.

    ``fingerprint`` defaults to ``md5(text_col)`` — engine-portable, so
    the diff itself is oracle-checkable. ``text_col`` names the payload
    column used for both the default fingerprint and the char counts, so
    tables without a ``text`` column work by passing their own column.

    Precondition: ``id_col`` is unique within each snapshot (the corpus
    primary key). Duplicate ids would fan out in the full outer join —
    run ``exact_dedup`` first if the snapshot may contain key dupes.
    """
    fp = fingerprint if fingerprint is not None else F.md5(F.col(text_col))
    o = old.select(
        F.col(id_col).alias("id"),
        fp.alias("fp_old"),
        F.length(text_col).cast("long").alias("chars_old"),
    )
    n = new.select(
        F.col(id_col).alias("id"),
        fp.alias("fp_new"),
        F.length(text_col).cast("long").alias("chars_new"),
    )
    joined = o.join(n, "id", "full_outer")
    return (
        joined.withColumn(
            "status",
            F.when(F.col("fp_old").isNull(), F.lit("added"))
            .when(F.col("fp_new").isNull(), F.lit("removed"))
            .when(F.col("fp_old") != F.col("fp_new"), F.lit("changed"))
            .otherwise(F.lit("unchanged")),
        )
        .filter(F.col("status") != "unchanged")
        .select(
            F.col("id").alias("doc_id"), "status", "chars_old", "chars_new"
        )
    )


def incremental_work_set(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    fingerprint: Column | None = None,
    text_col: str = "text",
) -> DataFrame:
    """The rows of ``new`` that must re-enter the expensive stages:
    documents whose content is new or changed since ``old``. The
    table-level generalization of the reference's skip-if-output-exists
    check — a semi-join of ``new`` against the diff's added/changed ids,
    so payload columns never enter the diff shuffle."""
    work_ids = snapshot_diff(old, new, id_col, fingerprint, text_col).filter(
        F.col("status").isin("added", "changed")
    )
    return new.join(
        work_ids.select(F.col("doc_id").alias(id_col)), id_col, "left_semi"
    )


def edit_severity(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    trivial: float = 0.9,
    moderate: float = 0.5,
) -> DataFrame:
    """Grade every CHANGED document by how much actually changed.

    ``snapshot_diff`` says *that* a doc changed; the incremental-ingest
    decision needs *how much*: a fixed typo should not invalidate the
    doc's embeddings, near-dup signatures, and quality scores, while a
    rewrite must re-enter every stage. For each id present in both
    snapshots with differing content, compute the n-token-shingle
    Jaccard between its old and new text and classify:

      jaccard >= ``trivial``   → 'trivial'   (keep derived artifacts)
      jaccard >= ``moderate``  → 'moderate'  (re-embed, keep identity)
      else                     → 'rewrite'   (full re-process)

    Output: ``(id_col, jaccard, severity)`` — one row per changed doc.

    Plan shape: ONE equi-join on the id (co-partitioned, no fan-out —
    ids are unique per snapshot, same precondition as snapshot_diff);
    the Jaccard is per-ROW set math over the two shingle arrays
    (array_intersect/array_union HOFs, zero extra shuffle) — never a
    corpus-wide shingle join, because the pairs are already known. Both
    docs empty/too-short → jaccard 1.0 (nothing measurable changed at
    shingle granularity; the fingerprint filter already said bytes
    differ, so 'trivial' is the honest grade).
    """
    from biodata_pipeline_spark.operators.dedup import token_shingles

    o = old.select(
        F.col(id_col).alias("id"),
        F.md5(F.col(text_col)).alias("fp_old"),
        token_shingles(F.col(text_col), n).alias("sh_old"),
    )
    nw = new.select(
        F.col(id_col).alias("id"),
        F.md5(F.col(text_col)).alias("fp_new"),
        token_shingles(F.col(text_col), n).alias("sh_new"),
    )
    inter = F.size(F.array_intersect("sh_old", "sh_new"))
    union = F.size(F.array_union("sh_old", "sh_new"))
    j = F.when(union == 0, F.lit(1.0)).otherwise(
        F.round(inter / union.cast("double"), 9)
    )
    return (
        o.join(nw, "id")
        .filter(F.col("fp_old") != F.col("fp_new"))
        .withColumn("jaccard", j)
        .select(
            F.col("id").alias(id_col),
            "jaccard",
            F.when(F.col("jaccard") >= trivial, F.lit("trivial"))
            .when(F.col("jaccard") >= moderate, F.lit("moderate"))
            .otherwise(F.lit("rewrite"))
            .alias("severity"),
        )
    )
