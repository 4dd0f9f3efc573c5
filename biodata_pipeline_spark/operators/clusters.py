"""Connected components over near-duplicate pair edges.

The dedup family (exact / Jaccard / MinHash / SimHash / cosine) emits
*pair* edges; an actual dedup pass needs *clusters* — every document
labeled with a canonical representative so one survivor per cluster can
be kept. Pairs → clusters is connected components: an inherently
iterative computation (SURVEY §2's "genuinely non-SQL-expressible"
category), implemented as label propagation:

    label(v) ← min(label(v), min over neighbors u of label(u))

repeated to fixpoint. Each round is one join + one aggregation; the
number of rounds is bounded by the graph diameter (near-dup clusters are
shallow — a handful of rounds in practice). ``localCheckpoint`` truncates
the lineage each round so plans don't grow with iterations — the
standard Spark pattern for iterative algorithms (same shape GraphX/
GraphFrames use).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Cluster assignment from an undirected edge list.

    Returns ``(id, component)`` for every vertex appearing in ``edges``,
    where ``component`` is the smallest vertex id reachable from ``id`` —
    deterministic, so downstream "keep min-id per cluster" decisions are
    reproducible. Isolated vertices don't appear (no edges ⇒ no dedup
    decision needed).

    Raises ``RuntimeError`` if the labels have not reached fixpoint within
    ``max_iterations`` — chain-shaped clusters (successively drifting
    near-dups) can exceed any fixed round budget, and unconverged labels
    would silently keep several "survivors" from one cluster. Raise the
    budget for deep graphs; propagation costs one join per round.
    """
    # Undirected: materialize both directions once.
    fwd = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = fwd.unionByName(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    ).distinct()
    sym = sym.localCheckpoint()

    labels = (
        sym.groupBy("u")
        .agg(F.min("v").alias("nbr_min"))
        .select(
            F.col("u").alias("id"),
            F.least(F.col("u"), F.col("nbr_min")).alias("component"),
        )
        .localCheckpoint()
    )
    for _ in range(max_iterations):
        # candidate label per vertex: min over neighbors' current labels
        neighbor_labels = (
            sym.join(labels.withColumnRenamed("id", "v"), "v")
            .groupBy("u")
            .agg(F.min("component").alias("nbr_label"))
            .select(F.col("u").alias("id"), "nbr_label")
        )
        # (Pointer doubling was tried and measured SLOWER here: near-dup
        # clusters are shallow, so the extra per-round join costs more than
        # the rounds it saves. Plain propagation wins for this graph shape.)
        # The convergence flag rides along in the same projection, so the
        # fixpoint test is a filter over the already-materialized
        # checkpoint — not a second labels⋈updated join per round.
        updated = (
            labels.withColumnRenamed("component", "__old")
            .join(neighbor_labels, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("__old"), F.coalesce("nbr_label", F.col("__old"))
                ).alias("component"),
                (F.coalesce("nbr_label", F.col("__old")) < F.col("__old")).alias(
                    "__changed"
                ),
            )
            .localCheckpoint()
        )
        changed = updated.filter(F.col("__changed")).limit(1).count()
        labels = updated.drop("__changed")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge within {max_iterations} "
        "rounds — the edge graph has a component deeper than the budget; "
        "raise max_iterations"
    )


def dedup_survivors(
    df: DataFrame,
    pair_edges: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """End-to-end dedup decision: keep the min-id member of every near-dup
    cluster plus all unpaired rows. This is the operator a training-data
    pipeline actually runs after MinHash/SimHash pair generation."""
    comp = connected_components(pair_edges, src, dst)
    losers = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    # No broadcast hint: in a duplicate-heavy corpus `losers` is a large
    # fraction of all rows — let AQE pick the join strategy from its size.
    return df.join(losers, id_col, "left_anti")
