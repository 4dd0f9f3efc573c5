"""Connected components over near-duplicate pair edges.

The dedup family (exact / Jaccard / MinHash / SimHash / cosine) emits
*pair* edges; an actual dedup pass needs *clusters* — every document
labeled with a canonical representative so one survivor per cluster can
be kept. Pairs → clusters is connected components: an inherently
iterative computation (SURVEY §2's "genuinely non-SQL-expressible"
category), implemented as alternating large-star / small-star
contraction (Kiveris et al. 2014, "Connected Components in MapReduce
and Beyond" — the standard Spark CC):

    large-star:  for each node u, hook every LARGER neighbor to
                 m(u) = min(Γ(u) ∪ {u})
    small-star:  for each node u, hook u and its SMALLER neighbors
                 to their minimum

Each operation is one groupBy-min plus one join, and the edge set
CONTRACTS as clusters collapse toward their minima — unlike plain label
propagation, which reshuffles the full edge set every round and needs
diameter-many rounds (the round-4 scale probe's worst offender: 6.4×
at 100× data). Star contraction converges in O(log² n) rounds with
geometrically shrinking work; the fixpoint is a star forest whose
centers are the component minima. ``localCheckpoint`` truncates lineage
each round so plans don't grow with iterations (the standard Spark
pattern for iterative algorithms; GraphX/GraphFrames do the same).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _is_star_forest(canon: DataFrame) -> bool:
    """True iff the (hi, lo) edge set is a star forest: every hi occurs
    exactly once and no hi also appears as a lo. A star forest is a
    fixpoint of both star operations (checked directly instead of
    running a confirming round — one limit-1 job against the
    just-checkpointed edges, saving a full round of shuffles)."""
    multi_hi = (
        canon.groupBy("hi")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") > 1)
        .select(F.lit(1).alias("bad"))
    )
    hi_is_lo = canon.join(
        canon.select(F.col("hi").alias("lo")).distinct(), "lo", "left_semi"
    ).select(F.lit(1).alias("bad"))
    return multi_hi.unionByName(hi_is_lo).limit(1).count() == 0


# Edge-count bound for the driver union-find shortcut. Dedup edge sets
# are SPARSE by construction (near-dup pairs, not all-pairs); below this
# bound the edges are aggregate-sized and every star-contraction round's
# fixed job latency (two window shuffles + distinct + convergence probe,
# ~0.3 s each on a 32-partition session) dwarfs the actual work —
# measured 2.5 s of rounds for a 45-edge graph at sf0.1. The same
# observed-size strategy switch as retrieve_top_k_auto / the flagship's
# kernel-vs-HOF pick; both paths produce identical labels (min reachable
# id), pinned against each other in tests/test_audit.py.
SMALL_GRAPH_EDGES = 100_000


def _union_find_components(pairs):
    """Driver-side union-find with min-label roots (path-halving).
    Ids may be any orderable type (int, string, ...)."""
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return [(x, find(x)) for x in parent]


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 20,
    small_graph_edges: int = SMALL_GRAPH_EDGES,
) -> DataFrame:
    """Cluster assignment from an undirected edge list.

    Returns ``(id, component)`` for every vertex appearing in ``edges``,
    where ``component`` is the smallest vertex id reachable from ``id`` —
    deterministic, so downstream "keep min-id per cluster" decisions are
    reproducible. Vertices with only self-loop edges map to themselves.

    Strategy switch on the OBSERVED deduplicated edge count (known for
    free: the canonical edge set is checkpointed before iterating):
    at most ``small_graph_edges`` edges → driver union-find (the
    MLlib-shaped aggregate-sized collect; one job, no rounds); larger →
    alternating star contraction (fully distributed).

    Raises ``RuntimeError`` if the star forest has not stabilized within
    ``max_iterations`` rounds of (large-star, small-star) — unconverged
    labels would silently keep several "survivors" from one cluster.
    O(log² n) rounds suffice for any graph, so a hit budget signals a
    pathological input, not a tuning knob to raise casually.
    """
    # Narrow (a, b) projection checkpointed ONCE: both the canonical
    # edge set and the final vertex inventory consume it, so an expensive
    # upstream edge derivation (e.g. the exact-Jaccard shingle join) runs
    # once, not once per consumer. localCheckpoint is MEMORY_AND_DISK —
    # two longs per edge, spill-safe at any realistic near-dup density.
    e = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).localCheckpoint()
    canon = (
        e.filter(F.col("a") != F.col("b"))
        .select(
            F.greatest("a", "b").alias("hi"), F.least("a", "b").alias("lo")
        )
        .distinct()
        .localCheckpoint()
    )
    if canon.count() <= small_graph_edges:
        from pyspark.sql.types import StructField, StructType

        spark = edges.sparkSession
        labels = _union_find_components(
            [(r.hi, r.lo) for r in canon.collect()]
        )
        # Schema derived from the canonical edges so the shortcut matches
        # the distributed path for ANY orderable id type (string ids used
        # to crash here, int32 ids silently widened to long — and which
        # behavior fired depended on the edge count crossing
        # small_graph_edges).
        id_type = canon.schema["hi"].dataType
        uf_schema = StructType(
            [
                StructField("id", id_type, True),
                StructField("component", id_type, True),
            ]
        )
        comp_uf = spark.createDataFrame(
            labels or [(None, None)], uf_schema
        ).filter(F.col("id").isNotNull())
        vertices = (
            e.select(F.col("a").alias("id"))
            .unionByName(e.select(F.col("b").alias("id")))
            .distinct()
        )
        self_only = vertices.join(comp_uf.select("id"), "id", "left_anti")
        return comp_uf.unionByName(
            self_only.withColumn("component", F.col("id"))
        )
    from pyspark.sql import Window

    converged = _is_star_forest(canon)
    for _ in range(max_iterations):
        if converged:
            break
        # LARGE-STAR: per node u, hook each neighbor v > u to
        # m = min(Γ(u) ∪ {u}). A min-window over u — ONE shuffle,
        # single pass, no groupBy+join round trip. Output keeps the
        # hi > lo orientation (v > u ≥ m).
        sym = canon.select(
            F.col("hi").alias("u"), F.col("lo").alias("v")
        ).unionByName(canon.select(F.col("lo").alias("u"), F.col("hi").alias("v")))
        large = (
            sym.withColumn(
                "mn", F.least(F.min("v").over(Window.partitionBy("u")), F.col("u"))
            )
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("hi"), F.col("mn").alias("lo"))
        )
        # SMALL-STAR over the hi > lo edges: per node hi, hook hi and
        # every smaller neighbor to m = min of the smaller neighbors —
        # the same min-window shape, with both emitted edges produced in
        # the same pass via explode (duplicates from skipping large's
        # distinct are harmless: min is idempotent, and the final
        # distinct collapses them).
        small = large.withColumn(
            "m", F.min("lo").over(Window.partitionBy("hi"))
        )
        canon_next = (
            small.select(
                F.explode(
                    F.array(
                        F.struct(F.col("lo").alias("hi"), F.col("m").alias("lo")),
                        F.struct(F.col("hi").alias("hi"), F.col("m").alias("lo")),
                    )
                ).alias("e")
            )
            .select("e.hi", "e.lo")
            .filter(F.col("hi") != F.col("lo"))
            .distinct()
            .localCheckpoint()
        )
        converged = _is_star_forest(canon_next)
        canon = canon_next
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge within {max_iterations} "
            "rounds of star contraction — pathological input (star "
            "contraction needs O(log² n) rounds on any graph); raise "
            "max_iterations"
        )
    # Fixpoint = star forest: every hi occurs once, pointing at its
    # component minimum; centers map to themselves. Vertices that only
    # ever appeared in self-loops are their own components.
    comp = canon.select(F.col("hi").alias("id"), F.col("lo").alias("component"))
    roots = canon.select(F.col("lo").alias("id")).distinct().withColumn(
        "component", F.col("id")
    )
    vertices = (
        e.select(F.col("a").alias("id"))
        .unionByName(e.select(F.col("b").alias("id")))
        .distinct()
    )
    self_only = vertices.join(
        comp.select("id").unionByName(roots.select("id")), "id", "left_anti"
    ).withColumn("component", F.col("id"))
    return comp.unionByName(roots).unionByName(self_only)


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
