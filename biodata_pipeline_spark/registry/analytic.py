"""Multidimensional aggregation + distribution-window queries: CUBE,
GROUPING SETS, pivot, and ntile/percent_rank/cume_dist.

The reference's sweep grids report metrics per (adapter-type, epoch,
task) cell and then aggregate across every subset of those dimensions by
re-reading the result JSONs (llm_harness_evaluation/
test_all_models_llm_eval_sophia.py:38-52). CUBE / GROUPING SETS compute
all those subtotal levels in ONE pass — Catalyst's Expand node replays
each row per grouping set before the single hash aggregate, so the plan
has exactly one shuffle regardless of how many levels are requested.
Pivot is the grid-cell → matrix layout step; the distribution windows
(ntile/percent_rank/cume_dist) are the per-group score-distribution
analyses of the harness results, partitioned by group key so no task
ever holds more than one group's rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from biodata_pipeline_spark.functions import aggs
from biodata_pipeline_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# TPC-H order priorities: the pivot's closed column domain. Passing the
# values explicitly skips pivot's extra distinct-collect job (at scale
# that job is a full shuffle just to learn column names).
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def q_cube_pricing(spark, sf_dir):
    """CUBE over (returnflag, linestatus): every subtotal combination in
    one Expand + one hash aggregate (single shuffle)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        aggs.dec_sum("l_extendedprice", 2).alias("revenue"),
        F.count("*").alias("n_items"),
    )


def q_grouping_sets_revenue(spark, sf_dir):
    """Explicit GROUPING SETS ((nation, priority), (nation), ()) — the
    rollup levels the reference recomputes by re-scanning result files,
    declared once. Dim joins broadcast; one shuffle for the aggregate."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    joined = o.join(c, o.o_custkey == c.c_custkey).join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    )
    return joined.groupingSets(
        [["n_name", "o_orderpriority"], ["n_name"], []],
        "n_name",
        "o_orderpriority",
    ).agg(
        aggs.dec_sum("o_totalprice", 2).alias("revenue"),
        F.count("*").alias("n_orders"),
    )


def q_pivot_priority_matrix(spark, sf_dir):
    """Pivot order counts into a status × priority matrix (the sweep-grid
    cell layout, test_all_models_llm_eval_sophia.py:49-52)."""
    o = _t(spark, sf_dir, "orders")
    wide = o.groupBy("o_orderstatus").pivot("o_orderpriority", PRIORITIES).count()
    return wide.select(
        "o_orderstatus",
        *[
            F.coalesce(F.col(f"`{p}`"), F.lit(0)).alias(alias)
            for p, alias in zip(
                PRIORITIES, ["urgent", "high", "medium", "not_specified", "low"]
            )
        ],
    )


def q_ntile_distribution(spark, sf_dir):
    """Per-customer order-value distribution: quartile, percent_rank,
    cume_dist. Partitioned by customer — no global window, no straggler."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cume"),
    )


def q_stats_corr(spark, sf_dir):
    """Statistical aggregates — correlation + stddev per group — computed
    deterministically from EXACT decimal-grid power sums, not the engines'
    native corr()/stddev() (whose accumulation order differs per engine
    and partitioning). The inputs sit on a 2 dp grid, so their products
    sit on an exact 4 dp grid (a float64 product is within 1 ulp of the
    grid point, far inside the half-grain); the final formula is a fixed
    float64 op chain over the exact sums — bit-identical anywhere.

    Spread before the aggregate (r16): every flop here is in the
    map-side decimal power sums, one-task-bound on the single-row-group
    testdata file (measured 1.56x with the spread); decimal sums are
    exact, so partitioning cannot move the result."""
    from biodata_pipeline_spark.sources.tables import spread_small_scan

    li = spread_small_scan(_t(spark, sf_dir, "lineitem"), spark, sf_dir,
                           "lineitem")
    x, y = F.col("l_extendedprice"), F.col("l_discount")
    g = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x.cast("decimal(28,2)")).cast("double").alias("sx"),
        F.sum(y.cast("decimal(28,2)")).cast("double").alias("sy"),
        F.sum((x * y).cast("decimal(28,4)")).cast("double").alias("sxy"),
        F.sum((x * x).cast("decimal(28,4)")).cast("double").alias("sxx"),
        F.sum((y * y).cast("decimal(28,4)")).cast("double").alias("syy"),
    )
    n = F.col("n").cast("double")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = n * F.col("syy") - F.col("sy") * F.col("sy")
    return g.select(
        "l_returnflag",
        "n",
        F.round(cov / (F.sqrt(vx) * F.sqrt(vy)), 6).alias("corr_price_discount"),
        F.round(F.sqrt(vx / (n * (n - 1))), 4).alias("stddev_price"),
    )


SPARK = {
    "q_cube_pricing": q_cube_pricing,
    "q_grouping_sets_revenue": q_grouping_sets_revenue,
    "q_pivot_priority_matrix": q_pivot_priority_matrix,
    "q_ntile_distribution": q_ntile_distribution,
    "q_stats_corr": q_stats_corr,
}

ORACLE = {
    "q_stats_corr": """
        WITH s AS (
            SELECT l_returnflag, count(*) AS n,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sx,
                   CAST(sum(CAST(l_discount AS DECIMAL(28,2))) AS DOUBLE) AS sy,
                   CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(28,4))) AS DOUBLE) AS sxy,
                   CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sxx,
                   CAST(sum(CAST(l_discount * l_discount AS DECIMAL(28,4))) AS DOUBLE) AS syy
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag, n,
               round((n * sxy - sx * sy)
                     / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
                 AS corr_price_discount,
               round(sqrt((n * sxx - sx * sx) / (n * (n - 1))), 4) AS stddev_price
        FROM s
    """,
    "q_cube_pricing": """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS revenue,
               count(*) AS n_items
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "q_grouping_sets_revenue": """
        SELECT n_name, o_orderpriority,
               CAST(sum(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS revenue,
               count(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY GROUPING SETS ((n_name, o_orderpriority), (n_name), ())
    """,
    "q_pivot_priority_matrix": """
        SELECT o_orderstatus,
               count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS urgent,
               count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS high,
               count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS medium,
               count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS not_specified,
               count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS low
        FROM orders GROUP BY o_orderstatus
    """,
    "q_ntile_distribution": """
        SELECT o_custkey, o_orderkey,
               CAST(ntile(4) OVER w AS INTEGER) AS quartile,
               round(percent_rank() OVER w, 9) AS pct_rank,
               round(cume_dist() OVER w, 9) AS cume
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
}
