"""Money/metric aggregation variants: exact-decimal vs fast-double.

Two sums of the same column, two contracts:

- :func:`dec_sum` / :func:`dec_avg` — cast each value onto its decimal
  grid and sum exactly in decimal. Bit-identical across engines,
  partitionings, and scale factors; this is what every oracle-checked
  query uses (registry/relational.py:_dec_sum). Cost: decimal arithmetic
  is ~10× double per row (measured: q21 at the 100× replica, ~21 s vs
  ~2.3 s — SCALING.md), though fully parallel.

- :func:`fast_sum` / :func:`fast_avg` — plain float64 accumulation.
  ~10× cheaper, but the result depends on accumulation order, so two
  runs (or two engines, or two partitionings) can differ in final ulps,
  and the absolute error grows with the data. Use for production paths
  where a monitoring metric, a score threshold, or a relative comparison
  is consumed — anywhere a 1e-12 relative wobble is invisible. Never use
  in a declared/oracle-checked query or anything hashed for equality.

Rule of thumb at 100 TB: reductions that feed *decisions on exact
equality* (dedup keys, bucketing, hash checks) stay on the decimal grid;
reductions that feed *dashboards and ratios* take the fast path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dec_sum(col: Column | str, grain: int = 2) -> Column:
    """Exact sum on a ``grain``-decimal grid, returned as double.
    Deterministic across engines/partitionings at any SF."""
    return F.sum(_c(col).cast(f"decimal(28,{grain})")).cast("double")


def dec_avg(col: Column | str, grain: int = 2) -> Column:
    """Deterministic average: exact decimal sum / count (never avg())."""
    c = _c(col)
    return dec_sum(c, grain) / F.count(c)


def fast_sum(col: Column | str) -> Column:
    """Float64 sum — ~10× cheaper than the decimal grid, order-dependent
    in the last ulps. For production metrics, not for hashed results."""
    return F.sum(_c(col).cast("double"))


def fast_avg(col: Column | str) -> Column:
    """Float64 average with the same tradeoff as :func:`fast_sum`."""
    c = _c(col)
    return F.avg(c.cast("double"))
