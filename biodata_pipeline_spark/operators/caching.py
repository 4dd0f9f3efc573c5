"""Caller-controlled lifetime for operator-internal persisted frames.

Several operators ``persist()`` an internal frame because it feeds
multiple consumers inside one query (the MinHash band table, the
collapse rep table, the flagship's scored stream). Spark has no scoped
cache: without an explicit ``unpersist()`` those frames live until the
session dies, so a library user composing many per_content-style queries
accumulates executor storage with no release path (the bench harness
works around it with ``spark.catalog.clearCache()``, which a library
user sharing a session with other workloads cannot safely call).

``cache_scope()`` is that release path::

    with cache_scope():
        result = duplicated_passages(docs).collect()   # materialize INSIDE
    # every operator-internal persist made in the scope is now unpersisted

Operators report each internal ``persist()`` via ``register_cached``
(a no-op when no scope is active — standalone behavior is unchanged).
Scopes nest: a frame is released by the innermost scope active when it
was registered. The caller must materialize results before the scope
exits — unpersisting is lazy-safe (Spark just recomputes), so an
escaped, unmaterialized frame stays CORRECT but loses the reuse the
persist existed for.
"""

from __future__ import annotations

import contextlib
import threading

from pyspark.sql import DataFrame

_active = threading.local()


def _stack() -> list[list[DataFrame]]:
    if not hasattr(_active, "stack"):
        _active.stack = []
    return _active.stack


def register_cached(df: DataFrame) -> DataFrame:
    """Record an operator-internal ``persist()`` with the innermost active
    ``cache_scope`` (no-op when none is active). Returns ``df``."""
    stack = _stack()
    if stack:
        stack[-1].append(df)
    return df


@contextlib.contextmanager
def cache_scope(blocking: bool = False):
    """Unpersist every operator-internal frame registered while the scope
    was the innermost one. Yields the (mutable) list of tracked frames."""
    frames: list[DataFrame] = []
    _stack().append(frames)
    try:
        yield frames
    finally:
        _stack().pop()
        for df in frames:
            try:
                df.unpersist(blocking)
            except Exception:
                pass  # session already stopped — nothing to release
