"""Vectorized embedding surface — the production path for the reference's
embedding function (SURVEY §2.12 "vector UDF").

Reference: rag_evaluation/RAG-eval-test_model.py:65-117 — tokenizer
(max_length=1024, padding, truncation) → model forward → mean-pooled last
hidden state → ``List[float]`` per chunk/query.

Spark-side contract:

- an Arrow-batched ``pandas_udf`` returning ``array<float>`` — whole text
  batches cross the JVM↔Python boundary once per Arrow batch, never per
  row;
- the model handle is constructed lazily **once per Python worker** via a
  module-level cache keyed by a string (the loader itself is a cheap
  picklable closure; weights load on executor first-use and are reused
  across batches and tasks — the "per-executor model broadcast" pattern);
- embeddings are non-deterministic across model/tokenizer versions, so
  this surface stays OUT of the oracle-checked queries (SURVEY §7 risk 4:
  the precomputed ``embeddings`` table is the determinism boundary).
  Tests use :func:`hash_embedding_loader`, a deterministic mock with the
  same tokenize→encode→mean-pool shape.

Real transformer loaders are not available in this container; plugging
one in is writing a ``loader`` that returns a ``Series → Series`` encode
function, e.g. wrapping ``AutoModel`` + mean-pooling exactly like the
reference.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# One model handle per (python worker, key). Populated lazily inside the
# UDF — never serialized from the driver.
_MODEL_CACHE: dict[str, Callable[[pd.Series], pd.Series]] = {}


def hash_embedding_loader(
    dim: int = 16, max_tokens: int = 1024
) -> Callable[[], Callable[[pd.Series], pd.Series]]:
    """Deterministic mock model factory: each whitespace token maps to a
    fixed pseudo-random unit-scale vector derived from its blake2b digest
    (stable across processes and Python hash seeds), and a text embeds as
    the mean over its first ``max_tokens`` token vectors — the same
    truncate→encode→mean-pool shape as the reference's model
    (RAG-eval-test_model.py:74-87), with none of the weights."""

    def loader() -> Callable[[pd.Series], pd.Series]:
        import hashlib

        def token_vec(tok: str) -> np.ndarray:
            # 8 bytes of digest per dimension → uniform in [-1, 1)
            need = dim * 8
            buf = b""
            counter = 0
            while len(buf) < need:
                buf += hashlib.blake2b(
                    f"{counter}\x00{tok}".encode(), digest_size=32
                ).digest()
                counter += 1
            ints = np.frombuffer(buf[:need], dtype="<u8")
            return (ints / 2**63).astype("float64") - 1.0

        def encode(texts: pd.Series) -> pd.Series:
            out = []
            for t in texts:
                toks = (t or "").lower().split()[:max_tokens]
                if not toks:
                    out.append(np.zeros(dim, dtype="float32"))
                    continue
                m = np.mean([token_vec(tok) for tok in toks], axis=0)
                out.append(m.astype("float32"))
            return pd.Series(out)

        return encode

    loader._cache_key = f"hash_embed:{dim}:{max_tokens}"
    return loader


def embed_text(
    col: Column | str,
    loader: Callable[[], Callable[[pd.Series], pd.Series]] | None = None,
    cache_key: str | None = None,
) -> Column:
    """``array<float>`` embedding of a text column via an Arrow-batched
    pandas UDF with a per-worker model cache.

    ``loader`` builds the encode function (called at most once per Python
    worker); ``cache_key`` names the cache slot — pass distinct keys for
    distinct models, the default derives from the loader's qualname.
    """
    if loader is None:
        loader = hash_embedding_loader()
    key = (
        cache_key
        or getattr(loader, "_cache_key", None)
        or f"{loader.__module__}.{getattr(loader, '__qualname__', repr(loader))}"
    )

    @F.pandas_udf("array<float>")
    def _embed(texts: pd.Series) -> pd.Series:
        model = _MODEL_CACHE.get(key)
        if model is None:
            model = _MODEL_CACHE[key] = loader()
        return model(texts)

    return _embed(F.col(col) if isinstance(col, str) else col)
