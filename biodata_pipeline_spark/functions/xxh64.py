"""Vectorized numpy twin of Spark SQL's ``xxhash64`` for Arrow kernels.

Spark's ``xxhash64(a, b, ...)`` (catalyst ``XxHash64`` over the public
XXH64 algorithm, seed 42) folds its arguments left to right: each
argument's hash becomes the seed of the next. A LONG argument goes
through the one-8-byte-block path, an INT argument through the
one-4-byte-block path (widened unsigned into the long lane). Both end
in the same avalanche mix. Every operation is 64-bit wraparound
arithmetic, which numpy's uint64 reproduces exactly — so these
functions are BIT-IDENTICAL to the JVM expressions on every input
(pinned in tests/test_dedup.py against live ``F.expr`` evaluation),
which is the precondition for swapping a hot interpreted-HOF stage for
an Arrow kernel without changing one emitted row.

Why this exists: the MinHash signature fold
(``operators/dedup.py::minhash_signature_from`` — 32 lanes of
``xxhash64(h, i)`` under ``array_min`` per row) is a CodegenFallback
expression chain, i.e. interpreted per element. Interpreted HOFs on
hot paths have twice shown multi-minute JIT-bimodality outliers at
scale (SCALING r11: 11 s ↔ 1288 s on the index scoring stage;
SCALING r12: a 28× one-run outlier on a 1M-doc ingest-gate admit whose
signature fold is exactly this expression). The kernel removes the
interpreter from the loop entirely.
"""

from __future__ import annotations

import numpy as np

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)

SEED = np.uint64(42)  # Spark's fixed xxhash64 seed


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r64 = np.uint64(r)
    return (x << r64) | (x >> (np.uint64(64) - r64))


def _fmix(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> np.uint64(33))
    h = h * _P2
    h = h ^ (h >> np.uint64(29))
    h = h * _P3
    h = h ^ (h >> np.uint64(32))
    return h


def hash_long(value: np.ndarray, seed: np.ndarray | np.uint64) -> np.ndarray:
    """XXH64 of one LONG block — Spark's ``XXH64.hashLong(value, seed)``.
    ``value`` must already be uint64 (two's-complement view of the
    signed long); ``seed`` is a scalar or a matching array (chaining)."""
    h = seed + _P5 + np.uint64(8)
    k1 = _rotl(value * _P2, 31) * _P1
    h = h ^ k1
    h = _rotl(h, 27) * _P1 + _P4
    return _fmix(h)


def hash_int(value: int | np.ndarray, seed: np.ndarray | np.uint64) -> np.ndarray:
    """XXH64 of one INT block — Spark's ``XXH64.hashInt(value, seed)``:
    the int is widened UNSIGNED into the 64-bit lane."""
    v = (np.uint64(value) if not isinstance(value, np.ndarray) else value) & np.uint64(
        0xFFFFFFFF
    )
    h = seed + _P5 + np.uint64(4)
    h = h ^ (v * _P1)
    h = _rotl(h, 23) * _P2 + _P3
    return _fmix(h)


def xxhash64_long_int(longs: np.ndarray, i: int) -> np.ndarray:
    """``xxhash64(col<long>, lit<int>)`` — the MinHash lane shape:
    seed 42 → fold the long → fold the int literal. Returns uint64
    (callers ``.view``/``astype`` back to int64 for JVM-signed
    comparisons)."""
    return hash_int(i, hash_long(longs.astype(np.uint64), SEED))


def xxhash64_int_then_longs(i: int, long_cols: list[np.ndarray]) -> np.ndarray:
    """``xxhash64(lit<int>, col1<long>, ..., colr<long>)`` — the LSH
    band-bucket shape: seed 42 → fold the band index → fold each
    signature long in order."""
    h = hash_int(i, SEED)
    for col in long_cols:
        h = hash_long(col.astype(np.uint64), h)
    return h
