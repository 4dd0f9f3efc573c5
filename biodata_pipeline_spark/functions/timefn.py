"""Timestamp → epoch-milliseconds helpers that are session-timezone-proof.

Declared queries ship timestamps across the engine boundary as epoch ms.
``unix_millis`` works for TIMESTAMP (tz-aware, epoch-based — no tz math),
but parquet ms-precision columns load as TIMESTAMP_NTZ, where any cast
through TIMESTAMP would shift by the session timezone. ``timestampdiff``
against the NTZ epoch literal avoids that entirely, so results are
identical no matter what timezone the host session runs in.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def epoch_ms(col: Column | str, df=None) -> Column:
    """Epoch milliseconds for TIMESTAMP or TIMESTAMP_NTZ columns.

    Pass ``df`` to resolve the column's type; string column names with no
    ``df`` assume NTZ (the parquet-loader default for ms columns).
    """
    if isinstance(col, str):
        if df is not None and isinstance(df.schema[col].dataType, T.TimestampType):
            return F.unix_millis(F.col(col))
        return ntz_epoch_ms(F.col(col))
    return F.unix_millis(col)


def ntz_epoch_ms(col: Column) -> Column:
    return F.timestamp_diff("MILLISECOND", F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"), col)
