"""Scalar expressions re-implementing the reference's row functions.

R6 — epoch seconds -> formatted UTC timestamp
    reference: ``time.strftime('%Y-%m-%d %H:%M:%S', time.gmtime(int(ts)))``
    (``walletDataConsumer.py:96``), a per-row Python call.
    here: ``from_unixtime``/``date_format`` — codegen'd JVM expressions;
    correct because the session timezone is pinned to UTC (session.py).

R7 — wei-style integer -> human token units
    reference: ``int(value) / 10 ** int(decimal)`` (``walletDataConsumer.py:103``)
    — binary float division, lossy above ~9e15 wei.
    here: DecimalType(38,18) arithmetic, exact through the full scaled
    range; raw values too large for the type (uint256 can reach ~1.2e77)
    overflow to NULL under ANSI-off semantics so they can be quarantined
    rather than silently corrupted.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def epoch_to_timestamp(epoch_seconds: Column | str) -> Column:
    """Epoch seconds (string or numeric) -> TimestampType (UTC session)."""
    c = F.col(epoch_seconds) if isinstance(epoch_seconds, str) else epoch_seconds
    return F.to_timestamp(F.from_unixtime(c.cast(T.LongType())))


def epoch_to_utc_string(epoch_seconds: Column | str) -> Column:
    """R6 exact parity: 'yyyy-MM-dd HH:mm:ss' UTC string."""
    return F.date_format(epoch_to_timestamp(epoch_seconds), "yyyy-MM-dd HH:mm:ss")


def scale_token_amount(raw_value: Column | str, decimals: Column | str) -> Column:
    """R7: ``raw / 10^decimals`` as DecimalType(38,18), exact."""
    v = F.col(raw_value) if isinstance(raw_value, str) else raw_value
    d = F.col(decimals) if isinstance(decimals, str) else decimals
    unscaled = v.cast(T.DecimalType(38, 0))
    return (unscaled / F.pow(F.lit(10.0), d.cast(T.IntegerType())).cast(T.DecimalType(38, 0))).cast(
        T.DecimalType(38, 18)
    )
