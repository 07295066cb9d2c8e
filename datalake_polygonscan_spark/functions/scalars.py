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
    """R7: ``raw / 10^decimals`` as DecimalType(38,18), exact.

    Implemented as decimal-point insertion on the digit string (lpad +
    substring + cast), not decimal division: Spark's division scale
    rule (max(6, ...) with precision capping) truncates 1e-18 to zero
    for 38-digit operands. String surgery keeps every digit, stays in
    codegen, and amounts too large for (38,18) — uint256 can reach
    ~1.2e77 — overflow to NULL on the cast for quarantine.
    """
    v = (F.col(raw_value) if isinstance(raw_value, str) else raw_value).cast(T.StringType())
    d_raw = (F.col(decimals) if isinstance(decimals, str) else decimals).cast(T.IntegerType())
    # ERC-20 tokenDecimal is uint8 (0..255 legal on-chain). Clamp to
    # [0, 280]: below 0 is malformed; above 280 the result is < 1e-200
    # for any uint256 value, which rounds to the same 0E-18 the clamped
    # division produces — and the clamp bounds the zero-pad length so
    # the pad is never data-controlled unbounded.
    d = F.greatest(F.least(d_raw, F.lit(280)), F.lit(0))
    # data-dependent zero pad to length >= d+1 so the integer part
    # always keeps >= 1 digit — a fixed-width pad makes the substring
    # indices negative for d >= width + len(value), and Spark's substr
    # counts negative starts from the string END, silently producing a
    # wrong-magnitude value instead of the right one
    zeros_needed = F.greatest(d + F.lit(1) - F.length(v), F.lit(0))
    padded = F.concat(F.lit("0" * 281).substr(F.lit(1), zeros_needed), v)
    n = F.length(padded)
    int_part = padded.substr(F.lit(1), n - d)
    frac_part = padded.substr(n - d + 1, d)
    # try_cast: overflow -> NULL under ANSI mode too (Spark 4 default)
    return F.concat(int_part, F.lit("."), frac_part).try_cast(T.DecimalType(38, 18))
