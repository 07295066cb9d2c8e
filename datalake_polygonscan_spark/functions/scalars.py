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


# ---------------------------------------------------------------------------
# DG4 — format-preserving pseudonymization (Feistel over the md5 bridge)
# ---------------------------------------------------------------------------

#: half-width of the Feistel domain: ids live in [0, 2^62) as two
#: 31-bit halves, so every intermediate stays a positive BIGINT on
#: both engines
FEISTEL_HALF_BITS = 31
FEISTEL_ROUNDS = 4


def _feistel_round(v: Column, r: int, seed: str) -> Column:
    """Round function: keyed md5 of the half's decimal digits, folded
    to 31 bits via the engine-portable md5/conv bridge (identical
    construction in the SQL oracle)."""
    h = F.md5(F.concat(F.lit(f"{seed}{r}:"), v.cast("string")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % F.lit(
        2**FEISTEL_HALF_BITS
    )


def feistel_pseudonymize(key: Column, seed: str = "dg4", inverse: bool = False) -> Column:
    """DG4 — deterministic FORMAT-PRESERVING pseudonymization: a
    4-round balanced Feistel network over 62-bit integers whose round
    function is keyed md5 — the tokenization-vault primitive that
    replaces a PII key with a stable opaque token WITHOUT a lookup
    table (the mapping is a pure function of key + seed), stays inside
    the BIGINT type so every downstream join/partition scheme keeps
    working, and is EXACTLY invertible (``inverse=True`` runs the
    rounds backwards). Feistel guarantees bijectivity regardless of
    the round function, so distinct-count semantics survive
    pseudonymization — the property k-anonymity (DG2) and masking
    (DG1) releases cannot offer. Pure codegen: zero Python, zero
    shuffle, replayable verbatim by a SQL oracle."""
    # exact bit arithmetic (never double division — keys up to 2^62
    # would lose precision through a float)
    half_mod = F.lit(2**FEISTEL_HALF_BITS)
    hi = F.shiftright(key.cast("long"), FEISTEL_HALF_BITS)
    lo = key.cast("long").bitwiseAND(F.lit(2**FEISTEL_HALF_BITS - 1))
    if not inverse:
        for r in range(1, FEISTEL_ROUNDS + 1):
            hi, lo = lo, _xor31(hi, _feistel_round(lo, r, seed))
    else:
        for r in range(FEISTEL_ROUNDS, 0, -1):
            hi, lo = _xor31(lo, _feistel_round(hi, r, seed)), hi
    return (hi * half_mod + lo).cast("long")


def _xor31(a: Column, b: Column) -> Column:
    """Bitwise XOR of two sub-2^31 longs (stays positive)."""
    return a.bitwiseXOR(b)
