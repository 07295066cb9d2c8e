"""Skew mitigation: explicit key salting for pathological hot keys.

The session enables AQE skew-join splitting (session.py), which
handles organic skew at runtime. ``salted_join`` is the explicit
fallback for *pathological* keys (one key = 30% of a 100 TB fact
table) where even a split partition overwhelms its tasks, or for
engines/paths where AQE cannot rewrite the join (e.g. inside a
cached/bucketed plan fragment).

Mechanics: the fact side gets a deterministic salt in [0, salt_n)
derived from ITS OWN row content (no RNG, no monotonically-increasing
ids — reproducible across retries and speculative tasks); the dim
side is replicated salt_n times with ``explode(sequence(...))``. The
join key becomes (key, salt): the hot key now spreads over salt_n
reduce partitions. Replication multiplies the dim shuffle volume by
salt_n — use for fact-dim joins where the dim side is orders of
magnitude smaller (but too big / too row-exploding to broadcast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def detect_salt_n(
    fact: DataFrame,
    on: str,
    salt_cap: int = 64,
    sample_rows: int = 100_000,
) -> int:
    """Self-tuning salt fan-out from a CHEAP key-frequency sketch: a
    deterministic content-hash sample of ~``sample_rows`` fact rows
    (one narrow scan + partial agg on the key — never a full
    count-by-key of the fact table), estimate the hottest key's row
    share ``p``, and size the salt so that key's rows spread into
    roughly average-sized shuffle partitions:
    ``salt_n = ceil(p * shuffle.partitions)``, capped at ``salt_cap``.

    The sample filter hashes the WHOLE row, not the key — hashing the
    key would keep or drop a hot key all-or-nothing and see no skew at
    all. Deterministic across retries/speculation (no RNG state).
    Returns 1 when no key is hot enough to need salting (the caller
    can then skip replication entirely)."""
    import math

    total = fact.count()
    if total == 0:
        return 1
    denom = 1_000_000
    keep = min(denom, int(math.ceil(sample_rows / total * denom)))
    sample = fact.filter(
        F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(denom)) < F.lit(keep)
    )
    row = (
        sample.groupBy(on)
        .count()
        .agg(F.max("count").alias("mx"), F.sum("count").alias("n"))
        .collect()[0]
    )
    if not row["n"]:
        return 1
    hot_share = row["mx"] / row["n"]
    partitions = int(fact.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))
    salt_n = math.ceil(hot_share * partitions)
    return max(1, min(salt_cap, salt_n))


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "inner",
    salt_n: int | None = 16,
) -> DataFrame:
    """Equi-join ``fact`` with ``dim`` on column ``on``, spreading each
    join key over ``salt_n`` shuffle partitions. Supported ``how``:
    'inner' and 'left' (the fact-preserving shapes salting is for).
    Output columns = fact columns + dim's non-key columns (like a
    plain ``join(dim, on)``).

    ``salt_n=None`` self-tunes: :func:`detect_salt_n` sizes the
    fan-out from a sampled key-frequency sketch, and a detected
    fan-out of 1 (no pathological key) skips salting — no dim
    replication cost when the data isn't skewed."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if salt_n is None:
        salt_n = detect_salt_n(fact, on)
    if salt_n <= 1:
        return fact.join(dim, on, how)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(salt_n))
    f = fact.withColumn("_salt", salt)
    d = dim.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_n - 1))))
    joined = f.join(d, [on, "_salt"], how)
    return joined.drop("_salt")
