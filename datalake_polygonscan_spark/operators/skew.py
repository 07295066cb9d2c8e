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


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "inner",
    salt_n: int = 16,
) -> DataFrame:
    """Equi-join ``fact`` with ``dim`` on column ``on``, spreading each
    join key over ``salt_n`` shuffle partitions. Supported ``how``:
    'inner' and 'left' (the fact-preserving shapes salting is for).
    Output columns = fact columns + dim's non-key columns (like a
    plain ``join(dim, on)``)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(salt_n))
    f = fact.withColumn("_salt", salt)
    d = dim.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_n - 1))))
    joined = f.join(d, [on, "_salt"], how)
    return joined.drop("_salt")
