"""DQ1 — declarative data-quality EXPECTATIONS in one scan
(Deequ / Great-Expectations-style, compiled to Catalyst aggregates).

A 100 TB ingest gate cannot afford one pass per check: every
expectation here compiles to an aggregate expression and the whole
suite evaluates in a SINGLE aggregation over one scan (uniqueness
checks add Spark's multi-distinct Expand, still one scan), then pivots
to one row per check via ``stack``. Referential-integrity checks are
the exception by nature (they need the dimension side): each adds one
broadcast anti-join count.

Unlike S20's CHECK constraints (hard per-batch gates that abort a
commit), expectations MEASURE: each check returns its observed metric,
its threshold, and a pass flag — the shape a curation pipeline logs
and alerts on, and a closed-form SQL oracle can restate.

Check specs (dicts):
- ``{"check": "completeness", "column": c, "min_ratio": r}`` —
  fraction of non-null values
- ``{"check": "uniqueness", "column": c, "min_ratio": r}`` —
  distinct / non-null count (1.0 = key candidate)
- ``{"check": "min", "column": c, "at_least": v}`` /
  ``{"check": "max", "column": c, "at_most": v}``
- ``{"check": "pattern", "column": c, "regex": p, "min_ratio": r}`` —
  fraction of non-null values matching (Java regex; keep to the
  RE2-compatible subset for cross-engine oracles)
- ``{"check": "in_set", "column": c, "values": [...], "min_ratio": r}``
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_METRIC_SCALE = 6  # boundary rounding, same as the registry convention


def _metric_expr(spec: dict) -> Column:
    c = F.col(spec["column"])
    kind = spec["check"]
    if kind == "completeness":
        return F.avg(c.isNotNull().cast("double"))
    if kind == "uniqueness":
        # exact by default; {"approx": True} swaps in the HLL sketch —
        # at 100 TB an exact COUNT(DISTINCT) shuffles every distinct
        # value, while the sketch stays one map-side-combined agg (the
        # 2% default rsd is far tighter than any uniqueness threshold
        # a quality gate would set)
        if spec.get("approx"):
            return F.approx_count_distinct(c, 0.02) / F.count(c)
        return F.count_distinct(c) / F.count(c)
    if kind == "min":
        return F.min(c).cast("double")
    if kind == "max":
        return F.max(c).cast("double")
    if kind == "pattern":
        # coalesce to false: a NULL value FAILS the pattern check (the
        # oracle's CASE WHEN counts it as a failure; bare avg over a
        # null-propagating predicate would silently skip it)
        return F.avg(F.coalesce(c.rlike(spec["regex"]), F.lit(False)).cast("double"))
    if kind == "in_set":
        return F.avg(F.coalesce(c.isin(*spec["values"]), F.lit(False)).cast("double"))
    raise ValueError(f"unknown check type: {kind!r}")


def _threshold(spec: dict) -> tuple[float, str]:
    """(threshold value, comparison direction) for a spec."""
    if "min_ratio" in spec:
        return float(spec["min_ratio"]), ">="
    if "at_least" in spec:
        return float(spec["at_least"]), ">="
    if "at_most" in spec:
        return float(spec["at_most"]), "<="
    raise ValueError(f"spec has no threshold: {spec!r}")


def expectations(df: DataFrame, checks: list[dict]) -> DataFrame:
    """Evaluate every check in ONE aggregation over one scan of ``df``.
    Returns (check_name, col_name, metric, threshold, passed) — one row per
    check, in spec order."""
    if not checks:
        raise ValueError("no checks given")
    aggs = [
        F.round(_metric_expr(s), _METRIC_SCALE).alias(f"_m{i}")
        for i, s in enumerate(checks)
    ]
    one = df.agg(*aggs)
    stack_args: list[Column] = []
    for i, s in enumerate(checks):
        thr, direction = _threshold(s)
        m = F.col(f"_m{i}")
        passed = (m >= thr) if direction == ">=" else (m <= thr)
        stack_args += [
            F.lit(s["check"]),
            F.lit(s["column"]),
            m.cast("double"),
            F.lit(thr).cast("double"),
            passed.cast("int"),
        ]
    n = len(checks)
    return one.select(
        F.stack(
            F.lit(n), *stack_args
        ).alias("check_name", "col_name", "metric", "threshold", "passed")
    )


def referential_integrity(
    fact: DataFrame, fk_col: str, dim: DataFrame, pk_col: str
) -> DataFrame:
    """FK orphan check: fraction of non-null ``fact[fk_col]`` values
    present in ``dim[pk_col]`` (broadcast anti-join count — the dim is
    the small side by definition of a dimension). Output row matches
    :func:`expectations`' schema with check_name='referential_integrity'
    and threshold 1.0."""
    keys = fact.select(F.col(fk_col).alias("_fk")).filter(F.col("_fk").isNotNull())
    pks = dim.select(F.col(pk_col).alias("_fk")).distinct()
    orphans = keys.join(F.broadcast(pks), "_fk", "left_anti").agg(
        F.count("*").alias("_orphans")
    )
    total = keys.agg(F.count("*").alias("_total"))
    return (
        total.crossJoin(orphans)
        .select(
            F.lit("referential_integrity").alias("check_name"),
            F.lit(fk_col).alias("col_name"),
            F.round(1.0 - F.col("_orphans") / F.col("_total"), _METRIC_SCALE)
            .cast("double")
            .alias("metric"),
            F.lit(1.0).cast("double").alias("threshold"),
            (F.col("_orphans") == 0).cast("int").alias("passed"),
        )
    )
