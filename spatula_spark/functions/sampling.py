"""Deterministic corpus sampling / splitting.

Training pipelines need train/val/test assignment that is (a) stable
across runs, cluster sizes, partitionings, and engine versions, and
(b) joinable back to provenance. ``DataFrame.randomSplit`` gives
neither — it samples per-partition with a seeded RNG, so the same row
can land in different splits when the partitioning changes. Here the
split is a pure column function of the row's id: hash-bucket the id
into [0, 100) with the md5-based portable hash (the same primitive
the dedup/LSH family uses, reproducible bit-for-bit in DuckDB) and
carve the range by cumulative weights. No shuffle, no RNG, no state —
whole-stage codegen end to end, and any engine can recompute the
assignment from the id alone.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..urls import portable_hash64


def split_bucket(id_col: Column, salt: str = "split") -> Column:
    """Deterministic bucket in [0, 100) for an id column."""
    return F.pmod(
        portable_hash64(
            F.concat(F.lit(salt + ":"), id_col.cast("string"))
        ),
        F.lit(100),
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, int] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Assign every row a named split by hash bucket; ``weights`` are
    integer percentages summing to 100 (default 90/5/5)."""
    weights = weights or {"train": 90, "val": 5, "test": 5}
    if sum(weights.values()) != 100:
        raise ValueError("split weights must sum to 100")
    b = split_bucket(F.col(id_col), salt)
    expr: Column | None = None
    hi = 0
    *head, (last, _) = list(weights.items())
    for name, w in head:
        hi += w
        cond = b < hi
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn("split", expr)


def duck_split_sql(id_expr: str, weights: dict[str, int] | None = None,
                   salt: str = "split") -> str:
    """DuckDB rendering of :func:`hash_split`'s assignment (same md5
    bucket arithmetic), for cross-engine oracles."""
    from ..entry_queries import duck_hash

    weights = weights or {"train": 90, "val": 5, "test": 5}
    salted = f"'{salt}:' || ({id_expr})::VARCHAR"
    b = f"({duck_hash(salted)} % 100)"
    case, hi = "CASE", 0
    *head, (last, _) = list(weights.items())
    for name, w in head:
        hi += w
        case += f" WHEN {b} < {hi} THEN '{name}'"
    return case + f" ELSE '{last}' END"


def rebalance(
    df: DataFrame,
    group_col: str,
    id_col: str,
    salt: str = "rebal",
) -> DataFrame:
    """Deterministic group rebalancing (the training-mixture op):
    downsample every group to the size of the smallest one, so the
    output is a balanced mix. Per-group keep rate = min_count/count
    comes from one small aggregate (broadcast back); membership is the
    same hash-threshold predicate as :func:`weighted_sample` in
    quality.py — stable under repartitioning, recomputable from the id
    alone, and the scan stays map-side after the tiny rate join.

    Expected kept rows per group = min_count (exact in expectation,
    binomial spread around it; exact-k variants need a per-group sort
    — a full shuffle — which mixture construction rarely justifies).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    counts = df.groupBy(group_col).agg(F.count("*").alias("_cnt"))
    # global min via an unpartitioned window over the group-cardinality
    # sized counts table (tiny), not a scalar cross join — keeps the
    # plan free of BroadcastNestedLoopJoin
    whole = Window.partitionBy()
    rates = counts.select(
        group_col,
        (F.min("_cnt").over(whole).cast("double") / F.col("_cnt")).alias(
            "_rate"
        ),
    )
    u = (
        portable_hash64(
            F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))
        ).cast("double")
        / F.lit(float(1 << 60))
    )
    return (
        df.join(F.broadcast(rates), group_col)
        .filter(u < F.col("_rate"))
        .drop("_rate")
    )
