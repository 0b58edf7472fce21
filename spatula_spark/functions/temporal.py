"""Temporal joins Spark lacks natively, composed from built-ins.

As-of join: each left row matches the single most recent right row
with ``right.ts <= left.ts`` for the same key — the standard
point-in-time lookup (feature stores, tick data, "state as of the
event"). Spark has no ASOF JOIN; the scalable spelling is a tagged
UNION + one window pass:

    tag left side=1, right side=0; union; window last(right value,
    ignorenulls) over (partition by key order by (ts, side) rows
    unbounded preceding..current); keep left rows.

One shuffle on the key (the window), no join at all — at 100 TB this
beats the naive range-join (which explodes to |L| x |R| candidate
pairs per key before picking the max). Ordering (ts, side) puts a
right row BEFORE a left row at equal ts, giving the inclusive
``<=`` match DuckDB's ASOF JOIN implements — the oracle is native
DuckDB ASOF JOIN, so the value-hash check pins the full semantics
(inclusive boundary, per-key isolation, nulls for no-match).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def range_join_buckets(
    points: DataFrame,
    intervals: DataFrame,
    ts: str = "ts",
    start: str = "start",
    end: str = "end",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Point-in-interval join WITHOUT a key: points matched to every
    interval containing them, via overlap bucketing.

    Spark plans an un-keyed ``BETWEEN`` join as BroadcastNestedLoop —
    |P| x |I| comparisons, a non-starter when both sides are large.
    The scale shape: explode each interval to the time buckets it
    overlaps, bucket each point, EQUI-join on the bucket (a normal
    shuffle join), then filter exact containment. Cost is
    |P| + sum(interval_len/bucket) join rows instead of |P| x |I|;
    ``bucket_seconds`` trades fan-out vs per-bucket candidates (size
    it near the median interval length).
    """
    b = F.lit(bucket_seconds)
    iv = intervals.withColumn(
        "_bk",
        F.explode(
            F.sequence(
                (F.unix_timestamp(start) / b).cast("long"),
                (F.unix_timestamp(end) / b).cast("long"),
            )
        ),
    )
    pt = points.withColumn(
        "_bk", (F.unix_timestamp(ts) / b).cast("long")
    )
    return (
        pt.join(iv, "_bk")
        .filter(F.col(ts).between(F.col(start), F.col(end)))
        .drop("_bk")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    value_cols: list[str] | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Left rows + the latest right row at-or-before each left ``ts``.

    ``value_cols``: right columns to carry (default: all but key+ts).
    Right ``ts`` is carried as ``ts + suffix``. Left rows with no
    earlier right row keep nulls (left-outer as-of semantics).
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (on, ts)]
    carried = [ts + suffix] + [c + suffix for c in value_cols]

    # All carried columns ride ONE struct so the window's last() picks
    # them atomically from the SAME right row — per-column last(...,
    # ignorenulls) would splice a null value column from an older row
    # under the latest row's ts (inconsistent (ts_r, value_r) pairs,
    # and wrong ASOF semantics, which carry the latest row's NULL).
    rstruct = F.struct(
        F.col(ts).alias("_rts"),
        *[F.col(c).alias("_v_" + c) for c in value_cols],
    )
    rt = right.select(
        on,
        F.col(ts),
        F.lit(0).alias("_side"),
        rstruct.alias("_rrow"),
        # deterministic tiebreak among right rows sharing (key, ts):
        # without it the window order (ts, _side) leaves which same-ts
        # right row "wins" up to partition layout.
        F.xxhash64(rstruct).alias("_tie"),
    )
    lt = (
        left.withColumn("_side", F.lit(1))
        .withColumn("_rrow", F.lit(None).cast(rt.schema["_rrow"].dataType))
        .withColumn("_tie", F.lit(0).cast("long"))
    )
    # align schemas for the union: left keeps all its columns, right
    # rows carry nulls there
    for c in left.columns:
        if c not in (on, ts) and c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    rt = rt.select(*[c for c in lt.columns])

    u = lt.unionByName(rt)
    w = (
        Window.partitionBy(on)
        .orderBy(ts, "_side", "_tie")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = u.withColumn(
        "_m", F.last(F.when(F.col("_side") == 0, F.col("_rrow")), True).over(w)
    )
    return out.filter(F.col("_side") == 1).select(
        *[c for c in left.columns],
        F.col("_m._rts").alias(ts + suffix),
        *[F.col("_m._v_" + c).alias(c + suffix) for c in value_cols],
    )
