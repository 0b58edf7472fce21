"""Per-host politeness budgets, robots.txt rules, host-skew salting.

The reference's politeness is a single global token bucket —
``requests_per_minute=60`` handed to scrapelib
(``/root/reference/src/spatula/cli.py:33,79-85``) — adequate for one
thread, meaningless for 1000 executors. The engine generalizes it to a
**per-host per-wave budget** (north rule): within a wave, each host may
schedule at most ``budget`` fetches; the overflow is *deferred* — it
stays in the frontier with untouched lineage paths, so crawl ordering
is unchanged, only wave assignment shifts.

Scale notes:
* budget selection = ``row_number() over (partition by host order by
  priority, path)`` — one shuffle on ``host``. A hot host (the classic
  crawl skew) would make one straggler task; we pre-split with a
  salted repartition on ``(host, pmod(xxhash64(url), salt))`` so the
  *sort* work spreads, and AQE skew-join handles the fetch join.
  The row_number window itself must see a host's rows together; with
  per-host budgets in the low thousands the windowed data per host is
  tiny after the wave cap — the salting matters for the fetch join and
  the transform stage, which carry payload bytes.
* robots rules are a small table -> broadcast join on host + prefix
  match; longest-prefix wins, allow beats disallow at equal length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def split_by_host_budget(
    frontier: DataFrame,
    politeness: DataFrame | None,
    default_budget: int | None,
) -> tuple[DataFrame, DataFrame]:
    """Partition a wave's frontier into (scheduled, deferred).

    ``politeness``: optional DataFrame (host, budget_per_wave)
    overriding ``default_budget``. Null-source rows (no fetch) are
    always scheduled. ``default_budget=None`` disables the limiter.
    """
    if default_budget is None and politeness is None:
        return frontier, frontier.limit(0)

    fetchable = frontier.filter(F.col("url").isNotNull())
    nullsrc = frontier.filter(F.col("url").isNull())

    if politeness is not None:
        fetchable = fetchable.join(F.broadcast(politeness), "host", "left")
        budget_col = F.coalesce(
            F.col("budget_per_wave"), F.lit(default_budget or 2**31 - 1)
        )
    else:
        budget_col = F.lit(default_budget)

    w = Window.partitionBy("host").orderBy("priority", "path")
    ranked = fetchable.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_budget", budget_col
    )
    scheduled = ranked.filter(F.col("_rn") <= F.col("_budget")).drop(
        "_rn", "_budget", "budget_per_wave"
    )
    deferred = ranked.filter(F.col("_rn") > F.col("_budget")).drop(
        "_rn", "_budget", "budget_per_wave"
    )
    return nullsrc.unionByName(scheduled), deferred


def apply_robots(
    frontier: DataFrame, robots: DataFrame | None
) -> tuple[DataFrame, DataFrame]:
    """Filter disallowed URLs. Returns (allowed, blocked).

    Longest-matching-prefix decides; ties broken allow-wins. The rules
    table is broadcast (robots corpora are MBs even web-scale).
    """
    if robots is None:
        return frontier, frontier.limit(0)

    path_col = F.coalesce(F.parse_url(F.col("url"), F.lit("PATH")), F.lit("/"))
    fr = frontier.withColumn("_path", path_col)
    joined = fr.join(
        F.broadcast(robots.withColumnRenamed("host", "r_host")),
        (F.col("host") == F.col("r_host"))
        & F.col("_path").startswith(F.col("path_prefix")),
        "left",
    )
    w = Window.partitionBy("path").orderBy(
        F.length("path_prefix").desc(), F.col("allow").desc()
    )
    decided = (
        joined.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .withColumn("_allowed", F.coalesce(F.col("allow"), F.lit(True)))
        .drop("_rk", "r_host", "path_prefix", "allow", "_path")
    )
    allowed = decided.filter(F.col("_allowed")).drop("_allowed")
    blocked = decided.filter(~F.col("_allowed")).drop("_allowed")
    return allowed, blocked


def salted_repartition(df: DataFrame, n: int, salt_buckets: int, url_col: str = "url") -> DataFrame:
    """Spread a hot host across ``salt_buckets`` partitions before the
    payload-heavy stages (north-rule skew mandate)."""
    return df.repartition(
        n, F.col("host"), F.pmod(F.xxhash64(F.col(url_col)), F.lit(salt_buckets))
    )
