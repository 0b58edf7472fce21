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

    Plan shape (the scale-critical part): a naive ``row_number() over
    (partition by host)`` sorts the ENTIRE frontier every wave. Instead
    a per-host count aggregate (map-side combine => tiny) finds the
    hosts actually over budget; only THOSE hosts' rows go through the
    ranking window, everything else passes straight through a broadcast
    hash join (no sort, no extra shuffle). The hot set is bounded by
    ``frontier_size / budget`` rows — thousands, not billions — so the
    broadcast is safe at any frontier size with sane budgets.
    """
    if default_budget is None and politeness is None:
        return frontier, frontier.limit(0)
    if default_budget is not None and default_budget < 1:
        # budget 0 would defer every row every wave => the crawl loop
        # never drains; None is the documented "disabled" spelling
        raise ValueError(
            "host budget must be >= 1 (use None to disable the limiter)"
        )

    fetchable = frontier.filter(F.col("url").isNotNull())
    nullsrc = frontier.filter(F.col("url").isNull())

    counts = fetchable.groupBy("host").agg(F.count("*").alias("_hn"))
    if politeness is not None:
        counts = counts.join(F.broadcast(politeness), "host", "left")
        # explicit None check — `or` would turn a (validated-away) 0
        # into "unlimited"; hosts absent from the table fall back to
        # default_budget, or unlimited when no default is set
        fallback = 2**31 - 1 if default_budget is None else default_budget
        budget_col = F.coalesce(F.col("budget_per_wave"), F.lit(fallback))
    else:
        budget_col = F.lit(default_budget)
    hot = counts.filter(F.col("_hn") > budget_col).select(
        "host", budget_col.cast("long").alias("_budget")
    )

    flagged = fetchable.join(F.broadcast(hot), "host", "left")
    cold = flagged.filter(F.col("_budget").isNull()).drop("_budget")
    hot_rows = flagged.filter(F.col("_budget").isNotNull())

    w = Window.partitionBy("host").orderBy("priority", "path")
    ranked = hot_rows.withColumn("_rn", F.row_number().over(w))
    sched_hot = ranked.filter(F.col("_rn") <= F.col("_budget")).drop(
        "_rn", "_budget"
    )
    deferred = ranked.filter(F.col("_rn") > F.col("_budget")).drop(
        "_rn", "_budget"
    )
    return nullsrc.unionByName(cold).unionByName(sched_hot), deferred


ROBOTS_EXPR_MAX_RULES = 5000


def robots_allow_expr(rules: list[tuple[str, str, bool]]) -> Column:
    """Compile robots rules into one Catalyst CASE expression.

    ``rules``: (host, path_prefix, allow) sorted longest-prefix-first,
    allow-wins on ties — the first matching arm decides. A compiled
    expression beats a join+window: no shuffle, no per-row sort, and
    whole-stage codegen evaluates it inline during the frontier scan.
    Robots corpora are small even web-scale (rules live per *host*,
    not per URL); beyond ROBOTS_EXPR_MAX_RULES fall back to a
    broadcast join.
    """
    ordered = sorted(rules, key=lambda r: (-len(r[1]), not r[2]))
    url_path = F.coalesce(F.parse_url(F.col("url"), F.lit("PATH")), F.lit("/"))
    expr = F.lit(True)
    for host, prefix, allow in reversed(ordered):
        cond = (F.col("host") == host) & url_path.startswith(prefix)
        expr = F.when(cond, F.lit(bool(allow))).otherwise(expr)
    return expr


def apply_robots(
    frontier: DataFrame, robots: DataFrame | None
) -> tuple[DataFrame, DataFrame]:
    """Filter disallowed URLs. Returns (allowed, blocked).

    Longest-matching-prefix decides; ties broken allow-wins. Small rule
    sets compile to a single CASE expression (collected once on the
    driver, evaluated inline — no join); oversized rule sets fall back
    to a broadcast join + longest-prefix aggregate.
    """
    if robots is None:
        return frontier, frontier.limit(0)

    rules = [
        (r["host"], r["path_prefix"], bool(r["allow"]))
        for r in robots.limit(ROBOTS_EXPR_MAX_RULES + 1).collect()
    ]
    if not rules:
        return frontier, frontier.limit(0)
    if len(rules) <= ROBOTS_EXPR_MAX_RULES:
        allowed_col = robots_allow_expr(rules)
        decided = frontier.withColumn("_allowed", allowed_col)
        return (
            decided.filter(F.col("_allowed")).drop("_allowed"),
            decided.filter(~F.col("_allowed")).drop("_allowed"),
        )

    return robots_broadcast_join(frontier, robots)


def robots_broadcast_join(
    frontier: DataFrame, robots: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Oversized-rule-set path: broadcast join + longest-prefix max_by
    aggregate. Used by the engine when the rule count exceeds
    ROBOTS_EXPR_MAX_RULES — the CASE expression would otherwise
    silently truncate to an arbitrary subset."""
    path_col = F.coalesce(F.parse_url(F.col("url"), F.lit("PATH")), F.lit("/"))
    fr = frontier.withColumn("_path", path_col)
    joined = fr.join(
        F.broadcast(robots.withColumnRenamed("host", "r_host")),
        (F.col("host") == F.col("r_host"))
        & F.col("_path").startswith(F.col("path_prefix")),
        "left",
    )
    keep = [c for c in fr.columns]
    decided = (
        joined.groupBy(*keep)
        .agg(
            F.coalesce(
                F.max_by(
                    F.col("allow"),
                    F.struct(F.length("path_prefix"), F.col("allow")),
                ),
                F.lit(True),
            ).alias("_allowed")
        )
        .drop("_path")
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
