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


def seeded_shuffle(
    df: DataFrame,
    id_col: str,
    seed: str = "epoch0",
    n_shards: int = 64,
) -> DataFrame:
    """Deterministic global training-order shuffle into shards.

    Pretraining loaders need the corpus in a reproducible pseudorandom
    order, restartable and identical across cluster sizes —
    ``df.orderBy(rand(seed))`` is neither (rand is per-partition
    seeded) and a true global sort is one giant range-exchange. Here
    order is a pure column function of (seed, id): ``sort_key`` is the
    portable 60-bit hash of the seeded id and ``shard`` the hash of a
    shard-salted id (decorrelated from sort_key so shard boundaries
    don't stripe the order). The physical write is
    ``repartition(n_shards, shard).sortWithinPartitions(sort_key)`` —
    one hash exchange plus independent per-shard sorts, no global
    range exchange, no RNG state; a new epoch is a new ``seed``
    string, zero re-reads of the old order. At 10^10-doc scale
    ``n_shards`` sizes the per-shard sort (pick shards ~ the loader's
    file count, e.g. 10^5 → 10^5-row... 10^5-doc sorts), so no single
    task ever sees the whole corpus.
    """
    sort_key = portable_hash64(
        F.concat(F.lit(seed + ":"), F.col(id_col).cast("string"))
    )
    shard = F.pmod(
        portable_hash64(
            F.concat(F.lit("shard:"), F.col(id_col).cast("string"))
        ),
        F.lit(n_shards),
    ).cast("int")
    return df.withColumn("sort_key", sort_key).withColumn("shard", shard)


def mixture_plan(
    df: DataFrame,
    source_col: str,
    token_count_col,
    budget_num: int = 1,
    budget_den: int = 2,
) -> DataFrame:
    """Training-mixture planning: per-source sampling rates and epoch
    counts for a uniform target mixture under a token budget.

    The data-mixing step every pretraining run does before any
    sampling happens: given per-source token inventories and a total
    token budget (``budget_num/budget_den`` of the corpus, default
    half), a uniform target share per source implies each source
    contributes ``budget / n_sources`` tokens; sources with more than
    that are downsampled (``sample_rate_ppm`` < 1e6) and sources with
    less must repeat (``epochs_ppm`` > 1e6 — the up-sampling /
    multi-epoch signal Hoffmann-style data curves care about).

    All arithmetic is int64 (parts-per-million fixed point, floor
    division) so the plan is bit-reproducible across engines — no
    float share ever materializes. One vocabulary-sized aggregate
    (n_sources rows), map-side combinable; the int64 ppm product caps
    the corpus at ~9e12 budget tokens — beyond that swap the ppm
    columns to DECIMAL(38,0).
    """
    per = df.groupBy(source_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count_col).cast("long").alias("tokens"),
    )
    # corpus totals via an unpartitioned window over the n_sources-row
    # aggregate (tiny by construction; same pattern as rebalance above)
    from pyspark.sql import Window

    whole = Window.partitionBy()
    tot = F.sum("tokens").over(whole)
    n_src = F.count("*").over(whole)
    # integer ppm, floor-division throughout (DIV = int64 floor);
    # per-source budget tokens = tot DIV den * num DIV n_sources,
    # operation order mirrored verbatim in the DuckDB oracle
    return per.select(
        source_col,
        "n_docs",
        "tokens",
        (F.col("tokens") * F.lit(1_000_000)).cast("long").alias("_t6"),
        tot.alias("_tot"),
        n_src.alias("_n"),
    ).select(
        source_col,
        "n_docs",
        "tokens",
        F.expr("_t6 DIV _tot").alias("natural_share_ppm"),
        F.expr("1000000 DIV _n").alias("target_share_ppm"),
        F.least(
            F.lit(1_000_000).cast("long"),
            F.expr(
                f"(_tot DIV {budget_den} * {budget_num} DIV _n)"
                " * 1000000 DIV tokens"
            ),
        ).alias("sample_rate_ppm"),
        F.expr(
            f"(_tot DIV {budget_den} * {budget_num} DIV _n)"
            " * 1000000 DIV tokens"
        ).alias("epochs_ppm"),
    )
