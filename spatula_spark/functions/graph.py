"""Link-graph analytics: integer-exact distributed PageRank.

The 100 TB motivation: crawl prioritization and corpus quality
weighting both want link-graph centrality, and PageRank at web scale
is the canonical iterative-join workload — K rounds of
(join on src -> shuffle by dst -> aggregate), each round one shuffle
of the slim (node, rank) table, never the payloads.

Why INTEGER PageRank: the textbook float formulation is not
cross-engine reproducible — per-node rank sums run in whatever order
the engine's aggregation happens to add them, and float addition is
not associative, so Spark and DuckDB (and two different cluster
topologies!) disagree in the last ulps. Carrying ranks as scaled
64-bit integers (SCALE = 10^12) makes every operation — floor
division by out-degree, integer sum over in-edges, damping as
``(85 * s) div 100`` — order-independent and therefore bit-exact
across engines AND across partitionings: the same determinism
argument as the engine's hash-bucket sampling. The cost is a bounded
rounding drift of < out_degree per node per iteration (~1e-12 of
total mass), irrelevant for ranking.

Overflow headroom (int64): total system mass is n * SCALE; at
SCALE=10^12 that allows n up to ~9 million nodes in one int64 sum in
the worst all-edges-into-one-node case — and the per-node damping
product ``85 * s`` stays below 2^63 for s up to ~10^17. For larger
graphs, drop SCALE or shard the hub sum; the battery documents the
envelope rather than hiding it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**12


def integer_pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    n_iter: int = 5,
    scale: int = SCALE,
    damp_num: int = 85,
    damp_den: int = 100,
) -> DataFrame:
    """K power-iteration rounds of damped PageRank in scaled-integer
    arithmetic. ``nodes`` has column ``node``; ``edges`` has
    ``(src, dst)`` (parallel edges count with multiplicity; dangling
    nodes simply contribute nothing). Returns ``(node, rank_scaled)``.

    Per round: one broadcast-or-shuffle join of the slim rank table
    with the edge list and one hash aggregate by ``dst`` — the rank
    table is 16 bytes/node, so even a 10^10-node graph shuffles only
    ~160 GB per round, independent of page payloads."""
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    ranks = nodes.select("node", F.lit(scale).cast("long").alias("r"))
    for _ in range(n_iter):
        # name-based (USING) joins throughout: nodes/edges/ranks share
        # base lineage, and attribute-id joins on self-derived frames
        # trip Spark's ambiguous-column check
        per_src = (
            ranks.withColumnRenamed("node", "src")
            .join(deg, "src")
            .select("src", F.expr("r div od").alias("c"))
        )
        contrib = (
            edges.join(per_src, "src")
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
            .withColumnRenamed("dst", "node")
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            F.expr(
                f"(({damp_den - damp_num}L * {scale}L) div {damp_den}) + "
                f"(({damp_num} * coalesce(s, 0L)) div {damp_den})"
            ).alias("r"),
        )
    return ranks.select("node", F.col("r").alias("rank_scaled"))


def integer_pagerank_duckdb(
    nodes_sql: str,
    edges_sql: str,
    n_iter: int = 5,
    scale: int = SCALE,
    damp_num: int = 85,
    damp_den: int = 100,
) -> str:
    """DuckDB mirror as unrolled CTEs (K is small and fixed): the same
    integer arithmetic, so ranks match Spark's bit-for-bit."""
    parts = [
        f"pr_nodes AS ({nodes_sql})",
        f"pr_edges AS ({edges_sql})",
        "pr_deg AS (SELECT src, count(*) AS od FROM pr_edges GROUP BY src)",
        f"pr_r0 AS (SELECT node, {scale}::BIGINT AS r FROM pr_nodes)",
    ]
    for k in range(1, n_iter + 1):
        prev = f"pr_r{k - 1}"
        parts.append(
            f"pr_c{k} AS (SELECT e.dst AS node, "
            f"sum((p.r // d.od))::BIGINT AS s "
            f"FROM {prev} p JOIN pr_deg d ON p.node = d.src "
            f"JOIN pr_edges e ON e.src = d.src GROUP BY e.dst)"
        )
        parts.append(
            f"pr_r{k} AS (SELECT n.node, "
            f"(({damp_den - damp_num}::BIGINT * {scale}) // {damp_den}) + "
            f"(({damp_num}::BIGINT * coalesce(c.s, 0)) // {damp_den}) AS r "
            f"FROM pr_nodes n LEFT JOIN pr_c{k} c ON n.node = c.node)"
        )
    return ",\n".join(parts) + f"\n-- final table: pr_r{n_iter}(node, r)"


def degree_histogram(
    edges: DataFrame, dst_col: str = "dst"
) -> DataFrame:
    """Log2-bucketed in-degree distribution of a link graph — the
    first analytics pass over a crawled web graph (power-law check,
    hub detection, join-skew forecasting for everything downstream).
    Two map-side-combinable aggregates: per-node degree count, then
    nodes per floor(log2(degree)) bucket with each bucket's degree
    range. floor(log2) is bit-length arithmetic (length(bin(d)) - 1),
    so a cross-engine oracle is integer-exact; no window, no join —
    at 10^11 edges the only wide stage is the keyed degree count."""
    deg = edges.groupBy(F.col(dst_col).alias("node")).agg(
        F.count("*").alias("deg")
    )
    return deg.groupBy(
        (F.length(F.bin("deg")) - 1).alias("bucket")
    ).agg(
        F.count("*").alias("n_nodes"),
        F.min("deg").alias("min_deg"),
        F.max("deg").alias("max_deg"),
    )
