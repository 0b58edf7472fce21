"""Cardinality sketches: from-scratch HyperLogLog distinct counting.

The 100 TB motivation: exact ``COUNT(DISTINCT url)`` over a crawl log
is a full shuffle of every distinct key; the HLL sketch reduces the
same question to ONE map-side aggregate into ``m = 2^p`` buckets (the
per-partition partial is m longs, mergeable by max), so the network
cost is executors × m longs regardless of corpus size — the standard
production shape for frontier/dedup telemetry (Flajolet et al. 2007;
the reference spatula has no analog — it never aggregates).

Everything here is cross-engine bit-exact by construction, which is
what lets the driver's DuckDB oracle value-hash the result:

* the hash is the repo's portable 60-bit md5 hash;
* rho (the HLL register) is INTEGER-ONLY: instead of a float log2 of
  the remaining bits — whose floor can be off-by-one at 2^k
  boundaries when the libm result rounds up — we isolate the lowest
  set bit with ``x & -x`` and count the ones below it with
  ``bit_count(low - 1)`` (trailing zeros, exact in both engines);
* the estimator stays in the RAW harmonic regime: the indicator sum
  ``sum(2^-reg)`` is carried as a SCALED 64-bit INTEGER
  ``sum(2^(cap-reg))`` (exact — no float summation-order hazard), and
  the only floating operation is the final single division by that
  integer. The small-range linear-counting correction
  (``m * ln(m/V)``) is deliberately omitted: ``ln`` is not
  correctly-rounded-portable across engines, so callers should size
  ``p`` such that the expected cardinality is >> 2.5*m (the raw
  regime), which is also the only regime that matters at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..urls import portable_hash64, portable_hash64_duckdb

RHO_CAP = 40  # registers capped so sum(2^(cap-reg)) fits int64 exactly

# alpha_m for the raw harmonic estimator (Flajolet et al. 2007 Fig. 3)
_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def _alpha(m: int) -> float:
    return _ALPHA.get(m, 0.7213 / (1.0 + 1.079 / m))


def hll_numerator(p: int) -> float:
    """alpha_m * m^2 * 2^RHO_CAP as one double literal — computed the
    same way the oracle SQL embeds it, so both engines divide the same
    numerator by the same integer."""
    m = 1 << p
    return _alpha(m) * m * m * float(1 << RHO_CAP)


def hll_rho(h: Column, p: int) -> Column:
    """HLL register value for a 60-bit hash column: 1 + trailing zeros
    of the remaining bits (integer-exact; see module docstring)."""
    rest = F.shiftright(h, p).bitwiseOR(F.lit(1 << (60 - p)))
    low = rest.bitwiseAND(-rest)
    return (F.bit_count(low - F.lit(1)) + F.lit(1)).cast("int")


def hll_registers(df: DataFrame, col: str, p: int = 6) -> DataFrame:
    """The HLL register table ``(bucket, r)`` — the sketch STATE. This
    is what a distributed pipeline persists and merges: registers of
    two corpus slices combine by per-bucket MAX (groupBy(bucket).max —
    associative, commutative, idempotent), so partial sketches from
    any partitioning merge to exactly the whole-corpus sketch
    (pytest-pinned in test_hll_registers_merge)."""
    m = 1 << p
    h = portable_hash64(F.col(col))
    return (
        df.select(
            h.bitwiseAND(F.lit(m - 1)).alias("bucket"),
            hll_rho(h, p).alias("rho"),
        )
        .groupBy("bucket")
        .agg(F.least(F.max("rho"), F.lit(RHO_CAP)).alias("r"))
    )


def hll_estimate(regs: DataFrame, p: int = 6) -> DataFrame:
    """Fold a register table into the one-row raw-regime estimate."""
    m = 1 << p
    return regs.agg(
        F.lit(p).alias("p"),
        F.lit(m).alias("m"),
        F.count(F.lit(1)).alias("n_buckets_seen"),
        F.round(
            F.lit(hll_numerator(p))
            / (
                F.sum(F.expr(f"shiftleft(1L, {RHO_CAP} - r)"))
                + (F.lit(m) - F.count(F.lit(1)))
                * F.lit(1 << RHO_CAP)
            ),
            4,
        ).alias("hll_estimate"),
    )


def hll_distinct(df: DataFrame, col: str, p: int = 6) -> DataFrame:
    """One-row DataFrame ``(p, m, n_buckets_seen, hll_estimate)`` for
    the distinct count of ``col``. Two narrow aggregates: per-bucket
    max register (map-side combinable), then the scaled-integer
    harmonic sum; no distinct shuffle anywhere."""
    return hll_estimate(hll_registers(df, col, p), p)


def cms_table(
    tokens: DataFrame, col: str = "word", w: int = 1024, d: int = 4
) -> DataFrame:
    """Count-min sketch of token frequencies: a ``d x w`` counter
    matrix as a DataFrame of at most ``d*w`` rows ``(row, cell, cnt)``.

    The scale point: token-frequency questions over 100 TB normally
    shuffle every distinct token; the CMS shuffles a key space BOUNDED
    at ``d*w`` cells (here 4,096) no matter the corpus — the per-cell
    counts are map-side combinable partial sums, so the reduce stage
    is corpus-size-independent. Point estimates are biased UP only
    (min over d counters >= true count, Cormode & Muthukrishnan 2005),
    and every operation is integer, so a DuckDB oracle replays the
    sketch bit-for-bit."""
    cells = tokens.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("row"),
                    F.pmod(
                        portable_hash64(
                            F.concat(F.col(col), F.lit(f":cms{i}"))
                        ),
                        F.lit(w),
                    ).alias("cell"),
                )
                for i in range(d)
            ])
        ).alias("rc")
    )
    return cells.groupBy("rc.row", "rc.cell").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cms_estimate(
    cms: DataFrame, probes: DataFrame, col: str = "word",
    w: int = 1024, d: int = 4,
) -> DataFrame:
    """Point-estimate counts for the probe tokens: min over the d
    counters each probe hashes to (inner join is safe — a probe that
    occurs in the corpus has contributed to all d of its cells)."""
    pc = probes.select(
        col,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("row"),
                    F.pmod(
                        portable_hash64(
                            F.concat(F.col(col), F.lit(f":cms{i}"))
                        ),
                        F.lit(w),
                    ).alias("cell"),
                )
                for i in range(d)
            ])
        ).alias("rc"),
    ).select(col, "rc.row", "rc.cell")
    return (
        pc.join(F.broadcast(cms), ["row", "cell"])
        .groupBy(col)
        .agg(F.min("cnt").alias("cms_est"))
    )


def cms_hash_duckdb(word_expr: str, i: int, w: int) -> str:
    """DuckDB rendering of the CMS row-i cell index."""
    h = portable_hash64_duckdb(f"{word_expr} || ':cms{i}'")
    return f"(({h}) % {w})"


def hll_distinct_duckdb(from_expr: str, url_expr: str, p: int = 6) -> str:
    """DuckDB mirror of :func:`hll_distinct` (same integer arithmetic,
    same double numerator literal, same single division)."""
    m = 1 << p
    h = portable_hash64_duckdb(url_expr)
    rest = f"(({h} >> {p}) | (1::BIGINT << {60 - p}))"
    rho = f"(1 + bit_count(({rest} & -{rest}) - 1))"
    return f"""
hll_b AS (SELECT ({h} & {m - 1}) AS bucket, {rho} AS rho
          FROM {from_expr}),
hll_a AS (SELECT bucket, least(max(rho), {RHO_CAP}) AS r
          FROM hll_b GROUP BY bucket),
hll_s AS (SELECT {p} AS p, {m} AS m,
            count(*) AS n_buckets_seen,
            round({hll_numerator(p)!r} /
              (sum((1::BIGINT << ({RHO_CAP} - r)))::BIGINT
               + ({m} - count(*)) * (1::BIGINT << {RHO_CAP})),
              4) AS hll_estimate
          FROM hll_a)
"""


def histogram_quantiles(
    df,
    key_col: str,
    value_col: str,
    quantiles: tuple[int, ...] = (50, 95, 99),
):
    """Exact grouped quantiles over an integer-binned value — the
    scale-correct alternative to both a global sort (one total-order
    shuffle of every row) and percentile_approx (float interpolation,
    engine-specific, not oracle-able). Fetch latencies, response
    sizes and queue depths are integers (or are binned to integers by
    the caller), so the per-key histogram is tiny regardless of row
    count: ONE map-side-combinable count aggregate keyed by
    (key, value), then a per-key cumulative window over at most
    |value domain| rows per key. The quantile rule is the exact
    lower-quantile definition: smallest v with cum_count >= ceil(q/100
    * n) — all-integer (cum * 100 >= q * n), so any SQL engine
    replays it bit-for-bit.

    Returns one row per key: n, min/max, and q<NN> columns.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    hist = df.groupBy(
        F.col(key_col).alias("k"), F.col(value_col).alias("v")
    ).agg(F.count("*").alias("c"))
    win = (
        Window.partitionBy("k")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("cum", F.sum("c").over(win)).withColumn(
        "n", F.sum("c").over(Window.partitionBy("k"))
    )
    aggs = [
        F.sum("c").alias("n"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
    ]
    for q in quantiles:
        aggs.append(
            F.min(
                F.when(F.col("cum") * 100 >= F.lit(q) * F.col("n"), F.col("v"))
            ).alias(f"q{q}")
        )
    return cum.groupBy(F.col("k").alias(key_col)).agg(*aggs)


def histogram_quantiles_duckdb(
    rows_sql: str,
    key: str = "k",
    value: str = "v",
    quantiles: tuple[int, ...] = (50, 95, 99),
) -> str:
    """DuckDB mirror of histogram_quantiles over ``rows_sql`` yielding
    (k, v) rows; final table ``hq_final``."""
    qcols = ", ".join(
        f"min(CASE WHEN cum * 100 >= {q} * n THEN v END) AS q{q}"
        for q in quantiles
    )
    return f"""
hq_rows AS ({rows_sql}),
hq_hist AS (SELECT {key} AS k, {value} AS v, count(*) AS c
            FROM hq_rows GROUP BY 1, 2),
hq_cum AS (SELECT k, v, c,
    sum(c) OVER (PARTITION BY k ORDER BY v
                 ROWS UNBOUNDED PRECEDING) AS cum,
    sum(c) OVER (PARTITION BY k) AS n
  FROM hq_hist),
hq_final AS (SELECT k AS {key}, sum(c)::BIGINT AS n,
    min(v) AS min_v, max(v) AS max_v, {qcols}
  FROM hq_cum GROUP BY k)
""".strip()
