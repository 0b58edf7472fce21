"""Freshness-aware recrawl scheduling.

The reference crawls a site once per invocation; a continuously
operated crawler must decide *which already-seen URLs to fetch again*.
The classical model (Cho & Garcia-Molina, "Effective Page Refresh
Policies for Web Crawlers", TODS 2003) treats page change as a Poisson
process: estimate a per-URL change rate λ from the observed fetch
history, then refresh pages by their probability of having changed
since the last fetch, 1 - exp(-λ·age).

:func:`recrawl_priority` implements exactly that estimation pipeline
over a fetch-history table, with one deliberate twist: the final
staleness score uses the first-order Padé surrogate
``x/(1+x)`` of ``1-exp(-x)`` (same 0→1 range, same monotonicity in
λ·age, identical ordering of candidates) because it is built from
IEEE basic ops only — add/mul/div round identically in the JVM and
DuckDB, so the cross-engine oracle is bit-exact, whereas libm
``exp`` carries no such guarantee. λ itself is additively smoothed
(``(changes + alpha) / (span + beta)``), so never-observed-to-change
URLs and single-fetch URLs get a small positive rate instead of 0/0.

Plan shape at 10^10 URLs: one window over (url, ts) to detect
fingerprint changes (shuffle on url), one aggregate per url (same
partitioning — Catalyst reuses the exchange), a per-host top-k window
for the politeness-bounded schedule. No joins, no collect; history
compaction (keeping only the last K fetches per URL) drops in as a
ranked filter on the same first window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def recrawl_priority(
    history: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    ts_col: str = "fetch_ts",
    fp_col: str = "content_fp",
    alpha: float = 0.5,
    beta_s: float = 3600.0,
    k: int = 3,
    now_ms: int | None = None,
) -> DataFrame:
    """Per-host top-``k`` recrawl schedule from a fetch-history table.

    For each URL: ``n_fetches``, ``n_changes`` (consecutive fetches
    whose content fingerprint differs), smoothed change rate
    ``λ = (n_changes + alpha) / (observed_span_s + beta_s)``, age
    since the last fetch measured against ``now_ms`` (epoch millis;
    production passes the scheduler's wall clock — None derives the
    corpus-wide latest fetch time, the deterministic choice the oracle
    battery needs), and ``score = λ·age / (1 + λ·age)`` — the staleness
    probability surrogate (see module docstring). Returns the ``k``
    highest-score URLs per host, rank-stable (score desc, url asc).
    """
    url, host = F.col(url_col), F.col(host_col)
    # parquet timestamps may arrive as NTZ; session tz is pinned UTC so
    # the LTZ reinterpretation matches DuckDB's naive epoch_ms exactly
    ms = F.unix_millis(F.col(ts_col).cast("timestamp"))
    w_url = Window.partitionBy(url_col).orderBy(ms, fp_col)
    changed = F.when(
        F.lag(fp_col).over(w_url).isNotNull()
        & (F.col(fp_col) != F.lag(fp_col).over(w_url)),
        F.lit(1),
    ).otherwise(F.lit(0))
    per_url = (
        history.select(
            url.alias("url"), host.alias("host"), ms.alias("_ms"),
            changed.alias("_chg"),
        )
        .groupBy("url", "host")
        .agg(
            F.count("*").alias("n_fetches"),
            F.sum("_chg").alias("n_changes"),
            F.min("_ms").alias("_first_ms"),
            F.max("_ms").alias("_last_ms"),
        )
    )
    if now_ms is None:
        # corpus-wide "now" = latest observed fetch, attached as a
        # 1-row broadcast (an unpartitioned max window would drag the
        # whole per-URL table onto a single partition — fatal at 10^10
        # URLs; a 1-row broadcast nested-loop join just streams)
        now = per_url.agg(F.max("_last_ms").alias("_now_ms"))
        per_url = per_url.crossJoin(F.broadcast(now))
    else:
        per_url = per_url.withColumn("_now_ms", F.lit(int(now_ms)))
    span_s = (F.col("_last_ms") - F.col("_first_ms")) / 1000.0
    age_s = (F.col("_now_ms") - F.col("_last_ms")) / 1000.0
    lam = (F.col("n_changes") + F.lit(alpha)) / (span_s + F.lit(beta_s))
    x = lam * age_s
    scored = per_url.withColumn("score", F.round(x / (x + 1.0), 6))
    w_host = Window.partitionBy("host").orderBy(F.col("score").desc(), "url")
    return (
        scored.withColumn("rn", F.row_number().over(w_host))
        .filter(F.col("rn") <= k)
        .select("host", "url", "n_fetches", "n_changes", "score", "rn")
    )
