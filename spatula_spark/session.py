"""SparkSession factory tuned for the crawl engine.

Local-mode testing runs on ``local[N]`` but every conf here is chosen
for multi-executor scale: AQE for runtime re-planning (skew joins on
hot hosts), shuffle partitions matched to parallelism, Arrow for the
pandas-UDF hot path, UTC timezone pinned so the DuckDB oracle compares
timestamps bit-for-bit.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "spatula_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores`` may be an int (→ ``local[n]``), ``"*"``, or None
    (→ ``$SPARK_GRAFT_CPUS`` or all cores). ``shuffle_partitions``
    defaults to the core count — the single most important local-mode
    knob (200 default over-parallelizes small data and starves big).
    """
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = f"local[{cores}]"
    if shuffle_partitions is None:
        n = os.cpu_count() or 8
        shuffle_partitions = n if cores in ("*",) else int(cores)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # zstd over snappy for every parquet write (wave scratch,
        # snapshots, sinks): smaller bytes win on any IO-constrained
        # store and shrink 100-TB footprints; interleaved same-window
        # A/B on the sync crawl (scratch/codec_ab.py): snappy 28.4 /
        # 29.3 s vs zstd 26.68 / 26.68 s — ~8% faster AND the
        # leg-to-leg spread collapses. Override via env for CPU-bound
        # deployments where snappy's cheaper encode wins.
        .config(
            "spark.sql.parquet.compression.codec",
            os.environ.get("SPARK_GRAFT_PARQUET_CODEC", "zstd"),
        )
        # r6: PySpark 4's per-API-call call-site capture does a Python
        # stack inspection plus TWO extra py4j round trips per
        # DataFrame-API call (pyspark.errors.utils._with_origin) purely
        # to enrich error messages. The crawl engine builds hundreds of
        # Column/DataFrame ops per wave on the driver — cProfile showed
        # ~1s of a 13-wave doc-tree crawl in _capture_call_site alone.
        # Scale-independent driver-overhead removal; tracebacks still
        # carry the Python stack. Re-enable via env for debugging.
        .config(
            "spark.python.sql.dataFrameDebugging.enabled",
            os.environ.get("SPARK_GRAFT_DF_DEBUGGING", "false"),
        )
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
