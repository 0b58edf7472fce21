"""Physical-plan discipline checks (.explain audit as assertions):
filters reach the parquet scan, projections prune columns, small dims
broadcast — the properties that survive a 100x scale-up."""

import re

import __spark_entry__ as entry


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _read_schemas(plan: str) -> list[str]:
    return re.findall(r"FileScan parquet \[([^\]]*)\]", plan)


SF = "/root/testdata/sf0.001"


def test_q1_filter_pushdown_and_pruning(spark):
    p = _plan(entry.queries()["q1_pricing_summary"](spark, SF))
    scans = _read_schemas(p)
    assert scans, p
    cols = {c.split("#")[0] for c in scans[0].split(",")}
    # 11-column table, 7 needed: pruning must drop the rest
    assert "l_orderkey" not in cols and "l_partkey" not in cols
    assert "l_shipdate" in cols
    assert "l_shipdate" in p.split("DataFilters:")[1][:200]


def test_text_profile_reads_two_columns(spark):
    p = _plan(entry.queries()["text_profile"](spark, SF))
    cols = {c.split("#")[0] for c in _read_schemas(p)[0].split(",")}
    assert cols == {"doc_id", "text"}


def test_q5_small_dims_broadcast(spark):
    p = _plan(entry.queries()["q5_region_revenue"](spark, SF))
    assert p.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in p


def test_media_bytes_pruned_outside_decode(spark, tmp_path):
    """Column-pruning discipline on the binary column: a caption-only
    projection over the media table must not read `bytes`."""
    from spatula_spark.sources.synthweb import SynthWeb

    path = str(tmp_path / "media.pq")
    SynthWeb(n_hosts=1, details_per_host=4, skew=1).media(spark).write.parquet(
        path
    )
    m = spark.read.parquet(path)
    p = _plan(m.select("image_id", "caption"))
    cols = {c.split("#")[0] for c in _read_schemas(p)[0].split(",")}
    assert "bytes" not in cols
    assert cols == {"image_id", "caption"}


def test_bucketed_store_join_skips_store_shuffle(spark):
    """The Iceberg-deployment claim made executable: a page store
    written with bucketBy(url_hash) joins the frontier with NO exchange
    on the store side (only the slim frontier shuffles), while the same
    join against the plain store exchanges both sides. This is the
    co-located-join layout a 100 TB store ships with."""
    from spatula_spark.sources.synthweb import SynthWeb

    store = SynthWeb(n_hosts=4, details_per_host=200,
                     details_per_list=50).page_store(spark)
    store.write.bucketBy(8, "url_hash").sortBy("url_hash").mode(
        "overwrite"
    ).saveAsTable("_bucketed_store_test")
    try:
        bstore = spark.table("_bucketed_store_test")
        frontier = store.select("url_hash").limit(100)

        def executed_plan(df):
            df.count()
            return df._jdf.queryExecution().executedPlan().toString()

        p_bucketed = executed_plan(
            bstore.join(frontier.hint("shuffle_hash"), "url_hash")
        )
        p_plain = executed_plan(
            store.join(frontier.hint("shuffle_hash"), "url_hash")
        )
        assert "Bucketed: true" in p_bucketed
        assert p_bucketed.count("Exchange hashpartitioning") == 1  # frontier
        assert p_plain.count("Exchange hashpartitioning") == 2  # both sides
    finally:
        spark.sql("DROP TABLE IF EXISTS _bucketed_store_test")


def test_salted_repartition_spreads_hot_host(spark):
    """Host-skew mandate: a 99%-one-host frontier repartitioned on
    host alone piles into one partition; the salted repartition
    (host, pmod(xxhash64(url), salt)) spreads the hot host across
    many partitions while keeping per-(host, salt) groups co-located."""
    from pyspark.sql import functions as F

    from spatula_spark.operators.politeness import salted_repartition

    rows = [("hot.example.com", f"http://hot.example.com/p{i}")
            for i in range(990)]
    rows += [(f"h{i}.example.com", f"http://h{i}.example.com/x")
             for i in range(10)]
    df = spark.createDataFrame(rows, "host string, url string")

    def partition_sizes(d):
        return [
            r["n"] for r in d.withColumn(
                "pid", F.spark_partition_id()
            ).groupBy("pid").agg(F.count("*").alias("n")).collect()
        ]

    unsalted = partition_sizes(df.repartition(8, "host"))
    salted = partition_sizes(salted_repartition(df, 8, salt_buckets=16))
    assert max(unsalted) >= 990        # the hot host is one straggler
    assert max(salted) <= 990 / 3      # spread across >=3 partitions
    assert sum(salted) == 1000


def test_repetition_profile_is_map_side_only(spark):
    """Gopher repetition metrics must stream at scan speed: no
    Exchange (shuffle) anywhere in the plan, only doc_id+text read."""
    p = _plan(entry.queries()["doc_repetition_filters"](spark, SF))
    assert "Exchange" not in p, p
    cols = {c.split("#")[0] for c in _read_schemas(p)[0].split(",")}
    assert cols == {"doc_id", "text"}


def test_quality_sample_is_map_side_only(spark):
    p = _plan(entry.queries()["quality_sample"](spark, SF))
    assert "Exchange" not in p, p


def test_caption_image_alignment_is_map_side_only(spark):
    """The CLIP-style alignment gate must run at scan speed: pure
    per-row HOF arithmetic, no Exchange, only doc_id read (captions
    and fingerprints are derived column-side in this query)."""
    p = _plan(entry.queries()["caption_image_alignment"](spark, SF))
    assert "Exchange" not in p, p
    cols = {c.split("#")[0] for c in _read_schemas(p)[0].split(",")}
    assert cols == {"doc_id"}


def test_anchor_text_topk_join_free_three_exchanges(spark):
    """Anchor aggregation must never self-join the link graph: one
    edge-scale pre-distinct aggregate, the (dst, phrase) rollup, the
    per-dst window — three keyed exchanges, zero joins."""
    p = _plan(entry.queries()["anchor_text_topk"](spark, SF))
    assert "Join" not in p, p
    assert p.count("Exchange hashpartitioning") == 3, p


def test_trap_hosts_single_shuffle_before_window(spark):
    """Trap detection touches the crawl log once: one hash aggregate
    (plus its distinct-expand exchange) feeds the tiny per-host
    window — no join, no resort of the log itself."""
    p = _plan(entry.queries()["crawl_trap_hosts"](spark, SF))
    assert "Join" not in p, p
    assert p.count("Exchange hashpartitioning") <= 3, p


def test_decontaminate_broadcasts_benchmark_grams(spark):
    """Benchmark gram set must broadcast; the corpus side must not be
    sort-merge joined."""
    p = _plan(entry.queries()["decontaminate"](spark, SF))
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p


def test_pack_sequences_single_shuffle(spark):
    """One hash-partition exchange for the per-stream window; no
    second shuffle downstream of it."""
    p = _plan(entry.queries()["pack_sequences"](spark, SF))
    assert p.count("Exchange hashpartitioning") == 1, p


def test_redact_pii_is_map_side_only(spark):
    p = _plan(entry.queries()["redact_pii"](spark, SF))
    assert "Exchange" not in p, p


def test_lang_rebalance_broadcasts_rates(spark):
    p = _plan(entry.queries()["lang_rebalance"](spark, SF))
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p
