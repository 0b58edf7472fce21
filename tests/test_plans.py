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
