"""Sequence packing (functions/packing.py): offset contiguity,
budget invariants, repartition stability."""

from collections import defaultdict

from pyspark.sql import functions as F

from spatula_spark.functions import packing as pk


def _pack(spark, n=300, budget=128, n_streams=4, repartition=None):
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id") * 37 + 11, F.lit(90)) + 10).alias("n_tokens"),
    )
    if repartition:
        df = df.repartition(repartition)
    return pk.pack_sequences(
        df, "doc_id", "n_tokens", budget=budget, n_streams=n_streams
    ).collect()


def test_offsets_contiguous_per_stream(spark):
    rows = _pack(spark)
    streams = defaultdict(list)
    for r in rows:
        streams[r["stream"]].append(r)
    assert len(streams) == 4
    for srows in streams.values():
        srows.sort(key=lambda r: r["offset"])
        expect = 0
        for r in srows:
            assert r["offset"] == expect  # no gaps, no overlaps
            assert r["pack_id"] == r["offset"] // 128
            assert r["pack_pos"] == r["offset"] % 128
            expect += r["n_tokens"]


def test_assignment_stable_under_repartition(spark):
    a = sorted(map(tuple, _pack(spark)), key=lambda t: t[0])
    b = sorted(map(tuple, _pack(spark, repartition=13)), key=lambda t: t[0])
    assert a == b
