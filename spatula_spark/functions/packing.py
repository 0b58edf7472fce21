"""Deterministic sequence packing for training-batch construction.

The dominant LLM packing strategy is concat-and-chunk: shuffle the
corpus deterministically, concatenate token streams, and cut every
``budget`` tokens. Distributed spelling: shard docs into ``n_streams``
independent streams by portable hash (streams are the parallel unit —
size n_streams so one stream's token footprint fits an executor), then
one running-sum window per stream assigns every doc its global token
offset; ``pack_id = offset div budget`` is then a pure column
function. One shuffle total (the window's hash partition + sort);
assignment is reproducible from (id, n_streams, budget) alone by any
engine — the DuckDB oracle in ``entry_queries`` replays it
bit-for-bit.

The within-pack document order is the hash order itself — i.e. the
deterministic "epoch shuffle" a training pipeline wants anyway
(re-salt to re-shuffle between epochs: ``salt="pack:epoch3"``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..urls import portable_hash64


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int = 512,
    n_streams: int = 8,
    salt: str = "pack",
) -> DataFrame:
    """Assign every doc (stream, offset, pack_id, pack_pos).

    offset  = total tokens before this doc in its stream's hash order
    pack_id = offset div budget  (the training sequence this doc
              starts in; docs straddling a boundary are split at
              tokenization time, as concat-and-chunk always does)
    pack_pos = offset mod budget (start position inside the pack)
    """
    h = portable_hash64(
        F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))
    )
    out = df.withColumn("_h", h).withColumn(
        "stream", F.pmod(F.col("_h"), F.lit(n_streams))
    )
    w = Window.partitionBy("stream").orderBy("_h", id_col)
    offset = (F.sum(tokens_col).over(w) - F.col(tokens_col)).cast("long")
    return (
        out.withColumn("offset", offset)
        .withColumn("pack_id", F.expr(f"offset div {budget}"))
        .withColumn("pack_pos", F.pmod(F.col("offset"), F.lit(budget)))
        .drop("_h")
    )
