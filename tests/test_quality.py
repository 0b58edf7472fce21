"""Corpus-hygiene operators (functions/quality.py): repetition
filters, benchmark decontamination, deterministic weighted sampling."""

import pytest
from pyspark.sql import functions as F

from spatula_spark.functions import quality as ql


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta"),  # clean
        (1, "spam spam spam spam spam spam spam spam"),  # degenerate
        (2, "one two one two one two one two"),  # bigram loop
        (3, "word"),  # single word
        (4, ""),  # empty
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _by_id(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


class TestRepetitionProfile:
    def test_metrics_golden(self, docs):
        m = _by_id(ql.repetition_profile(docs))
        clean = m[0]
        assert clean["dup_word_frac"] == 0.0
        assert clean["dup_bigram_frac"] == 0.0
        assert clean["adjacent_dup_frac"] == 0.0
        assert clean["keep"] is True

        spam = m[1]  # 8x the same word
        assert spam["n_words"] == 8
        assert spam["dup_word_frac"] == pytest.approx(7 / 8)
        assert spam["dup_bigram_frac"] == pytest.approx(6 / 7)
        assert spam["dup_trigram_frac"] == pytest.approx(5 / 6)
        assert spam["adjacent_dup_frac"] == 1.0
        assert spam["keep"] is False

        loop = m[2]  # "one two" * 4: every word repeats, no adjacent dups
        assert loop["dup_word_frac"] == pytest.approx(6 / 8)
        assert loop["dup_bigram_frac"] == pytest.approx(5 / 7)
        assert loop["adjacent_dup_frac"] == 0.0
        assert loop["keep"] is False  # bigram loop caught without adjacency

    def test_short_doc_edges(self, docs):
        m = _by_id(ql.repetition_profile(docs))
        for did in (3, 4):  # 1 word / empty: no n-grams, all fracs 0
            assert m[did]["dup_bigram_frac"] == 0.0
            assert m[did]["dup_trigram_frac"] == 0.0
            assert m[did]["adjacent_dup_frac"] == 0.0
            assert m[did]["keep"] is True


class TestDecontaminate:
    def test_shared_trigram_flagged(self, spark):
        # pick ids whose hash bucket puts exactly one doc in the
        # benchmark set (same md5 arithmetic as quality.benchmark_member)
        def bucket(i, mod=20):
            import hashlib

            return int(hashlib.md5(f"bench:{i}".encode()).hexdigest()[:15], 16) % mod

        bench_doc = next(i for i in range(1000) if bucket(i) == 0)
        overlap_doc = next(
            i for i in range(1000) if bucket(i) != 0 and i != bench_doc
        )
        clean_doc = next(
            i for i in range(1000)
            if bucket(i) != 0 and i not in (bench_doc, overlap_doc)
        )
        df = spark.createDataFrame(
            [
                (bench_doc, "the quick brown fox jumps high"),
                (overlap_doc, "a quick brown fox appears suddenly today"),
                (clean_doc, "completely different words entirely here now"),
            ],
            "doc_id long, text string",
        )
        out = _by_id(ql.decontaminate(df))
        assert bench_doc not in out  # benchmark docs aren't scored
        assert out[overlap_doc]["contaminated"] is True
        assert out[overlap_doc]["n_hit_shingles"] == 1  # "quick brown fox"
        assert out[clean_doc]["contaminated"] is False
        assert out[clean_doc]["n_hit_shingles"] == 0


class TestWeightedSample:
    def test_extremes_and_determinism(self, spark):
        df = spark.range(500).select(
            F.col("id").alias("doc_id"), F.lit(1.0).alias("w")
        )
        assert ql.weighted_sample(df, "doc_id", F.col("w")).count() == 500
        zero = df.withColumn("w", F.lit(0.0))
        assert ql.weighted_sample(zero, "doc_id", F.col("w")).count() == 0

        half = df.withColumn("w", F.lit(0.5))
        kept1 = sorted(
            r["doc_id"] for r in ql.weighted_sample(half, "doc_id", F.col("w")).collect()
        )
        # stable under repartitioning (unlike df.sample)
        kept2 = sorted(
            r["doc_id"]
            for r in ql.weighted_sample(
                half.repartition(13), "doc_id", F.col("w")
            ).collect()
        )
        assert kept1 == kept2
        assert 200 <= len(kept1) <= 300  # ~Binomial(500, .5)


class TestTfidfTopk:
    def test_golden_small(self, spark):
        from spatula_spark.functions import text as tx

        df = spark.createDataFrame(
            [
                (0, "apple apple banana"),
                (1, "banana cherry"),
                (2, "cherry cherry cherry date"),
            ],
            "doc_id long, text string",
        )
        rows = {
            (r["doc_id"], r["rank"]): (r["word"], r["tf"])
            for r in tx.tfidf_topk(df, k=2).collect()
        }
        # apple: tf=2, df=1 -> top of doc 0; date df=1 beats cherry df=2
        # at tf ties? doc 2: cherry tf=3 df=2 score=3*ln(1.5)=1.216;
        # date tf=1 df=1 score=ln(3)=1.099 -> cherry first
        assert rows[(0, 1)] == ("apple", 2)
        assert rows[(2, 1)] == ("cherry", 3)
        assert rows[(2, 2)] == ("date", 1)


class TestRebalance:
    def test_balanced_and_stable(self, spark):
        from spatula_spark.functions import sampling as sp

        rows = [(i, "big") for i in range(900)] + [
            (i + 1000, "small") for i in range(100)
        ]
        df = spark.createDataFrame(rows, "doc_id long, lang string")
        kept = sp.rebalance(df, "lang", "doc_id")
        by_lang = {
            r["lang"]: r["n"]
            for r in kept.groupBy("lang").agg(
                F.count("*").alias("n")).collect()
        }
        assert by_lang["small"] == 100  # rate 1.0: rarest group intact
        assert 60 <= by_lang["big"] <= 140  # ~Binomial(900, 1/9)
        a = sorted(r["doc_id"] for r in kept.collect())
        b = sorted(
            r["doc_id"]
            for r in sp.rebalance(df.repartition(17), "lang", "doc_id").collect()
        )
        assert a == b


class TestRedactPii:
    def test_patterns_scrubbed(self, spark):
        from spatula_spark.functions import text as tx

        df = spark.createDataFrame(
            [
                (0, "write to alice.smith+x@corp.example.org today"),
                (1, "call +1 555-123-4567 or 555 987 6543 now"),
                (2, "no pii here at all"),
            ],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r["red"]
            for r in df.select(
                "doc_id", tx.redact_pii(F.col("text")).alias("red")
            ).collect()
        }
        assert out[0] == "write to <PII> today"
        assert "<PII>" in out[1] and "555-123-4567" not in out[1]
        assert "555 987 6543" not in out[1]  # space-separated form too
        assert out[2] == "no pii here at all"


def test_decontaminate_shuffle_fallback_same_result(spark):
    """broadcast_max_grams=0 forces the shuffle join; the verdicts
    must be identical to the broadcast path."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = sorted(map(tuple, ql.decontaminate(docs).collect()))
    b = sorted(
        map(tuple, ql.decontaminate(docs, broadcast_max_grams=0).collect())
    )
    assert a == b
