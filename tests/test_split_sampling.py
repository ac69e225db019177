"""Deterministic train/val/test split + hash sampling (corpus.py):
key-hash assignment that is stable under partitioning, appends, and
engine changes — the property rand(seed)/randomSplit/df.sample lack
(their output depends on partition layout, so a compaction or a
different cluster size silently moves documents between train and
eval)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logparse_spark import corpus


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.01/documents.parquet")


def test_split_bounds_math():
    bounds = corpus._split_hex_bounds()
    assert [n for n, _ in bounds] == ["train", "val", "test"]
    assert bounds[0][1] == format(int(0.90 * 16**8), "08x")
    # final bound caps the whole hex space (every key lands somewhere)
    assert bounds[-1][1] > "ffffffff"
    # weights needn't sum to 1 — they normalize
    b2 = corpus._split_hex_bounds((("a", 1), ("b", 1)))
    assert b2[0][1] == format(16**8 // 2, "08x")


def test_split_proportions_and_totality(spark, docs):
    got = {r["split"]: r["n"] for r in
           docs.select(corpus.split_column().alias("split"))
           .groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    n = sum(got.values())
    assert n == docs.count()          # no null assignments
    assert set(got) == {"train", "val", "test"}
    assert abs(got["train"] / n - 0.90) < 0.03
    assert abs(got["val"] / n - 0.05) < 0.02
    assert abs(got["test"] / n - 0.05) < 0.02


def test_split_stable_under_partitioning(spark, docs):
    """THE claim: identical assignment at any parallelism. rand-based
    splits fail exactly this check."""
    def assign(df):
        return dict(df.select(
            "doc_id", corpus.split_column().alias("s")).collect())

    a = assign(docs.repartition(1))
    b = assign(docs.repartition(13))
    assert a == b


def test_hash_sample_contract(spark, docs):
    n = docs.count()
    s10 = corpus.hash_sample(docs, 0.10)
    got = s10.count()
    # n=500 -> sd ~1.3%; allow 4 sd
    assert abs(got / n - 0.10) < 0.055
    # deterministic: the same rows every time, at any parallelism
    ids1 = {r["doc_id"] for r in s10.collect()}
    ids2 = {r["doc_id"] for r in
            corpus.hash_sample(docs.repartition(7), 0.10).collect()}
    assert ids1 == ids2
    # nested fractions: a 5% sample is a subset of the 10% sample
    ids05 = {r["doc_id"] for r in corpus.hash_sample(docs, 0.05).collect()}
    assert ids05 <= ids1
    # salts give independent draws
    salted = {r["doc_id"] for r in
              corpus.hash_sample(docs, 0.10, salt="v2").collect()}
    assert salted != ids1
    overlap = len(salted & ids1) / max(1, len(ids1))
    assert overlap < 0.5  # ~1% expected for independent 10% draws
    # edges
    assert corpus.hash_sample(docs, 0.0).count() == 0
    assert corpus.hash_sample(docs, 1.0).count() == n
    with pytest.raises(ValueError):
        corpus.hash_sample(docs, 1.5)


def test_split_jvm_only(spark, docs):
    plan = (docs.select(corpus.split_column().alias("s"))
            ._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
