"""Sharded JSONL export (corpus.export_jsonl): deterministic shard
membership, round-trip fidelity, and file-size targeting."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from logparse_spark import corpus

DOCS = "/root/testdata/sf0.01/documents.parquet"


def _read_shard_rows(out):
    rows = {}
    for d in glob.glob(os.path.join(out, "shard=*")):
        shard = int(d.rsplit("=", 1)[1])
        for f in sorted(glob.glob(os.path.join(d, "*.json"))):
            with open(f, encoding="utf-8") as fh:
                for line in fh:
                    rows[json.loads(line)["doc_id"]] = shard
    return rows


def test_round_trip_and_determinism(spark, tmp_path):
    df = spark.read.parquet(DOCS)
    out1, out2 = str(tmp_path / "a"), str(tmp_path / "b")
    res = corpus.export_jsonl(df, out1, n_shards=4)
    assert res == {"rows": df.count(), "shards": 4}
    # re-export at different parallelism: identical shard membership
    corpus.export_jsonl(df.repartition(13), out2, n_shards=4)
    m1, m2 = _read_shard_rows(out1), _read_shard_rows(out2)
    assert m1 == m2 and len(m1) == df.count()
    assert set(m1.values()) == set(range(4))
    # full-fidelity round trip through Spark's own reader
    back = spark.read.json(f"{out1}/shard=*")
    orig = {tuple(sorted(r.asDict().items())) for r in df.collect()}
    got = {tuple(sorted(r.asDict().items())) for r in
           back.select(*df.columns).collect()}
    assert got == orig


def test_within_shard_order_and_file_target(spark, tmp_path):
    df = spark.read.parquet(DOCS)
    out = str(tmp_path / "sized")
    corpus.export_jsonl(df, out, n_shards=2, max_records_per_file=50)
    for d in glob.glob(os.path.join(out, "shard=*")):
        ids = []
        for f in sorted(glob.glob(os.path.join(d, "*.json"))):
            with open(f, encoding="utf-8") as fh:
                lines = fh.read().splitlines()
            assert len(lines) <= 50
            ids.extend(json.loads(x)["doc_id"] for x in lines)
        # rolled files preserve the order_by order shard-wide
        assert ids == sorted(ids)
    with pytest.raises(ValueError):
        corpus.export_jsonl(df, str(tmp_path / "x"), n_shards=0)
