"""Time-versioned (SCD2) dimension enrichment (stages.enrich_scd):
each row joins the dimension version in effect at its event time —
broadcast hash join on the key with the validity interval as
post-probe filter, never a nested-loop join."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from logparse_spark import stages


def _hist(spark):
    rows = [
        ("user", "human_v1", dt.datetime(1970, 1, 1), dt.datetime(2026, 1, 3)),
        ("user", "human", dt.datetime(2026, 1, 3), dt.datetime(2100, 1, 1)),
        ("tool", "infra_v1", dt.datetime(1970, 1, 1), dt.datetime(2026, 1, 3)),
        ("tool", "infra", dt.datetime(2026, 1, 3), dt.datetime(2100, 1, 1)),
    ]
    return spark.createDataFrame(
        rows, "role string, role_class string, "
              "valid_from timestamp_ntz, valid_to timestamp_ntz")


def test_versions_resolve_by_event_time(spark):
    rows = [
        ("c1", 0, "user", dt.datetime(2026, 1, 2, 23, 59, 59)),   # pre
        ("c1", 1, "user", dt.datetime(2026, 1, 3, 0, 0, 0)),      # boundary
        ("c1", 2, "tool", dt.datetime(2026, 1, 4, 12, 0, 0)),     # post
        ("c1", 3, "ghost", dt.datetime(2026, 1, 4, 0, 0, 0)),     # unknown
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, ts timestamp_ntz")
    out = {r["turn_idx"]: r["role_class"] for r in
           stages.enrich_scd(df, _hist(spark)).collect()}
    assert out == {0: "human_v1", 1: "human", 2: "infra", 3: None}


def test_exactly_one_version_per_row(spark):
    """Tiling half-open intervals: the join never duplicates rows."""
    n = 200
    df = spark.range(n).select(
        F.col("id").cast("string").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.when(F.col("id") % 2 == 0, "user").otherwise("tool").alias("role"),
        (F.to_timestamp_ntz(F.lit("2026-01-01"))
         + F.make_dt_interval(F.pmod(F.col("id"), 5).cast("int"))).alias("ts"),
    )
    out = stages.enrich_scd(df, _hist(spark))
    assert out.count() == n
    assert out.filter(F.col("role_class").isNull()).count() == 0


def test_plan_is_broadcast_hash_join(spark):
    df = spark.createDataFrame(
        [("c", 0, "user", dt.datetime(2026, 1, 2))],
        "conv_id string, turn_idx int, role string, ts timestamp_ntz")
    plan = (stages.enrich_scd(df, _hist(spark))
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan
