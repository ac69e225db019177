"""rules/weblog.rules — the access-log config over the round-3 grok
composites, run through the FULL pipeline (both engines): health
checks ignored, 5xx counted by status, parsed hits rendered into one
report sink, garbage unmatched."""

from __future__ import annotations

from pyspark.sql import functions as F

from logparse_spark import pipeline, stages
from logparse_spark.rules import load_rules

RULES = "/root/repo/rules/weblog.rules"

LINES = [
    '10.1.2.3 - alice [10/Oct/2000:13:55:36 -0700] "POST /api/v1/turns HTTP/1.1" 201 512',
    '10.1.2.3 - - [10/Oct/2000:13:55:37 -0700] "GET /health HTTP/1.1" 200 2',
    'host-7.internal.example - bob [10/Oct/2000:13:55:38 -0700] "GET /admin HTTP/1.0" 503 77',
    '192.168.0.9 - - [11/Oct/2000:09:01:02 +0000] "GET /ready HTTP/1.1" 200 -',
    '10.9.8.7 - carol [11/Oct/2000:09:02:03 +0000] "DELETE /api/v1/convs/42 HTTP/1.1" 500 31',
    "total garbage line",
]


def _frame(spark):
    rows = [
        (f"conv{i:03d}", 0, "user", text, None, "2026-01-01 00:00:00")
        for i, text in enumerate(LINES)
    ]
    return (
        spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string, "
                  "text string, tool string, ts string")
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )


def test_weblog_rules_route_through_pipeline(spark):
    compiled = load_rules(RULES)
    df = _frame(spark)
    for engine in ("udf", "sql"):
        cdf = pipeline.classify(df, compiled, buckets=4, engine=engine)
        got = {
            (r["sink_id"], r["conv_id"]): r["rendered"]
            for r in cdf.select("sink_id", "conv_id", "rendered").collect()
        }
        sinks = {k[0] for k in got}
        assert sinks == {"webhit", "weberr", "ignored", "unmatched"}, engine
        # health + ready -> ignored; 503 + 500 -> weberr counts
        assert got[("ignored", "conv001")] is None
        assert got[("ignored", "conv003")] is None
        assert got[("weberr", "conv002")] == "503"
        assert got[("weberr", "conv004")] == "500"
        assert got[("webhit", "conv000")] == \
            "POST /api/v1/turns -> 201 from 10.1.2.3"
        assert got[("unmatched", "conv005")] == "total garbage line"

    # per-rule summary (the LogParse report stage shape)
    counts = (
        stages.routed(pipeline.classify(df, compiled, buckets=4))
        .groupBy("sink_id").count().collect()
    )
    assert {r["sink_id"]: r["count"] for r in counts} == {
        "webhit": 1, "weberr": 2, "unmatched": 1}
