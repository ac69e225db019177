#!/usr/bin/env python
"""Measure read_time_range file skipping + wall under the two
compaction sort orders at material scale.

Synthetic table: N conversations x T turns, event time uniform over 30
days, conv ids TIME-RANDOM (the adversarial case for the default
key-order clustering). Two copies of the same committed table are
compacted with sort_order='key' and 'time'; a 1-day range read is
measured on each (planned files via the executed scan's numFiles
metric, wall warm).

Run: python BENCH/timerange_probe.py [n_convs] (default 120k -> ~6M rows)
One JSON line to stdout; prose summary goes to BENCH/TIMERANGE.md.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

N_BUCKETS = 64
DAYS = 30
TURNS = 50


def scan_num_files(df, path_substr):
    df.collect()

    def walk(node, out):
        name = node.getClass().getSimpleName()
        if "FileSourceScan" in name:
            out.append(node)
        if name == "AdaptiveSparkPlanExec":
            return walk(node.executedPlan(), out)
        if name.endswith("QueryStageExec"):
            return walk(node.plan(), out)
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i), out)
        return out

    scans = walk(df._jdf.queryExecution().executedPlan(), [])
    hits = [s for s in scans if path_substr in
            s.relation().location().rootPaths().apply(0).toString()]
    return sum(int(s.metrics().apply("numFiles").value()) for s in hits)


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from logparse_spark.sinks import SinkSet

    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.driver.memory", "24g")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    base = tempfile.mkdtemp(prefix="trange_")
    src = (
        spark.range(n_convs).select(
            F.concat(F.lit("conv-"),
                     F.lpad(F.conv(F.col("id") * 2654435761 % 2**30, 10, 16),
                            8, "0"),
                     F.lit("-"), F.col("id").cast("string")).alias("conv_id"),
            (F.col("id") % DAYS).alias("day"),
        )
        .select(
            "conv_id",
            F.explode(F.sequence(F.lit(0), F.lit(TURNS - 1))).alias("turn_idx"),
            "day",
        )
        .select(
            "conv_id",
            F.col("turn_idx").cast("int"),
            F.lit("user").alias("role"),
            (F.to_timestamp_ntz(F.lit("2026-03-01 00:00:00"))
             + F.make_dt_interval(F.col("day"), F.lit(0), F.col("turn_idx"))
             ).alias("ts"),
            F.lit("chat").alias("sink_id"),
        )
        .withColumn("bucket",
                    F.pmod(F.xxhash64("conv_id"), F.lit(N_BUCKETS)).cast("int"))
    )

    out0 = f"{base}/table"
    ss = SinkSet(out_dir=out0)
    t0 = time.time()
    ss.commit(ss.write_classified(src.repartition(64)), n_buckets=N_BUCKETS)
    write_s = time.time() - t0

    results = {"n_rows": n_convs * TURNS, "write_s": round(write_s, 2)}
    lo, hi = "2026-03-10", "2026-03-11"  # 1 of 30 days
    for order in ("key", "time"):
        out = f"{base}/table_{order}"
        shutil.copytree(out0, out)
        t0 = time.time()
        SinkSet(out_dir=out).compact(
            spark, min_files_per_partition=1,
            max_records_per_file=20_000, sort_order=order)
        compact_s = time.time() - t0
        ss2 = SinkSet(out_dir=out)
        total = scan_num_files(ss2._read_committed(spark), out)
        # warm
        for _ in range(2):
            t0 = time.time()
            n = ss2.read_time_range(spark, lo, hi).count()
            wall = time.time() - t0
        planned = scan_num_files(ss2.read_time_range(spark, lo, hi), out)
        results[order] = {
            "compact_s": round(compact_s, 2), "files_total": total,
            "files_planned": planned, "rows_in_range": n,
            "range_read_warm_s": round(wall, 2),
        }
        shutil.rmtree(out)
    print(json.dumps(results))
    shutil.rmtree(base)
    spark.stop()


if __name__ == "__main__":
    main()
