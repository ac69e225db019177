#!/usr/bin/env python
"""Measure the row-level ops' scale claim at sf1: a DELETE/MERGE must
cost O(touched buckets), not O(table).

Protocol: build a committed sf1 table (6M turns, buckets='auto'),
then time
  - delete of 3 cold conversations  (expected: <=3 of B buckets rewritten)
  - upsert (re-delivery) of 1 conversation (expected: 1 bucket rewritten)
  - the naive alternative those ops replace: a FULL-table rewrite
    (compact(min_files_per_partition=1)) — what a store without
    bucket-pruned COW pays for any row-level change.

Prints one JSON line; paste the numbers into BENCH/ROWOPS.md.
Run: python BENCH/rowops_bench.py  (local[32], ~2-4 min)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def run_sf(spark, sf: str) -> dict:
    from logparse_spark import pipeline
    from logparse_spark.fixtures import ensure_fixture
    from logparse_spark.sinks import SinkSet, load_manifest

    sf_dir = ensure_fixture(sf)
    n_turns = {"0.1": 600_000, "1": 6_000_000, "10": 60_000_000}[sf]
    n_convs = {"0.1": 30_000, "1": 300_000, "10": 3_000_000}[sf]

    out = tempfile.mkdtemp(prefix=f"rowops_sf{sf}_")
    try:
        t0 = time.monotonic()
        pipeline.run(
            spark,
            source_path=f"{sf_dir}/transcripts.parquet",
            out_dir=out,
            dict_dir=sf_dir,
            buckets="auto",
            hot_threshold="auto",
        )
        t_build = time.monotonic() - t0
        nb = int(load_manifest(out)["n_buckets"])

        # 3 cold conversations (tail of the Zipf head — typical ids);
        # run the op twice with distinct id sets: the first read after
        # a big build pays page-cache flush + fresh file-listing (cold),
        # the second is the steady-state number
        convs = [f"conv{i:06d}"
                 for i in (n_convs // 3 * 2, n_convs // 6 * 5, n_convs - 1)]
        convs2 = [f"conv{i:06d}"
                  for i in (n_convs // 2 + 1, n_convs // 2 + 2,
                            n_convs // 2 + 3)]
        t0 = time.monotonic()
        d_cold = SinkSet(out_dir=out).delete_conversations(spark, convs)
        t_delete_cold = time.monotonic() - t0
        t0 = time.monotonic()
        d = SinkSet(out_dir=out).delete_conversations(spark, convs2)
        t_delete = time.monotonic() - t0

        # re-deliver one conversation: its source rows, one flipped turn
        up_src = os.path.join(out, "upsert_src.parquet")
        (
            spark.read.parquet(f"{sf_dir}/transcripts.parquet")
            .filter(F.col("conv_id") == f"conv{n_convs // 2:06d}")
            .withColumn(
                "text",
                F.when(F.col("turn_idx") == 0,
                       F.lit("login failed for user redelivery"))
                .otherwise(F.col("text")),
            )
            .coalesce(1).write.mode("overwrite").parquet(up_src)
        )
        t0 = time.monotonic()
        u = pipeline.upsert(spark, up_src, out, dict_dir=sf_dir)
        t_upsert = time.monotonic() - t0

        # the naive contrast: what any row change costs WITHOUT
        # bucket-pruned COW — a full-table rewrite
        t0 = time.monotonic()
        c = SinkSet(out_dir=out).compact(spark, min_files_per_partition=1)
        t_full = time.monotonic() - t0

        # partition evolution: rebucket to 2x — a full rewrite plus the
        # re-hash shuffle; expected ~= full_rewrite cost (it IS one)
        t0 = time.monotonic()
        rb = SinkSet(out_dir=out).rebucket(spark, nb * 2)
        t_rebucket = time.monotonic() - t0

        return {
            "sf": sf, "n_turns": n_turns, "n_buckets": nb,
            "build_sec": round(t_build, 2),
            "delete": {"sec": round(t_delete, 2),
                       "cold_sec": round(t_delete_cold, 2),
                       "buckets_rewritten": len(d["rewritten_buckets"]),
                       "rows_deleted": d["rows_deleted"]
                       + d_cold["rows_deleted"]},
            "upsert": {"sec": round(t_upsert, 2),
                       "buckets_rewritten": len(u["rewritten_buckets"]),
                       "rows_deleted": u["rows_deleted"],
                       "rows_inserted": u["rows_inserted"]},
            "full_rewrite": {"sec": round(t_full, 2),
                             "buckets_rewritten": len(c["rewritten_buckets"])},
            "rebucket": {"sec": round(t_rebucket, 2),
                         "to_buckets": rb["n_buckets_after"],
                         "rows": rb["rows"]},
        }
    finally:
        shutil.rmtree(out, ignore_errors=True)


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        # the scale claim is COST INVARIANCE of the row ops: bucket size
        # is pinned (~250k rows via auto_bucket_count; the local[32]
        # parallelism floor keeps sf<=1 at 32 buckets, sf10 gets 256)
        # so a k-conv delete rewrites k buckets of bounded size at ANY
        # table size, while the full rewrite grows linearly with the
        # table. Run the identical protocol at 600k / 6M / 60M turns.
        results = [run_sf(spark, sf) for sf in ("0.1", "1", "10")]
        print(json.dumps({"runs": results}))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
