"""Measure the driver-side serial tail of write_classified at sf10.

The write tail has four parts: the distributed write action itself,
then three DRIVER-SIDE serial steps paid identically at every
parallelism level — the footer lineage walk, the per-file stats walk
(a SECOND pass over the same footers), and the manifest commit. A
constant serial tail c at both scaling levels depresses measured
N->4N efficiency: eff = (T4 - c + c) / (4 * (T16' + c)) with
T16' = (T4 - c)/4, so c = 3s on a 47s local[16] job costs ~0.02-0.03
of efficiency. This probe times each step separately at one level.

Usage: taskset -c 0-15 python BENCH/footer_tail_probe.py 16 10
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402


def main() -> None:
    cores, sf = int(sys.argv[1]), sys.argv[2]
    from pyspark.sql import functions as F  # noqa: F401

    from logparse_spark import pipeline, stages
    from logparse_spark.fixtures import ensure_fixture
    from logparse_spark.rules import load_rules
    from logparse_spark.sinks import SinkSet

    spark = bench._spark(cores)
    d = ensure_fixture(sf)
    compiled = load_rules(bench.BENCH_RULES)
    src = os.path.join(d, "transcripts.parquet")
    role_dict = spark.read.parquet(os.path.join(d, "role_dict.parquet"))
    tool_dict = spark.read.parquet(os.path.join(d, "tool_dict.parquet"))
    stages.tune_scan_splits(spark, src)
    df = stages.read_transcripts(spark, src)
    n = df.count()
    buckets = min(1024, max(16, 1 << (n // 250_000).bit_length()))
    hot = stages.detect_hot_convs(
        df, threshold=stages.hot_conv_threshold(n, buckets),
        sample_fraction=0.02)
    cdf = pipeline.classify(df, compiled, role_dict, tool_dict,
                            buckets=buckets, salt_buckets=8, hot_convs=hot)

    out_dir = bench._mktemp_out(prefix="footer_probe_")
    sink = SinkSet(out_dir=out_dir)
    t: dict[str, float] = {}

    # time the pieces write_classified runs, separately
    from pyspark.sql import Observation
    from logparse_spark.sinks import SINK_COLUMNS
    keep = [c for c in SINK_COLUMNS if c in cdf.columns]
    obs = Observation()
    out = (cdf.select(*keep)
           .observe(obs, F.count(F.lit(1)).alias("rows_total"))
           .sortWithinPartitions("bucket", "sink_id", "conv_id", "turn_idx"))
    t0 = time.monotonic()
    out.write.mode("append").partitionBy("bucket", "sink_id").parquet(
        sink._run_dir())
    t["write_action"] = time.monotonic() - t0

    n_files = sum(
        1 for root, _, files in os.walk(sink._run_dir())
        for f in files if f.endswith(".parquet"))

    t0 = time.monotonic()
    lineage = sink._lineage_from_footers()
    t["footer_lineage_walk"] = time.monotonic() - t0

    t0 = time.monotonic()
    sink._write_file_stats()
    t["file_stats_walk"] = time.monotonic() - t0

    t0 = time.monotonic()
    sink._written = True
    sink._write_file_stats = lambda: None  # timed above; avoid double-count
    sink.commit(lineage)
    t["commit"] = time.monotonic() - t0

    total_serial = (t["footer_lineage_walk"] + t["file_stats_walk"]
                    + t["commit"])
    print(json.dumps({
        "cores": cores, "sf": sf, "n_rows": n, "n_files": n_files,
        "buckets": buckets,
        "timings_sec": {k: round(v, 3) for k, v in t.items()},
        "driver_serial_tail_sec": round(total_serial, 3),
    }, indent=1))
    shutil.rmtree(out_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
