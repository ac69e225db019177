"""Tail-variant A/B at sf10: what does each piece of the write tail
cost at the scaling ladder's own data size?

BENCH/footer_tail_probe.py showed the driver-side serial tail is
negligible (~0.75s of a ~50s local[16] job). The distributed tail is
sort + CollectMetrics observe + parquet encode + write. This probe
isolates each: the classified frame is persisted DISK_ONLY (tmpfs
local dirs, so replaying it is a DRAM-speed scan — upstream parse
paid once, outside every timer), then interleaved variants:

  prod      - observe(count) + full sort + zstd  (production path)
  noobs     - full sort + zstd, NO Observation   (observe cost)
  partsort  - observe + (bucket, sink_id) sort only (suffix-sort cost)
  snappy    - observe + full sort + snappy       (codec cost at 16c)

Usage: taskset -c 0-15 python BENCH/tail_variants_probe.py 16 10 [rounds]
"""
from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402


def _du(path: str) -> int:
    out = subprocess.run(["du", "-sb", path], capture_output=True, text=True)
    return int(out.stdout.split()[0])


def main() -> None:
    cores, sf = int(sys.argv[1]), sys.argv[2]
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    from pyspark import StorageLevel
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from logparse_spark import pipeline, stages
    from logparse_spark.fixtures import ensure_fixture
    from logparse_spark.rules import load_rules
    from logparse_spark.sinks import SINK_COLUMNS

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
    cdf = pipeline.classify(df, compiled, role_dict, tool_dict,
                            buckets=buckets, salt_buckets=8, hot_convs=[])
    keep = [c for c in SINK_COLUMNS if c in cdf.columns]
    cdf = cdf.select(*keep).persist(StorageLevel.DISK_ONLY)
    cdf.count()  # materialize once; replay is a tmpfs scan

    full_sort = ["bucket", "sink_id", "conv_id", "turn_idx"]
    part_sort = ["bucket", "sink_id"]
    variants = {
        "prod": (True, full_sort, "zstd"),
        "noobs": (False, full_sort, "zstd"),
        "partsort": (True, part_sort, "zstd"),
        "snappy": (True, full_sort, "snappy"),
    }
    results: dict[str, dict] = {k: {"secs": [], "bytes": None}
                                for k in variants}
    for r in range(rounds):
        order = list(variants)
        if r % 2:
            order.reverse()
        for name in order:
            observe, sort_cols, codec = variants[name]
            out_dir = bench._mktemp_out(prefix=f"tailab_{name}_")
            spark.conf.set("spark.sql.parquet.compression.codec", codec)
            frame = cdf
            obs = None
            if observe:
                obs = Observation()
                frame = frame.observe(
                    obs, F.count(F.lit(1)).alias("rows_total"))
            t0 = time.monotonic()
            (
                frame.sortWithinPartitions(*sort_cols)
                .write.mode("overwrite")
                .partitionBy("bucket", "sink_id").parquet(out_dir)
            )
            if obs is not None:
                assert int(obs.get["rows_total"]) == n
            sec = time.monotonic() - t0
            results[name]["secs"].append(round(sec, 3))
            results[name]["bytes"] = _du(out_dir)
            shutil.rmtree(out_dir, ignore_errors=True)
        print(f"[tailab] round {r + 1}/{rounds} done", file=sys.stderr)
    for name, got in results.items():
        ss = sorted(got["secs"])
        got["median_sec"] = ss[len(ss) // 2]
        got["mb"] = round(got["bytes"] / 1e6, 1)
    base = results["prod"]["median_sec"]
    for name, got in results.items():
        got["vs_prod"] = round(got["median_sec"] / base, 3)
    print(json.dumps({"sf": sf, "cores": cores, "n_rows": n,
                      "rounds": rounds, "results": results}, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
