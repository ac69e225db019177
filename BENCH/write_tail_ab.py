"""Write-tail A/B: what does the fan-out write's 36% of wall buy, and
can it be cheaper?

BENCH/decompose_scaling.py measured the sort+encode+write tail at a
stable ~36% of the e2e job's wall at BOTH parallelism levels. This
experiment decomposes THAT: the classified frame (sf1, 6M rows) is
cached in memory once (so the parse/enrich/shuffle upstream is paid
outside the timer), then the exact write_classified layout
(partitionBy(bucket, sink_id), writer-order pre-satisfied) is timed
under interleaved variants:

  sorted+snappy   - the production path (sinks.py write_classified)
  sorted+zstd     - same sort, zstd codec (fewer bytes, more CPU)
  sorted+lz4      - same sort, lz4 codec
  sorted+none     - same sort, no codec (pure encode+IO bound)
  partcols+snappy - sort ONLY by the two partition columns, dropping
                    the (conv_id, turn_idx) suffix: measures what the
                    determinism suffix costs (it also changes parquet
                    locality, so bytes move too)

Variants are interleaved across rounds (drift bias spreads evenly);
each reports median seconds and output bytes. Run on an otherwise
idle box:  python BENCH/write_tail_ab.py [rounds]
"""
from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_AB_SF", "1")


def _du(path: str) -> int:
    out = subprocess.run(["du", "-sb", path], capture_output=True, text=True)
    return int(out.stdout.split()[0])


def main(rounds: int = 3) -> None:
    from pyspark.sql import functions as F  # noqa: F401

    from logparse_spark import pipeline, stages
    from logparse_spark.fixtures import ensure_fixture
    from logparse_spark.rules import load_rules

    spark = bench._spark(bench.CPUS)
    d = ensure_fixture(SF)
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
    cols = ["bucket", "sink_id", "conv_id", "turn_idx", "role", "ts",
            "rule_id", "rule_name", "action", "rendered",
            "role_class", "weight", "tool_family", "is_privileged"]
    cdf = cdf.select(*[c for c in cols if c in cdf.columns]).cache()
    cdf.count()  # materialize: upstream paid once, outside every timer

    full_sort = ["bucket", "sink_id", "conv_id", "turn_idx"]
    part_sort = ["bucket", "sink_id"]
    # high-cardinality string columns where the dictionary attempt is
    # wasted work (the dict page fills, parquet falls back to plain per
    # chunk — paying the hashing anyway): rendered is ~unique, conv_id
    # ~n/turns distinct. Sorted input makes conv_id runs dict-friendly
    # though, so measure, don't assume.
    hc_nodict = {"parquet.enable.dictionary#rendered": "false"}
    variants = {
        "sorted+snappy": (full_sort, "snappy", {}),
        "sorted+zstd": (full_sort, "zstd", {}),
        "sorted+lz4": (full_sort, "lz4", {}),
        "sorted+none": (full_sort, "uncompressed", {}),
        "partcols+snappy": (part_sort, "snappy", {}),
        "sorted+zstd+nodict": (
            full_sort, "zstd", {"parquet.enable.dictionary": "false"}),
        "sorted+zstd+nodict-rendered": (full_sort, "zstd", hc_nodict),
        "sorted+zstd+pagev2": (
            full_sort, "zstd", {"parquet.writer.version": "v2"}),
    }
    results: dict[str, dict] = {k: {"secs": [], "bytes": None}
                                for k in variants}
    for r in range(rounds):
        order = list(variants)
        if r % 2:
            order.reverse()  # interleave: drift biases both ends equally
        for name in order:
            sort_cols, codec, opts = variants[name]
            out = bench._mktemp_out(prefix=f"ab_{name.replace('+','_')}_")
            spark.conf.set("spark.sql.parquet.compression.codec", codec)
            t0 = time.monotonic()
            w = cdf.sortWithinPartitions(*sort_cols).write.mode("overwrite")
            for k, v in opts.items():
                w = w.option(k, v)
            (
                w.partitionBy("bucket", "sink_id")
                .parquet(out)
            )
            sec = time.monotonic() - t0
            results[name]["secs"].append(round(sec, 3))
            results[name]["bytes"] = _du(out)
            shutil.rmtree(out, ignore_errors=True)
        print(f"[ab] round {r + 1}/{rounds} done", file=sys.stderr)
    for name, got in results.items():
        ss = sorted(got["secs"])
        got["median_sec"] = ss[len(ss) // 2]
        got["mb"] = round(got["bytes"] / 1e6, 1)
    base = results["sorted+snappy"]["median_sec"]
    for name, got in results.items():
        got["vs_baseline"] = round(got["median_sec"] / base, 3)
    print(json.dumps({"sf": SF, "n_rows": n, "rounds": rounds,
                      "parallelism": bench.CPUS, "results": results},
                     indent=1))
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
