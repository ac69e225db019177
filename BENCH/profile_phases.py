"""Phase-level scaling profile: where does the e2e job lose efficiency?

Usage:  taskset -c 0-{N-1} python BENCH/profile_phases.py <cores> <sf>
Times each phase of the e2e pipeline separately so the non-scaling
(serial / fixed-cost) phases are visible. Not part of the driver
contract; a diagnostic for BENCH/BASELINE.md numbers.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    cores, sf = int(sys.argv[1]), sys.argv[2]
    from logparse_spark.session import get_spark

    mem = os.environ.get("SPARK_DRIVER_MEM", f"{max(8, int(cores * 1.75))}g")
    conf = {"spark.driver.memory": mem}
    if os.path.isdir("/dev/shm"):  # mirror bench: tmpfs shuffle dirs
        conf["spark.local.dir"] = f"/dev/shm/spark_local_{os.getpid()}"
    spark = get_spark(app_name=f"profile[{cores}]", master=f"local[{cores}]",
                      shuffle_partitions=max(cores, 8),
                      extra_conf=conf)
    from logparse_spark import pipeline, stages
    from logparse_spark.fixtures import ensure_fixture
    from logparse_spark.rules import load_rules
    from logparse_spark.sinks import SinkSet

    d = ensure_fixture(sf)
    compiled = load_rules("/root/repo/rules/bench.rules")
    src = os.path.join(d, "transcripts.parquet")
    stages.tune_scan_splits(spark, src)
    role_dict = spark.read.parquet(os.path.join(d, "role_dict.parquet"))
    tool_dict = spark.read.parquet(os.path.join(d, "tool_dict.parquet"))
    df = stages.read_transcripts(spark, src)
    n = df.count()

    def e2e_phases() -> dict:
        t: dict[str, float] = {}
        t0 = time.monotonic()
        hot = stages.detect_hot_convs(df, threshold=max(100, n // 1000),
                                      sample_fraction=0.02)
        t["hot_detect"] = time.monotonic() - t0

        cdf = pipeline.classify(df, compiled, role_dict, tool_dict,
                                buckets=256, salt_buckets=8, hot_convs=hot)
        out_dir = tempfile.mkdtemp(prefix=f"prof_{cores}_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None)
        try:
            sink = SinkSet(out_dir=out_dir)
            t0 = time.monotonic()
            cols = ["bucket", "sink_id", "conv_id", "turn_idx", "role", "ts",
                    "rule_id", "rule_name", "action", "rendered",
                    "role_class", "weight", "tool_family", "is_privileged"]
            keep = [c for c in cols if c in cdf.columns]
            out = cdf.select(*keep).sortWithinPartitions(
                "sink_id", "conv_id", "turn_idx")
            out.write.mode("append").partitionBy("sink_id").parquet(
                sink._run_dir())
            t["main_write"] = time.monotonic() - t0

            t0 = time.monotonic()
            stats = (spark.read.parquet(sink._run_dir())
                     .groupBy("bucket", "sink_id").count().collect())
            t["stats_readback"] = time.monotonic() - t0

            lineage = {}
            for r in stats:
                b = int(r["bucket"])
                e = lineage.setdefault(b, {"rows": 0, "sinks": {}})
                e["rows"] += int(r["count"])
                e["sinks"][str(r["sink_id"])] = int(r["count"])
            t0 = time.monotonic()
            sink.commit(lineage)
            t["commit"] = time.monotonic() - t0
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)
        return t

    # parse-only (noop write): isolates scan+UDF+enrich from shuffle+write
    def parse_only() -> float:
        cdf = stages.parse_match(df, compiled)
        cdf = stages.enrich(cdf, role_dict, tool_dict)
        t0 = time.monotonic()
        cdf.write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    # shuffle added (noop write after repartition)
    def parse_shuffle() -> float:
        hot = stages.detect_hot_convs(df, threshold=max(100, n // 1000),
                                      sample_fraction=0.02)
        cdf = pipeline.classify(df, compiled, role_dict, tool_dict,
                                buckets=256, salt_buckets=8, hot_convs=hot)
        t0 = time.monotonic()
        cdf.write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    e2e_phases()  # warmup
    parse_only()
    runs = [e2e_phases() for _ in range(2)]
    med = {k: round(min(r[k] for r in runs), 3) for k in runs[0]}
    po = round(min(parse_only() for _ in range(2)), 3)
    ps = round(min(parse_shuffle() for _ in range(2)), 3)
    total = round(sum(med.values()), 3)
    print(json.dumps({"cores": cores, "sf": sf, "n": n, "phases": med,
                      "parse_only_noop": po, "parse_shuffle_noop": ps,
                      "e2e_total": total}))
    spark.stop()


if __name__ == "__main__":
    main()
