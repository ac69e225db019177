"""Paired A/B of the write-path lineage machinery at large scale.

Usage: python BENCH/lineage_ab.py [sf] [pairs]   (defaults: 10 2)

Round-2 shipped per-sink HLL cardinality inside the write's
CollectMetrics Observation; BENCH_r02 showed pipeline_e2e regressing
~1.2x beyond VM drift and BENCH/LINEAGE.md attributed ~+1.7s/6.5s to
the interpreted per-row metric evaluation. Round 3 made the HLL
OPT-IN (sinks.write_classified observe_cardinality, default False).
This script measures, at sf10 (60M rows, the scale where job setup
stops dominating), interleaved same-minute pairs of the FULL
classify -> fan-out write job:

  A: production default (Observation = conservation count only)
  B: observe_cardinality=True (count + per-sink HLL)

plus the driver-side parquet-footer lineage walk in isolation (it is
O(files); sf10 x 64 buckets x sinks x tasks is the largest file count
this sandbox produces). Interleaving A/B inside each pair cancels the
VM's multi-minute drift; the published number is the median B/A ratio,
not absolute seconds.

Writes one JSON line; paste the row into BENCH/LINEAGE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "10"
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from logparse_spark import pipeline, stages
    from logparse_spark.fixtures import ensure_fixture
    from logparse_spark.rules import load_rules
    from logparse_spark.session import get_spark
    from logparse_spark.sinks import SinkSet

    spark = get_spark(app_name="lineage_ab")
    spark.sparkContext.setLogLevel("ERROR")
    d = ensure_fixture(sf)
    compiled = load_rules("/root/repo/rules/default.rules")
    src = os.path.join(d, "transcripts.parquet")
    role_dict = spark.read.parquet(os.path.join(d, "role_dict.parquet"))
    tool_dict = spark.read.parquet(os.path.join(d, "tool_dict.parquet"))

    work = "/tmp/lineage_ab"
    shutil.rmtree(work, ignore_errors=True)

    def one(tag: str, observe: bool) -> tuple[float, float, int]:
        out = os.path.join(work, tag)
        df = stages.read_transcripts(spark, src)
        cdf = pipeline.classify(
            df, compiled, role_dict, tool_dict, buckets=64, salt_buckets=8
        )
        sink = SinkSet(out_dir=out)
        t0 = time.time()
        sink.write_classified(
            cdf, sinks=compiled.sink_ids, observe_cardinality=observe
        )
        wall = time.time() - t0
        # isolate the driver-side footer walk (runs inside the above;
        # re-running it alone is idempotent and measures just the walk)
        t1 = time.time()
        lineage = sink._lineage_from_footers()
        walk = time.time() - t1
        n_files = sum(
            len([f for f in fs if f.endswith(".parquet")])
            for _, _, fs in os.walk(os.path.join(out, "runs"))
        )
        print(f"[{tag}] wall={wall:.1f}s footer_walk={walk:.2f}s "
              f"files={n_files} rows={sum(e['rows'] for e in lineage.values())}",
              flush=True)
        shutil.rmtree(out, ignore_errors=True)
        return wall, walk, n_files

    # untimed warmup: JVM JIT, page cache for the ~1 GB input, shuffle
    # service — the first measured A/B attempt showed a monotone 187 ->
    # 47 s warm-up slope that buried the effect entirely
    one("warmup", observe=False)

    rounds = []
    for i in range(pairs):
        # alternate order so residual drift cancels across pairs
        # instead of biasing one arm
        if i % 2 == 0:
            a_wall, a_walk, n_files = one(f"p{i}_count_only", observe=False)
            b_wall, b_walk, _ = one(f"p{i}_with_hll", observe=True)
        else:
            b_wall, b_walk, n_files = one(f"p{i}_with_hll", observe=True)
            a_wall, a_walk, _ = one(f"p{i}_count_only", observe=False)
        rounds.append({
            "count_only_sec": round(a_wall, 2),
            "with_hll_sec": round(b_wall, 2),
            "hll_over_job": round((b_wall - a_wall) / a_wall, 4),
            "footer_walk_sec": round(max(a_walk, b_walk), 3),
            "files": n_files,
        })
    ratios = sorted(r["hll_over_job"] for r in rounds)
    med = ratios[len(ratios) // 2]
    out = {
        "metric": "per-sink HLL Observation overhead vs count-only write",
        "sf": sf,
        "pairs": rounds,
        "median_hll_over_job": med,
        "unit": "fraction of full classify+write job",
    }
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
