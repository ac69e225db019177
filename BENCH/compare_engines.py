"""Measure the three dispatch engines end-to-end on the same input.

Usage:  taskset -c 0-{N-1} python BENCH/compare_engines.py <cores> <sf>
Engines: udf (scalar arrow_udf + RE2-on-Arrow kernel, default),
pandas_udf (legacy pandas boundary), sql (pure-JVM chained CASE/rlike).
Times the full pipeline (scan -> parse -> shuffle -> enrich/metadata ->
fan-out write -> counts) per engine, best of `runs` after a shared
warmup; results feed BENCH/ENGINES.md.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")


def main() -> None:
    cores, sf = int(sys.argv[1]), sys.argv[2]
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    from bench import _mktemp_out, _spark, run_pipeline_e2e

    spark = _spark(cores)
    results: dict[str, dict] = {}
    try:
        # one warmup (worker spawn + JIT), engine-independent input warm
        out = _mktemp_out("engcmp_warm_")
        try:
            run_pipeline_e2e(spark, "1", out)
        finally:
            shutil.rmtree(out, ignore_errors=True)
        for engine in ("udf", "pandas_udf", "sql"):
            secs = []
            n = 0
            for _ in range(runs):
                out = _mktemp_out(f"engcmp_{engine}_")
                try:
                    sec, n = run_pipeline_e2e(spark, sf, out, engine=engine)
                finally:
                    shutil.rmtree(out, ignore_errors=True)
                secs.append(round(sec, 3))
            best = min(secs)
            results[engine] = {
                "runs": secs, "best_sec": best,
                "turns_per_sec": round(n / best, 1), "n_turns": n,
            }
    finally:
        spark.stop()
        shutil.rmtree(f"/dev/shm/spark_local_{os.getpid()}", ignore_errors=True)
    print(json.dumps({"cores": cores, "sf": sf, "engines": results}))


if __name__ == "__main__":
    main()
