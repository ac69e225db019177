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
        # INTERLEAVED rounds (same reasoning as bench.py run_scaling):
        # this VM's speed drifts up to ~2x between minutes, so timing
        # all runs of one engine then the next lets a slow window
        # poison one engine's numbers entirely. Each round times every
        # engine back-to-back; cross-engine RATIOS within a round are
        # drift-cancelled, and best-across-rounds bounds the absolute.
        engines = ("udf", "pandas_udf", "sql")
        secs: dict[str, list] = {e: [] for e in engines}
        n = 0
        for _ in range(runs):
            for engine in engines:
                out = _mktemp_out(f"engcmp_{engine}_")
                try:
                    sec, n = run_pipeline_e2e(spark, sf, out, engine=engine)
                finally:
                    shutil.rmtree(out, ignore_errors=True)
                secs[engine].append(round(sec, 3))
        rounds = [
            {e: secs[e][i] for e in engines} | {
                f"{e}_vs_udf": round(secs[e][i] / secs["udf"][i], 3)
                for e in engines if e != "udf"
            }
            for i in range(runs)
        ]
        for engine in engines:
            best = min(secs[engine])
            results[engine] = {
                "runs": secs[engine], "best_sec": best,
                "turns_per_sec": round(n / best, 1), "n_turns": n,
            }
        results["rounds"] = rounds
    finally:
        spark.stop()
        shutil.rmtree(f"/dev/shm/spark_local_{os.getpid()}", ignore_errors=True)
    print(json.dumps({"cores": cores, "sf": sf, "engines": results}))


if __name__ == "__main__":
    main()
