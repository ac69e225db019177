"""Decompose the scaling shortfall: which stage fails to scale 4 -> 16?

BENCH/BASELINE.md ("The second envelope, measured") shows this box's
DRAM bandwidth scales at only ~0.4 across any 4x core ladder while
CPU scales at ~0.87-0.99 — so a job's measured efficiency is a mix
weighted by its bandwidth-bound time fraction b. This experiment
measures b DIRECTLY instead of inferring it: at each pinned level it
times

  full  = the complete north-star job (scan -> hot-detect -> Arrow-UDF
          parse -> broadcast enrich -> bucket+salt repartition ->
          sortWithinPartitions -> fan-out parquet write to tmpfs ->
          footer lineage + commit), i.e. bench.run_pipeline_e2e; and
  parse = the IDENTICAL plan through the repartition shuffle, then a
          `noop` write — no sort, no parquet encode, no tmpfs write,
          no footer walk.

(full - parse) at each level isolates the sort+encode+write tail,
the DRAM-heaviest slice of the job (every byte written to /dev/shm is
a DRAM byte; the sorter streams full rows). Per level we report both
times plus bracketing CPU probes; per round we report each variant's
efficiency and the write tail's own scaling. Expectation if the
bandwidth-envelope explanation is right: parse (cache-friendlier,
CPU-dominated regex work) scales near the CPU envelope; the write
tail scales near the rw envelope (~0.4); and
  b ~= (full_lo - parse_lo) / full_lo
reproduces the 0.15-0.30 the mixture model inferred from attempts
2-3. Protocol mirrors bench.py --scaling: taskset-pinned worker
subprocesses, alternating level order across rounds, pre-round
envelope gate with a wait budget, pre/post probes recorded.

Usage:
    python BENCH/decompose_scaling.py                 # paired rounds
    python BENCH/decompose_scaling.py --worker N sf   # internal
"""
from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root harness: _spark, probes, e2e job)

LEVELS = (4, 16)
SF = os.environ.get("SPARK_GRAFT_SCALE_SF", "10")
ROUNDS = int(os.environ.get("SPARK_GRAFT_DECOMP_ROUNDS", "2"))
WAIT_MIN = float(os.environ.get("SPARK_GRAFT_SCALE_WAIT_MIN", "90"))
# 0 -> first round runs lo->hi; 1 -> first round runs hi->lo.  Set to 1
# when a prior (banked) round already ran lo->hi so orders alternate
# across attempts, not just within one (16->4 historically reads lower
# than 4->16 — both orders must be represented).
ORDER_OFFSET = int(os.environ.get("SPARK_GRAFT_DECOMP_ORDER_OFFSET", "0"))
STATE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "decompose_state.json")


def run_pipeline_parse_only(spark, sf: str) -> tuple[float, int]:
    """bench.run_pipeline_e2e minus the write tail: identical stages
    through the bucket+salt repartition, materialized via a `noop`
    write (full compute, zero output IO, no writer sort)."""
    from logparse_spark import pipeline, stages
    from logparse_spark.fixtures import ensure_fixture
    from logparse_spark.rules import load_rules

    d = ensure_fixture(sf)
    compiled = load_rules(bench.BENCH_RULES)
    src = os.path.join(d, "transcripts.parquet")
    role_dict = spark.read.parquet(os.path.join(d, "role_dict.parquet"))
    tool_dict = spark.read.parquet(os.path.join(d, "tool_dict.parquet"))

    stages.tune_scan_splits(spark, src)
    df = stages.read_transcripts(spark, src)
    n_turns = df.count()  # warm page cache; excluded from timing

    t0 = time.monotonic()
    buckets = min(1024, max(16, 1 << (n_turns // 250_000).bit_length()))
    hot = stages.detect_hot_convs(
        df, threshold=stages.hot_conv_threshold(n_turns, buckets),
        sample_fraction=0.02,
    )
    cdf = pipeline.classify(df, compiled, role_dict, tool_dict,
                            buckets=buckets, salt_buckets=8, hot_convs=hot)
    cdf.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0, n_turns


def _worker(cores: int, sf: str) -> dict:
    probe_pre = bench._cpu_probe(cores)
    spark = bench._spark(cores)
    try:
        # untimed warmup at sf1: python-worker spawn + JIT (same as
        # bench._scaling_one)
        out_dir = bench._mktemp_out(prefix=f"decomp_warm_{cores}_")
        try:
            bench.run_pipeline_e2e(spark, "1", out_dir)
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)

        out_dir = bench._mktemp_out(prefix=f"decomp_full_{cores}_")
        try:
            full_sec, n_turns = bench.run_pipeline_e2e(spark, sf, out_dir)
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)
        parse_sec, _ = run_pipeline_parse_only(spark, sf)
        out = {
            "cores": cores, "n_turns": n_turns,
            "full_sec": round(full_sec, 3),
            "parse_sec": round(parse_sec, 3),
            "write_tail_sec": round(full_sec - parse_sec, 3),
            "cpu_probe_sec": probe_pre,
        }
    finally:
        spark.stop()
        shutil.rmtree(f"/dev/shm/spark_local_{os.getpid()}",
                      ignore_errors=True)
    out["cpu_probe_post_sec"] = bench._cpu_probe(cores)
    out["probe_drift"] = round(
        max(probe_pre, out["cpu_probe_post_sec"])
        / min(probe_pre, out["cpu_probe_post_sec"]), 3)
    return out


def _spawn(cores: int, sf: str) -> dict:
    cmd = [sys.executable, __file__, "--worker", str(cores), sf]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    r = subprocess.run(cmd, capture_output=True, text=True, check=True)
    return json.loads(r.stdout.strip().splitlines()[-1])


def main() -> None:
    lo, hi = LEVELS
    factor = hi / lo
    deadline = time.monotonic() + WAIT_MIN * 60
    rounds = []
    i = 0
    while len(rounds) < ROUNDS:
        # pre-round quick gate (same idea as bench.run_scaling): don't
        # pay ~10 min of sf10 runs into a window the CPU probe already
        # rules out
        qlo, qhi = bench._cpu_probe(lo), bench._cpu_probe(hi)
        qenv = round(qlo / qhi / factor, 3)
        if qenv < bench.ENV_GATE:
            if time.monotonic() > deadline:
                print(f"[decomp] wait budget exhausted at probe {qenv}; "
                      "stopping", file=sys.stderr)
                break
            print(f"[decomp] pre-round probe {qenv} < {bench.ENV_GATE}; "
                  "waiting", file=sys.stderr)
            time.sleep(90)
            continue
        pair = (lo, hi) if (i + ORDER_OFFSET) % 2 == 0 else (hi, lo)
        i += 1
        got = {c: _spawn(c, SF) for c in pair}
        a, b = got[lo], got[hi]
        r = {"order": f"{pair[0]}->{pair[1]}", "lo": a, "hi": b}
        r.update(bench._round_valid(a, b, factor))
        for part in ("full", "parse", "write_tail"):
            r[f"eff_{part}"] = round(
                a[f"{part}_sec"] / b[f"{part}_sec"] / factor, 3)
        r["b_lo"] = round(a["write_tail_sec"] / a["full_sec"], 3)
        r["b_hi"] = round(b["write_tail_sec"] / b["full_sec"], 3)
        rounds.append(r)
        # checkpoint after every round: a killed session keeps the data
        with open(STATE + ".tmp", "w") as f:
            json.dump({"sf": SF, "levels": list(LEVELS),
                       "rounds": rounds}, f, indent=1)
        os.replace(STATE + ".tmp", STATE)
        print(f"[decomp] round {len(rounds)} {r['order']}: "
              f"eff full={r['eff_full']} parse={r['eff_parse']} "
              f"write_tail={r['eff_write_tail']} b_lo={r['b_lo']} "
              f"env={r['probe_env']}/{r.get('probe_env_post')}",
              file=sys.stderr)
    print(json.dumps({
        "metric": "scaling decomposition: full job vs parse-only "
                  f"(noop write), taskset {lo} -> {hi}",
        "sf": SF, "levels": list(LEVELS), "rounds": rounds,
    }))


if __name__ == "__main__":
    if sys.argv[1:2] == ["--worker"]:
        print(json.dumps(_worker(int(sys.argv[2]), sys.argv[3])))
    else:
        main()
