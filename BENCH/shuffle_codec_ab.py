"""Shuffle-codec A/B: does zstd shuffle compression beat lz4 on the
bandwidth-bound ladder?

Motivation (BENCH/BASELINE.md): the 4->16 proxy is capped by the SHARED
memory controller — shuffle write+read on tmpfs is pure DRAM traffic,
and bw_probe measured the DRAM envelope at 0.39-0.69 across windows
while the CPU envelope sits near 1.0. ``spark.io.compression.codec``
trades CPU (abundant, scales with cores) for shuffle bytes (the scarce,
NON-scaling resource on this topology — and the network/disk resource
on a real cluster). If zstd shrinks the string-heavy slim-record
shuffle enough, the e2e job sheds DRAM traffic exactly where the 16-core
level is starved.

Protocol: one taskset-pinned subprocess per (level, codec) running the
identical e2e job (bench.run_pipeline_e2e, sf10 by default) once after
an sf1 warmup — same shape as bench._scaling_one. Codecs alternate
WITHIN each level phase (lz4 then zstd back-to-back on the same pinned
cores), so hypervisor drift between the two codec runs is minimal; the
level order alternates per round like the scaling harness. Fixed-work
CPU probes bracket each (level, codec) run for post-hoc drift checks.

Reports per (level, codec): median e2e seconds, shuffle bytes written
(du of the session-private spark.local.dir BEFORE session stop), and
the per-round codec ratio at each level. Run on an otherwise idle box:

    python BENCH/shuffle_codec_ab.py [rounds]          # driver
    python BENCH/shuffle_codec_ab.py --worker C CODEC  # internal
"""
from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_AB_SF", "10")
LEVELS = tuple(int(x) for x in
               os.environ.get("SPARK_GRAFT_AB_LEVELS", "4,16").split(","))
CODECS = ("lz4", "zstd")
RESULT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "shuffle_codec_ab_result.json")


def _du(path: str) -> int:
    out = subprocess.run(["du", "-sb", path], capture_output=True, text=True)
    return int(out.stdout.split()[0]) if out.returncode == 0 else -1


def _file_sizes(path: str) -> dict[str, int]:
    """{relpath: bytes} for every file under path (tolerates races)."""
    out: dict[str, int] = {}
    for root, _, files in os.walk(path):
        for f in files:
            p = os.path.join(root, f)
            try:
                out[os.path.relpath(p, path)] = os.path.getsize(p)
            except OSError:
                pass  # ContextCleaner deleted it mid-walk
    return out


def worker(cores: int, codec: str) -> None:
    """One pinned measurement: e2e once at SF with the given shuffle codec."""
    from logparse_spark.session import get_spark

    probe_pre = bench._cpu_probe(cores)
    mem = f"{max(8, int(cores * 1.75))}g"
    local_dir = f"/dev/shm/spark_local_ab_{os.getpid()}"
    conf = {
        "spark.driver.memory": mem,
        "spark.io.compression.codec": codec,
        "spark.local.dir": local_dir,
    }
    spark = get_spark(app_name=f"codec_ab[{cores},{codec}]",
                      master=f"local[{cores}]",
                      shuffle_partitions=max(cores, 8), extra_conf=conf)
    try:
        out_dir = bench._mktemp_out(prefix="codec_warm_")
        try:
            bench.run_pipeline_e2e(spark, "1", out_dir)
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)
        # The blockmgr-* dir under spark.local.dir is LIVE session state —
        # deleting it breaks every later shuffle (FileNotFoundException in
        # DiskBlockObjectWriter). Instead snapshot the file SET after the
        # warmup and sum only files the measured run CREATED — warmup
        # shuffles GC'd mid-run by the ContextCleaner then can't bias the
        # number negative the way a du delta does.
        before = _file_sizes(local_dir)
        out_dir = bench._mktemp_out(prefix="codec_ab_")
        try:
            sec, n = bench.run_pipeline_e2e(spark, SF, out_dir)
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)
        after = _file_sizes(local_dir)  # shuffle files live until stop()
        shuffle_bytes = sum(sz for rel, sz in after.items()
                            if rel not in before)
    finally:
        spark.stop()
        shutil.rmtree(local_dir, ignore_errors=True)
    print(json.dumps({
        "cores": cores, "codec": codec, "sec": round(sec, 3), "n_turns": n,
        "shuffle_bytes": shuffle_bytes,
        "cpu_probe_sec": probe_pre,
        "cpu_probe_post_sec": bench._cpu_probe(cores),
    }))


def main(rounds: int = 2) -> None:
    results: list[dict] = []

    def one(cores: int, codec: str) -> dict:
        cmd = [sys.executable, os.path.abspath(__file__),
               "--worker", str(cores), codec]
        if shutil.which("taskset"):
            cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
        out = subprocess.run(cmd, capture_output=True, text=True, check=True)
        return json.loads(out.stdout.strip().splitlines()[-1])

    for r in range(rounds):
        levels = LEVELS if r % 2 == 0 else tuple(reversed(LEVELS))
        for cores in levels:
            codecs = CODECS if r % 2 == 0 else tuple(reversed(CODECS))
            for codec in codecs:
                got = one(cores, codec)
                got["round"] = r
                results.append(got)
                print(f"[ab] r{r} cores={cores} codec={codec} "
                      f"sec={got['sec']} shuffle_mb="
                      f"{round(got['shuffle_bytes'] / 1e6, 1)} "
                      f"probes={got['cpu_probe_sec']}/"
                      f"{got['cpu_probe_post_sec']}", file=sys.stderr)
                with open(RESULT, "w", encoding="utf-8") as f:
                    json.dump({"sf": SF, "levels": LEVELS,
                               "runs": results}, f, indent=1)

    summary: dict[str, dict] = {}
    for cores in LEVELS:
        for codec in CODECS:
            secs = [g["sec"] for g in results
                    if g["cores"] == cores and g["codec"] == codec]
            mbs = [g["shuffle_bytes"] for g in results
                   if g["cores"] == cores and g["codec"] == codec]
            summary[f"{cores}c_{codec}"] = {
                "median_sec": statistics.median(secs),
                "secs": secs,
                "shuffle_mb": round(statistics.median(mbs) / 1e6, 1),
            }
    # per-round within-level ratios (drift-resistant: back-to-back runs)
    ratios: dict[int, list[float]] = {c: [] for c in LEVELS}
    for r in range(rounds):
        for cores in LEVELS:
            got = {g["codec"]: g["sec"] for g in results
                   if g["round"] == r and g["cores"] == cores}
            if len(got) == 2:
                ratios[cores].append(round(got["zstd"] / got["lz4"], 3))
    out = {"sf": SF, "levels": list(LEVELS), "rounds": rounds,
           "summary": summary,
           "zstd_over_lz4_sec_ratio_per_round": {str(c): ratios[c]
                                                 for c in LEVELS},
           "runs": results}
    with open(RESULT, "w", encoding="utf-8") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["summary"], indent=1))
    print(json.dumps(out["zstd_over_lz4_sec_ratio_per_round"]))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), sys.argv[3])
    else:
        main(int(sys.argv[1]) if len(sys.argv) > 1 else 2)
