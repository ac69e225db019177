"""Fixed-work DRAM-bandwidth envelope probe (4 vs 16 pinned cores).

Why this exists (see BENCH/BASELINE.md "Attempt 3 conclusion"): the
scaling harness gates rounds on a pure-Python regex probe that is
cache-resident — it certifies the hypervisor delivered ~4x CPU, but
says nothing about memory bandwidth. `taskset 0-3` vs `taskset 0-15`
on ONE box quadruples cores while the memory controller stays shared,
so a scan/shuffle/write-heavy job has a second, lower envelope the CPU
probe cannot see. On a real cluster (4 -> 16 executors on separate
machines) bandwidth scales with machines and this envelope does not
apply. This probe quantifies the box's bandwidth envelope with the
same protocol as the CPU probe: fixed TOTAL work, embarrassingly
parallel, taskset-pinned process pool, best-of-3, paired rounds with
alternating level order.

Kernels (numpy, each process owns a private 64 MB float64 array —
16 procs x 64 MB = 1 GB live, far past any shared L3):
  read : arr.sum()            — pure read stream
  rw   : arr *= 1.0000001     — read+write stream (shuffle-write-ish)

Usage: python BENCH/bw_probe.py            # paired rounds, JSON line
       python BENCH/bw_probe.py --worker N # internal (tasksetted)
"""
from __future__ import annotations

import json
import multiprocessing as mp
import shutil
import subprocess
import sys
import time

ARR_MB = 64
# fixed total passes over the per-process array, sized so the 4-core
# level runs ~6-10s per timed measurement (short probes under-measure:
# pool imbalance + cold frequency)
TOTAL_PASSES = {"read": 3200, "rw": 2400}
LEVELS = (4, 16)

_ARR = None


def _init_arr():
    global _ARR
    if _ARR is None:
        import numpy as np

        _ARR = np.ones(ARR_MB * 1024 * 1024 // 8, dtype="float64")
    return _ARR


def _work_read(n: int) -> float:
    a = _init_arr()
    s = 0.0
    for _ in range(n):
        s += float(a.sum())
    return s


def _work_rw(n: int) -> float:
    a = _init_arr()
    for _ in range(n):
        a *= 1.0000001
    return float(a[0])


def _work_cpu(n: int) -> int:
    # same cache-resident regex kernel as bench.py's _cpu_probe
    import re

    lines = [
        f"login failed for user u{i} from 10.0.{i % 256}.{i % 199}"
        for i in range(2000)
    ] + [f"heartbeat ping seq={i}" for i in range(2000)]
    pat = re.compile(r"login failed for user (\w+) from (\d+\.\d+\.\d+\.\d+)")
    c = 0
    for _ in range(n):
        for ln in lines:
            if pat.search(ln):
                c += 1
    return c


_KERNELS = {"read": (_work_read, None), "rw": (_work_rw, None),
            "cpu": (_work_cpu, 51200)}


def _worker(nproc: int) -> dict:
    """Runs tasksetted: best-of-3 fixed-work seconds per kernel."""
    out = {}
    with mp.Pool(nproc) as p:
        for kind in ("cpu", "read", "rw"):
            fn, total = _KERNELS[kind]
            total = total or TOTAL_PASSES[kind]
            p.map(fn, [2] * nproc)  # warm: spawn pool, fault in arrays
            best = float("inf")
            for _ in range(3):
                t0 = time.monotonic()
                p.map(fn, [total // nproc] * nproc)
                best = min(best, time.monotonic() - t0)
            out[kind] = round(best, 3)
    return out


def _one(cores: int) -> dict:
    cmd = [sys.executable, __file__, "--worker", str(cores)]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    r = subprocess.run(cmd, capture_output=True, text=True, check=True)
    return json.loads(r.stdout.strip().splitlines()[-1])


def curve(levels=(1, 2, 4, 8, 16)) -> None:
    """Absolute GB/s per kernel across core counts — shows WHERE the
    memory controller saturates (no 4x ladder exists on this box if
    bandwidth flattens by ~4 cores). Fixed total work per kernel, so
    seconds are comparable; GB/s = bytes_moved / seconds."""
    bytes_moved = {
        "read": TOTAL_PASSES["read"] * ARR_MB * 1024 ** 2,
        # rw streams the array in AND out
        "rw": 2 * TOTAL_PASSES["rw"] * ARR_MB * 1024 ** 2,
    }
    out = []
    for c in levels:
        got = _one(c)
        row = {"cores": c, "sec": got}
        for kind, nb in bytes_moved.items():
            row[f"gbps_{kind}"] = round(nb / got[kind] / 1e9, 1)
        out.append(row)
        print(f"[bw-curve] {c} cores: cpu={got['cpu']}s "
              f"read={row['gbps_read']} GB/s rw={row['gbps_rw']} GB/s",
              file=sys.stderr)
    print(json.dumps({
        "metric": "absolute fixed-work throughput per core count",
        "arr_mb_per_proc": ARR_MB,
        "levels": out,
    }))


def main() -> None:
    lo, hi = LEVELS
    factor = hi / lo
    rounds = []
    for i in range(3):
        pair = (lo, hi) if i % 2 == 0 else (hi, lo)
        got = {c: _one(c) for c in pair}
        r = {"order": f"{pair[0]}->{pair[1]}", "lo": got[lo], "hi": got[hi]}
        for kind in ("cpu", "read", "rw"):
            r[f"env_{kind}"] = round(got[lo][kind] / got[hi][kind] / factor, 3)
        rounds.append(r)
        print(f"[bw] round {i + 1} {r['order']}: env cpu={r['env_cpu']} "
              f"read={r['env_read']} rw={r['env_rw']}", file=sys.stderr)
    med = {
        kind: sorted(r[f"env_{kind}"] for r in rounds)[len(rounds) // 2]
        for kind in ("cpu", "read", "rw")
    }
    print(json.dumps({
        "metric": f"fixed-work scaling envelopes, taskset {lo} -> {hi} cores",
        "levels": list(LEVELS),
        "arr_mb_per_proc": ARR_MB,
        "rounds": rounds,
        "median_env": med,
    }))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        print(json.dumps(_worker(int(sys.argv[2]))))
    elif sys.argv[1:2] == ["--curve"]:
        curve()
    else:
        main()
