"""Deterministic NON-SYSLOG multiline app-log fixture (Java-style).

The `multiline /RE/` directive grew grok extraction templates in
round 4: a header layout that is NOT syslog can now both assemble
records AND extract the canonical columns from its governing line.
This generator emits the classic Java application-log layout

    2026-03-14 09:26:53 ERROR [worker-3] com.example.api.Handler: msg

with stack-trace / wrapped / blank continuation lines, so the
extraction path can be an oracle-checked `queries()` arm (DuckDB
folds and extracts the identical file with the identical expanded
regex — see rules/applog.rules for the directive).

Canonical mapping exercised end-to-end:
    conv_id <- the [bracketed] worker/thread name
    role    <- the LOGLEVEL token
    tool    <- the logger class
    text    <- the message + folded continuation lines
    ts      <- the ISO-ish timestamp (ts "yyyy-MM-dd HH:mm:ss")

Determinism: seeded numpy; timestamps strictly increase line-over-line
(so per-conv (ts, text) ordering is unique), no \\x0b (the Java-vs-RE2
\\S divergence), no embedded newlines per physical line.
"""

from __future__ import annotations

import os

import numpy as np

SEED = 20260421

_WORKERS = [f"worker-{i}" for i in range(6)] + ["svc-payments", "svc-auth"]
_LEVELS = ["INFO", "WARN", "ERROR", "DEBUG"]
_LOGGERS = [
    "com.example.api.Handler", "com.example.db.Pool",
    "com.example.rpc.Client", "com.example.cache.Lru",
]
_FRAMES = [
    "com.example.api.Handler.dispatch", "com.example.db.Pool.acquire",
    "com.example.rpc.Client.call", "com.example.queue.Consumer.poll",
]
_WRAPPED = [
    "caused by: upstream handshake failure",
    "retrying with backoff window 250ms",
    "hint: increase pool_size in service.conf",
]

# headers per sf (continuations add ~50% more physical lines)
SF_LINES = {"0.001": 700, "0.01": 8_000, "0.1": 80_000, "1": 800_000}


def _message(rng_row: np.ndarray) -> str:
    kind = rng_row[0] % 5
    if kind == 0:
        return f"upstream timeout after {100 + rng_row[1] % 4900} ms"
    if kind == 1:
        return (f"request rid=r{rng_row[1] % 10_000:04d} completed "
                f"status={[200, 200, 404, 500][rng_row[2] % 4]}")
    if kind == 2:
        return f"cache miss for key k{rng_row[1] % 500}"
    if kind == 3:
        return f"Unhandled exception processing job {rng_row[1] % 1000}"
    return f"gc pause {rng_row[1] % 800} ms in region {rng_row[2] % 32}"


def gen_applog_lines(n_headers: int, seed: int = SEED) -> list[str]:
    rng = np.random.default_rng(seed)
    ints = rng.integers(0, 1_000_000, size=(n_headers, 8))
    n_cont = rng.integers(0, 4, size=n_headers)
    kinds = rng.random(size=(n_headers, 4))
    # strictly increasing timestamps: 1-3 s steps from a fixed epoch
    steps = rng.integers(1, 4, size=n_headers).cumsum()
    base = np.datetime64("2026-03-14T09:00:00")

    out: list[str] = []
    for i in range(n_headers):
        ts = str(base + np.timedelta64(int(steps[i]), "s")).replace("T", " ")
        worker = _WORKERS[int(ints[i][3]) % len(_WORKERS)]
        level = _LEVELS[int(ints[i][4]) % len(_LEVELS)]
        logger = _LOGGERS[int(ints[i][5]) % len(_LOGGERS)]
        msg = _message(ints[i])
        out.append(f"{ts} {level} [{worker}] {logger}: {msg}")
        is_exc = msg.startswith("Unhandled exception")
        for k in range(int(n_cont[i]) + (2 if is_exc else 0)):
            kk = kinds[i][k % 4]
            if is_exc or kk < 0.55:
                fr = _FRAMES[int(ints[i][(k + 1) % 8]) % len(_FRAMES)]
                ln = 10 + int(ints[i][(k + 2) % 8]) % 900
                out.append(f"    at {fr}({fr.rsplit('.', 2)[-2]}.java:{ln})")
            elif kk < 0.85:
                out.append(f"\t{_WRAPPED[int(ints[i][(k + 3) % 8]) % len(_WRAPPED)]}")
            else:
                out.append("")  # blank continuation (pinned semantics)
    return out


def applog_fixture_dir(sf: str, base_dir: str = "/root/repo/data") -> str:
    return os.path.join(base_dir, "applog", f"sf{sf}")


CONTENT_VERSION = 1


def ensure_applog_fixture(sf: str, base_dir: str = "/root/repo/data") -> str:
    """Idempotently materialize the raw applog file; returns the path."""
    from . import ensure_text_fixture

    return ensure_text_fixture(
        "applog", sf, gen_applog_lines, SF_LINES.get(sf, 8_000),
        CONTENT_VERSION, base_dir=base_dir)
