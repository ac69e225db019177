"""Deterministic raw syslog fixture (the reference's native input).

LogParse consumes line-oriented syslog text; `sources.read_raw_syslog`
keeps that compatibility mode alive on Spark. This generator emits a
seeded raw log file so the source itself can be an oracle-checked
`queries()` entry (DuckDB parses the identical file with the identical
regex).

Determinism constraints (so Spark and DuckDB agree bit-for-bit):
- per-host timestamps strictly increase -> the (ts, message) ordering
  that derives turn_idx has no ties;
- days are 10..28 only, so the day field is always two digits and one
  `%d`-style parse pattern serves both engines (classic space-padded
  single-digit days are covered by unit tests, not this fixture);
- messages avoid \\x01 and newlines (DuckDB reads lines via read_csv
  with delim='\\x01', quote='').
"""

from __future__ import annotations

import os

import numpy as np

SEED = 1337
YEAR = 2026
MONTHS = ["Jan", "Feb", "Mar", "Apr", "May", "Jun"]

HOSTS = [f"{k}-{i:02d}" for k in ("web", "db", "app", "cache") for i in range(1, 11)]
PROGRAMS = ["sshd", "cron", "kernel", "nginx", "systemd", "postfix", "sudo"]

# message templates overlap rules/default.rules so the raw log also
# exercises the full parse->route pipeline (tests/test_sources.py)
_USERS = ["alice", "bob", "carol", "dave", "erin", "frank", "grace", "heidi"]
_DETAILS = [
    "connection reset by peer", "timeout waiting for lock",
    "disk quota exceeded", "upstream returned 503",
]
_FILLERS = [
    "session opened", "session closed", "config reloaded",
    "cache flushed", "rotation complete",
]

# lines per sf, sized relative to the transcript fixture ladder
SF_LINES = {"0.001": 1_000, "0.01": 12_000, "0.1": 120_000, "1": 1_200_000}


def gen_syslog_lines(n_lines: int, seed: int = SEED) -> list[str]:
    rng = np.random.default_rng(seed)
    host_idx = rng.integers(0, len(HOSTS), size=n_lines)
    prog_idx = rng.integers(0, len(PROGRAMS), size=n_lines)
    has_pid = rng.random(n_lines) < 0.8
    pids = rng.integers(100, 99999, size=n_lines)
    mon_idx = rng.integers(0, len(MONTHS), size=n_lines)
    days = rng.integers(10, 29, size=n_lines)
    kind = rng.random(n_lines)
    seqs = rng.integers(1, 100000, size=n_lines)
    user_i = rng.integers(0, len(_USERS), size=n_lines)
    det_i = rng.integers(0, len(_DETAILS), size=n_lines)
    fill_i = rng.integers(0, len(_FILLERS), size=n_lines)
    octets = rng.integers(1, 255, size=(n_lines, 2))

    # strictly increasing seconds-of-day per host -> no (ts, message)
    # ties within a host (turn_idx derivation is order-unambiguous)
    sec_of_day = np.zeros(n_lines, dtype=np.int64)
    for h in range(len(HOSTS)):
        idx = np.flatnonzero(host_idx == h)
        if idx.size:
            # increments bounded so the cumsum stays < 86400 without
            # capping (a cap would collapse tail values into ties)
            hi = max(2, 86399 // idx.size)
            incs = rng.integers(1, hi, size=idx.size) if hi > 2 else np.ones(idx.size, dtype=np.int64)
            sec_of_day[idx] = np.cumsum(incs)

    lines: list[str] = []
    for i in range(n_lines):
        if kind[i] < 0.02:
            lines.append(f"-- malformed line {seqs[i]} --")
            continue
        hh, rem = divmod(int(sec_of_day[i]), 3600)
        mm, ss = divmod(rem, 60)
        prog = PROGRAMS[prog_idx[i]]
        tag = f"{prog}[{pids[i]}]" if has_pid[i] else prog
        if kind[i] < 0.25:
            msg = (f"login failed for user {_USERS[user_i[i]]} "
                   f"from 10.0.{octets[i][0]}.{octets[i][1]}")
        elif kind[i] < 0.45:
            msg = f"heartbeat ping seq={seqs[i]}"
        elif kind[i] < 0.65:
            msg = f"ERROR {seqs[i] % 600}: {_DETAILS[det_i[i]]} in step {i % 17}"
        else:
            msg = f"{_FILLERS[fill_i[i]]} id={seqs[i]}"
        lines.append(
            f"{MONTHS[mon_idx[i]]} {days[i]} {hh:02d}:{mm:02d}:{ss:02d} "
            f"{HOSTS[host_idx[i]]} {tag}: {msg}"
        )
    return lines


def syslog_fixture_dir(sf: str, base_dir: str = "/root/repo/data") -> str:
    return os.path.join(base_dir, "syslog", f"sf{sf}")


# bump when gen_syslog_lines' OUTPUT changes: the marker version makes
# stale cached fixtures regenerate (fixtures.ensure_text_fixture)
CONTENT_VERSION = 1


def ensure_syslog_fixture(sf: str, base_dir: str = "/root/repo/data") -> str:
    """Idempotently materialize the raw log; returns the file path."""
    from . import ensure_text_fixture

    return ensure_text_fixture(
        "syslog", sf, gen_syslog_lines, SF_LINES.get(sf, 12_000),
        CONTENT_VERSION, base_dir=base_dir)
