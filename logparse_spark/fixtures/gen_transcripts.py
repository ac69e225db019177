"""Deterministic transcripts fixture generator (FIXTURES.md §1-§3).

Shape is the authoritative input_hint (BASELINE.json:15):
  transcripts(conv_id string, turn_idx int32, role string,
              text string, tool string, ts timestamp)

Deliberately skewed (1% of conversations own ~50% of turns; one hot
tool name) so salting / skew handling is actually exercised. Seeded,
no wall-clock — same bytes every run. Pure numpy/pyarrow, no Spark.
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
BASE_TS = datetime(2026, 1, 1, tzinfo=timezone.utc)

# sf -> (n_turns, n_convs); mirrors the driver's sf ladder (TESTDATA.md)
SF_SIZES = {
    "0.001": (5_000, 300),
    "0.01": (60_000, 3_000),
    "0.1": (600_000, 30_000),
    "1": (6_000_000, 300_000),  # scaling-bench scale, generated on demand
    "10": (60_000_000, 3_000_000),  # compute-dominated scaling scale
}

ROLES = ["user", "assistant", "system", "tool"]

TOOL_NAMES = [
    "search", "exec", "read_file", "write_file", "browser", "calc",
    "sql", "http_get", "http_post", "shell", "grep", "summarize",
]
HOT_TOOL = "search"  # appears ~20x more often (sink skew)

USERS = [
    "alice", "bob", "carol", "dave", "erin", "frank", "grace", "heidi",
    "ivan", "judy", "mallory", "oscar", "peggy", "trent", "victor", "walter",
]
DETAILS = [
    "connection reset by peer", "index out of range", "timeout waiting for lock",
    "null pointer dereference", "disk quota exceeded", "schema mismatch detected",
    "checksum verification failed", "upstream returned 503",
]
FILLERS = [
    "please summarize the previous discussion",
    "the quarterly numbers look fine to me",
    "let's schedule a follow up for next week",
    "I think the approach is reasonable overall",
    "can you clarify the second point",
    "meeting notes have been shared with the team",
]
NEAR_MISSES = [  # first-match-order traps: almost match a rule, must not
    "heartbeat ping seq=abc",            # \d+ fails
    "heartbeat ping seq=123 extra",      # $ anchor fails
    "login failure for user bob from 1.2.3.4",   # 'failure' != 'failed'
    "ERROR x41: casing broken in step 2",        # code not \d+
    "error 17: lowercase in step 9",             # 'ERROR' literal fails
]

# text category mix (FIXTURES.md §1): ignore/count/report/filler/near-miss
CATEGORY_P = [0.20, 0.30, 0.25, 0.15, 0.10]


def _conv_sizes(n_turns: int, n_convs: int, rng: np.random.Generator) -> np.ndarray:
    """1% of conversations own ~50% of turns (Zipf-ish head)."""
    n_hot = max(1, n_convs // 100)
    hot_turns = n_turns // 2
    cold_turns = n_turns - hot_turns
    n_cold = n_convs - n_hot
    hot = np.full(n_hot, hot_turns // n_hot, dtype=np.int64)
    hot[: hot_turns - hot.sum()] += 1
    base = cold_turns // n_cold
    cold = np.full(n_cold, base, dtype=np.int64)
    jitter = rng.integers(-base // 2, base // 2 + 1, size=n_cold) if base >= 2 else np.zeros(n_cold, dtype=np.int64)
    cold = np.maximum(1, cold + jitter)
    # fix total exactly
    diff = cold_turns - cold.sum()
    cold[0] = max(1, cold[0] + diff)
    sizes = np.concatenate([hot, cold])
    # final exact-total correction lands on the first hot conv
    sizes[0] += n_turns - sizes.sum()
    return sizes


def gen_transcripts(n_turns: int, n_convs: int, seed: int = SEED) -> pa.Table:
    rng = np.random.default_rng(seed)
    sizes = _conv_sizes(n_turns, n_convs, rng)
    n = int(sizes.sum())
    assert n == n_turns, (n, n_turns)

    conv_ord = rng.permutation(n_convs)  # which conv gets which id
    conv_ids = np.array([f"conv{conv_ord[i]:06d}" for i in range(n_convs)], dtype=object)
    conv_col = np.repeat(conv_ids, sizes)
    turn_idx = np.concatenate([np.arange(s, dtype=np.int32) for s in sizes])

    # roles: cycle with per-conversation seeded phase jitter
    phase = rng.integers(0, 4, size=n_convs)
    phase_col = np.repeat(phase, sizes)
    role_i = (turn_idx + phase_col) % 4
    roles = np.array(ROLES, dtype=object)[role_i]
    unk = rng.random(n) < 0.005
    roles[unk] = "unknown_role"

    # text categories
    cat = rng.choice(5, size=n, p=CATEGORY_P)
    seq = rng.integers(0, 100_000, size=n)
    users = np.array(USERS, dtype=object)[rng.integers(0, len(USERS), size=n)]
    ips = np.array(
        [f"{a}.{b}.{c}.{d}" for a, b, c, d in rng.integers(1, 255, size=(64, 4))],
        dtype=object,
    )[rng.integers(0, 64, size=n)]
    codes = rng.integers(100, 600, size=n)
    details = np.array(DETAILS, dtype=object)[rng.integers(0, len(DETAILS), size=n)]
    steps = rng.integers(1, 40, size=n)
    fillers = np.array(FILLERS, dtype=object)[rng.integers(0, len(FILLERS), size=n)]
    nears = np.array(NEAR_MISSES, dtype=object)[rng.integers(0, len(NEAR_MISSES), size=n)]

    text = np.empty(n, dtype=object)
    m = cat == 0
    text[m] = [f"heartbeat ping seq={s}" for s in seq[m]]
    m = cat == 1
    text[m] = [f"login failed for user {u} from {ip}" for u, ip in zip(users[m], ips[m])]
    m = cat == 2
    text[m] = [f"ERROR {c}: {d} in step {k}" for c, d, k in zip(codes[m], details[m], steps[m])]
    m = cat == 3
    text[m] = [f"{f} (msg {s})" for f, s in zip(fillers[m], seq[m])]
    m = cat == 4
    text[m] = nears[m]

    # tool column: non-null only for role == "tool"
    tool = np.full(n, None, dtype=object)
    is_tool = roles == "tool"
    nt = int(is_tool.sum())
    weights = np.ones(len(TOOL_NAMES))
    weights[TOOL_NAMES.index(HOT_TOOL)] = 20.0
    weights = weights / weights.sum()
    tnames = np.array(TOOL_NAMES, dtype=object)[rng.choice(len(TOOL_NAMES), size=nt, p=weights)]
    with_arg = rng.random(nt) < 0.4
    args = np.array(["q", "x", "path", "v2", "full"], dtype=object)[rng.integers(0, 5, size=nt)]
    tool_vals = np.where(
        with_arg,
        np.array([f"{t}(arg={a})" for t, a in zip(tnames, args)], dtype=object),
        tnames,
    )
    tool[is_tool] = tool_vals

    ts = (np.arange(n, dtype=np.int64) * 7_000_000) + int(BASE_TS.timestamp() * 1_000_000)

    return pa.table(
        {
            "conv_id": pa.array(conv_col, type=pa.string()),
            "turn_idx": pa.array(turn_idx, type=pa.int32()),
            "role": pa.array(roles, type=pa.string()),
            "text": pa.array(text, type=pa.string()),
            "tool": pa.array(tool, type=pa.string()),
            "ts": pa.array(ts, type=pa.timestamp("us")),
        }
    )


def gen_role_dict() -> pa.Table:
    # deliberately missing "unknown_role" -> exercises left-join nulls
    return pa.table(
        {
            "role": pa.array(["user", "assistant", "system", "tool"]),
            "role_class": pa.array(["human", "model", "infra", "infra"]),
            "weight": pa.array([1.0, 2.0, 0.5, 0.25], type=pa.float64()),
        }
    )


def gen_tool_dict() -> pa.Table:
    fams = ["search", "exec", "io", "io", "search", "exec",
            "io", "search", "search", "exec", "search", "exec"]
    priv = [False, True, False, True, False, False,
            True, False, False, True, False, False]
    return pa.table(
        {
            "tool": pa.array(TOOL_NAMES),
            "tool_family": pa.array(fams),
            "is_privileged": pa.array(priv, type=pa.bool_()),
        }
    )


def fixture_dir(sf: str, base_dir: str = "/root/repo/data") -> str:
    return os.path.join(base_dir, "transcripts", f"sf{sf}")


def ensure_fixture(sf: str, base_dir: str = "/root/repo/data") -> str:
    """Generate (if missing) and return the fixture dir for a scale factor."""
    if sf not in SF_SIZES:
        raise ValueError(f"unknown sf {sf!r}; known: {sorted(SF_SIZES)}")
    d = fixture_dir(sf, base_dir)
    marker = os.path.join(d, "_COMPLETE")
    if os.path.exists(marker):
        return d
    os.makedirs(d, exist_ok=True)
    n_turns, n_convs = SF_SIZES[sf]
    # small row groups keep the file splittable: Spark assigns scan
    # partitions at row-group granularity, so a single-row-group file
    # would serialize the whole parse onto one core
    pq.write_table(
        gen_transcripts(n_turns, n_convs),
        os.path.join(d, "transcripts.parquet"),
        row_group_size=20_000,
    )
    pq.write_table(gen_role_dict(), os.path.join(d, "role_dict.parquet"))
    pq.write_table(gen_tool_dict(), os.path.join(d, "tool_dict.parquet"))
    with open(marker, "w") as f:
        f.write("ok\n")
    return d


def sf_from_dir(sf_dir: str) -> str:
    """Map a driver sf dir like /root/testdata/sf0.01 -> '0.01'."""
    base = os.path.basename(os.path.normpath(sf_dir))
    if base.startswith("sf"):
        base = base[2:]
    return base if base in SF_SIZES else "0.01"
