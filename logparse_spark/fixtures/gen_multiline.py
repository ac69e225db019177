"""Deterministic MULTILINE raw log fixture (continuation-line records).

Real log streams carry records that span lines — stack traces, wrapped
detail lines, config dumps — where only the first line matches the
syslog header layout and the rest must be folded back into it
(LogParse's line-at-a-time loop sees them as unmatched noise; every
production log shipper grows a multiline mode for exactly this).
`sources.read_raw_multiline` is that mode on Spark; this generator
emits a seeded file of header lines interleaved with continuation
lines so the assembly itself can be an oracle-checked `queries()`
entry (DuckDB folds the identical file with the identical rules).

Layout produced:
- header lines: the exact `gen_syslog` layout
  (`Mon DD HH:MM:SS host program[pid]: message`);
- continuation lines: indented stack-trace frames / wrapped detail
  (start with whitespace — never match the header regex);
- stray unindented junk (`-- malformed … --`): ALSO a continuation by
  the multiline rule (anything that is not a header joins the
  preceding record), mirroring how shippers treat mid-stream noise;
- BLANK lines: also continuations (pinned semantics — a blank line
  inside a wrapped record is record content; see
  sources.assemble_multiline), sprinkled in so the oracle-checked
  entry exercises the blank-line path, not just unit tests.

Determinism constraints match gen_syslog (strictly increasing per-host
timestamps, two-digit days, no \\x01 / no embedded newlines per line)
so Spark and the DuckDB oracle agree bit-for-bit, including on the
derived turn_idx ordering.
"""

from __future__ import annotations

import os

import numpy as np

from .gen_syslog import gen_syslog_lines

SEED = 4242

_FRAMES = [
    "com.example.api.Handler.dispatch", "com.example.db.Pool.acquire",
    "com.example.rpc.Client.call", "io.corp.queue.Consumer.poll",
]
_WRAPPED = [
    "caused by: upstream handshake failure",
    "retrying with backoff window 250ms",
    "hint: increase pool_size in service.conf",
]

# headers per sf; continuations add ~55% more physical lines on top
SF_LINES = {"0.001": 800, "0.01": 9_000, "0.1": 90_000, "1": 900_000}


def gen_multiline_lines(n_headers: int, seed: int = SEED) -> list[str]:
    """Headers from gen_syslog (its own seed keeps them reproducible),
    with a seeded sprinkling of continuation lines after each."""
    rng = np.random.default_rng(seed)
    headers = gen_syslog_lines(n_headers, seed=seed + 1)
    n_cont = rng.integers(0, 5, size=len(headers))
    frame_i = rng.integers(0, len(_FRAMES), size=(len(headers), 4))
    line_no = rng.integers(10, 999, size=(len(headers), 4))
    kind = rng.random(size=(len(headers), 4))
    wrap_i = rng.integers(0, len(_WRAPPED), size=(len(headers), 4))

    out: list[str] = []
    for i, h in enumerate(headers):
        if h.startswith("--"):
            # gen_syslog's malformed lines are continuations here by
            # definition (non-header): keep them, they fold into the
            # previous record — except at file start, where they would
            # be orphans; the oracle path must be orphan-free (orphan
            # handling is pinned by a unit test instead)
            if not out:
                continue
            out.append(h)
            continue
        out.append(h)
        for k in range(int(n_cont[i])):
            if kind[i][k] < 0.6:
                out.append(
                    f"    at {_FRAMES[frame_i[i][k]]}"
                    f"({_FRAMES[frame_i[i][k]].rsplit('.', 2)[-2]}.java:"
                    f"{line_no[i][k]})"
                )
            elif kind[i][k] < 0.92:
                out.append(f"\t{_WRAPPED[wrap_i[i][k]]}")
            else:
                # blank continuation line (kept as record content —
                # pinned semantics); even a file-final blank is safe:
                # both line readers see "…\n\n" as a trailing empty
                # line once the oracle trims the single terminator
                out.append("")
    return out


def multiline_fixture_dir(sf: str, base_dir: str = "/root/repo/data") -> str:
    return os.path.join(base_dir, "multiline", f"sf{sf}")


# v2: blank continuation lines added (round 4, pinned semantics)
CONTENT_VERSION = 2


def ensure_multiline_fixture(sf: str, base_dir: str = "/root/repo/data") -> str:
    """Idempotently materialize the raw multiline log; returns the path."""
    from . import ensure_text_fixture

    return ensure_text_fixture(
        "multiline", sf, gen_multiline_lines, SF_LINES.get(sf, 9_000),
        CONTENT_VERSION, base_dir=base_dir)
