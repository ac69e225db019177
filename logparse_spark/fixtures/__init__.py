from __future__ import annotations

import os

from .gen_transcripts import (  # noqa: F401
    ensure_fixture,
    fixture_dir,
    gen_transcripts,
    sf_from_dir,
)


def marker_current(marker: str, tag: str) -> bool:
    """True when the fixture marker exists and carries exactly
    ``tag`` — version-mismatched (including legacy plain-"ok")
    markers read as stale so the fixture regenerates."""
    try:
        with open(marker, encoding="utf-8") as f:
            return f.read() == tag
    except FileNotFoundError:
        return False


def stamp_marker(marker: str, tag: str) -> None:
    with open(marker, "w") as f:
        f.write(tag)


def ensure_text_fixture(subdir: str, sf: str, gen_fn, n_lines: int,
                        version: int,
                        base_dir: str = "/root/repo/data") -> str:
    """Idempotent, CONTENT-VERSIONED raw-text fixture materializer —
    the shared tmp-write + os.replace + marker idiom of the raw-log
    generators (gen_syslog / gen_multiline / gen_applog; the derived
    fixtures gen_jsonl / gen_scd share marker_current/stamp_marker).

    The ``_COMPLETE`` marker records a version token derived from the
    generator's declared CONTENT_VERSION and the line count; any
    mismatch — including a legacy plain-"ok" marker — regenerates, so
    a generator behavior change (e.g. multiline gaining blank
    continuation lines) propagates to hosts holding a stale cached
    fixture instead of silently serving old bytes forever. Returns
    the raw.log path."""
    d = os.path.join(base_dir, subdir, f"sf{sf}")
    path = os.path.join(d, "raw.log")
    marker = os.path.join(d, "_COMPLETE")
    tag = f"v{version}:n={n_lines}\n"
    if marker_current(marker, tag) and os.path.exists(path):
        return path
    os.makedirs(d, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write("\n".join(gen_fn(n_lines)) + "\n")
    os.replace(tmp, path)
    stamp_marker(marker, tag)
    return path
