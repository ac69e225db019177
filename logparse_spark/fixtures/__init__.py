from __future__ import annotations

import os

from .gen_transcripts import (  # noqa: F401
    ensure_fixture,
    fixture_dir,
    gen_transcripts,
    sf_from_dir,
)


def ensure_text_fixture(subdir: str, sf: str, gen_fn, n_lines: int,
                        version: int,
                        base_dir: str = "/root/repo/data") -> str:
    """Idempotent, CONTENT-VERSIONED raw-text fixture materializer —
    the one copy of the tmp-write + os.replace + marker idiom the
    raw-log generators share (gen_syslog / gen_multiline /
    gen_applog).

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
    try:
        with open(marker, encoding="utf-8") as f:
            if f.read() == tag and os.path.exists(path):
                return path
    except FileNotFoundError:
        pass
    os.makedirs(d, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write("\n".join(gen_fn(n_lines)) + "\n")
    os.replace(tmp, path)
    with open(marker, "w") as f:
        f.write(tag)
    return path
