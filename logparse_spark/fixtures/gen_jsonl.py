"""Deterministic JSONL transcripts fixture (structured-source compat).

Modern agent-transcript exports arrive as newline-delimited JSON at
least as often as columnar files; `sources.read_raw_jsonl` keeps that
ingestion mode first-class next to raw syslog. The fixture is the
SAME rows as the parquet transcripts fixture (gen_transcripts),
re-serialized line-by-line, so the `raw_jsonl` query's oracle is the
full row set: DuckDB parses the identical file with read_json and both
engines must agree bit-for-bit, including the timestamp round trip
(always 6 fractional digits -> one parse pattern serves both).
"""

from __future__ import annotations

import json
import os

from .gen_transcripts import ensure_fixture


# bump when the serialized output changes (marker versioning — see
# fixtures.ensure_text_fixture's rationale)
CONTENT_VERSION = 1


def jsonl_fixture_path(sf: str) -> str:
    return os.path.join(ensure_fixture(sf), "transcripts.jsonl")


def ensure_jsonl_fixture(sf: str, out_path: str | None = None) -> str:
    """Idempotently materialize the JSONL export; returns the path.

    ``out_path`` redirects the (unconditional) write elsewhere — used
    by determinism tests so they never delete the shared fixture out
    from under a parallel test run."""
    import pyarrow.parquet as pq

    from . import marker_current, stamp_marker

    d = ensure_fixture(sf)
    path = out_path or jsonl_fixture_path(sf)
    marker = path + "._COMPLETE"
    tag = f"v{CONTENT_VERSION}\n"
    if out_path is None and marker_current(marker, tag) \
            and os.path.exists(path):
        return path
    tbl = pq.read_table(os.path.join(d, "transcripts.parquet"))
    cols = tbl.to_pydict()
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        for i in range(tbl.num_rows):
            row = {
                "conv_id": cols["conv_id"][i],
                "turn_idx": cols["turn_idx"][i],
                "role": cols["role"][i],
                "text": cols["text"][i],
                "tool": cols["tool"][i],
                "ts": cols["ts"][i].strftime("%Y-%m-%d %H:%M:%S.%f"),
            }
            f.write(json.dumps(row) + "\n")
    os.replace(tmp, path)
    stamp_marker(marker, tag)
    return path
