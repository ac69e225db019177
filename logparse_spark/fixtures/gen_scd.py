"""Deterministic SCD2 role-history fixture (time-versioned dimension).

Production enrichment dictionaries are not static: a role's
classification changes over time and historical reprocessing must
join each turn against the classification IN EFFECT AT ITS EVENT TIME
(slowly-changing-dimension type 2). This derives a two-epoch history
from the fixture's ``role_dict``: before PIVOT every role carries its
class suffixed ``_v1``; from PIVOT on, the current class. Validity
intervals are half-open ``[valid_from, valid_to)`` and tile all of
time, so every turn matches exactly one version (the outer-join
unknown case stays exercised by roles absent from the dict).
"""

from __future__ import annotations

import os
from datetime import datetime

import pyarrow as pa
import pyarrow.parquet as pq

# mid-range of the transcripts fixture (2026-01-01 .. 2026-01-05)
PIVOT = datetime(2026, 1, 3, 0, 0, 0)
LO = datetime(1970, 1, 1)
HI = datetime(2100, 1, 1)

# bump when the derived history changes (marker versioning)
CONTENT_VERSION = 1


def ensure_role_hist(sf: str, base_dir: str = "/root/repo/data") -> str:
    """Idempotently derive role_hist.parquet next to the sf's dicts."""
    from . import marker_current, stamp_marker

    d = os.path.join(base_dir, "transcripts", f"sf{sf}")
    path = os.path.join(d, "role_hist.parquet")
    marker = path + "._COMPLETE"
    tag = f"v{CONTENT_VERSION}\n"
    if marker_current(marker, tag) and os.path.exists(path):
        return path
    src = pq.read_table(os.path.join(d, "role_dict.parquet")).to_pydict()
    roles, classes = src["role"], src["role_class"]
    rows = {"role": [], "role_class": [], "valid_from": [], "valid_to": []}
    for r, c in zip(roles, classes):
        rows["role"] += [r, r]
        rows["role_class"] += [f"{c}_v1", c]
        rows["valid_from"] += [LO, PIVOT]
        rows["valid_to"] += [PIVOT, HI]
    t = pa.table({
        "role": pa.array(rows["role"], pa.string()),
        "role_class": pa.array(rows["role_class"], pa.string()),
        "valid_from": pa.array(rows["valid_from"], pa.timestamp("us")),
        "valid_to": pa.array(rows["valid_to"], pa.timestamp("us")),
    })
    tmp = path + ".tmp"
    pq.write_table(t, tmp)
    os.replace(tmp, path)
    stamp_marker(marker, tag)
    return path
