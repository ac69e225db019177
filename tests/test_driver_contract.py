"""Driver-contract simulation: every queries()[name] vs oracle_sql()[name].

Replicates the driver's correctness gate locally (SURVEY.md §5.2 layer 3):
run the Spark query and the DuckDB oracle on the same sf0.01 data, then
compare row count, column-name set, and the order-insensitive multiset
of row values. Catching a mismatch here is cheap; in CORRECTNESS_r{N}
it is not.
"""

from __future__ import annotations

import glob
import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"

QUERY_NAMES = sorted(entrymod.queries().keys())


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for p in glob.glob(os.path.join(SF_DIR, "*.parquet")):
        name = os.path.splitext(os.path.basename(p))[0]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Column-name-sorted, row-order-insensitive, stringified frame."""
    df = df.reindex(sorted(df.columns), axis=1)
    out = pd.DataFrame(index=df.index)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            out[c] = s.map(lambda v: "null" if pd.isna(v) else repr(float(v)))
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.map(lambda v: "null" if pd.isna(v) else str(int(v)))
        else:
            out[c] = s.map(lambda v: "null" if v is None or v is pd.NA else str(v))
    out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out


def test_oracle_keys_subset():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    missing = set(o) - set(q)
    assert not missing, f"oracles without queries: {missing}"


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(name, spark, duck):
    oracles = entrymod.oracle_sql()
    if name not in oracles:
        pytest.skip(f"{name}: rows-only check (no SQL oracle)")
    sdf = entrymod.queries()[name](spark, SF_DIR).toPandas()
    odf = duck.execute(oracles[name]).fetchdf()
    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{name}: columns {sorted(sdf.columns)} vs {sorted(odf.columns)}"
    )
    assert len(sdf) == len(odf), f"{name}: {len(sdf)} vs {len(odf)} rows"
    for c in sdf.columns:
        ks, ko = sdf[c].dtype.kind, odf[c].dtype.kind
        assert ks == ko, f"{name}.{c}: dtype kind {sdf[c].dtype} vs {odf[c].dtype}"
    ns, no = normalize(sdf), normalize(odf)
    if not ns.equals(no):
        diff = pd.concat([ns, no]).drop_duplicates(keep=False)
        raise AssertionError(f"{name}: value mismatch; sample diff:\n{diff.head(10)}")


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"sink_id", "n", "n_convs"} == set(df.columns)
