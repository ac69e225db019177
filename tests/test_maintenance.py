"""Sink maintenance: compaction + vacuum (the parquet stand-ins for
Iceberg rewrite_data_files / expire_snapshots — SURVEY.md §2.2 X2).

Properties locked in:
  - compaction preserves the committed table EXACTLY (same rows, same
    per-sink counts, same routed-row order within every sink);
  - it actually reduces file count to one per (bucket, sink);
  - the manifest swap is atomic-by-construction (conservation check
    runs before commit), and vacuum removes only unreferenced runs;
  - readers (read_routed / lineage_df) see identical results before
    and after compact + vacuum.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from logparse_spark import pipeline
from logparse_spark.sinks import SinkSet, load_manifest

RULES = "/root/repo/rules/default.rules"


@pytest.fixture(scope="module")
def compact_out(spark, fixture_sf_small, tmp_path_factory):
    """A committed pipeline run with deliberately sharded bucket
    partitions: salt spreads each bucket over several write tasks, so
    every (bucket, sink) holds multiple small files — the state
    compaction exists to fix."""
    out = str(tmp_path_factory.mktemp("compact_out"))
    pipeline.run(
        spark,
        source_path=f"{fixture_sf_small}/transcripts.parquet",
        out_dir=out,
        rules_path=RULES,
        dict_dir=fixture_sf_small,
        buckets=8,
        salt_buckets=4,
        groups=2,
        hot_threshold=500,
    )
    return out


def _file_census(out_dir: str) -> dict[tuple[int, str], int]:
    """(bucket, sink_id) -> parquet file count across COMMITTED runs."""
    manifest = load_manifest(out_dir)
    census: dict[tuple[int, str], int] = {}
    for b, meta in manifest["buckets"].items():
        base = os.path.join(out_dir, "runs", meta["run_id"], f"bucket={int(b)}")
        for root, _, files in os.walk(base):
            n = len([f for f in files if f.endswith(".parquet")])
            if not n:
                continue
            sink = [s for s in root.split(os.sep) if s.startswith("sink_id=")]
            census[(int(b), sink[0].split("=", 1)[1])] = (
                census.get((int(b), sink[0].split("=", 1)[1]), 0) + n
            )
    return census


def test_compact_preserves_table_and_merges_files(spark, compact_out):
    sink = SinkSet(out_dir=compact_out)
    before_rows = sink.read_routed(spark).select(
        "bucket", "sink_id", "conv_id", "turn_idx", "rule_id", "rendered"
    )
    before = before_rows.collect()
    manifest_before = load_manifest(compact_out)["buckets"]
    census_before = _file_census(compact_out)
    assert any(n > 1 for n in census_before.values()), (
        "fixture run produced one file per partition already — the salt/"
        "group setup no longer shards writes and this test lost its subject"
    )

    res = sink.compact(spark)
    assert res["rewritten_buckets"], res
    assert res["files_after"] < res["files_before"]

    # manifest: same buckets, same counts, new run ids for rewritten ones
    manifest_after = load_manifest(compact_out)["buckets"]
    assert set(manifest_after) == set(manifest_before)
    for b in manifest_before:
        assert manifest_after[b]["rows"] == manifest_before[b]["rows"]
        assert manifest_after[b]["sinks"] == manifest_before[b]["sinks"]

    # one file per (bucket, sink) for every rewritten bucket
    census_after = _file_census(compact_out)
    assert set(census_after) == set(census_before)
    for (b, s), n in census_after.items():
        if b in res["rewritten_buckets"]:
            assert n == 1, (b, s, n)

    # reader equivalence: exact same multiset of routed rows
    after = SinkSet(out_dir=compact_out).read_routed(spark).select(
        "bucket", "sink_id", "conv_id", "turn_idx", "rule_id", "rendered"
    )
    assert sorted(map(tuple, before)) == sorted(map(tuple, after.collect()))

    # routed-row order within each sink file is (conv_id, turn_idx):
    # reading a single compacted (bucket, sink) dir yields sorted rows
    b = res["rewritten_buckets"][0]
    run_id = manifest_after[str(b)]["run_id"]
    bdir = os.path.join(compact_out, "runs", run_id, f"bucket={b}")
    sinks = [d for d in os.listdir(bdir) if d.startswith("sink_id=")]
    rows = (
        spark.read.parquet(os.path.join(bdir, sinks[0]))
        .select("conv_id", "turn_idx").collect()
    )
    assert rows == sorted(rows, key=lambda r: (r["conv_id"], r["turn_idx"]))


def test_vacuum_removes_only_unreferenced_runs(spark, compact_out):
    # partial compaction leaves old runs referenced by their
    # non-rewritten buckets (vacuum must NOT touch them); a full
    # rewrite (min_files_per_partition=1) repoints every non-empty
    # bucket, orphaning the earlier runs
    out = compact_out
    res = SinkSet(out_dir=out).compact(spark, min_files_per_partition=1)
    assert res["rewritten_buckets"]
    manifest = load_manifest(out)
    live = {m["run_id"] for m in manifest["buckets"].values()}
    on_disk = set(os.listdir(os.path.join(out, "runs")))
    assert on_disk - live, "expected unreferenced runs after full rewrite"

    sink = SinkSet(out_dir=out)
    n_before = sink.read_routed(spark).count()
    removed = sink.vacuum()
    assert set(removed) == on_disk - live
    assert set(os.listdir(os.path.join(out, "runs"))) == live

    # the committed table is untouched
    assert SinkSet(out_dir=out).read_routed(spark).count() == n_before
    # idempotent
    assert SinkSet(out_dir=out).vacuum() == []


def test_compact_noop_when_already_compact(spark, compact_out):
    sink = SinkSet(out_dir=compact_out)
    res = sink.compact(spark)
    assert res["rewritten_buckets"] == []
    assert res["files_after"] == res["files_before"]


def test_compact_refuses_iceberg_branch(spark, compact_out):
    # on Iceberg the table format owns file layout (rewrite_data_files);
    # the parquet-manifest compactor must not touch it
    with pytest.raises(RuntimeError, match="rewrite_data_files"):
        SinkSet(out_dir=compact_out, fmt="iceberg").compact(spark)


def test_compact_plan_prunes_and_single_exchange(spark, compact_out):
    """The compaction read must prune to the todo buckets at the scan
    (PartitionFilters on the bucket partition column — at 100 TB
    compacting 3 buckets must not list, let alone read, the other
    1021) and the rewrite must cost exactly ONE exchange (the
    repartition on bucket)."""
    manifest = load_manifest(compact_out)
    some = [int(b) for b in list(manifest["buckets"])[:2]]
    run_id = manifest["buckets"][str(some[0])]["run_id"]
    base = os.path.join(compact_out, "runs", run_id)
    df = (
        spark.read.option("basePath", base).parquet(base)
        .filter(F.col("bucket").isin(some))
        .repartition(len(some), "bucket")
        .sortWithinPartitions("bucket", "sink_id", "conv_id", "turn_idx")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and "bucket" in pf.group(1), plan
    assert plan.count("Exchange") == 1, plan
