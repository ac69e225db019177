"""Bucket-space evolution (SinkSet.rebucket) — the partition-evolution
operation a 10^12-turn table needs when it outgrows its bucket count.

Properties locked in:
  - rebucket preserves the committed table EXACTLY (same rows, same
    per-sink routing) while every row moves to its new
    pmod(xxhash64(conv_id), new_N) bucket;
  - the manifest atomically swaps the WHOLE bucket map and re-pins
    n_buckets (no pre-evolution bucket id survives);
  - point lookups keep pruning under the new count, and time-travel
    lookups across the boundary hash under the OLD count;
  - rollback across the rebucket restores the old count and table;
  - the commit is optimistic (stale expected_runs -> CommitConflict,
    manifest untouched) and conservation-gated;
  - superseded runs become vacuum-collectable.

Each test copies the shared committed-run fixture into its own tmp
dir, so tests are order- and selection-independent.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from logparse_spark import pipeline
from logparse_spark.sinks import CommitConflict, SinkSet, load_manifest

RULES = "/root/repo/rules/default.rules"
OLD_N, NEW_N = 8, 16


@pytest.fixture(scope="module")
def rb_committed(spark, fixture_sf_small, tmp_path_factory):
    """A committed run at OLD_N buckets. READ-ONLY: tests copy it."""
    out = str(tmp_path_factory.mktemp("rb_committed"))
    pipeline.run(
        spark,
        source_path=f"{fixture_sf_small}/transcripts.parquet",
        out_dir=out,
        rules_path=RULES,
        dict_dir=fixture_sf_small,
        buckets=OLD_N,
        salt_buckets=4,
        groups=2,
        hot_threshold=500,
    )
    return out


@pytest.fixture()
def rb_out(rb_committed, tmp_path):
    out = str(tmp_path / "sinkset")
    shutil.copytree(rb_committed, out)
    return out


ROW_KEY = ["sink_id", "conv_id", "turn_idx"]


def _table_rows(spark, out_dir):
    return sorted(
        SinkSet(out_dir=out_dir).read_routed(spark)
        .select(*ROW_KEY).collect()
    )


def test_rebucket_preserves_table_and_repins_count(spark, rb_out):
    before = _table_rows(spark, rb_out)
    # manifest totals include the ignored sink; read_routed excludes it
    total_before = sum(
        int(m["rows"])
        for m in load_manifest(rb_out)["buckets"].values())
    res = SinkSet(out_dir=rb_out).rebucket(spark, NEW_N)
    assert res["n_buckets_before"] == OLD_N
    assert res["n_buckets_after"] == NEW_N
    assert res["rows"] == total_before

    manifest = load_manifest(rb_out)
    assert manifest["n_buckets"] == NEW_N
    # the whole map was swapped: every live bucket belongs to ONE new
    # run, ids are valid under the new count
    runs = {m["run_id"] for m in manifest["buckets"].values()}
    assert len(runs) == 1
    assert all(0 <= int(b) < NEW_N for b in manifest["buckets"])
    # a rebucket from 8 to 16 must actually use ids >= 8 (xxhash64 mod
    # 16 spreads conversations over the full range)
    assert any(int(b) >= OLD_N for b in manifest["buckets"])

    # the physical layout agrees with the recomputed bucket column
    after_df = SinkSet(out_dir=rb_out).read_routed(spark)
    mismatched = after_df.filter(
        F.col("bucket") != F.pmod(F.xxhash64("conv_id"),
                                  F.lit(NEW_N)).cast("int")
    ).count()
    assert mismatched == 0
    assert _table_rows(spark, rb_out) == before


def test_rebucket_point_lookup_prunes_under_new_count(spark, rb_out):
    from conftest import scan_num_files

    ss = SinkSet(out_dir=rb_out)
    conv = ss.read_routed(spark).select("conv_id").first()["conv_id"]
    # read_conversation spans ALL sinks, including ignored
    want = sorted(
        ss._read_committed(spark).filter(F.col("conv_id") == conv)
        .select(*ROW_KEY).collect()
    )
    ss.rebucket(spark, NEW_N)

    ss2 = SinkSet(out_dir=rb_out)
    lookup = ss2.read_conversation(spark, conv)
    assert sorted(lookup.select(*ROW_KEY).collect()) == want
    # pruning: the lookup plans over a strict subset of the rewritten
    # run's files (one bucket of NEW_N, further narrowed by filestats)
    run_id = next(iter(
        {m["run_id"] for m in load_manifest(rb_out)["buckets"].values()}))
    run_dir = os.path.join(rb_out, "runs", run_id)
    total = sum(
        1 for _, _, fs in os.walk(run_dir)
        for f in fs if f.endswith(".parquet"))
    planned = scan_num_files(lookup, run_id)
    assert 0 < planned < total, (planned, total)


def test_rebucket_time_travel_hashes_under_old_count(spark, rb_out):
    ss = SinkSet(out_dir=rb_out)
    pre_snap = len(ss.snapshots()) - 1
    conv = ss.read_routed(spark).select("conv_id").first()["conv_id"]
    want = sorted(
        ss.read_conversation(spark, conv).select(*ROW_KEY).collect())

    ss.rebucket(spark, NEW_N)
    ss2 = SinkSet(out_dir=rb_out)
    assert ss2._n_buckets_as_of(pre_snap) == OLD_N
    got = sorted(
        ss2.read_conversation(spark, conv, as_of=pre_snap)
        .select(*ROW_KEY).collect())
    assert got == want
    # and the live lookup (new count) returns the same conversation
    live = sorted(
        ss2.read_conversation(spark, conv).select(*ROW_KEY).collect())
    assert live == want


def test_rollback_across_rebucket_restores_count(spark, rb_out):
    ss = SinkSet(out_dir=rb_out)
    pre_snap = len(ss.snapshots()) - 1
    before = _table_rows(spark, rb_out)
    pre_map = load_manifest(rb_out)["buckets"]

    ss.rebucket(spark, NEW_N)
    assert load_manifest(rb_out)["n_buckets"] == NEW_N

    SinkSet(out_dir=rb_out).rollback(pre_snap)
    manifest = load_manifest(rb_out)
    assert manifest["n_buckets"] == OLD_N
    assert manifest["buckets"] == pre_map
    assert _table_rows(spark, rb_out) == before
    # point lookup hashes under the restored count again
    conv = before[0]["conv_id"]
    got = SinkSet(out_dir=rb_out).read_conversation(spark, conv)
    assert got.count() > 0


def test_rebucket_commit_is_optimistic(spark, rb_out):
    ss = SinkSet(out_dir=rb_out)
    stale = {b: run for run, bs in ss._committed_by_run().items()
             for b in bs}
    # another writer repoints buckets between our read and our commit
    SinkSet(out_dir=rb_out).compact(spark, min_files_per_partition=1)
    manifest_mid = load_manifest(rb_out)

    rewriter = SinkSet(out_dir=rb_out)
    with pytest.raises(CommitConflict):
        rewriter.commit({0: {"rows": 0, "sinks": {}}},
                        n_buckets=NEW_N, expected_runs=stale,
                        replace_all=True)
    assert load_manifest(rb_out) == manifest_mid  # untouched

    # replace_all without expectations is refused outright
    with pytest.raises(ValueError, match="expected_runs"):
        SinkSet(out_dir=rb_out).commit(
            {0: {"rows": 0, "sinks": {}}}, n_buckets=NEW_N,
            replace_all=True)


def test_rebucket_guards(spark, rb_out):
    with pytest.raises(ValueError, match="already bucketed"):
        SinkSet(out_dir=rb_out).rebucket(spark, OLD_N)
    with pytest.raises(NotImplementedError, match="PARTITION FIELD"):
        SinkSet(out_dir=rb_out, fmt="iceberg").rebucket(spark, NEW_N)


def test_vacuum_collects_superseded_runs_after_rebucket(spark, rb_out):
    before = _table_rows(spark, rb_out)
    SinkSet(out_dir=rb_out).rebucket(spark, NEW_N)
    manifest = load_manifest(rb_out)
    live = {m["run_id"] for m in manifest["buckets"].values()}
    on_disk = set(os.listdir(os.path.join(rb_out, "runs")))
    assert on_disk - live, "old runs should be orphaned by the rebucket"
    removed = SinkSet(out_dir=rb_out).vacuum(min_age_minutes=0)
    assert set(removed) == on_disk - live
    assert _table_rows(spark, rb_out) == before


def test_changes_skips_rebucket_snapshot(spark, rb_out):
    """Incremental consumers must NOT see a rebucket as new data: the
    rewrite adds no records (every row was delivered by snapshots the
    consumer already saw). changes() across the boundary is an empty
    delta; changes() up to the boundary still answers."""
    ss = SinkSet(out_dir=rb_out)
    pre_snap = len(ss.snapshots()) - 1
    total = ss._read_committed(spark).count()

    ss.rebucket(spark, NEW_N)
    ss2 = SinkSet(out_dir=rb_out)
    post_snap = len(ss2.snapshots()) - 1
    assert post_snap == pre_snap + 1

    # the delta across JUST the rebucket is empty
    assert ss2.changes(spark, since=pre_snap, until=post_snap).count() == 0
    # a full-history delta still equals the table once (no double count)
    assert ss2.changes(spark, since=-1, until=post_snap).count() == total


def test_delete_after_rebucket_prunes_under_new_count(spark, rb_out):
    """Row ops keep working against the evolved bucket space: a delete
    after rebucket hashes its conv ids under the NEW count, rewrites
    only the hit buckets, and conserves everything else."""
    ss = SinkSet(out_dir=rb_out)
    ss.rebucket(spark, NEW_N)

    ss2 = SinkSet(out_dir=rb_out)
    total = ss2._read_committed(spark).count()
    conv = ss2._read_committed(spark).select("conv_id").first()["conv_id"]
    res = ss2.delete_conversations(spark, [conv])
    assert res["rows_deleted"] > 0
    assert len(res["rewritten_buckets"]) == 1
    b = res["rewritten_buckets"][0]
    # the rewritten bucket is the conv's bucket under the NEW count
    want_b = spark.range(1).select(
        F.pmod(F.xxhash64(F.lit(conv)), F.lit(NEW_N)).cast("int")
    ).first()[0]
    assert b == want_b and 0 <= b < NEW_N
    after = SinkSet(out_dir=rb_out)._read_committed(spark)
    assert after.filter(F.col("conv_id") == conv).count() == 0
    assert after.count() == total - res["rows_deleted"]
