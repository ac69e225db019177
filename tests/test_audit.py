"""Write-audit-publish gate (logparse_spark/audits.py): expectations
evaluated on the STAGED (written, uncommitted) run before the manifest
swap — the parquet-manifest analogue of Iceberg's WAP branch.

Properties locked in:
  - a violated audit aborts the publish: the manifest is bit-identical
    to before, readers see nothing new, and the staged run dir is an
    orphan that vacuum's min-age guard spares and explicit vacuum
    collects (== dropping the WAP branch);
  - committed earlier groups STAND across a later group's audit
    failure, and a fixed rerun resumes past them to completion;
  - expect() reports EVERY violated expectation in one failure (one
    aggregation pass, no whack-a-mole), and a passing audit publishes
    a table bit-identical to an unaudited run.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from logparse_spark import audits, pipeline
from logparse_spark.audits import AuditFailed
from logparse_spark.rules import load_rules
from logparse_spark.sinks import SinkSet, load_manifest

RULES = "/root/repo/rules/default.rules"


def _src(fixture_sf_small):
    return f"{fixture_sf_small}/transcripts.parquet"


def _run(spark, fixture_sf_small, out, **kw):
    return pipeline.run(
        spark, source_path=_src(fixture_sf_small), out_dir=str(out),
        rules_path=RULES, dict_dir=fixture_sf_small,
        buckets=8, salt_buckets=4, **kw,
    )


def test_failed_audit_publishes_nothing_and_orphan_is_collectable(
        spark, fixture_sf_small, tmp_path):
    out = tmp_path / "t"
    with pytest.raises(AuditFailed, match="rows_at_least"):
        _run(spark, fixture_sf_small, out,
             audit=audits.expect(audits.rows_at_least(10**9)))

    # nothing published: no committed buckets, manifest empty
    manifest = load_manifest(str(out))
    assert manifest["buckets"] == {} and manifest["history"] == []
    with pytest.raises(FileNotFoundError):
        SinkSet(out_dir=str(out))._read_committed(spark)
    # the staged files are an orphan run: min-age guard spares it,
    # explicit vacuum drops it (the dropped-WAP-branch lifecycle)
    runs = os.listdir(out / "runs")
    assert len(runs) == 1
    assert SinkSet(out_dir=str(out)).vacuum() == []
    assert SinkSet(out_dir=str(out)).vacuum(min_age_minutes=0) == runs
    assert os.listdir(out / "runs") == []


def test_passing_audit_publishes_identically_to_unaudited(
        spark, fixture_sf_small, tmp_path):
    compiled = load_rules(RULES)
    gate = audits.expect(
        audits.rows_at_least(1),
        audits.keys_never_null(),
        audits.unmatched_fraction_below(0.9),
        audits.null_fraction_below("role_class", 0.9),
        audits.sinks_within(compiled.sink_ids),
    )
    a, b = tmp_path / "audited", tmp_path / "plain"
    _run(spark, fixture_sf_small, a, audit=gate)
    _run(spark, fixture_sf_small, b)
    key = ["bucket", "sink_id", "conv_id", "turn_idx", "rendered"]
    got = SinkSet(out_dir=str(a))._read_committed(spark).select(*key)
    want = SinkSet(out_dir=str(b))._read_committed(spark).select(*key)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_expect_reports_every_violation_once(spark, fixture_sf_small,
                                             tmp_path):
    with pytest.raises(AuditFailed) as ei:
        _run(spark, fixture_sf_small, tmp_path / "t",
             audit=audits.expect(
                 audits.rows_at_least(10**9),
                 audits.unmatched_fraction_below(0.0),
                 audits.sinks_within(["only_this"]),
             ))
    msg = str(ei.value)
    assert "rows_at_least" in msg
    assert "unmatched_fraction_below" in msg
    assert "sinks_within" in msg


def test_earlier_groups_stand_and_fixed_rerun_resumes(
        spark, fixture_sf_small, tmp_path):
    """Group 0 publishes; group 1 trips the gate. The table keeps
    group 0 (resumable semantics), and a rerun with a passing gate
    finishes ONLY the remaining buckets."""
    out = tmp_path / "t"
    calls = {"n": 0}

    def flaky_gate(staged):
        calls["n"] += 1
        if calls["n"] >= 2:
            raise AuditFailed("injected: group 1 fails its audit")

    with pytest.raises(AuditFailed, match="injected"):
        _run(spark, fixture_sf_small, out, groups=2, audit=flaky_gate)

    ss = SinkSet(out_dir=str(out))
    snaps = ss.snapshots()
    assert len(snaps) == 1  # exactly group 0 published
    g0 = set(snaps[0]["committed_buckets"])
    assert g0 and g0 < set(range(8))

    res = _run(spark, fixture_sf_small, out, groups=2,
               audit=audits.expect(audits.rows_at_least(1)))
    assert set(res.skipped_buckets) == g0
    assert set(res.processed_buckets) == set(range(8)) - g0
    # complete and consistent: every turn accounted for exactly once
    n = SinkSet(out_dir=str(out))._read_committed(spark).count()
    assert n == spark.read.parquet(_src(fixture_sf_small)).count()


def test_audit_refuses_empty_staging_and_iceberg(spark, fixture_sf_small,
                                                 tmp_path):
    # a rules file whose audit runs against zero staged files: filter
    # everything out pre-write by pointing at an empty source
    empty = str(tmp_path / "empty.parquet")
    spark.read.parquet(_src(fixture_sf_small)).limit(0) \
        .coalesce(1).write.parquet(empty)
    with pytest.raises(AuditFailed, match="ZERO files"):
        pipeline.run(
            spark, source_path=empty, out_dir=str(tmp_path / "t"),
            rules_path=RULES, buckets=4, salt_buckets=2,
            audit=audits.expect(audits.rows_at_least(1)),
        )
    with pytest.raises((ValueError, RuntimeError), match="WAP|Iceberg"):
        pipeline.run(
            spark, source_path=_src(fixture_sf_small),
            out_dir=str(tmp_path / "t2"), rules_path=RULES,
            sink_format="iceberg", sink_table="cat.db.t",
            audit=audits.expect(audits.rows_at_least(1)),
        )
