"""Event-time range reads with file-level skipping
(SinkSet.read_time_range + the ts bounds in _filestats.json).

The honest clustering story, pinned here exactly as documented: files
are (conv_id, turn_idx)-sorted and compaction rolls each (bucket,
sink) into conv-contiguous files, so when conversation ids are
time-ordered (ULID/snowflake-style — id prefix encodes start time)
every compacted file covers a narrow event-time band and a range read
plans a small fraction of the files. With time-random ids it degrades
to a full plan, never a wrong one.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from logparse_spark.sinks import SinkSet

N_BUCKETS = 4
DAYS = 8
CONVS_PER_DAY = 12
TURNS = 10


@pytest.fixture(scope="module")
def ulid_table(spark, tmp_path_factory):
    """Committed + compacted table whose conv ids are time-ordered:
    conv '0310-c07' started on day 3 and all its turns fall within
    that day — the ULID-style correlation the skipping exploits."""
    out = str(tmp_path_factory.mktemp("ulid_table"))
    rows = []
    for d in range(DAYS):
        for c in range(CONVS_PER_DAY):
            conv = f"{d:02d}{10 + c}-c{c:02d}"
            for t in range(TURNS):
                rows.append((
                    conv, t, "user" if t % 2 == 0 else "assistant",
                    dt.datetime(2026, 3, 1 + d, 1 + c, t, 0),
                    "chat",
                ))
    df = (spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string, "
                  "ts timestamp_ntz, sink_id string")
          .withColumn("bucket",
                      F.pmod(F.xxhash64("conv_id"), F.lit(N_BUCKETS))
                      .cast("int"))
          # several write tasks per bucket -> small files, the state
          # compaction exists to fix
          .repartition(8))
    ss = SinkSet(out_dir=out)
    lineage = ss.write_classified(df)
    ss.commit(lineage, n_buckets=N_BUCKETS)
    # roll each bucket into ~4 conv-contiguous files (~2 days each:
    # 240 rows/bucket at a 60-row target)
    SinkSet(out_dir=out).compact(
        spark, min_files_per_partition=1, max_records_per_file=60)
    return out


def _collect(df):
    return sorted(map(tuple, df.select(
        "conv_id", "turn_idx", "sink_id", "ts").collect()))


def test_range_read_matches_full_filter(spark, ulid_table):
    ss = SinkSet(out_dir=ulid_table)
    lo, hi = dt.datetime(2026, 3, 3), dt.datetime(2026, 3, 5)
    got = _collect(ss.read_time_range(spark, lo, hi))
    want = _collect(
        ss._read_committed(spark).filter(
            (F.col("ts") >= F.lit(lo.isoformat(sep=" ")).cast("timestamp_ntz"))
            & (F.col("ts") < F.lit(hi.isoformat(sep=" ")).cast("timestamp_ntz"))))
    assert got and got == want
    # exactly days 3-4 (0-based days 2-3 -> conv prefix 02/03)
    assert {c[:2] for c, *_ in got} == {"02", "03"}


def test_range_read_skips_files(spark, ulid_table):
    """Runtime numFiles proof: a 1-of-8-day window plans well under
    half of the compacted table's files (each compacted file covers a
    ~2-day conv-contiguous band)."""
    from conftest import scan_num_files

    ss = SinkSet(out_dir=ulid_table)
    total = scan_num_files(ss._read_committed(spark), ulid_table)
    ranged = scan_num_files(
        ss.read_time_range(spark, dt.datetime(2026, 3, 3),
                           dt.datetime(2026, 3, 4)), ulid_table)
    assert ranged < total / 2, (ranged, total)


def test_iso_string_bounds_and_empty_window(spark, ulid_table):
    ss = SinkSet(out_dir=ulid_table)
    a = _collect(ss.read_time_range(spark, "2026-03-03", "2026-03-05"))
    b = _collect(ss.read_time_range(spark, dt.datetime(2026, 3, 3),
                                    dt.datetime(2026, 3, 5)))
    assert a == b
    # window before all data: zero rows, and still a valid plan
    assert ss.read_time_range(spark, "2020-01-01", "2020-01-02").count() == 0
    with pytest.raises(ValueError):
        ss.read_time_range(spark, "2026-03-05", "2026-03-03")


def test_missing_sidecar_degrades_to_full_plan(spark, ulid_table, tmp_path):
    """A run without ts bounds stays fully planned — skipping is an
    optimization, never a correctness dependency."""
    import os
    import shutil

    out = str(tmp_path / "nostats")
    shutil.copytree(ulid_table, out)
    for root, _, files in os.walk(out):
        for f in files:
            if f == "_filestats.json":
                os.unlink(os.path.join(root, f))
    ss = SinkSet(out_dir=out)
    got = _collect(ss.read_time_range(spark, dt.datetime(2026, 3, 3),
                                      dt.datetime(2026, 3, 5)))
    assert {c[:2] for c, *_ in got} == {"02", "03"}


def test_time_sorted_compaction_enables_skipping_for_random_ids(spark, tmp_path):
    """compact(sort_order='time') — the WRITE ORDERED BY lever: with
    time-RANDOM conv ids (where key-order compaction gives no ts
    clustering at all), time-order compaction rolls time-contiguous
    files and the range read skips, runtime-numFiles-proved. Result
    equality is asserted against the pre-compaction truth."""
    from conftest import scan_num_files

    out = str(tmp_path / "timesorted")
    rows = [(f"conv-{(i * 37) % 100:03d}-{i:03d}", t, "user",
             dt.datetime(2026, 3, 1 + (i * 13 + t) % DAYS, 8, i % 60, t), "chat")
            for i in range(100) for t in range(8)]
    df = (spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string, "
                  "ts timestamp_ntz, sink_id string")
          .withColumn("bucket",
                      F.pmod(F.xxhash64("conv_id"), F.lit(N_BUCKETS))
                      .cast("int"))
          .repartition(8))
    ss = SinkSet(out_dir=out)
    ss.commit(ss.write_classified(df), n_buckets=N_BUCKETS)
    before = _collect(SinkSet(out_dir=out)._read_committed(spark))

    res = SinkSet(out_dir=out).compact(
        spark, min_files_per_partition=1, max_records_per_file=50,
        sort_order="time")
    assert res["rewritten_buckets"]
    ss2 = SinkSet(out_dir=out)
    assert ss2.snapshots()[-1]["sort_order"] == "time"
    # compaction preserved the table exactly
    assert _collect(ss2._read_committed(spark)) == before

    lo, hi = dt.datetime(2026, 3, 2), dt.datetime(2026, 3, 3)
    got = _collect(ss2.read_time_range(spark, lo, hi))
    want = [r for r in before if lo <= r[3] < hi]
    assert got == want and got
    total = scan_num_files(ss2._read_committed(spark), out)
    ranged = scan_num_files(ss2.read_time_range(spark, lo, hi), out)
    assert ranged < total / 2, (ranged, total)


def test_time_range_time_travel_across_delete(spark, ulid_table, tmp_path):
    """as_of: a range read time-traveled to the pre-delete snapshot
    still sees the deleted conversation's rows; the live read does
    not. (The audit read for 'what was in that window before the
    GDPR delete'.)"""
    import shutil

    out = str(tmp_path / "tt")
    shutil.copytree(ulid_table, out)
    ss = SinkSet(out_dir=out)
    lo, hi = dt.datetime(2026, 3, 3), dt.datetime(2026, 3, 4)
    before = _collect(ss.read_time_range(spark, lo, hi))
    victim = before[0][0]
    pre_snapshot = len(ss.snapshots()) - 1
    ss.delete_conversations(spark, [victim])

    live = _collect(SinkSet(out_dir=out).read_time_range(spark, lo, hi))
    assert all(c != victim for c, *_ in live)
    travel = _collect(SinkSet(out_dir=out).read_time_range(
        spark, lo, hi, as_of=pre_snapshot))
    assert travel == before


def test_compact_rejects_unknown_sort_order(spark, ulid_table, tmp_path):
    import shutil

    out = str(tmp_path / "badorder")
    shutil.copytree(ulid_table, out)
    with pytest.raises(ValueError):
        SinkSet(out_dir=out).compact(spark, sort_order="hilbert")


def test_uncompacted_salted_table_still_correct(spark, tmp_path):
    """Pre-compaction (salt-sharded, time-random files): ranges stay
    exact even when no file can be skipped."""
    out = str(tmp_path / "salted")
    rows = [(f"conv-{i:03d}", t, "user",
             dt.datetime(2026, 3, 1 + (i * 7 + t) % DAYS, 12, 0, 0), "chat")
            for i in range(40) for t in range(5)]
    df = (spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string, "
                  "ts timestamp_ntz, sink_id string")
          .withColumn("bucket",
                      F.pmod(F.xxhash64("conv_id"), F.lit(N_BUCKETS))
                      .cast("int"))
          .repartition(8))
    ss = SinkSet(out_dir=out)
    ss.commit(ss.write_classified(df), n_buckets=N_BUCKETS)
    lo, hi = dt.datetime(2026, 3, 2), dt.datetime(2026, 3, 4)
    got = _collect(SinkSet(out_dir=out).read_time_range(spark, lo, hi))
    want = [r for r in sorted(
        (c, t, s, ts) for c, t, _, ts, s in rows) if lo <= r[3] < hi]
    assert got == want
