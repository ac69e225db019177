"""Incrementally-maintained materialized aggregate over the routed
table — the lakehouse incremental-view-maintenance pattern.

At 10^12 turns the dashboard aggregate ("rows per sink per day")
cannot be recomputed by rescanning the table on every refresh. This
view keeps a tiny parquet summary plus a watermark of the last
snapshot it absorbed; ``refresh()`` reads ONLY the delta snapshots
via :meth:`SinkSet.changes` (the IncrementalAppendScan), folds them
into the summary, and atomically repoints the view. When the delta
range crosses a row-level modification (delete / merge / rollback —
``changes()`` refuses, exactly like Iceberg), the refresh degrades to
ONE full recompute and the incremental path resumes from there.

The view swap mirrors the sink-manifest protocol: each refresh writes
a new ``v<uuid>`` directory and atomically replaces ``_view.json``
(pointer + watermark); a crash mid-refresh leaves the old view
readable and the orphan directory collectable. Superseded view
versions are retained for ``min_age_minutes`` after the swap (same
grace discipline as :meth:`SinkSet.vacuum`): a reader that loaded the
old pointer just before the swap can still finish its scan; each
refresh sweeps only versions older than the grace window.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sinks import SinkSet, _atomic_write_json


class SinkDailyCounts:
    """rows per (sink_id, day) — the running ops dashboard table."""

    def __init__(self, table_dir: str, view_dir: str,
                 min_age_minutes: float = 30.0) -> None:
        self.table_dir = table_dir
        self.view_dir = view_dir
        # grace window before a superseded view version is deleted
        self.min_age_minutes = min_age_minutes

    def _state_path(self) -> str:
        return os.path.join(self.view_dir, "_view.json")

    def _state(self) -> dict | None:
        try:
            with open(self._state_path(), encoding="utf-8") as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    @staticmethod
    def _aggregate(df: DataFrame) -> DataFrame:
        return (
            df.filter(F.col("sink_id") != "ignored")
            .groupBy("sink_id",
                     F.date_trunc("day", "ts").alias("day"))
            .agg(F.count(F.lit(1)).alias("n"))
        )

    def read(self, spark: SparkSession) -> DataFrame:
        st = self._state()
        if st is None:
            raise FileNotFoundError(
                f"no materialized view under {self.view_dir} — refresh() first")
        return spark.read.parquet(os.path.join(self.view_dir, st["data"]))

    def refresh(self, spark: SparkSession) -> dict:
        """Absorb snapshots newer than the watermark. Returns
        {"mode": "noop" | "incremental" | "full", "snapshot": w}."""
        ss = SinkSet(out_dir=self.table_dir)
        latest = len(ss.snapshots()) - 1
        st = self._state()
        last = st["snapshot"] if st else -1
        if latest == last:
            self._sweep_stale(current=st["data"] if st else None)
            return {"mode": "noop", "snapshot": latest}
        mode = "incremental" if st else "full"
        if st and last > latest:
            # table recreated/reset under the same view dir: the
            # watermark points past the snapshot log — re-baseline
            mode = "full"
        elif st:
            try:
                delta = self._aggregate(
                    ss.changes(spark, since=last, until=latest))
                merged = (
                    self.read(spark).unionByName(delta)
                    .groupBy("sink_id", "day").agg(F.sum("n").alias("n"))
                )
            except (ValueError, IndexError):
                # delta crosses a delete/merge/rollback (ValueError) or
                # the snapshot log is shorter than the watermark
                # implies (IndexError, table reset): one full recompute
                # re-baselines the view
                mode = "full"
        if mode == "full":
            merged = self._aggregate(ss.read_routed(spark))
        new = f"v{uuid.uuid4().hex[:12]}"
        out = os.path.join(self.view_dir, new)
        # the summary is tiny (sinks x days): one file reads fastest
        merged.coalesce(1).write.mode("overwrite").parquet(out)
        _atomic_write_json(self._state_path(),
                           {"snapshot": latest, "data": new})
        self._sweep_stale(current=new)
        return {"mode": mode, "snapshot": latest}

    def _sweep_stale(self, current: str | None) -> None:
        """Delete superseded ``v*`` version dirs older than the grace
        window. Never touches the current pointer target; a version
        that was JUST superseded survives until it ages out, so
        in-flight readers of the old pointer finish cleanly."""
        cutoff = time.time() - self.min_age_minutes * 60.0
        try:
            entries = os.listdir(self.view_dir)
        except FileNotFoundError:
            return
        for name in entries:
            if name == current or not name.startswith("v"):
                continue
            p = os.path.join(self.view_dir, name)
            try:
                if os.path.isdir(p) and os.path.getmtime(p) < cutoff:
                    shutil.rmtree(p, ignore_errors=True)
            except OSError:
                continue
