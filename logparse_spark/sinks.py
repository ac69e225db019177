"""Sink abstraction: fan-out writes + atomic manifest commit + lineage.

Production target is Iceberg (snapshot commit, bucket(B, conv_id)
partitioning — BASELINE.json:6); this sandbox has no Iceberg runtime
jar (SURVEY.md §M4), so the same protocol is implemented over parquet
with an atomic JSON manifest standing in for the snapshot:

  out_dir/
    _manifest/committed.json   atomic (tmp+rename); maps bucket ->
                               {run_id, rows, per-sink rows}  == lineage
    runs/<run_id>/bucket=<b>/sink_id=<s>/part-*.parquet

Readers only trust buckets listed in the manifest, so a job killed
mid-write leaves no visible partial state; a resumed run re-processes
exactly the uncommitted buckets (exactly-once at bucket granularity).
The per-(stage,bucket) row counts stored alongside are the
"per-partition lineage and row-count metrics" the north rule requires.

Lineage protocol (ONE pass over the data, ZERO read-back):
  - ``bucket`` and ``sink_id`` are both write-partition columns, so
    exact per-(bucket, sink) row counts come from the parquet FOOTERS
    of the files the write just produced — pure metadata (~KB per
    file), never a second scan of the data. This is precisely how an
    Iceberg commit gets its per-partition stats (manifest-file row
    counts); on the Iceberg branch the snapshot itself carries them.
  - A write-time ``Observation`` rides the same action with a
    conservation total plus per-sink ``approx_count_distinct(conv_id)``
    cardinality. Deliberately per-SINK, not per-(bucket, sink): every
    observed aggregate is evaluated for EVERY row, so B x S metrics
    cost O(B*S) per row (6k+ branch evaluations/row at 1024 buckets) —
    a throughput cliff. S HLL sketches are a handful of updates per
    row, and per-bucket conversation counts are ~convs/B by xxhash64
    uniformity anyway; the exact per-bucket ROW counts come free from
    the footers above.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_DIR = "_manifest"
MANIFEST_FILE = "committed.json"


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, MANIFEST_DIR, MANIFEST_FILE)


def load_manifest(out_dir: str) -> dict:
    p = _manifest_path(out_dir)
    if not os.path.exists(p):
        return {"buckets": {}, "history": []}
    with open(p, encoding="utf-8") as f:
        return json.load(f)


def _atomic_write_json(path: str, obj: dict) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + f".tmp.{uuid.uuid4().hex}"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)  # atomic on POSIX


def committed_buckets(out_dir: str) -> set[int]:
    return {int(b) for b in load_manifest(out_dir)["buckets"]}


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg runtime + catalog is on the classpath."""
    try:
        # py4j attribute access never fails (returns a lazy JavaPackage);
        # only an actual classload proves the jar is present
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.Table")
        return True
    except Exception:
        return False


@dataclass
class SinkSet:
    """A fan-out sink group rooted at ``out_dir`` (fmt="parquet") or an
    Iceberg table identifier (fmt="iceberg", ``table`` like
    "cat.db.routed")."""

    out_dir: str
    fmt: str = "parquet"  # "iceberg" branch activates where the jar exists
    table: str | None = None  # iceberg table identifier
    run_id: str = field(default_factory=lambda: uuid.uuid4().hex[:12])
    # per-sink approx conv cardinality from the last write's Observation
    _convs_approx: dict[str, int] | None = field(default=None, repr=False)
    _written: bool = field(default=False, repr=False)

    def _run_dir(self) -> str:
        return os.path.join(self.out_dir, "runs", self.run_id)

    def _write_iceberg(self, out: DataFrame) -> None:
        """Iceberg branch: create-if-absent with the production
        partition spec — bucket(conv_id) via the precomputed ``bucket``
        column plus identity(sink_id) — then snapshot-append. The
        manifest/lineage protocol stays identical (Iceberg's own
        snapshot is then authoritative for readers; ours remains the
        resume ledger). Exercised only where the runtime jar exists —
        this sandbox has none, so the guard raises immediately instead
        of failing deep inside py4j."""
        spark = out.sparkSession
        if not iceberg_available(spark):
            raise RuntimeError(
                "fmt='iceberg' requires the iceberg-spark-runtime jar and a "
                "configured catalog; this environment has neither "
                "(SURVEY.md M4) — use fmt='parquet'"
            )
        if not self.table:
            raise ValueError("fmt='iceberg' needs table='cat.db.name'")
        writer = out.writeTo(self.table).partitionedBy("sink_id", "bucket")
        try:
            writer.append()
        except Exception as e:  # first write: table doesn't exist yet
            if "TABLE_OR_VIEW_NOT_FOUND" in str(e) or "does not exist" in str(e):
                writer.create()
            else:
                raise

    def write_classified(self, df: DataFrame,
                         sinks: list[str] | None = None) -> dict[int, dict]:
        """Single-pass fan-out write of ALL classified rows (ignored
        rows included, under sink_id=ignored with a null payload — at
        parquet level the constant columns dictionary-encode to almost
        nothing, and keeping them makes lineage a pure metadata read).

        Returns per-bucket lineage {bucket: {"rows": n, "sinks": {s: n}}}.

        One pass over the data, ONE job: the upstream plan (scan ->
        parse -> enrich -> repartition) executes exactly once, inside
        this write action — no persist, no second parse, and no
        read-back of the written output. Lineage row counts come from
        the parquet footers of the files this run just wrote (see
        module docstring); an ``Observation`` on the same action
        cross-checks conservation (sum of footer counts must equal the
        observed total) and, when ``sinks`` names the expected sink
        ids, records per-sink ``approx_count_distinct(conv_id)``
        cardinality into the manifest at commit.

        The sort key starts with the two dynamic-partition columns so
        the file writer's required ordering is pre-satisfied (single
        sequential open writer per task); (conv_id, turn_idx) after
        them preserves routed-row equality order within each sink.
        """
        from pyspark.sql import Observation

        if self._written:
            # the footer walk counts EVERY file under this run's dir, so
            # a second write through the same instance would double-count
            # the first write's rows against the second's Observation and
            # trip the conservation check — one write per SinkSet run
            raise RuntimeError(
                "this SinkSet already wrote run "
                f"{self.run_id!r}; create a new SinkSet (new run_id) for "
                "each write_classified call"
            )
        self._written = True
        cols = ["bucket", "sink_id", "conv_id", "turn_idx", "role", "ts",
                "rule_id", "rule_name", "action", "rendered",
                # enrichment outputs (J1): the broadcast lookup joins
                # are load-bearing — their columns land in the sinks
                "role_class", "weight", "tool_family", "is_privileged"]
        keep = [c for c in cols if c in df.columns]
        obs = Observation()
        metrics = [F.count(F.lit(1)).alias("rows_total")]
        for i, s in enumerate(sinks or []):
            metrics.append(
                F.approx_count_distinct(
                    F.when(F.col("sink_id") == s, F.col("conv_id"))
                ).alias(f"convs_{i}")
            )
        out = (
            df.select(*keep)
            .observe(obs, *metrics)
            .sortWithinPartitions("bucket", "sink_id", "conv_id", "turn_idx")
        )
        if self.fmt == "iceberg":
            self._write_iceberg(out)
        else:
            (
                out.write.mode("append")
                .partitionBy("bucket", "sink_id")
                .parquet(self._run_dir())
            )
        got = obs.get  # blocks until the (already finished) action reports
        if self.fmt == "iceberg":
            # guard-only in this sandbox (no runtime jar): an Iceberg
            # snapshot carries per-partition stats natively; reading the
            # just-committed snapshot is the stand-in until then
            readback = df.sparkSession.read.table(self.table)
            stats = readback.groupBy("bucket", "sink_id").count().collect()
            lineage: dict[int, dict] = {}
            for r in stats:
                entry = lineage.setdefault(int(r["bucket"]), {"rows": 0, "sinks": {}})
                entry["rows"] += int(r["count"])
                entry["sinks"][str(r["sink_id"])] = int(r["count"])
        else:
            lineage = self._lineage_from_footers()
        total = sum(e["rows"] for e in lineage.values())
        if total != int(got["rows_total"]):
            raise RuntimeError(
                f"lineage conservation violated: footers count {total} rows, "
                f"write observed {got['rows_total']} — output files missing "
                f"or foreign files present under {self._run_dir()}"
            )
        if sinks:
            self._convs_approx = {
                s: int(got[f"convs_{i}"]) for i, s in enumerate(sinks)
            }
        return lineage

    def _lineage_from_footers(self) -> dict[int, dict]:
        """Exact per-(bucket, sink) row counts from the parquet footers
        of THIS run's files — metadata-only (the Iceberg-manifest
        pattern), no Spark job, no data read. Driver-side O(files);
        on a real deployment the table format's own commit metadata
        replaces this walk outright."""
        import pyarrow.parquet as pq

        run_dir = self._run_dir()
        lineage: dict[int, dict] = {}
        for root, _, files in os.walk(run_dir):
            pfs = [f for f in files if f.endswith(".parquet")]
            if not pfs:
                continue
            parts = dict(
                seg.split("=", 1)
                for seg in os.path.relpath(root, run_dir).split(os.sep)
                if "=" in seg
            )
            b, s = int(parts["bucket"]), parts["sink_id"]
            n = sum(
                pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
                for f in pfs
            )
            entry = lineage.setdefault(b, {"rows": 0, "sinks": {}})
            entry["rows"] += n
            entry["sinks"][s] = entry["sinks"].get(s, 0) + n
        return lineage

    def commit(self, lineage: dict[int, dict], extra: dict | None = None) -> None:
        """Atomically publish buckets (the Iceberg-snapshot stand-in)."""
        manifest = load_manifest(self.out_dir)
        for b, entry in lineage.items():
            manifest["buckets"][str(b)] = {
                "run_id": self.run_id,
                "rows": entry["rows"],
                "sinks": entry["sinks"],
            }
        entry = {
            "run_id": self.run_id,
            "committed_buckets": sorted(int(b) for b in lineage),
            "wall_time": time.time(),
            **(extra or {}),
        }
        if self._convs_approx is not None:
            # per-sink approx_count_distinct(conv_id) from the write's
            # Observation — the cardinality metric rides the manifest
            entry["convs_approx"] = dict(self._convs_approx)
        manifest["history"].append(entry)
        _atomic_write_json(_manifest_path(self.out_dir), manifest)

    # -- read side -----------------------------------------------------

    def read_routed(self, spark: SparkSession) -> DataFrame:
        """Read committed routed rows — uncommitted runs are invisible,
        like reading an Iceberg snapshot. The ignored sink is excluded
        by partition pruning; count_key is re-derived (== rendered for
        count rules) so readers see the full MATCH_COLUMNS shape."""
        manifest = load_manifest(self.out_dir)
        if not manifest["buckets"]:
            raise FileNotFoundError(f"no committed buckets under {self.out_dir}")
        # group committed buckets by the run that produced them
        by_run: dict[str, list[int]] = {}
        for b, meta in manifest["buckets"].items():
            by_run.setdefault(meta["run_id"], []).append(int(b))
        frames = []
        for run_id, bs in sorted(by_run.items()):
            base = os.path.join(self.out_dir, "runs", run_id)
            df = spark.read.option("basePath", base).parquet(base)
            frames.append(df.filter(F.col("bucket").isin(bs)))
        out = frames[0]
        for f_ in frames[1:]:
            out = out.unionByName(f_)
        out = out.filter(F.col("sink_id") != "ignored")
        if "count_key" not in out.columns and "action" in out.columns:
            out = out.withColumn(
                "count_key",
                F.when(F.col("action") == "count", F.col("rendered")).cast("string"),
            )
        return out

    # -- maintenance (Iceberg rewrite_data_files / expire_snapshots
    #    stand-ins) ------------------------------------------------------

    def compact(self, spark: SparkSession,
                min_files_per_partition: int = 2) -> dict:
        """Rewrite committed buckets' small files into one file per
        (bucket, sink_id) and atomically repoint the manifest — the
        parquet stand-in for Iceberg's ``rewrite_data_files`` +
        snapshot swap.

        Why this exists at 100 TB: fan-out writes shard each bucket
        partition across every task that held rows for it (tasks x
        sinks files per run), and resumed/multi-run tables accrete
        runs. Scans then pay per-file open + footer costs and lose
        row-group locality. Compaction is a bucket-parallel rewrite:
        one shuffle keyed on the existing ``bucket`` column (no
        re-hash of conv_id needed), each task writes exactly its
        bucket's partitions, sorted by (sink_id, conv_id, turn_idx) so
        routed-row order is preserved within every sink.

        Safety: the rewrite lands in a NEW run dir; the manifest swap
        happens only after parquet-footer counts from the new files
        match the committed lineage exactly (same conservation check
        as write_classified). A crash mid-compaction leaves the old
        manifest intact and only an unreferenced run dir behind
        (collected by ``vacuum``). Buckets already at or under
        ``min_files_per_partition`` files per partition are left in
        place (their old run stays referenced for them).

        Returns {"rewritten_buckets": [...], "files_before": n,
        "files_after": n}.
        """
        if self.fmt == "iceberg":
            raise RuntimeError(
                "compact() is the parquet-manifest stand-in; on the Iceberg "
                "branch use the native CALL catalog.system.rewrite_data_files"
                "(table) procedure — the table format owns its file layout"
            )
        manifest = load_manifest(self.out_dir)
        if not manifest["buckets"]:
            raise FileNotFoundError(f"no committed buckets under {self.out_dir}")

        # survey committed (bucket -> run, files) from the filesystem;
        # skip buckets already compact
        todo: dict[int, str] = {}
        files_before = 0
        for b, meta in manifest["buckets"].items():
            base = os.path.join(self.out_dir, "runs", meta["run_id"],
                                f"bucket={int(b)}")
            n_files = max(
                (len([f for f in fs if f.endswith(".parquet")])
                 for _, _, fs in os.walk(base)),
                default=0,
            )
            files_before += sum(
                len([f for f in fs if f.endswith(".parquet")])
                for _, _, fs in os.walk(base)
            )
            if n_files >= min_files_per_partition:
                todo[int(b)] = meta["run_id"]
        if not todo:
            return {"rewritten_buckets": [], "files_before": files_before,
                    "files_after": files_before}

        compactor = SinkSet(out_dir=self.out_dir, fmt=self.fmt)
        by_run: dict[str, list[int]] = {}
        for b, run_id in todo.items():
            by_run.setdefault(run_id, []).append(b)
        frames = []
        for run_id, bs in sorted(by_run.items()):
            base = os.path.join(self.out_dir, "runs", run_id)
            df = spark.read.option("basePath", base).parquet(base)
            frames.append(df.filter(F.col("bucket").isin(bs)))
        out = frames[0]
        for f_ in frames[1:]:
            out = out.unionByName(f_)
        (
            # one task per bucket -> one file per (bucket, sink_id)
            out.repartition(len(todo), "bucket")
            .sortWithinPartitions("bucket", "sink_id", "conv_id", "turn_idx")
            .write.mode("append").partitionBy("bucket", "sink_id")
            .parquet(compactor._run_dir())
        )
        new_lineage = compactor._lineage_from_footers()
        # conservation: the rewrite must carry every committed row
        for b in todo:
            old = manifest["buckets"][str(b)]
            got = new_lineage.get(b)
            if got is None or got["rows"] != old["rows"] or \
                    got["sinks"] != old["sinks"]:
                raise RuntimeError(
                    f"compaction conservation violated for bucket {b}: "
                    f"committed {old!r}, rewrite produced {got!r} — "
                    f"manifest left untouched"
                )
        compactor.commit(new_lineage, extra={"compaction_of": sorted(by_run)})
        files_after = files_before
        for b in todo:
            base = os.path.join(compactor._run_dir(), f"bucket={b}")
            files_after += sum(
                len([f for f in fs if f.endswith(".parquet")])
                for _, _, fs in os.walk(base)
            )
            old_base = os.path.join(self.out_dir, "runs", todo[b], f"bucket={b}")
            files_after -= sum(
                len([f for f in fs if f.endswith(".parquet")])
                for _, _, fs in os.walk(old_base)
            )
        return {"rewritten_buckets": sorted(todo), "files_before": files_before,
                "files_after": files_after}

    def vacuum(self) -> list[str]:
        """Delete run directories no manifest bucket references (the
        ``expire_snapshots`` + ``remove_orphan_files`` stand-in).
        Safe by construction: readers resolve data only through the
        manifest, which is swapped atomically, so an unreferenced run
        is invisible the instant vacuum could touch it. Returns the
        removed run_ids."""
        import shutil

        manifest = load_manifest(self.out_dir)
        live = {meta["run_id"] for meta in manifest["buckets"].values()}
        runs_dir = os.path.join(self.out_dir, "runs")
        removed = []
        if os.path.isdir(runs_dir):
            for run_id in sorted(os.listdir(runs_dir)):
                if run_id not in live:
                    shutil.rmtree(os.path.join(runs_dir, run_id))
                    removed.append(run_id)
        return removed

    def lineage_df(self, spark: SparkSession) -> DataFrame:
        """The _lineage metrics as a queryable DataFrame."""
        manifest = load_manifest(self.out_dir)
        rows = []
        for b, meta in manifest["buckets"].items():
            for sink, n in meta["sinks"].items():
                rows.append((int(b), meta["run_id"], sink, int(n)))
        return spark.createDataFrame(
            rows or [(None, None, None, None)],
            "bucket int, run_id string, sink_id string, rows long",
        ).filter(F.col("bucket").isNotNull())

    def sink_cardinality_df(self, spark: SparkSession) -> DataFrame:
        """Per-(run, sink) approx conversation cardinality recorded by
        the write-time Observation (n_convs_approx = HLL
        approx_count_distinct(conv_id), default 5% rsd)."""
        manifest = load_manifest(self.out_dir)
        rows = []
        for h in manifest["history"]:
            for sink, n in (h.get("convs_approx") or {}).items():
                rows.append((h["run_id"], sink, int(n)))
        return spark.createDataFrame(
            rows or [(None, None, None)],
            "run_id string, sink_id string, n_convs_approx long",
        ).filter(F.col("run_id").isNotNull())
