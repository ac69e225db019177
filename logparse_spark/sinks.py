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

    def write_classified(self, df: DataFrame) -> dict[int, dict]:
        """Single-pass fan-out write of ALL classified rows (ignored
        rows included, under sink_id=ignored with a null payload — at
        parquet level the constant columns dictionary-encode to almost
        nothing, and keeping them makes lineage a pure metadata read).

        Returns per-bucket lineage {bucket: {"rows": n, "sinks": {s: n}}}.

        One pass over the data: the upstream plan (scan -> parse ->
        enrich -> repartition) executes exactly once, inside this write
        action — no persist, no second parse. The sort key starts with
        the dynamic-partition column so the file writer's required
        ordering is pre-satisfied (single sequential open writer per
        task); (conv_id, turn_idx) after it preserves routed-row
        equality order within each sink. Lineage counts come from a
        column-pruned read-back of the files just written — the scan
        touches only the int `bucket` column + the sink_id dir value,
        a few MB per GB of data.
        """
        cols = ["bucket", "sink_id", "conv_id", "turn_idx", "role", "ts",
                "rule_id", "rule_name", "action", "rendered",
                # enrichment outputs (J1): the broadcast lookup joins
                # are load-bearing — their columns land in the sinks
                "role_class", "weight", "tool_family", "is_privileged"]
        keep = [c for c in cols if c in df.columns]
        out = df.select(*keep).sortWithinPartitions("sink_id", "conv_id", "turn_idx")
        if self.fmt == "iceberg":
            self._write_iceberg(out)
        else:
            (
                out.write.mode("append")
                .partitionBy("sink_id")
                .parquet(self._run_dir())
            )
        spark = df.sparkSession
        if self.fmt == "iceberg":
            # production refinement: scope to the just-committed snapshot
            # via VERSION AS OF; a fresh table has exactly this run's rows
            readback = spark.read.table(self.table)
        else:
            readback = spark.read.parquet(self._run_dir())
        # the session's tiny maxPartitionBytes exists to parallelize the
        # SOURCE scan; for this metadata-ish read (one int column of
        # files we just wrote, fan-out = many small files) it would
        # spawn hundreds of near-empty tasks whose scheduling overhead
        # dwarfs the read — lift it for the duration of the count
        key = "spark.sql.files.maxPartitionBytes"
        prev = spark.conf.get(key)
        spark.conf.set(key, "128m")
        try:
            stats = readback.groupBy("bucket", "sink_id").count().collect()
        finally:
            spark.conf.set(key, prev)
        lineage: dict[int, dict] = {}
        for r in stats:
            b = int(r["bucket"])
            entry = lineage.setdefault(b, {"rows": 0, "sinks": {}})
            entry["rows"] += int(r["count"])
            entry["sinks"][str(r["sink_id"])] = int(r["count"])
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
        manifest["history"].append(
            {
                "run_id": self.run_id,
                "committed_buckets": sorted(int(b) for b in lineage),
                "wall_time": time.time(),
                **(extra or {}),
            }
        )
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
