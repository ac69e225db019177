"""End-to-end orchestration: parse -> enrich -> route -> aggregate.

``run()`` is the production entry point (shipped via
``spark-submit --py-files``, see jobs/submit_pipeline.py). It processes
the input in bucket *groups*, committing each group atomically to the
sink manifest, so a killed run resumes from the last committed group
(north rule: "resumable from checkpoint with per-partition lineage +
metrics").
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import stages
from .rules import CompiledRules, load_rules
from .sinks import SinkSet, committed_buckets


@dataclass
class RunResult:
    out_dir: str
    processed_buckets: list[int]
    skipped_buckets: list[int]
    total_rows_processed: int


def _load_dicts(spark: SparkSession, dict_dir: str) -> tuple[DataFrame, DataFrame]:
    role_dict = spark.read.parquet(os.path.join(dict_dir, "role_dict.parquet"))
    tool_dict = spark.read.parquet(os.path.join(dict_dir, "tool_dict.parquet"))
    return role_dict, tool_dict


def classify(
    df: DataFrame,
    compiled: CompiledRules,
    role_dict: DataFrame | None = None,
    tool_dict: DataFrame | None = None,
    buckets: int = 64,
    salt_buckets: int = 8,
    hot_convs: list[str] | None = None,
    engine: str = "udf",
) -> DataFrame:
    """The full logical plan, no actions:
    parse(slim) -> bucket/salt exchange -> rule metadata -> enrich.

    The parse runs on scan partitions (row groups spread hot
    conversations naturally, so the UDF stage has no skew), and the
    ONE shuffle happens right after it carrying only the minimal
    parsed record (ids, role, tool, ts, rule_id int32, rendered):
    `text` is dropped before the exchange, and every
    constant/dictionary decoration — rule_name/action/sink_id from
    rule_id, role/tool enrichment — happens AFTER the exchange via
    broadcast hash joins on the bucket-partitioned stream, so those
    strings never cross the wire. `tool` crosses (it is the post-
    shuffle enrich key) and is dropped after the join; the enrichment
    columns land in the routed sinks (J1 is load-bearing, not
    decorative)."""
    out = stages.parse_match_slim(df, compiled, engine=engine)
    out = out.drop("text")
    out = stages.bucket_and_salt(out, buckets, salt_buckets, hot_convs)
    out = stages.attach_rule_metadata(out, compiled)
    if role_dict is not None and tool_dict is not None:
        out = stages.enrich(out, role_dict, tool_dict)
    return out.drop("tool")


def run(
    spark: SparkSession,
    source_path: str,
    out_dir: str,
    rules_path: str = "/root/repo/rules/default.rules",
    dict_dir: str | None = None,
    buckets: int = 64,
    salt_buckets: int = 8,
    groups: int = 1,
    resume: bool = True,
    hot_threshold: int | None = None,
    engine: str = "udf",
    sink_format: str = "parquet",
    sink_table: str | None = None,  # iceberg table id when sink_format=iceberg
    fail_after_groups: int | None = None,  # test hook: simulate a crash
) -> RunResult:
    compiled = load_rules(rules_path)
    stages.tune_scan_splits(spark, source_path)
    df = stages.read_transcripts(spark, source_path)

    role_dict = tool_dict = None
    if dict_dir:
        role_dict, tool_dict = _load_dicts(spark, dict_dir)

    hot: list[str] | None = None
    if hot_threshold is not None:
        hot = stages.detect_hot_convs(df, hot_threshold)

    done = committed_buckets(out_dir) if resume else set()
    pending = [b for b in range(buckets) if b not in done]
    group_sz = max(1, (len(pending) + groups - 1) // groups) if pending else 1
    bucket_groups = [pending[i : i + group_sz] for i in range(0, len(pending), group_sz)]

    processed: list[int] = []
    total_rows = 0
    for gi, group in enumerate(bucket_groups):
        if fail_after_groups is not None and gi >= fail_after_groups:
            raise RuntimeError(f"injected failure before group {gi}")
        gdf = df.withColumn(
            "bucket", F.pmod(F.xxhash64("conv_id"), F.lit(buckets)).cast("int")
        )
        # partition pruning analogue: only this group's buckets are read
        # forward (with Iceberg bucket partitioning this prunes at scan)
        gdf = gdf.filter(F.col("bucket").isin(group)).drop("bucket")
        cdf = classify(
            gdf, compiled, role_dict, tool_dict,
            buckets=buckets, salt_buckets=salt_buckets, hot_convs=hot, engine=engine,
        )
        # single pass: ONE action writes every classified row (ignored
        # included); lineage row counts come from the written files'
        # parquet footers and cardinality from a write-time Observation
        # — no persist, no read-back, the parse UDF runs exactly once
        sink = SinkSet(out_dir=out_dir, fmt=sink_format, table=sink_table)
        lineage = sink.write_classified(cdf, sinks=compiled.sink_ids)
        # buckets with zero rows still need committing
        for b in group:
            lineage.setdefault(b, {"rows": 0, "sinks": {}})
        sink.commit(lineage, extra={"group": gi, "n_groups": len(bucket_groups)})
        processed.extend(group)
        total_rows += sum(e["rows"] for e in lineage.values())

    return RunResult(
        out_dir=out_dir,
        processed_buckets=processed,
        skipped_buckets=sorted(done),
        total_rows_processed=total_rows,
    )


# ---------------------------------------------------------------------------
# Report rendering (K1): the LogParse-style plain-text summary.
# ---------------------------------------------------------------------------

def render_report(
    spark: SparkSession,
    out_dir: str,
    compiled: CompiledRules,
    max_lines_per_rule: int = 20,
) -> str:
    """Driver-side render of the final summary (small data by then)."""
    sink = SinkSet(out_dir=out_dir)
    lineage = sink.lineage_df(spark)
    totals = {
        r["sink_id"]: r["n"]
        for r in lineage.groupBy("sink_id").agg(F.sum("rows").alias("n")).collect()
    }
    routed = sink.read_routed(spark)
    lines = ["LogParse-Spark summary", "======================", ""]
    for rule in compiled.rules:
        n = totals.get(rule.sink_id, 0)
        lines.append(f"rule {rule.spec.name} ({rule.spec.action}): {n} matches")
        if rule.spec.action == "count":
            keyed = (
                routed.filter(F.col("rule_name") == rule.spec.name)
                .groupBy("count_key").count()
                .orderBy(F.desc("count"), "count_key")
                .limit(max_lines_per_rule)
                .collect()
            )
            for r in keyed:
                lines.append(f"  {r['count_key']}: {r['count']}")
        elif rule.spec.action == "report":
            sample = (
                routed.filter(F.col("rule_name") == rule.spec.name)
                .orderBy("conv_id", "turn_idx")
                .limit(max_lines_per_rule)
                .collect()
            )
            for r in sample:
                lines.append(f"  {r['rendered']}")
        lines.append("")
    lines.append(f"unmatched: {totals.get('unmatched', 0)}")
    lines.append(f"ignored: {totals.get('ignored', 0)}")
    return "\n".join(lines) + "\n"
