"""Alternate sources: raw log-file compatibility mode (SURVEY.md §2.3).

The reference consumes raw syslog-style text files. This module keeps
that mode alive on Spark: ``spark.read.text`` + JVM-side regexp
tokenization of the classic syslog layout

    Mon DD HH:MM:SS host program[pid]: message

into the same column shape the transcript pipeline consumes, so one
rule file serves both inputs:

    conv_id  <- host          (the grouping key of a log stream)
    turn_idx <- line number within host (monotonic arrival order)
    role     <- program
    text     <- message
    tool     <- program[pid]
    ts       <- parsed syslog timestamp (year-less; anchored to ref_year)

Everything is whole-stage-codegen expressions — no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SYSLOG_RE = (
    r"^([A-Z][a-z]{2}) +(\d{1,2}) (\d{2}:\d{2}:\d{2}) (\S+) ([^\[:]+)(?:\[(\d+)\])?: (.*)$"
)


JSONL_READ_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts string"
)


def read_raw_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Newline-delimited-JSON transcripts -> the canonical frame.

    Schema is EXPLICIT (never inferred — inference is a full extra
    scan at 100 TB and can silently widen types between batches); the
    timestamp arrives as a string with exactly 6 fractional digits and
    parses via to_timestamp_ntz (wall clock, tz-independent, matching
    the parquet TIMESTAMP_NTZ shape). Whole-stage codegen throughout:
    Jackson JSON parse + timestamp parse are JVM-side expressions."""
    df = spark.read.schema(JSONL_READ_SCHEMA).json(path)
    return df.withColumn(
        "ts", F.to_timestamp_ntz("ts", F.lit("yyyy-MM-dd HH:mm:ss.SSSSSS"))
    )


def read_raw_syslog(spark: SparkSession, path: str, ref_year: int = 2026) -> DataFrame:
    """Raw syslog text -> transcript-shaped DataFrame (S1 compat mode)."""
    lines = spark.read.text(path)
    parts = lines.select(
        F.regexp_extract("value", SYSLOG_RE, 1).alias("mon"),
        F.regexp_extract("value", SYSLOG_RE, 2).alias("day"),
        F.regexp_extract("value", SYSLOG_RE, 3).alias("hms"),
        F.regexp_extract("value", SYSLOG_RE, 4).alias("host"),
        F.regexp_extract("value", SYSLOG_RE, 5).alias("program"),
        F.regexp_extract("value", SYSLOG_RE, 6).alias("pid"),
        F.regexp_extract("value", SYSLOG_RE, 7).alias("message"),
        F.col("value"),
    )
    # to_timestamp_ntz: wall-clock parse with NO session-tz roundtrip
    # (to_timestamp would shift wall times falling in a DST gap of the
    # session zone), matching the transcript schema's TIMESTAMP_NTZ
    ts = F.to_timestamp_ntz(
        F.concat_ws(" ", F.lit(str(ref_year)), F.col("mon"), F.col("day"), F.col("hms")),
        F.lit("yyyy MMM d HH:mm:ss"),
    )
    w = Window.partitionBy("host").orderBy("ts", "message")
    out = (
        parts.filter(F.col("host") != "")
        .withColumn("ts", ts)
        .withColumn("turn_idx", (F.row_number().over(w) - 1).cast("int"))
    )
    return out.select(
        F.col("host").alias("conv_id"),
        "turn_idx",
        F.col("program").alias("role"),
        F.col("message").alias("text"),
        F.when(F.col("pid") != "", F.concat(F.col("program"), F.lit("["), F.col("pid"), F.lit("]")))
        .otherwise(F.col("program")).alias("tool"),
        "ts",
    )
