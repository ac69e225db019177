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


def read_raw_jsonl(spark: SparkSession, path: str,
                   keep_corrupt: bool = False) -> DataFrame:
    """Newline-delimited-JSON transcripts -> the canonical frame.

    Schema is EXPLICIT (never inferred — inference is a full extra
    scan at 100 TB and can silently widen types between batches); the
    timestamp arrives as a string with exactly 6 fractional digits and
    parses via to_timestamp_ntz (wall clock, tz-independent, matching
    the parquet TIMESTAMP_NTZ shape). Whole-stage codegen throughout:
    Jackson JSON parse + timestamp parse are JVM-side expressions.

    ``keep_corrupt=True`` adds a ``_corrupt`` column (PERMISSIVE mode's
    columnNameOfCorruptRecord): null for parsed rows, the raw line for
    malformed ones — the dead-letter channel a production ingest needs
    (route ``_corrupt IS NOT NULL`` to an errors sink instead of
    silently landing all-null rows, which is what PERMISSIVE does when
    nobody asks). Default stays the plain frame: the extra column is
    only materialized when requested."""
    if keep_corrupt:
        df = (
            spark.read
            .schema(JSONL_READ_SCHEMA + ", _corrupt string")
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt")
            .json(path)
        )
    else:
        df = spark.read.schema(JSONL_READ_SCHEMA).json(path)
    return df.withColumn(
        "ts", F.to_timestamp_ntz("ts", F.lit("yyyy-MM-dd HH:mm:ss.SSSSSS"))
    )


def assemble_multiline(lines: DataFrame, header_re: str = SYSLOG_RE) -> DataFrame:
    """Fold continuation lines into their governing header line —
    the multiline-record mode every log shipper grows (stack traces,
    wrapped detail) and LogParse's single-line loop lacks.

    Rule: a line matching ``header_re`` STARTS a record; every other
    line (indented frames, wrapped detail, stray junk, and BLANK
    lines) joins the nearest header at or before it. Blank lines are
    continuations like any other non-header line — pinned semantics,
    matching log shippers' multiline modes (a blank line inside a
    wrapped record is record content) and the DuckDB oracle. Lines
    before the first header of a file are orphans and are dropped
    (there is no record to join; callers that must audit them can
    diff line counts via the returned ``n_lines``).

    ``lines`` must be a ``spark.read.text`` frame (column ``value``).
    Returns one row per assembled record:
    ``(src_file, blk, seq, raw, n_lines)`` where ``raw`` is the
    newline-rejoined record (header first) and (blk, seq) is the
    record's file-order sort key.

    Built split-boundary-safe for TB-scale single files — the part a
    naive window-over-file solution gets wrong at scale:

    - ``_metadata.file_block_start`` identifies the file split a line
      was read from; a split is consumed by exactly ONE task, so
      ``monotonically_increasing_id()`` is read-order-monotonic within
      it, making ``(src_file, blk, seq)`` a total file order without
      ever sorting whole files in one task.
    - the governing-header scan runs per (file, split) — bounded
      memory, parallel across splits — leaving each split's leading
      continuation lines (a record that STARTED in the previous split)
      keyed null;
    - a per-split summary (one row per split: its last header id) is
      window-scanned and broadcast-joined back, so those boundary
      lines re-key to the previous split's last record. Records and
      splits never need to align.

    Everything is JVM-side (rlike / window / collect_list+array_sort);
    no Python in the path.
    """
    lines = lines.select(
        "value",
        F.col("_metadata.file_path").alias("src_file"),
        F.col("_metadata.file_block_start").alias("blk"),
        F.monotonically_increasing_id().alias("seq"),
    )
    is_hdr = F.col("value").rlike(header_re)
    w_run = (
        Window.partitionBy("src_file", "blk")
        .orderBy("seq")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    keyed = lines.withColumn(
        "hdr_seq",
        F.last(F.when(is_hdr, F.col("seq")), ignorenulls=True).over(w_run),
    )
    # one row per split: the last header it contains (None for a split
    # of pure continuation lines — F.last skips it and keeps walking
    # back, so a record spanning >2 splits still re-keys correctly)
    w_prev = (
        Window.partitionBy("src_file")
        .orderBy("blk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    blocks = (
        keyed.groupBy("src_file", "blk")
        .agg(F.max("hdr_seq").alias("last_hdr"))
        .withColumn("prev_hdr", F.last("last_hdr", ignorenulls=True).over(w_prev))
        .select("src_file", "blk", "prev_hdr")
    )
    asm = (
        keyed.join(F.broadcast(blocks), ["src_file", "blk"], "left")
        .withColumn("rec", F.coalesce("hdr_seq", "prev_hdr"))
        .filter(F.col("rec").isNotNull())
    )
    parts = F.array_sort(
        F.collect_list(F.struct(F.col("blk"), F.col("seq"), F.col("value")))
    )
    return (
        asm.groupBy("src_file", "rec")
        .agg(
            F.concat_ws(
                "\n", F.transform(parts, lambda s: s["value"])
            ).alias("raw"),
            F.min("blk").alias("blk"),
            F.min("seq").alias("seq"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .drop("rec")
    )


def read_raw_multiline(spark: SparkSession, path: str,
                       ref_year: int = 2026,
                       header_re: str = SYSLOG_RE,
                       fields: tuple = (),
                       ts_format: str | None = None) -> DataFrame:
    """Raw text WITH continuation lines -> transcript-shaped frame:
    :func:`assemble_multiline` folds records, then the record's
    canonical columns extract from its governing HEADER line and the
    record's ``text`` is the header's message plus the continuation
    lines (original indentation preserved, newline-joined).

    Two extraction modes, both all-JVM:

    - ``fields`` empty (default): the classic syslog layout — a
      custom ``header_re`` (the rules DSL's plain ``multiline /RE/``
      directive) then controls ASSEMBLY only and must select
      syslog-shaped lines (refinement: e.g. only certain programs
      open records, other syslog lines ride along as continuations).
    - ``fields`` non-empty (the directive's grok ``%{PAT:field}``
      captures, as ``((name, group_number), ...)``): the header
      fields extract via ``regexp_extract(header, header_re, n)`` —
      any line layout works, not just syslog. ``text`` is required;
      ``conv_id`` defaults to ``"-"`` (one stream), ``role`` to
      ``""``, ``tool`` to NULL, ``ts`` (parsed with the Java format
      ``ts_format``) to NULL. ``turn_idx`` orders by (ts, text) per
      conv when ts is captured — same determinism contract as the
      syslog mode — else by file order (blk, seq)."""
    if fields:
        return _read_multiline_extract(spark, path, header_re,
                                       dict(fields), ts_format)
    recs = assemble_multiline(spark.read.text(path), header_re=header_re)
    hdr = F.substring_index(F.col("raw"), "\n", 1)
    rest = F.expr(
        "substr(raw, length(substring_index(raw, '\n', 1)) + 2)"
    )
    parts = recs.select(
        F.regexp_extract(hdr, SYSLOG_RE, 1).alias("mon"),
        F.regexp_extract(hdr, SYSLOG_RE, 2).alias("day"),
        F.regexp_extract(hdr, SYSLOG_RE, 3).alias("hms"),
        F.regexp_extract(hdr, SYSLOG_RE, 4).alias("host"),
        F.regexp_extract(hdr, SYSLOG_RE, 5).alias("program"),
        F.regexp_extract(hdr, SYSLOG_RE, 6).alias("pid"),
        F.when(rest == "", F.regexp_extract(hdr, SYSLOG_RE, 7))
        .otherwise(F.concat(F.regexp_extract(hdr, SYSLOG_RE, 7),
                            F.lit("\n"), rest)).alias("message"),
    )
    ts = F.to_timestamp_ntz(
        F.concat_ws(" ", F.lit(str(ref_year)), F.col("mon"), F.col("day"),
                    F.col("hms")),
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
        F.when(F.col("pid") != "",
               F.concat(F.col("program"), F.lit("["), F.col("pid"), F.lit("]")))
        .otherwise(F.col("program")).alias("tool"),
        "ts",
    )


def _read_multiline_extract(spark: SparkSession, path: str,
                            header_re: str, fmap: dict[str, int],
                            ts_format: str | None) -> DataFrame:
    """Grok-template extraction mode of :func:`read_raw_multiline`:
    canonical columns from the governing header line via numbered
    capture groups (rules.py expands the directive's %{PAT:field}
    tokens to (field, group) at compile time)."""
    recs = assemble_multiline(spark.read.text(path), header_re=header_re)
    hdr = F.substring_index(F.col("raw"), "\n", 1)
    rest = F.expr(
        "substr(raw, length(substring_index(raw, '\n', 1)) + 2)"
    )

    def grp(name: str):
        return F.regexp_extract(hdr, header_re, fmap[name])

    text_hdr = grp("text")
    parts = recs.select(
        F.when(rest == "", text_hdr)
        .otherwise(F.concat(text_hdr, F.lit("\n"), rest))
        .alias("text"),
        (grp("conv_id") if "conv_id" in fmap
         else F.lit("-")).alias("conv_id"),
        (grp("role") if "role" in fmap else F.lit("")).alias("role"),
        (grp("tool") if "tool" in fmap
         else F.lit(None).cast("string")).alias("tool"),
        (F.to_timestamp_ntz(grp("ts"), F.lit(ts_format))
         if "ts" in fmap
         else F.lit(None).cast("timestamp_ntz")).alias("ts"),
        "blk", "seq",
    )
    order = ("ts", "text") if "ts" in fmap else ("blk", "seq")
    w = Window.partitionBy("conv_id").orderBy(*order)
    return (
        parts
        .withColumn("turn_idx", (F.row_number().over(w) - 1).cast("int"))
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
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
