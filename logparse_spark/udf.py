"""Arrow UDF wrapper around the kernel + a pure-SQL dispatch alternative.

Exactly ONE JVM<->Python crossing per row batch (SURVEY.md §4
"vectorized execution"): all regex work — first-match dispatch, capture
extraction, template render — is fused into a single scalar UDF
returning a slim struct, so Arrow RecordBatches cross the boundary
once. Default engine is the pyspark-4.1 scalar **arrow_udf**
(``with_match_arrow``): the kernel consumes Spark's Arrow buffers
directly, skipping the arrow->pandas->arrow conversion the legacy
pandas UDF pays (kept as ``with_match`` for comparison).

The pure-SQL variant (``dispatch_sql_columns``) expresses the same
ordered first-match semantics as chained ``rlike`` CASE + ``regexp_extract``
— fully JVM-side/codegen, no Python at all. It is kept as an alternate
physical strategy (bench compares both); the UDF is the default because
real LogParse rule sets lean on Perl-regex features Java regex lacks.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .kernel import parse_and_match_pandas
from .rules import CompiledRules, SINK_UNMATCHED, compile_rules

MATCH_SCHEMA = T.StructType(
    [
        T.StructField("rule_id", T.IntegerType(), True),
        T.StructField("rendered", T.StringType(), True),
    ]
)

MATCH_COLUMNS = ["rule_id", "rule_name", "action", "sink_id", "count_key", "rendered"]

# slim struct + the P3 capture array ({1}..{n} regex groups, per rule)
CAPTURES_SCHEMA = T.StructType(
    [
        T.StructField("rule_id", T.IntegerType(), True),
        T.StructField("rendered", T.StringType(), True),
        T.StructField("captures", T.ArrayType(T.StringType()), True),
    ]
)


def make_parse_and_match_udf(compiled: CompiledRules):
    """Build the scalar pandas UDF. The compiled plan (a few small regex
    objects) is captured in the closure — pickled once per executor,
    never per row (SURVEY.md §3.3).

    Output is the *slim* struct (rule_id, rendered): the minimum bytes
    that must cross the JVM<->Python Arrow boundary. Everything else
    (rule_name/action/sink_id/count_key) is rule metadata derived
    JVM-side in ``with_match`` via a broadcast join on rule_id."""
    # capture only what's needed; re.Pattern pickles by (pattern, flags)
    rules_source = compiled.source_text

    @F.pandas_udf(MATCH_SCHEMA)
    def parse_and_match(text: pd.Series, tool: pd.Series) -> pd.DataFrame:
        # lazy recompile per worker keeps the closure tiny and immune to
        # pickle quirks of compiled regexes across Python versions
        plan = _worker_plan(rules_source)
        return parse_and_match_pandas(text, tool, plan, slim=True)

    # asNondeterministic is a *dedup barrier*, not a semantic statement:
    # without it, a Filter on a UDF output field makes Catalyst emit TWO
    # ArrowEvalPython nodes (one for the predicate, one for the
    # projection) and every row is regex-parsed twice. Marking the UDF
    # nondeterministic stops the optimizer from splitting/duplicating it.
    return parse_and_match.asNondeterministic()


_WORKER_PLAN_CACHE: dict[str, CompiledRules] = {}


def _worker_plan(rules_source: str) -> CompiledRules:
    plan = _WORKER_PLAN_CACHE.get(rules_source)
    if plan is None:
        plan = compile_rules(rules_source)
        _WORKER_PLAN_CACHE[rules_source] = plan
    return plan


def rule_metadata_df(spark, compiled: CompiledRules) -> DataFrame:
    """Tiny (n_rules)-row metadata table for the broadcast join."""
    rows = [
        (r.rule_id, r.spec.name, r.spec.action, r.sink_id)
        for r in compiled.rules
    ]
    return spark.createDataFrame(
        rows, "rule_id int, rule_name string, action string, sink_id string"
    )


def with_match(df: DataFrame, compiled: CompiledRules,
               text_col: str = "text", tool_col: str = "tool") -> DataFrame:
    """df + the full MATCH_COLUMNS (one slim UDF stage + broadcast join).

    The Arrow boundary carries only (rule_id int32, rendered string);
    the constant-per-rule columns come from a broadcast hash join with
    the rule metadata (JVM-side, no shuffle), and count_key is
    ``rendered`` for count rules by kernel construction."""
    udf = make_parse_and_match_udf(compiled)
    return _finish_match(df, compiled, udf(F.col(text_col), F.col(tool_col)))


def make_parse_and_match_arrow_udf(compiled: CompiledRules):
    """Scalar **Arrow UDF** (pyspark 4.1 ``F.arrow_udf``) around the
    Arrow-native kernel: Spark's Arrow batches reach
    ``kernel.parse_and_match_arrow`` as ``pa.Array`` directly — no
    arrow->pandas->arrow round trip at the boundary (two full string
    copies per batch with the pandas UDF), and the RE2 match scan runs
    on the Arrow buffers themselves. Only MATCHED subsets ever
    materialize as Python objects (capture extraction + render).

    Unlike ``mapInArrow`` this keeps the scalar-UDF shape: non-input
    columns bypass Python JVM-side and column pruning still works."""
    from .kernel import parse_and_match_arrow

    rules_source = compiled.source_text

    @F.arrow_udf(MATCH_SCHEMA)
    def parse_and_match(text: pa.Array, tool: pa.Array) -> pa.Array:
        plan = _worker_plan(rules_source)
        if isinstance(text, pa.ChunkedArray):  # defensive; scalar gets Array
            text, tool = text.combine_chunks(), tool.combine_chunks()
        rid, rendered = parse_and_match_arrow(text, tool, plan)
        return pa.StructArray.from_arrays(
            [rid, rendered], names=["rule_id", "rendered"]
        )

    # same dedup-barrier rationale as make_parse_and_match_udf
    return parse_and_match.asNondeterministic()


def attach_match(df: DataFrame, m: Column) -> DataFrame:
    """Star-expand the slim (rule_id, rendered) struct onto df."""
    return df.withColumn("_m", m).select("*", "_m.*").drop("_m")


def attach_rule_metadata(df: DataFrame, compiled: CompiledRules) -> DataFrame:
    """Broadcast-join the constant-per-rule columns onto a frame that
    already has (rule_id, rendered); derive action/sink_id/count_key.

    Kept separate from ``attach_match`` so the pipeline can run it
    AFTER the bucket repartition: the exchange then carries only
    (rule_id int32, rendered) of the parse output — never the
    rule_name/action/sink_id strings, which are redundant with rule_id
    and cost ~20-25 bytes/row of shuffle+sort traffic."""
    meta = rule_metadata_df(df.sparkSession, compiled)
    out = df.join(F.broadcast(meta), "rule_id", "left")
    ck = F.when(F.col("action") == "count", F.col("rendered"))
    if "sum_key" in df.columns:
        # sum rules: the key crossed the exchange in its own column
        # (derived pre-shuffle by sum_key_col — see its docstring)
        ck = F.coalesce(ck, F.col("sum_key"))
    out = (
        out.withColumn("action", F.coalesce(F.col("action"), F.lit(SINK_UNMATCHED)))
        .withColumn("sink_id", F.coalesce(F.col("sink_id"), F.lit(SINK_UNMATCHED)))
        .withColumn("count_key", ck.cast("string"))
    )
    return out.drop("sum_key") if "sum_key" in df.columns else out


def _finish_match(df: DataFrame, compiled: CompiledRules, m: Column) -> DataFrame:
    """Shared tail of every UDF engine: star-expand the slim struct,
    broadcast-join rule metadata, derive action/sink_id/count_key
    (sum-rule keys render here, while the source field is in scope)."""
    out = attach_match(df, m)
    sk = sum_key_col(compiled)
    if sk is not None:
        out = out.withColumn("sum_key", sk)
    return attach_rule_metadata(out, compiled)


def with_match_arrow(df: DataFrame, compiled: CompiledRules,
                     text_col: str = "text", tool_col: str = "tool") -> DataFrame:
    """df + MATCH_COLUMNS via the scalar Arrow UDF (default engine)."""
    udf = make_parse_and_match_arrow_udf(compiled)
    return _finish_match(df, compiled, udf(F.col(text_col), F.col(tool_col)))


def make_parse_and_match_captures_udf(compiled: CompiledRules):
    """Scalar pandas UDF emitting the slim struct PLUS the raw capture
    array (list<string> of regex groups {1}..{n} of the winning rule,
    null for unmatched rows and group-less rules). This is the
    non-slim kernel path (kernel.parse_and_match_pandas slim=False):
    the default pipeline never ships captures across the boundary
    because the rendered template already folds them in, but the raw
    array is part of the P3 operator surface — consumers that want
    their own formatting get the groups, not our rendering."""
    rules_source = compiled.source_text

    @F.pandas_udf(CAPTURES_SCHEMA)
    def parse_and_match_caps(text: pd.Series, tool: pd.Series) -> pd.DataFrame:
        plan = _worker_plan(rules_source)
        out = parse_and_match_pandas(text, tool, plan)
        return out[["rule_id", "rendered", "captures"]]

    # same dedup-barrier rationale as make_parse_and_match_udf
    return parse_and_match_caps.asNondeterministic()


def with_match_captures(df: DataFrame, compiled: CompiledRules,
                        text_col: str = "text", tool_col: str = "tool") -> DataFrame:
    """df + MATCH_COLUMNS + ``captures`` (the {n} array, end to end)."""
    udf = make_parse_and_match_captures_udf(compiled)
    return _finish_match(df, compiled, udf(F.col(text_col), F.col(tool_col)))


# ---------------------------------------------------------------------------
# Pure-SQL alternative (JVM-only): chained CASE on rlike, first match wins.
# ---------------------------------------------------------------------------

def _template_col(rule, col: Column, which: str = "template") -> Column:
    tmpl = rule.template if which == "template" else rule.key_template
    if tmpl is None:
        return F.lit(None).cast("string")
    pieces = []
    for kind, val in tmpl.parts:
        if kind == "lit":
            pieces.append(F.lit(val))
        else:
            pieces.append(F.regexp_extract(col, rule.spec.pattern, int(val)))
    return F.concat(*pieces) if len(pieces) > 1 else pieces[0]


def _rule_struct(r) -> Column:
    rendered = _template_col(r, F.col(r.spec.field))
    if r.spec.action == "count":
        ck = rendered  # key == payload by construction
    elif r.spec.action == "sum":
        # payload is the extracted VALUE; the grouping key renders from
        # its own template
        ck = _template_col(r, F.col(r.spec.field), which="key")
    else:
        ck = F.lit(None).cast("string")
    return F.struct(
        F.lit(r.rule_id).alias("rule_id"),
        F.lit(r.spec.name).alias("rule_name"),
        F.lit(r.spec.action).alias("action"),
        F.lit(r.sink_id).alias("sink_id"),
        ck.alias("count_key"),
        (rendered if r.spec.action != "ignore" else F.lit(None).cast("string")).alias("rendered"),
    )


def sum_key_col(compiled: CompiledRules) -> Column | None:
    """Per-rule CASE deriving a sum rule's grouping key JVM-side from
    the winning ``rule_id`` and the SOURCE field — evaluated while
    text/tool still exist (pre-shuffle), because the slim Arrow
    boundary carries only (rule_id, rendered=value) and a sum rule's
    key, unlike a count rule's, is not the payload. None when the rule
    set has no sum rules (the exchange then stays exactly as slim as
    before). Group-extraction agreement between this Java regex render
    and the kernel's RE2/Python render is pinned by the engine-equality
    tests."""
    expr: Column | None = None
    for r in compiled.rules:
        if r.spec.action != "sum":
            continue
        k = _template_col(r, F.col(r.spec.field), which="key")
        cond = F.col("rule_id") == r.rule_id
        expr = F.when(cond, k) if expr is None else expr.when(cond, k)
    return expr


def with_match_sql(df: DataFrame, compiled: CompiledRules) -> DataFrame:
    """Same output columns as ``with_match`` (minus captures), built from
    Catalyst expressions only — whole-stage-codegen end to end.

    ONE chained CASE producing the whole match struct: each rule's
    regex predicate is evaluated at most once per row (short-circuit
    first-match, like the kernel), instead of once per output column."""
    unmatched = F.struct(
        F.lit(None).cast("int").alias("rule_id"),
        F.lit(None).cast("string").alias("rule_name"),
        F.lit(SINK_UNMATCHED).alias("action"),
        F.lit(SINK_UNMATCHED).alias("sink_id"),
        F.lit(None).cast("string").alias("count_key"),
        F.col("text").alias("rendered"),
    )
    expr: Column | None = None
    for r in compiled.rules:
        col = F.col(r.spec.field)
        cond = col.isNotNull() & col.rlike(r.spec.pattern)
        branch = _rule_struct(r)
        expr = F.when(cond, branch) if expr is None else expr.when(cond, branch)
    assert expr is not None
    m = expr.otherwise(unmatched)
    return df.withColumn("_m", m).select("*", "_m.*").drop("_m")
