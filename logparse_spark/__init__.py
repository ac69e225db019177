"""logparse_spark — a PySpark-native rule-driven log/transcript pipeline.

A brand-new engine with the query semantics of ``mikeknox/LogParse``
(rule DSL: regex patterns with IGNORE / COUNT / report actions and
``{n}`` field substitutions; see SURVEY.md §1-§2), re-expressed
Spark-first over an Iceberg/Parquet table of multi-turn transcripts:

    parse (vectorized Arrow UDF) -> enrich (broadcast joins)
        -> route (rule-match fan-out sinks) -> aggregate (per-rule summary)

Modules
-------
rules       driver-side rule DSL parse/compile (no Spark dependency)
kernel      vectorized pandas parse+match kernel (no Spark dependency)
udf         the Arrow UDF wrapper and pure-SQL dispatch alternative
stages      DataFrame stage functions (parse_match, enrich, route, aggregate)
pipeline    end-to-end orchestration: run(), report rendering, resume
sinks       sink abstraction: parquet fan-out + atomic manifest (Iceberg stand-in)
sources     raw syslog text compatibility source (spark.read.text mode)
streaming   Structured Streaming wrappers (foreachBatch, watermarked windows,
            applyInPandasWithState per-conversation state)
packaging   --py-files zip build + runtime addPyFile shipping
queries     driver-contract registry (Spark queries + DuckDB oracle SQL)
corpus      training-data operators (dedup, similarity, text stats, events)
fixtures    deterministic transcripts fixture generator
"""

__version__ = "0.1.0"
