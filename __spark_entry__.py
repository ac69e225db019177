"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship parse->enrich->aggregate over the
deterministic sf0.001 transcripts fixture (the BASELINE.json:15
input_hint shape, synthesized in-repo; see FIXTURES.md).

``queries()`` / ``oracle_sql()`` — one entry per implemented operator
from SURVEY.md §2 plus the corpus/training-data ops, each paired with
DuckDB SQL the driver runs side-by-side at sf=0.01. Transcripts
queries read the committed fixture parquet via ``read_parquet`` in
the oracle; corpus queries use the driver's pre-registered views.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full pipeline classification -> enriched per-sink summary."""
    import os

    from pyspark.sql import functions as F

    from logparse_spark import stages
    from logparse_spark.fixtures import ensure_fixture
    from logparse_spark.queries import _rules

    d = ensure_fixture("0.001")
    df = stages.read_transcripts(spark, os.path.join(d, "transcripts.parquet"))
    role_dict = spark.read.parquet(os.path.join(d, "role_dict.parquet"))
    tool_dict = spark.read.parquet(os.path.join(d, "tool_dict.parquet"))
    cdf = stages.parse_match(df, _rules())
    cdf = stages.enrich(cdf, role_dict, tool_dict)
    routed = stages.routed(cdf)
    return (
        routed.groupBy("sink_id")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("conv_id").alias("n_convs"),
        )
        .orderBy("sink_id")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from logparse_spark.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from logparse_spark.queries import all_oracles

    return all_oracles()
