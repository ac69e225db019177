"""Physical-plan regression tests (SURVEY.md §4).

These lock in the optimizer properties the engine's scale story
depends on; a regression here is a silent 2-10x slowdown at 100 TB
even though results stay correct:

- exactly ONE ArrowEvalPython stage per job (no duplicated parse)
- column pruning reaches the parquet scan (ReadSchema minimal)
- native pre-parse filters are pushed into the scan (PushedFilters)
- dictionary enrichment uses broadcast hash joins, never a shuffle
  (SortMergeJoin/ShuffledHashJoin) for the small side
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from logparse_spark import stages
from logparse_spark.rules import load_rules

RULES = "/root/repo/rules/default.rules"


@pytest.fixture(scope="module")
def tpath(fixture_sf_small):
    return os.path.join(fixture_sf_small, "transcripts.parquet")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_single_udf_eval_under_filter_and_agg(spark, tpath):
    """A filter on a UDF output must not duplicate the parse stage."""
    df = stages.read_transcripts(spark, tpath)
    cdf = stages.parse_match(df, load_rules(RULES))
    agg = stages.sink_counts(stages.routed(cdf))
    assert _plan(agg).count("ArrowEvalPython") == 1


def test_column_pruning_reaches_scan(spark, tpath):
    """dispatch needs text/tool (+ids); the scan must not read role/ts."""
    df = stages.read_transcripts(spark, tpath)
    cdf = stages.parse_match(df, load_rules(RULES)).select("sink_id")
    plan = _plan(cdf)
    scan_line = [ln for ln in plan.splitlines() if "FileScan parquet" in ln][0]
    assert "text" in scan_line and "tool" in scan_line
    assert "role" not in scan_line and "conv_id" not in scan_line


def test_native_filter_pushed_down(spark, tpath):
    """Cheap native predicates run before the UDF and reach the scan."""
    df = stages.read_transcripts(spark, tpath).filter(F.col("role") == "user")
    cdf = stages.parse_match(df, load_rules(RULES))
    plan = _plan(cdf)
    assert "PushedFilters: [IsNotNull(role), EqualTo(role,user)]" in plan


def test_enrich_uses_broadcast_join(spark, tpath, fixture_sf_small):
    role_dict = spark.read.parquet(os.path.join(fixture_sf_small, "role_dict.parquet"))
    tool_dict = spark.read.parquet(os.path.join(fixture_sf_small, "tool_dict.parquet"))
    df = stages.read_transcripts(spark, tpath)
    cdf = stages.parse_match(df, load_rules(RULES))
    en = stages.enrich(cdf, role_dict, tool_dict)
    plan = _plan(en)
    assert plan.count("BroadcastHashJoin") >= 2  # role + tool (+rule meta)
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan


def test_sql_engine_whole_stage_codegen(spark, tpath):
    """The pure-SQL dispatch must stay inside whole-stage codegen."""
    df = stages.read_transcripts(spark, tpath)
    cdf = stages.parse_match(df, load_rules(RULES), engine="sql")
    plan = _plan(cdf)
    assert "*(1)" in plan  # whole-stage-codegen star marker
    assert "ArrowEvalPython" not in plan


def test_redact_prunes_and_stays_in_codegen(spark):
    """redact reads only 3 of 6 columns and never leaves the JVM."""
    from logparse_spark import queries

    df = queries.q_redact(spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    scan_line = [ln for ln in plan.splitlines() if "FileScan parquet" in ln][0]
    assert "text" in scan_line and "conv_id" in scan_line
    assert "role" not in scan_line and "tool" not in scan_line
    assert "EvalPython" not in plan
    assert "*(1)" in plan  # whole-stage codegen


def test_anti_join_is_broadcast(spark):
    """users_no_purchase must anti-join via broadcast, never a
    shuffled/sort-merge join of the big event stream."""
    from logparse_spark import corpus

    plan = _plan(corpus.q_users_no_purchase(spark, "/root/testdata/sf0.001"))
    assert "LeftAnti" in plan, plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_rollup_uses_expand_single_pass(spark):
    """ROLLUP compiles to one Expand + hash aggregate, not one
    aggregation pass per grouping set."""
    from logparse_spark import queries

    plan = _plan(queries.q_rollup_counts(spark, "/root/testdata/sf0.001"))
    assert "Expand" in plan
    assert plan.count("ArrowEvalPython") == 1  # the single parse stage


def test_ann_ivf_no_cartesian_product(spark):
    """Centroids and probe cells are broadcast; the vector table must
    never be cartesian-joined."""
    from logparse_spark import corpus

    plan = _plan(corpus.q_ann_ivf(spark, "/root/testdata/sf0.001"))
    assert "CartesianProduct" not in plan, plan


def test_tfidf_topk_no_global_sort(spark):
    """Global top-30 must be TakeOrderedAndProject (per-partition top-k
    + driver merge), never a full Sort of the term table."""
    from logparse_spark import corpus

    plan = _plan(corpus.q_tfidf_terms(spark, "/root/testdata/sf0.001"))
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_conv_profile_partial_agg_no_window(spark):
    """min_by/max_by keep first/last inside the aggregate buffer: no
    Window operator, and the aggregation is partial+final (the shuffle
    carries ~one row per (conv, map partition), not every turn the way
    a first_value window would)."""
    from logparse_spark import queries

    plan = _plan(queries.q_conv_profile(spark, "/root/testdata/sf0.001"))
    assert "Window" not in plan, plan
    assert "partial_min_by" in plan, plan


def test_cube_uses_expand_single_pass(spark):
    """CUBE compiles to one Expand + hash aggregate like ROLLUP."""
    from logparse_spark import queries

    plan = _plan(queries.q_cube_counts(spark, "/root/testdata/sf0.001"))
    assert "Expand" in plan
    assert "EvalPython" not in plan  # raw-scan query, no parse stage


def test_pivot_single_parse_single_aggregate_pass(spark):
    """Explicit-value pivot is ONE aggregation over the routed frame —
    no per-role scan fan-out and only the one parse stage."""
    from logparse_spark import queries

    plan = _plan(queries.q_pivot_roles(spark, "/root/testdata/sf0.001"))
    assert plan.count("ArrowEvalPython") == 1
    assert plan.count("FileScan parquet") == 1


def test_raw_jsonl_stays_in_codegen(spark):
    """JSON source parse is all JVM expressions — no Python stage."""
    from logparse_spark import queries

    plan = _plan(queries.q_raw_jsonl(spark, "/root/testdata/sf0.001"))
    assert "EvalPython" not in plan
    assert "FileScan json" in plan


def test_asof_join_is_window_not_join(spark):
    """The as-of composition must compile to ONE window over the event
    stream — no join operator of any kind (the naive formulation is a
    range self-join)."""
    from logparse_spark import corpus

    plan = _plan(corpus.q_asof_clicks(spark, "/root/testdata/sf0.001"))
    assert "Window" in plan
    assert "Join" not in plan, plan


def test_range_join_is_equi_join(spark):
    """The banded range join must be a hash equi-join — never a
    cartesian/nested-loop theta join."""
    from logparse_spark import corpus

    plan = _plan(corpus.q_range_join_events(spark, "/root/testdata/sf0.001"))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "Join" in plan


def test_one_shuffle_in_pipeline_plan(spark, tpath, fixture_sf_small):
    """classify = scan -> ONE repartition exchange -> parse -> broadcast
    enrich; no second full-data exchange before the sinks."""
    from logparse_spark import pipeline

    role_dict = spark.read.parquet(os.path.join(fixture_sf_small, "role_dict.parquet"))
    tool_dict = spark.read.parquet(os.path.join(fixture_sf_small, "tool_dict.parquet"))
    df = stages.read_transcripts(spark, tpath)
    cdf = pipeline.classify(df, load_rules(RULES), role_dict, tool_dict)
    plan = _plan(cdf)
    # broadcast exchanges excluded; only the explicit bucket repartition
    n_shuffle = sum(
        1 for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln or "Exchange RoundRobin" in ln
    )
    assert n_shuffle == 1, plan


def test_dispatch_captures_single_python_stage(spark):
    """The captures UDF must stay ONE Python stage (the
    asNondeterministic dedup barrier) + the rule-metadata broadcast."""
    from logparse_spark import queries

    plan = _plan(queries.q_dispatch_captures(spark, "/root/testdata/sf0.001"))
    assert plan.count("EvalPython") == 1, plan
    assert "SortMergeJoin" not in plan


def test_minhash_pairgen_star_linear(spark):
    """Round-2 shape: star pairing = bands equi-joined to the per-bucket
    MIN aggregate. Output is linear in the input (df-1 pairs per bucket)
    so the only acceptable join is a hash equi-join on (b, k) — never a
    nested-loop/cartesian, and never a bands-to-bands self-join (which
    would be O(df^2) on a hot boilerplate key)."""
    from logparse_spark import corpus

    plan = _plan(corpus.q_minhash_lsh(spark, "/root/testdata/sf0.001"))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "partial_min" in plan, plan          # bucket-min aggregate
    assert "HashJoin" in plan, plan             # equi-join on (b, k)
    # exactly one join: bands->mins attach; a second would be all-pairs
    assert plan.count("Join") == 1, plan


def test_enrich_lookup_single_parse_broadcast_only(spark):
    """The merged two-dimension lookup still parses ONCE (only the role
    branch needs classification) and joins are broadcast-only."""
    from logparse_spark import queries

    plan = _plan(queries.q_enrich_lookup(spark, "/root/testdata/sf0.001"))
    assert plan.count("ArrowEvalPython") == 1, plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_jaccard_df_cap_is_broadcast_anti(spark):
    """The hot-shingle filter must be a broadcast anti join on the tiny
    over-cap key set, never a shuffle of the full inverted index."""
    from logparse_spark import corpus

    plan = _plan(corpus.q_jaccard_pairs(spark, "/root/testdata/sf0.001"))
    assert "LeftAnti" in plan, plan
    assert "BroadcastHashJoin" in plan


from conftest import scan_num_files as _scan_num_files  # noqa: E402


def test_ann_index_probe_prunes_partitions(spark, tmp_path):
    """Round-3 fix: the ANN index is PERSISTED partitionBy(t, bucket)
    and a probe workload must touch only its probed (t, bucket)
    directories — PartitionFilters at plan time AND a strictly pruned
    numFiles scan metric at runtime (at 100 TB this is the difference
    between reading ~n_tables*|masks|/64 of the index and a full
    scan). Same check for the IVF cell layout."""
    import re

    from logparse_spark import corpus

    sf = "/root/testdata/sf0.001"
    idx = corpus.build_ann_index(spark, sf, str(tmp_path / "annidx"), n_tables=2)

    def count_files(sub_dir):
        return len([
            f for r, _, fs in os.walk(os.path.join(idx, sub_dir))
            for f in fs if f.endswith(".parquet")
        ])

    df = corpus.ann_search(
        spark, sf, "lsh", query_ids=[1, 2], k=5, n_tables=2,
        probe_radius=1, index_dir=idx,
    )
    plan = _plan(df)
    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and "bucket" in pf.group(1) and "t" in pf.group(1), plan

    n_read = _scan_num_files(df, "annidx")
    n_all = count_files("lsh")
    # <= 2 queries x 2 tables x 7 masks = 28 probed dirs of 2*64
    assert 0 < n_read <= 28 < n_all, (n_read, n_all)

    # results identical to the on-the-fly derivation (index adds
    # pruning, never changes answers)
    on_the_fly = corpus.ann_search(
        spark, sf, "lsh", query_ids=[1, 2], k=5, n_tables=2, probe_radius=1,
    )
    assert sorted(map(tuple, df.collect())) == \
        sorted(map(tuple, on_the_fly.collect()))

    ivf = corpus.ann_search(
        spark, sf, "ivf", query_ids=[0], k=5, nprobe=2, index_dir=idx,
    )
    pf2 = re.search(r"PartitionFilters: \[([^\]]*)\]", _plan(ivf))
    assert pf2 and "cell" in pf2.group(1), _plan(ivf)
    n_ivf_read = _scan_num_files(ivf, "annidx")
    assert 0 < n_ivf_read < count_files("ivf"), n_ivf_read
    base = corpus.ann_search(spark, sf, "ivf", query_ids=[0], k=5, nprobe=2)
    assert sorted(map(tuple, ivf.collect())) == \
        sorted(map(tuple, base.collect()))


def test_registry_wide_no_cartesian_no_row_python(spark):
    """Sweeping guard over the ENTIRE driver registry: none of the 50
    surfaced queries may plan a CartesianProduct (quadratic at any
    scale) or a BatchEvalPython stage (row-at-a-time Python — the
    north rule mandates vectorized Arrow UDFs only). Individual plan
    tests above pin specific shapes; this one makes the property hold
    for every FUTURE registry entry by default.

    BroadcastNestedLoopJoin is allowed ONLY on a pinned allowlist of
    queries whose broadcast side is a constant-size probe/scalar frame
    (ANN's K query vectors; TF-IDF's 1-row corpus size) — cost is
    n_rows x K, linear. Streaming-backed entries are skipped (they
    drain a stream on build; their batch output plan is a scan).
    """
    from logparse_spark.queries import all_queries

    sf = "/root/testdata/sf0.001"
    if not os.path.isdir(sf):
        pytest.skip("driver testdata not present")
    bnlj_ok = {"ann_bucketed", "ann_cosine", "tfidf_terms"}
    offenders: dict[str, list[str]] = {}
    for name, fn in sorted(all_queries().items()):
        if name.startswith("stream_"):
            continue
        plan = _plan(fn(spark, sf))
        bad = []
        if "CartesianProduct" in plan:
            bad.append("CartesianProduct")
        if "BatchEvalPython" in plan:
            bad.append("BatchEvalPython")
        if "BroadcastNestedLoopJoin" in plan and name not in bnlj_ok:
            bad.append("BroadcastNestedLoopJoin")
        if bad:
            offenders[name] = bad
    assert not offenders, offenders
