"""Model-based property test for the row-level table ops: ANY
interleaving of conversation upserts and deletes must leave the
committed table exactly equal to a trivial driver-side model (dict of
conv -> turn count), with the manifest lineage conserving the table's
row counts after every step.

This is the test shape Iceberg uses for its own row-delta semantics
(random op sequences vs a reference table); hypothesis drives the
sequences, a fresh copy of the committed fixture per example.
"""

from __future__ import annotations

import shutil

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from logparse_spark import pipeline
from logparse_spark.sinks import SinkSet, load_manifest

RULES = "/root/repo/rules/default.rules"

TEXTS = [
    "err 9 step 2: schema mismatch detected",     # report rule
    "login failed for user prop",                 # count rule
    "heartbeat ping seq=123",                     # ignore rule
    "totally unmatched free text",                # unmatched
]

# op := ("delete", [conv_slot, ...]) | ("upsert", conv_slot, n_turns, text_idx)
# conv_slot 0..5: slots 0..3 alias the fixture's first 4 conversations,
# slots 4..5 are brand-new ids (insert-then-maybe-delete paths)
_op = st.one_of(
    st.tuples(st.just("delete"),
              st.lists(st.integers(0, 5), min_size=1, max_size=3)),
    st.tuples(st.just("upsert"), st.integers(0, 5),
              st.integers(1, 5), st.integers(0, len(TEXTS) - 1)),
)


@pytest.fixture(scope="module")
def base_table(spark, fixture_sf_small, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("prop_base"))
    pipeline.run(
        spark,
        source_path=f"{fixture_sf_small}/transcripts.parquet",
        out_dir=out,
        rules_path=RULES,
        dict_dir=fixture_sf_small,
        buckets=8,
    )
    counts = {
        r["conv_id"]: r["n"]
        for r in SinkSet(out_dir=out)._read_committed(spark)
        .groupBy("conv_id").agg(F.count("*").alias("n")).collect()
    }
    return out, counts


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ops=st.lists(_op, min_size=1, max_size=4))
def test_op_sequences_match_model(spark, base_table, tmp_path_factory, ops):
    import datetime

    base, base_counts = base_table
    table = str(tmp_path_factory.mktemp("prop") / "t")
    shutil.copytree(base, table)
    fixture_convs = sorted(base_counts)[:4]
    slot = {i: c for i, c in enumerate(fixture_convs)}
    slot[4], slot[5] = "convPROPNEW04", "convPROPNEW05"

    model = dict(base_counts)  # conv -> expected row count
    ts = datetime.datetime(2026, 5, 1)
    src_root = tmp_path_factory.mktemp("prop_src")

    for i, op in enumerate(ops):
        if op[0] == "delete":
            convs = sorted({slot[s] for s in op[1]})
            res = SinkSet(out_dir=table).delete_conversations(spark, convs)
            expected_gone = sum(model.pop(c, 0) for c in convs)
            assert res["rows_deleted"] == expected_gone
        else:
            _, s, n_turns, t_idx = op
            conv = slot[s]
            src = str(src_root / f"u{i}.parquet")
            spark.createDataFrame(
                [(conv, j, "assistant", TEXTS[t_idx], None, ts)
                 for j in range(n_turns)],
                "conv_id string, turn_idx int, role string, text string, "
                "tool string, ts timestamp",
            ).coalesce(1).write.mode("overwrite").parquet(src)
            res = pipeline.upsert(spark, src, table, rules_path=RULES)
            assert res["rows_deleted"] == model.get(conv, 0)
            assert res["rows_inserted"] == n_turns
            model[conv] = n_turns

        # invariant after EVERY op: manifest lineage == model total
        manifest = load_manifest(table)["buckets"]
        assert sum(m["rows"] for m in manifest.values()) == sum(model.values())

    # final state: the table IS the model
    got = {
        r["conv_id"]: r["n"]
        for r in SinkSet(out_dir=table)._read_committed(spark)
        .groupBy("conv_id").agg(F.count("*").alias("n")).collect()
    } if sum(model.values()) else {}
    assert got == {c: n for c, n in model.items() if n}
