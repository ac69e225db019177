"""Unit tests: vectorized kernel vs the scalar oracle (layer 2). No Spark."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from logparse_spark.fixtures import gen_transcripts
from logparse_spark.kernel import parse_and_match_pandas, required_literal
from logparse_spark.rules import load_rules
from tests.oracle_ref import classify_row

COMPILED = load_rules("/root/repo/rules/default.rules")


def _kernel_vs_oracle(text, tool, prefilter=True):
    got = parse_and_match_pandas(
        pd.Series(text, dtype=object), pd.Series(tool, dtype=object),
        COMPILED, prefilter=prefilter,
    )
    if not text:
        assert len(got) == 0
        return
    want = pd.DataFrame([classify_row(t, tl, COMPILED) for t, tl in zip(text, tool)])
    for col in ["rule_name", "action", "sink_id", "count_key", "rendered"]:
        assert got[col].where(got[col].notna(), None).tolist() == \
            want[col].where(want[col].notna(), None).tolist(), col
    want_ids = [None if r is None or r != r else int(r) for r in want["rule_id"].tolist()]
    assert [None if r is pd.NA else int(r) for r in got["rule_id"].tolist()] == want_ids
    got_caps = [c if isinstance(c, list) else None for c in got["captures"].tolist()]
    assert got_caps == want["captures"].tolist()


GOLDEN_TEXT = [
    "heartbeat ping seq=42",
    "heartbeat ping seq=42 trailing",          # anchor near-miss
    "login failed for user alice from 10.0.0.1",
    "prefix login failed for user bob from 1.2.3.4 suffix",  # search semantics
    "ERROR 503: upstream returned 503 in step 12",
    "error 503: lowercase in step 12",         # case-sensitive near-miss
    "nothing to see here",
    None,
]
GOLDEN_TOOL = [None, None, None, None, None, "exec(arg=x)", "exec(arg=x)", "calc(arg=v2)"]


def test_kernel_golden():
    _kernel_vs_oracle(GOLDEN_TEXT, GOLDEN_TOOL)


def test_kernel_golden_no_prefilter():
    _kernel_vs_oracle(GOLDEN_TEXT, GOLDEN_TOOL, prefilter=False)


def test_first_match_wins_text_over_tool():
    # row matches both the 'authfail' text rule and the 'toolcall' tool rule:
    # file order says authfail (rule 1) beats toolcall (rule 3)
    got = parse_and_match_pandas(
        pd.Series(["login failed for user x from 1.1.1.1"]),
        pd.Series(["shell(arg=full)"]),
        COMPILED,
    )
    assert got["rule_name"].tolist() == ["authfail"]


def test_kernel_on_fixture_sample():
    t = gen_transcripts(2_000, 100).to_pandas()
    _kernel_vs_oracle(t["text"].tolist(), t["tool"].tolist())
    # every fixture category appears
    got = parse_and_match_pandas(t["text"], t["tool"], COMPILED)
    assert set(got["sink_id"].unique()) == {
        "ignored", "authfail", "error", "toolcall", "unmatched",
    }


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.text(
                alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd", "Zs"),
                                       whitelist_characters=".:=()"),
                max_size=60,
            ),
            st.sampled_from(GOLDEN_TEXT[:-1]),
        ),
        max_size=40,
    )
)
def test_kernel_property_random_text(texts):
    tools = [None] * len(texts)
    _kernel_vs_oracle(texts, tools)


def _arrow_vs_pandas(text, tool):
    """The Arrow kernel must agree with the pandas kernel exactly
    (rule_id + rendered — the slim boundary struct)."""
    import pyarrow as pa

    from logparse_spark.kernel import parse_and_match_arrow

    rid_pa, rendered_pa = parse_and_match_arrow(
        pa.array(text, type=pa.string()), pa.array(tool, type=pa.string()),
        COMPILED,
    )
    want = parse_and_match_pandas(
        pd.Series(text, dtype=object), pd.Series(tool, dtype=object),
        COMPILED, slim=True,
    )
    got_rid = [None if v is None else int(v) for v in rid_pa.to_pylist()]
    want_rid = [None if v is pd.NA else int(v) for v in want["rule_id"].tolist()]
    assert got_rid == want_rid
    want_rendered = want["rendered"].where(want["rendered"].notna(), None).tolist()
    assert rendered_pa.to_pylist() == want_rendered


def test_arrow_kernel_golden():
    _arrow_vs_pandas(GOLDEN_TEXT, GOLDEN_TOOL)


def test_arrow_kernel_first_match_wins():
    _arrow_vs_pandas(["login failed for user x from 1.1.1.1"], ["shell(arg=full)"])


def test_arrow_kernel_on_fixture_sample():
    t = gen_transcripts(2_000, 100).to_pandas()
    _arrow_vs_pandas(t["text"].tolist(), t["tool"].tolist())


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.text(
                alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd", "Zs"),
                                       whitelist_characters=".:=()"),
                max_size=60,
            ),
            st.sampled_from(GOLDEN_TEXT[:-1]),
        ),
        max_size=40,
    )
)
def test_arrow_kernel_property_random_text(texts):
    _arrow_vs_pandas(texts, [None] * len(texts))


def test_required_literal():
    assert required_literal(r"^heartbeat ping seq=\d+$") == "heartbeat ping seq="
    assert required_literal(r"login failed for user (\w+) from ([\d.]+)") == \
        "login failed for user "
    assert required_literal(r"ERROR (\d+): (.+) in step (\d+)") == " in step "
    assert required_literal(r"^(\w+)\(arg=(\w+)\)$") == "arg="
    assert required_literal(r"cat|dog") is None               # alternation
    assert required_literal(r"(abcdef)?xy") is None           # optional group
    assert required_literal(r"colou?r stuff") == "r stuff"    # optional char trimmed
    assert required_literal(r"[abcdefgh]+") is None           # class is not literal


def test_partition_invariant():
    # every row lands in exactly one bucket (SURVEY §5.2 property a)
    t = gen_transcripts(3_000, 150).to_pandas()
    got = parse_and_match_pandas(t["text"], t["tool"], COMPILED)
    assert len(got) == len(t)
    assert got["sink_id"].notna().all()
    by_sink = got.groupby("sink_id").size()
    assert by_sink.sum() == len(t)


def test_any_pattern_cache_not_fooled_by_id_reuse():
    """Regression (round-1 ADVICE): _ANY_PATTERN_CACHE was keyed by
    id(compiled); a GC'd CompiledRules whose id was reused by a NEW rule
    set served the OLD combined pre-scan pattern, silently routing
    matchable rows to unmatched. Content keying must make two rule sets
    with different patterns produce different pre-scan results even when
    objects are created/destroyed in sequence (the id-reuse window)."""
    import gc

    from logparse_spark.kernel import parse_and_match_pandas as run
    from logparse_spark.rules import compile_rules

    rules_a = compile_rules('rule a match /alpha (\\d+)/ count {1}\n')
    text = pd.Series(["beta 7", "alpha 7"], dtype=object)
    tool = pd.Series([None, None], dtype=object)
    got_a = run(text, tool, rules_a)
    assert got_a["rule_name"].where(got_a["rule_name"].notna(), None).tolist() \
        == [None, "a"]
    del rules_a
    gc.collect()  # maximize chance the next compile reuses the freed id
    rules_b = compile_rules('rule b match /beta (\\d+)/ count {1}\n')
    got_b = run(text, tool, rules_b)
    # under the id-keyed cache, the stale "alpha" pre-scan pattern marked
    # "beta 7" unmatchable and this row fell to unmatched (rule_name None)
    assert got_b["rule_name"].where(got_b["rule_name"].notna(), None).tolist() \
        == ["b", None]


def test_named_group_pattern_rewrites():
    """named_group_pattern: the RE2-extraction rewrite must name exactly
    the capturing groups, leaving escapes, classes, and (?: alone."""
    from logparse_spark.kernel import named_group_pattern as ngp

    assert ngp(r"a(\d+)b") == r"(?P<g0>a(?P<g1>\d+)b)"
    assert ngp(r"(?:x)(y)") == r"(?P<g0>(?:x)(?P<g2>y))".replace("g2", "g1")
    # escaped paren is a literal, not a group
    assert ngp(r"\((\w+)\)") == r"(?P<g0>\((?P<g1>\w+)\))"
    # ( inside a character class is a literal
    assert ngp(r"[(](\w)") == r"(?P<g0>[(](?P<g1>\w))"
    # []] / [^]] leading-]-is-literal forms must not close the class
    assert ngp(r"[]x](a)") == r"(?P<g0>[]x](?P<g1>a))"
    assert ngp(r"[^]x](a)") == r"(?P<g0>[^]x](?P<g1>a))"
    # pre-existing named groups: bail (index mapping would be ambiguous)
    assert ngp(r"(?P<x>\d+)") is None


def test_arrow_extraction_matches_python_re():
    """The extraction dispatcher must reproduce Python-re semantics on
    the DSL subset — multi-group, whole-match {0}, and crucially a NULL
    (not "") capture for a non-participating optional group, which raw
    RE2 extract_regex cannot represent."""
    import numpy as np
    import pyarrow as pa

    from logparse_spark.kernel import _extract_groups, _extract_with_whole
    from logparse_spark.rules import compile_rules

    rules = compile_rules(
        "rule ssh match /Failed password for (invalid user )?(\\w+) from ([\\d.]+) port (\\d+)/ count {2}\n"
    )
    rule = rules.rules[0]
    rows = [
        "Failed password for invalid user eve from 9.8.7.6 port 22",
        "Failed password for root from 1.2.3.4 port 2222",
    ]
    ser = pd.Series(rows, dtype=object)
    got = _extract_groups(
        pa.array(rows, type=pa.string()),
        lambda pos: ser if pos is None else ser.iloc[np.asarray(pos)],
        rule,
    )
    want = _extract_with_whole(ser, rule)
    for j in range(rule.n_groups + 1):
        g = got.iloc[:, j].where(got.iloc[:, j].notna(), None).tolist()
        w = want.iloc[:, j].where(want.iloc[:, j].notna(), None).tolist()
        assert g == w, f"group {j}"
    assert got.iloc[1, 1] is None or got.iloc[1, 1] != got.iloc[1, 1]


def test_full_scan_and_gather_paths_agree(monkeypatch):
    """Both sides of the _FULL_SCAN_FRAC crossover must classify a
    fixture sample identically (the threshold is a cost knob, never a
    semantics knob)."""
    from logparse_spark import kernel

    t = gen_transcripts(3_000, 150).to_pandas()
    text = t["text"].astype(object)
    tool = t["tool"].astype(object)

    monkeypatch.setattr(kernel, "_FULL_SCAN_FRAC", 0.0)  # always full scan
    full = kernel.parse_and_match_pandas(text, tool, COMPILED)
    monkeypatch.setattr(kernel, "_FULL_SCAN_FRAC", 2.0)  # always gather
    gather = kernel.parse_and_match_pandas(text, tool, COMPILED)
    for col in ["rule_id", "sink_id", "rendered", "count_key"]:
        assert full[col].where(full[col].notna(), None).tolist() == \
            gather[col].where(gather[col].notna(), None).tolist(), col


def test_first_match_wins_across_prescan_blocks(monkeypatch):
    """Block prescan must only SKIP rows a block cannot match — never
    reorder dispatch. With _BLOCK_SIZE=2, a row matching rules in two
    different blocks must still go to the earlier rule, and a row
    matching only a later block must reach it."""
    from logparse_spark import kernel
    from logparse_spark.rules import compile_rules

    monkeypatch.setattr(kernel, "_BLOCK_SIZE", 2)
    monkeypatch.setattr(kernel, "_BLOCK_MIN_FRAC", 0.0)
    rules = compile_rules(
        "rule a match /alpha (\\d+)/ count {1}\n"
        "rule b match /beta/ ignore\n"
        "rule c match /gamma (\\w+)/ report \"g={1}\"\n"
        "rule d match /alpha/ ignore\n"          # shadowed by a for digits
        "rule e on tool match /^probe$/ count {0}\n"
    )
    text = pd.Series(
        ["alpha 7 gamma x",   # matches a (block 0) AND c,d (block 1) -> a
         "gamma y",           # only block 1 -> c
         "alpha seven",       # a's \d+ fails; d (block 1) claims
         "nothing",           # tool rule e claims via block 2
         "zilch"], dtype=object)
    tool = pd.Series([None, None, None, "probe", None], dtype=object)
    got = kernel.parse_and_match_pandas(text, tool, rules)
    assert got["rule_name"].where(got["rule_name"].notna(), None).tolist() \
        == ["a", "c", "d", "e", None]

    import pyarrow as pa
    rid, _ = kernel.parse_and_match_arrow(
        pa.array(text, type=pa.string(), from_pandas=True),
        pa.array(tool, type=pa.string(), from_pandas=True), rules)
    assert [None if v is None else int(v) for v in rid.to_pylist()] \
        == [0, 2, 3, 4, None]
