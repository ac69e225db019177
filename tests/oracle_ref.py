"""Pure-pandas "mini-LogParse" reference oracle (SURVEY.md §5.2 layer 4).

Replays the rule DSL with the reference's scalar, line-at-a-time
semantics (ordered rule scan, first regex match wins, {n} substitution
— SURVEY.md §3.1) over a pandas frame. Deliberately *naive and scalar*
(a Python loop per row) so it shares no vectorization code with the
engine kernel: agreement between the two is meaningful.

Stands in for the reference binary while /root/reference is empty
(SURVEY.md §0); swap the golden source if the mount is populated.
"""

from __future__ import annotations

import pandas as pd

from logparse_spark.rules import CompiledRules, SINK_UNMATCHED


def classify_row(text: object, tool: object, compiled: CompiledRules):
    """Scalar first-match dispatch for ONE row -> dict of output fields."""
    for rule in compiled.rules:
        target = text if rule.spec.field == "text" else tool
        if target is None or (isinstance(target, float) and target != target):
            continue
        m = rule.regex.search(str(target))
        if not m:
            continue
        groups = [m.group(i + 1) for i in range(rule.n_groups)]
        rendered = None
        count_key = None
        if rule.template is not None:
            rendered = rule.template.render_row(m.group(0), groups)
            if rule.spec.action == "count":
                count_key = rendered
        return {
            "rule_id": rule.rule_id,
            "rule_name": rule.spec.name,
            "action": rule.spec.action,
            "sink_id": rule.sink_id,
            "count_key": count_key,
            "rendered": rendered,
            "captures": groups if groups else None,
        }
    return {
        "rule_id": None,
        "rule_name": None,
        "action": SINK_UNMATCHED,
        "sink_id": SINK_UNMATCHED,
        "count_key": None,
        "rendered": None if text is None else str(text),
        "captures": None,
    }


def run_oracle(df: pd.DataFrame, compiled: CompiledRules) -> pd.DataFrame:
    """Classify every row; returns input columns + dispatch columns."""
    rows = [
        classify_row(t, tl, compiled)
        for t, tl in zip(df["text"].tolist(), df["tool"].tolist())
    ]
    out = pd.concat([df.reset_index(drop=True), pd.DataFrame(rows)], axis=1)
    return out


def sink_counts(classified: pd.DataFrame) -> pd.DataFrame:
    """Per-sink aggregate counts (the BASELINE.json:14 equality target)."""
    return (
        classified.groupby("sink_id", dropna=False)
        .size()
        .reset_index(name="n")
        .sort_values("sink_id")
        .reset_index(drop=True)
    )


def routed_rows(classified: pd.DataFrame) -> pd.DataFrame:
    """Routed rows (ignore-action rows dropped), stable order."""
    routed = classified[classified["action"] != "ignore"]
    return (
        routed[["sink_id", "conv_id", "turn_idx", "rendered"]]
        .sort_values(["sink_id", "conv_id", "turn_idx"])
        .reset_index(drop=True)
    )


def keyed_counts(classified: pd.DataFrame) -> pd.DataFrame:
    """COUNT-action keyed tallies: (rule_name, count_key) -> n."""
    c = classified[classified["action"] == "count"]
    return (
        c.groupby(["rule_name", "count_key"])
        .size()
        .reset_index(name="n")
        .sort_values(["rule_name", "count_key"])
        .reset_index(drop=True)
    )
