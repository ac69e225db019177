"""Write-audit-publish (WAP) gate for the routed sink table.

The manifest design makes Iceberg's WAP branch pattern natural: a run's
files are invisible until :meth:`SinkSet.commit` swaps the manifest, so
"staged" IS "written but uncommitted". ``pipeline.run(audit=...)``
evaluates the audit on each group's staged files BEFORE the commit; a
violation aborts the publish — the manifest is never touched, readers
keep seeing the previous snapshot, and the staged run dir is left as an
orphan for :meth:`SinkSet.vacuum` (exactly how a dropped WAP branch
dies). Committed earlier groups stand, so a fixed rerun resumes past
them.

Scale contract: an audit over a 100 TB staging write must not become a
second full pipeline. :func:`expect` therefore compiles the whole
expectation list into ONE aggregate job over the staged files (one
scan, partial+final agg, a 1-row result to the driver) instead of one
job per check, and every violated expectation is reported in a single
failure so the operator never plays whack-a-mole at one rerun per
violation.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class AuditFailed(Exception):
    """The staged run violated its expectations; nothing was published."""


@dataclass(frozen=True)
class Expectation:
    """One named check: an AGGREGATE expression over the staged rows
    plus a predicate on its (driver-side, scalar) result."""

    name: str
    metric: Column
    ok: Callable[[object], bool]
    describe: str  # human-readable bound, rendered into the failure


def rows_at_least(n: int) -> Expectation:
    """Guard against an upstream outage publishing a near-empty batch."""
    return Expectation(
        name="rows_at_least",
        metric=F.count(F.lit(1)),
        ok=lambda v: int(v) >= n,
        describe=f"staged rows >= {n}",
    )


def unmatched_fraction_below(limit: float) -> Expectation:
    """A rule-set/log-format drift alarm: when the input's shape moves
    out from under the rules, the unmatched fraction is the first
    signal — block the publish instead of silently filling the
    unmatched sink."""
    return Expectation(
        name="unmatched_fraction_below",
        metric=F.try_divide(
            F.count(F.when(F.col("sink_id") == "unmatched", 1)),
            F.count(F.lit(1)),
        ),
        ok=lambda v: v is not None and float(v) < limit,
        describe=f"unmatched fraction < {limit}",
    )


def null_fraction_below(column: str, limit: float) -> Expectation:
    """Column-quality bound (e.g. enrichment coverage: a spike of null
    role_class means the broadcast dictionary no longer covers the
    traffic)."""
    return Expectation(
        name=f"null_fraction_below[{column}]",
        metric=F.try_divide(
            F.count(F.when(F.col(column).isNull(), 1)), F.count(F.lit(1))
        ),
        ok=lambda v: v is not None and float(v) < limit,
        describe=f"null fraction of {column} < {limit}",
    )


def keys_never_null() -> Expectation:
    """The table's identity columns must be total — a null conv_id or
    turn_idx breaks bucketing, ordering and row-level ops downstream."""
    return Expectation(
        name="keys_never_null",
        metric=F.count(
            F.when(F.col("conv_id").isNull() | F.col("turn_idx").isNull(), 1)
        ),
        ok=lambda v: int(v) == 0,
        describe="conv_id/turn_idx never null",
    )


def sinks_within(allowed: list[str]) -> Expectation:
    """No row may route to a sink outside the compiled rule set (a
    corrupted sink_id would create phantom partitions forever)."""
    allowed_set = set(allowed)
    return Expectation(
        name="sinks_within",
        metric=F.collect_set("sink_id"),
        ok=lambda v: set(v or []) <= allowed_set,
        describe=f"sink_id within {sorted(allowed_set)}",
    )


def expect(*expectations: Expectation) -> Callable[[DataFrame], None]:
    """Compile expectations into a single-pass audit callable for
    ``pipeline.run(audit=...)``. One aggregate job over the staged
    files; raises :class:`AuditFailed` naming EVERY violated
    expectation with its observed value."""
    if not expectations:
        raise ValueError("expect() needs at least one Expectation")
    names = [e.name for e in expectations]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate expectation names: {names}")

    def audit(staged: DataFrame) -> None:
        row = staged.agg(
            *[e.metric.alias(f"m{i}") for i, e in enumerate(expectations)]
        ).first()
        failures = []
        for i, e in enumerate(expectations):
            got = row[f"m{i}"]
            if not e.ok(got):
                failures.append(f"{e.name}: expected {e.describe}, got {got!r}")
        if failures:
            raise AuditFailed(
                "staged run failed audit — publish aborted, manifest "
                "untouched, staged files left for vacuum:\n  "
                + "\n  ".join(failures)
            )

    return audit
