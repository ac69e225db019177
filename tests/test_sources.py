"""Raw syslog compatibility-mode source tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from logparse_spark import sources, stages
from logparse_spark.rules import compile_rules

SAMPLE = """\
Jan 12 06:25:01 webhost1 sshd[1234]: login failed for user mallory from 10.1.2.3
Jan 12 06:25:02 webhost1 cron[77]: heartbeat ping seq=100
Jan 12 06:25:03 dbhost kernel: ERROR 503: upstream returned 503 in step 4
Jan 12 06:25:04 webhost1 sshd[1234]: session opened for user alice
not a syslog line at all
Jan 12 06:26:00 dbhost kernel: ERROR 17: disk quota exceeded in step 9
"""

RULES = """\
rule heartbeat match /^heartbeat ping seq=\\d+$/ ignore
rule authfail  match /login failed for user (\\w+) from ([\\d.]+)/ count {1}
rule error     match /ERROR (\\d+): (.+) in step (\\d+)/ report "err {1} step {3}: {2}"
"""


def test_read_raw_syslog(spark, tmp_path):
    p = tmp_path / "sample.log"
    p.write_text(SAMPLE)
    df = sources.read_raw_syslog(spark, str(p))
    rows = df.orderBy("conv_id", "turn_idx").collect()
    assert len(rows) == 5  # malformed line dropped
    assert rows[0]["conv_id"] == "dbhost" and rows[0]["turn_idx"] == 0
    wh = [r for r in rows if r["conv_id"] == "webhost1"]
    assert [r["turn_idx"] for r in wh] == [0, 1, 2]
    assert wh[0]["role"] == "sshd" and wh[0]["tool"] == "sshd[1234]"
    assert wh[0]["text"].startswith("login failed for user mallory")
    assert str(rows[0]["ts"]).startswith("2026-01-12 06:25:03")


def test_raw_log_through_pipeline(spark, tmp_path):
    """One rule file serves both parquet transcripts and raw syslog."""
    p = tmp_path / "sample.log"
    p.write_text(SAMPLE)
    df = sources.read_raw_syslog(spark, str(p))
    cdf = stages.parse_match(df, compile_rules(RULES))
    counts = {
        r["sink_id"]: r["n"]
        for r in stages.sink_counts(stages.routed(cdf)).collect()
    }
    assert counts == {"authfail": 1, "error": 2, "unmatched": 1}
    rendered = sorted(
        r["rendered"]
        for r in cdf.filter(F.col("action") == "report").collect()
    )
    assert rendered == [
        "err 17 step 9: disk quota exceeded",
        "err 503 step 4: upstream returned 503",
    ]


def test_jsonl_fixture_deterministic_and_parses(spark):
    """gen_jsonl must emit byte-identical output across calls (the
    oracle reads the same file the query reads), and read_raw_jsonl
    must round-trip it to exactly the parquet fixture rows."""
    import hashlib
    import os

    from logparse_spark.fixtures.gen_jsonl import ensure_jsonl_fixture

    import tempfile

    p = ensure_jsonl_fixture("0.001")
    h1 = hashlib.md5(open(p, "rb").read()).hexdigest()
    # regenerate into a throwaway path: determinism is verified without
    # deleting the shared fixture under a parallel runner
    with tempfile.TemporaryDirectory() as td:
        p2 = ensure_jsonl_fixture("0.001", out_path=os.path.join(td, "t.jsonl"))
        h2 = hashlib.md5(open(p2, "rb").read()).hexdigest()
    assert h1 == h2

    jdf = sources.read_raw_jsonl(spark, p)
    pdf = spark.read.parquet(os.path.join(os.path.dirname(p), "transcripts.parquet"))
    assert jdf.count() == pdf.count()
    assert jdf.schema == pdf.schema
    assert jdf.exceptAll(pdf).count() == 0
