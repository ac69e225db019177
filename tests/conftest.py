import os
import sys

import pytest

sys.path.insert(0, "/root/repo")


@pytest.fixture(scope="session")
def spark():
    from logparse_spark.session import get_spark

    s = get_spark(app_name="logparse_tests", master="local[4]", shuffle_partitions=8,
                  extra_conf={"spark.driver.memory": "4g"})
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixture_sf_small(tmp_path_factory):
    """Small deterministic transcripts fixture dir (t1 smoke scale)."""
    from logparse_spark.fixtures import ensure_fixture

    return ensure_fixture("0.001")


def scan_num_files(df, path_substr: str) -> int:
    """numFiles metric of the executed FileSourceScan whose path
    contains ``path_substr`` — the runtime truth of partition pruning
    (DataFrame.inputFiles() lists the UNPRUNED table, so it cannot
    prove pruning). Descends AQE query-stage leaves. Shared by the
    plan-shape tests (ANN index probes, point lookups)."""
    df.collect()  # materialize metrics

    def walk(node, out):
        name = node.getClass().getSimpleName()
        if "FileSourceScan" in name:
            out.append(node)
        if name == "AdaptiveSparkPlanExec":
            return walk(node.executedPlan(), out)
        if name.endswith("QueryStageExec"):
            return walk(node.plan(), out)
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i), out)
        return out

    scans = walk(df._jdf.queryExecution().executedPlan(), [])
    # identify by the relation's actual root path: toString() truncates
    # location strings at spark.sql.maxMetadataStringLength (100), which
    # silently cuts long pytest tmp paths
    hits = [
        s for s in scans
        if path_substr in s.relation().location().rootPaths().apply(0).toString()
    ]
    assert hits, f"no FileSourceScan over {path_substr!r} in executed plan"
    return sum(int(s.metrics().apply("numFiles").value()) for s in hits)
