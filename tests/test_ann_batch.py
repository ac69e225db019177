"""Batched ANN (corpus.ann_search): one pass answers every query.

Covers: batch-vs-single equivalence, exact agreement with a numpy
ground truth, the WindowGroupLimit plan shape (per-query top-k must do
partial top-k BEFORE the shuffle), and a measured recall floor for the
bucketed approximate methods."""

import numpy as np
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from logparse_spark import corpus

SF = "/root/testdata/sf0.01"


def _by_query(rows):
    out = {}
    for r in rows:
        out.setdefault(r["qid"], []).append((r["rk"], r["vec_id"], r["sim_r"]))
    return {q: sorted(v) for q, v in out.items()}


def test_batch_brute_matches_single_query(spark):
    """query_ids=[0] reproduces q_ann_cosine exactly (same ranking,
    same rounded similarities)."""
    single = corpus.q_ann_cosine(spark, SF).collect()
    batch = corpus.ann_search(spark, SF, "brute", query_ids=[0], k=10).collect()
    want = sorted((r["rk"], r["vec_id"], r["sim_r"]) for r in single)
    assert _by_query(batch) == {0: want}


def test_batch_brute_matches_numpy_ground_truth(spark):
    """Exact top-5 for 8 queries vs a numpy oracle (same rounding and
    the same (-sim, vec_id) tie-break)."""
    t = pq.read_table(f"{SF}/embeddings.parquet")
    ids = np.array(t["vec_id"])
    V = np.array([np.asarray(v, dtype=np.float64) for v in t["embedding"].to_pylist()])
    order = np.argsort(ids)
    ids, V = ids[order], V[order]
    norms = np.sqrt((V * V).sum(axis=1))

    qids = list(range(8))
    got = _by_query(corpus.ann_search(spark, SF, "brute", query_ids=qids, k=5).collect())
    for q in qids:
        sims = np.round(V @ V[q] / (norms * norms[q]), 6)
        cand = [(-sims[i], ids[i]) for i in range(len(ids)) if ids[i] != q]
        cand.sort()
        want = [
            (rk + 1, int(vid), float(-negsim))
            for rk, (negsim, vid) in enumerate(cand[:5])
        ]
        assert got[q] == want, f"query {q}"


def test_batch_topk_plan_is_window_group_limit(spark):
    """The per-query rank filter must plan as WindowGroupLimit: each
    input partition keeps only its local top-k per qid before the
    exchange, so the shuffle carries <= k rows per (query, partition)
    instead of the full scored set."""
    for method in ("brute", "lsh"):
        df = corpus.ann_search(spark, SF, method, query_ids=[0, 1, 2], k=5)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        assert "WindowGroupLimit" in plan, (method, plan)


@pytest.mark.parametrize("method,floor", [("lsh", 0.35), ("ivf", 0.40)])
def test_bucketed_recall_floor(spark, method, floor):
    """Measured recall@5 over 16 queries stays above a floor pinned
    from the deterministic fixture (sf0.01 measured: lsh 0.425 at the
    default n_tables=2/probe_radius=1; trained-IVF 0.462 at the
    default k_cells=8/nprobe=2, i.e. scanning ~25% of the corpus —
    at an EQUAL 50% scan fraction the trained quantizer's nprobe=4
    measures 0.788 here / 0.762 at sf0.1 vs the former fixed-centroid
    layout's 0.70, see BENCH/RECALL.md. Floors leave slack only for fixture
    regeneration, the methods themselves are deterministic). The
    fixture's true neighbors sit near cosine 0.3, so single-probe
    single-table LSH is bounded at p^6 ≈ 0.05; the multi-table/
    multi-probe defaults are what make the method usable. Guards
    against a silent bucketing regression (e.g. a hyperplane or
    centroid constant drifting between engines) that correctness
    oracles for the single-query form might keep matching on."""
    qids = list(range(16))
    truth = _by_query(corpus.ann_search(spark, SF, "brute", query_ids=qids, k=5).collect())
    approx = _by_query(corpus.ann_search(spark, SF, method, query_ids=qids, k=5).collect())
    recalls = []
    for q in qids:
        t = {v for _, v, _ in truth[q]}
        a = {v for _, v, _ in approx.get(q, [])}
        recalls.append(len(a & t) / len(t))
    assert sum(recalls) / len(recalls) >= floor, recalls


def test_lsh_recall_monotone_in_tables_and_radius(spark):
    """More tables / larger probe radius can only add candidates, so
    recall is monotone non-decreasing along both levers — and radius 0
    with 1 table reproduces the single-bucket q_ann_lsh semantics."""
    qids = list(range(8))
    truth = _by_query(corpus.ann_search(spark, SF, "brute", query_ids=qids, k=5).collect())

    def recall(nt, pr):
        got = _by_query(
            corpus.ann_search(
                spark, SF, "lsh", query_ids=qids, k=5, n_tables=nt, probe_radius=pr
            ).collect()
        )
        vals = []
        for q in qids:
            t = {v for _, v, _ in truth[q]}
            a = {v for _, v, _ in got.get(q, [])}
            vals.append(len(a & t) / len(t))
        return sum(vals) / len(vals)

    r00 = recall(1, 0)
    r01 = recall(1, 1)
    r21 = recall(2, 1)
    assert r00 <= r01 <= r21, (r00, r01, r21)


def test_ivf_nprobe_full_reproduces_brute(spark):
    """nprobe = K (all cells probed) must equal the exact baseline —
    the approximation comes ONLY from skipping cells."""
    qids = [0, 5, 9]
    brute = _by_query(corpus.ann_search(spark, SF, "brute", query_ids=qids, k=5).collect())
    full = _by_query(
        corpus.ann_search(spark, SF, "ivf", query_ids=qids, k=5,
                          nprobe=corpus._SEM_K).collect()
    )
    assert full == brute


def test_append_ann_index_matches_one_shot(spark, tmp_path):
    """Incremental index growth: an index built on half the corpus and
    appended with the other half must answer probe workloads
    IDENTICALLY to an index built in one shot — for both the LSH and
    IVF layouts — because the hyperplanes are seeded constants and
    the appended vectors are assigned against the persisted
    centroids. With the TRAINED quantizer the half build reuses the
    one-shot build's centroids (the production pattern: train the
    quantizer once — e.g. on a sample — then assign everywhere);
    letting each build re-train would legitimately shift cell
    boundaries between the two indexes."""
    import os

    from pyspark.sql import functions as F

    from logparse_spark.corpus import (
        _emb,
        _read_centroids,
        ann_search,
        append_ann_index,
        build_ann_index,
    )

    sf = "/root/testdata/sf0.001"
    emb = _emb(spark, sf)
    n = emb.count()
    half = n // 2
    one_shot = build_ann_index(spark, sf, str(tmp_path / "full"))
    grown = build_ann_index(
        spark, sf, str(tmp_path / "half"),
        emb=emb.filter(F.col("vec_id") < half),
        centroids=_read_centroids(spark, one_shot),
    )
    res = append_ann_index(
        spark, emb.filter(F.col("vec_id") >= half), grown)
    assert res["ivf_rows"] == n - half

    qids = [0, 7, 23]
    for method in ("lsh", "ivf"):
        a = ann_search(spark, sf, method=method, query_ids=qids, k=5,
                       index_dir=one_shot)
        b = ann_search(spark, sf, method=method, query_ids=qids, k=5,
                       index_dir=grown)
        assert sorted(map(tuple, a.collect())) == \
            sorted(map(tuple, b.collect())), method

    # appended files landed INSIDE the existing partition layout (no
    # new top-level dirs; probes prune exactly as before)
    tops = {d.split("=")[0] for d in os.listdir(os.path.join(grown, "lsh"))
            if not d.startswith(("_", "."))}
    assert tops == {"t"}
    cents = spark.read.parquet(os.path.join(grown, "centroids"))
    assert cents.count() == corpus._SEM_K
