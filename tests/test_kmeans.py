"""Distributed Lloyd k-means (corpus.kmeans_fit_assign): exact
agreement with a sequential numpy reference under the same
deterministic init, plus the partitioning-stability and plan-shape
properties the Spark-first design claims."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from logparse_spark import corpus

EMB = "/root/testdata/sf0.01/embeddings.parquet"


def _numpy_reference(ids, vecs, k, n_iter):
    order = sorted(range(len(ids)),
                   key=lambda i: (hashlib.md5(str(ids[i]).encode())
                                  .hexdigest(), str(ids[i])))
    cents = np.stack([vecs[i] for i in order[:k]]).astype(np.float64)
    for _ in range(n_iter):
        d = ((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)  # ties -> lowest index, same as Spark
        for c in range(k):
            if (a == c).any():
                # same centroid quantization as kmeans_fit_assign /
                # the DuckDB oracle replication (corpus._quantize_cent)
                cents[c] = [corpus._quantize_cent(v)
                            for v in vecs[a == c].mean(axis=0)]
    d = ((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    return d.argmin(axis=1), cents


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(EMB)


def test_matches_numpy_reference(spark, emb):
    k, n_iter = 6, 4
    assigned, cents = corpus.kmeans_fit_assign(emb, k=k, n_iter=n_iter)
    got = {r["vec_id"]: r["cluster"] for r in assigned.collect()}

    rows = emb.orderBy("vec_id").collect()
    ids = [r["vec_id"] for r in rows]
    vecs = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    ref_a, ref_c = _numpy_reference(ids, vecs, k, n_iter)
    want = dict(zip(ids, (int(x) for x in ref_a)))
    assert got == want
    assert np.allclose(np.array(cents), ref_c, atol=1e-9)
    # clusters are non-trivial on this fixture
    assert len(set(got.values())) > 1


def test_stable_under_partitioning(spark, emb):
    a1, c1 = corpus.kmeans_fit_assign(emb.repartition(1), k=4, n_iter=2)
    a2, c2 = corpus.kmeans_fit_assign(emb.repartition(11), k=4, n_iter=2)
    assert {tuple(r) for r in a1.select("vec_id", "cluster").collect()} == \
           {tuple(r) for r in a2.select("vec_id", "cluster").collect()}
    assert np.allclose(np.array(c1), np.array(c2))


def test_assignment_plan_is_jvm_only(spark, emb):
    assigned, _ = corpus.kmeans_fit_assign(emb, k=3, n_iter=1)
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_semantic_dedup_synthetic(spark):
    """Planted near-duplicate sets (same direction, tiny jitter) in
    well-separated random directions: semantic_dedup keeps exactly one
    representative (the min id) per planted set, keeps singletons, and
    a transitively-chained set collapses to ONE group."""
    rng = np.random.default_rng(7)
    base = rng.normal(size=(10, 64))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = []
    vid = 0
    planted = {}
    for g in range(10):
        n_dup = 3 if g < 4 else 1
        members = []
        for j in range(n_dup):
            v = base[g] + rng.normal(scale=0.003, size=64) * j
            rows.append((vid, [float(x) for x in v]))
            members.append(vid)
            vid += 1
        planted[g] = members
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r["keep"] for r in
           corpus.semantic_dedup(emb, k=5, n_iter=3,
                                 threshold=0.99).collect()}
    assert set(out) == set(range(vid))
    for g, members in planted.items():
        kept = [m for m in members if out[m]]
        if len(members) == 1:
            assert kept == members
        else:
            assert kept == [min(members)], (g, members, kept)


def test_semantic_dedup_precomputed_assignment(spark, emb):
    """assignment= reuses an existing partitioning (e.g. ANN IVF
    cells): feeding the k-means assignment back in must reproduce the
    default result exactly."""
    assigned, _ = corpus.kmeans_fit_assign(emb, k=5, n_iter=3)
    via_param = {r["vec_id"]: r["keep"] for r in corpus.semantic_dedup(
        emb, threshold=0.95,
        assignment=assigned.select("vec_id", "cluster")).collect()}
    default = {r["vec_id"]: r["keep"] for r in corpus.semantic_dedup(
        emb, k=5, n_iter=3, threshold=0.95).collect()}
    assert via_param == default


def test_funnel_strict_ordering(spark):
    """The funnel is ORDERED: a purchase BEFORE the first
    view->click chain does not convert (this is what separates it
    from naive per-type existence, which the dense driver fixture
    cannot discriminate)."""
    import datetime as dt

    from logparse_spark import corpus

    t = dt.datetime(2026, 1, 1)

    def ev(i, uid, typ, minutes):
        return (i, t + dt.timedelta(minutes=minutes), uid, typ, 0.0, "{}")

    rows = [
        # u1: view -> click -> purchase (converts fully)
        ev(1, 1, "view", 0), ev(2, 1, "click", 1), ev(3, 1, "purchase", 2),
        # u2: purchase first, then view -> click (NO purchase conversion)
        ev(4, 2, "purchase", 0), ev(5, 2, "view", 1), ev(6, 2, "click", 2),
        # u3: click before any view (no click conversion either)
        ev(7, 3, "click", 0), ev(8, 3, "view", 1),
        # u4: view only
        ev(9, 4, "view", 0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
              "event_type string, value double, props string")
    import tempfile
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    got = {r["step"]: r["n_users"] for r in
           corpus._funnel_base(spark, d).collect()}
    assert got == {"1_view": 4, "2_click": 2, "3_purchase": 1}


def _funnel_reference(events):
    """Sequential reference of the strict-order funnel: per user,
    t1 = first view; t2 = first click strictly after t1; t3 = first
    purchase strictly after t2."""
    from collections import defaultdict

    by_user = defaultdict(list)
    for ts, uid, typ in events:
        by_user[uid].append((ts, typ))
    n1 = n2 = n3 = 0
    for evs in by_user.values():
        evs.sort()
        t1 = min((t for t, y in evs if y == "view"), default=None)
        if t1 is None:
            continue
        n1 += 1
        t2 = min((t for t, y in evs if y == "click" and t > t1),
                 default=None)
        if t2 is None:
            continue
        n2 += 1
        if any(y == "purchase" and t > t2 for t, y in evs):
            n3 += 1
    return {"1_view": n1, "2_click": n2, "3_purchase": n3}


def test_funnel_matches_reference_property(spark, tmp_path):
    """Hypothesis property: random event permutations (including
    duplicate timestamps and missing steps) must equal the sequential
    reference — the strict-order edge cases one handcrafted test
    can't sweep."""
    import datetime as dt

    from hypothesis import given, settings, strategies as st

    event = st.tuples(
        st.integers(0, 20),                       # minute offset
        st.integers(1, 5),                        # user id
        st.sampled_from(["view", "click", "purchase", "other"]),
    )
    case_n = [0]

    @settings(max_examples=15, deadline=None)
    @given(evs=st.lists(event, min_size=1, max_size=30))
    def check(evs):
        case_n[0] += 1
        t0 = dt.datetime(2026, 1, 1)
        rows = [
            (i, t0 + dt.timedelta(minutes=m), uid, typ, 0.0, "{}")
            for i, (m, uid, typ) in enumerate(evs)
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp_ntz, user_id long, "
                  "event_type string, value double, props string")
        d = str(tmp_path / f"fp_{case_n[0]}")
        df.write.mode("overwrite").parquet(f"{d}/events.parquet")
        got = {r["step"]: r["n_users"] for r in
               corpus._funnel_base(spark, d).collect()}
        want = _funnel_reference(
            [(t0 + dt.timedelta(minutes=m), uid, typ)
             for m, uid, typ in evs])
        assert got == want

    check()


def test_bad_params(spark, emb):
    with pytest.raises(ValueError):
        corpus.kmeans_fit_assign(emb, k=0)
    with pytest.raises(ValueError):
        corpus.kmeans_fit_assign(emb.limit(2), k=5)
