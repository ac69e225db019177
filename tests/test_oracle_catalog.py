"""Oracle-catalog robustness: the 50-entry catalog builds everywhere.

The dedup_embed kmeans/keep oracle arms inline centroid literals
replicated from the driver's sf0.01 embeddings parquet; on a host
without that testdata the catalog must degrade to omitting ONLY that
entry (with a warning), never fail wholesale — the other 49 oracles
have no data dependency at build time."""

from __future__ import annotations

import warnings

import pytest

from logparse_spark import corpus, queries


@pytest.fixture
def _fresh_cent_cache():
    corpus._SEM_CENTS_CACHE = None
    yield
    corpus._SEM_CENTS_CACHE = None


def test_catalog_is_exactly_50_with_testdata():
    o = queries.all_oracles()
    q = queries.all_queries()
    assert len(o) == 50
    assert set(o) == set(q)


def test_missing_testdata_degrades_to_omitting_dedup_embed(
        monkeypatch, _fresh_cent_cache):
    monkeypatch.setattr(queries, "ORACLE_SF", "9.99")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        o = corpus.corpus_oracles()
    assert "dedup_embed" not in o
    assert "ann_bucketed" not in o  # its ivft arm shares the centroids
    # every other corpus oracle is still served
    assert len(o) == len(corpus.CORPUS_QUERIES) - 2
    assert any("dedup_embed" in str(x.message) for x in w)


def test_centroid_quantization_is_pinned(_fresh_cent_cache):
    """Every inlined centroid coordinate is exactly representable at
    the pinned decimal width — i.e. the quantization actually ran on
    the oracle side (guards against one side dropping the round)."""
    cents = corpus._sem_oracle_centroids()
    for c in cents:
        for v in c:
            assert v == corpus._quantize_cent(v)
