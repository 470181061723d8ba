"""The DP_MATERIALIZE deployment switch: operators must produce
identical results under every mode, persist mode must retain lineage
(executor-loss recompute) and be releasable at job boundaries, and
iterative loops must still converge when the mode keeps lineage."""

import pytest

from datapatterns_spark import materialize as M
from datapatterns_spark.operators import dedup as D


def _jvm_cache_empty(spark):
    return (
        spark._jsparkSession.sharedState().cacheManager().isEmpty()
    )


@pytest.fixture
def corpus(spark):
    shared = "the quick brown fox jumps over the lazy dog every single day"
    rows = [(i, f"doc {i} {shared}") for i in range(30)] + [
        (100, "completely different text about nothing shared at all here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_invalid_mode_rejected():
    with pytest.raises(ValueError):
        M.set_materialize_mode("cache")
    M.set_materialize_mode(None)


def test_env_mode_validated(monkeypatch):
    monkeypatch.setenv("DP_MATERIALIZE", "bogus")
    with pytest.raises(ValueError):
        M.materialize_mode()


def test_persist_mode_equals_default_and_releases(spark, corpus):
    """minhash_lsh_pairs (three materialize sites) yields identical
    pairs under persist mode; the persisted frames are visible in the
    CacheManager until release_all(), after which the session is
    clean — the documented job-boundary contract."""
    base = sorted(
        tuple(r) for r in D.minhash_lsh_pairs(corpus, "text", "doc_id").collect()
    )
    M.set_materialize_mode("persist")
    try:
        got = sorted(
            tuple(r)
            for r in D.minhash_lsh_pairs(corpus, "text", "doc_id").collect()
        )
        assert got == base
        assert not _jvm_cache_empty(spark)
        assert M.release_all() >= 3
        assert _jvm_cache_empty(spark)
    finally:
        M.set_materialize_mode(None)
        M.release_all()


def test_persist_mode_keeps_lineage(spark, corpus):
    """The point of persist mode: the returned frame still has its
    lineage (storage level set, plan not truncated to an
    ExistingRDD-style scan), so executor loss recomputes instead of
    failing."""
    M.set_materialize_mode("persist")
    try:
        out = M.materialize(corpus.select("doc_id"))
        assert out.storageLevel.useMemory
        assert "LocalTableScan" in out._jdf.queryExecution().optimizedPlan().toString() or (
            "Project" in out._jdf.queryExecution().optimizedPlan().toString()
        )
    finally:
        M.set_materialize_mode(None)
        M.release_all()


def test_persist_mode_iterative_loop_converges(spark):
    """connected_components' loop marks its per-round cut as
    cut_lineage-required; under persist mode it falls back to a real
    lineage cut, so a long chain still converges with a bounded plan
    (a bare persist doubles the plan per round)."""
    edges = [(i, i + 1) for i in range(14)]
    df = spark.createDataFrame(edges, "a long, b long")
    base = sorted(
        tuple(r) for r in D.connected_components(df, "a", "b").collect()
    )
    M.set_materialize_mode("persist")
    try:
        got = sorted(
            tuple(r) for r in D.connected_components(df, "a", "b").collect()
        )
        assert got == base
        assert {c for _, c in got} == {0}
    finally:
        M.set_materialize_mode(None)
        M.release_all()
