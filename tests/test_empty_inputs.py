"""Zero-row inputs must degrade gracefully, not crash: a partition-
scoped run over a table whose filter matched nothing is a normal event
at deployment scale (fresh Iceberg partition, all-violations batch,
empty ingest)."""

from __future__ import annotations

from datapatterns_spark.operators import constraints as C
from datapatterns_spark.operators import dedup as D
from datapatterns_spark.operators.benford import benford
from datapatterns_spark.operators.cardinality import cardinality
from datapatterns_spark.operators.profile import profile


def _empty(spark):
    return spark.createDataFrame([], "a int, s string, ts timestamp")


def test_profile_empty_both_modes(spark):
    for mode in ("exact", "approx"):
        rows = {r["attribute"]: r for r in profile(_empty(spark), mode=mode).collect()}
        # one row per attribute, zeroed stats
        assert set(rows) == {"a", "s", "ts"}
        assert all(r["rec_count"] == 0 and r["fill_count"] == 0 for r in rows.values())


def test_cardinality_benford_empty(spark):
    assert cardinality(_empty(spark)).collect() == []
    out = benford(_empty(spark), field_list=["a"]).collect()
    # expected-distribution row + the analyzed (empty) field row
    assert len(out) == 2


def test_checks_and_dedup_empty(spark):
    df = _empty(spark).withColumnRenamed("a", "turn_idx")
    verdicts, violations = C.run_checks(df, [C.row_rule("nn", "s IS NOT NULL")])
    assert verdicts.collect() == []
    assert violations.collect() == []
    assert D.dedup_exact(_empty(spark), "s", "a").collect() == []
    assert D.minhash_lsh_pairs(_empty(spark), "s", "a").collect() == []


def test_round2_ops_empty(spark):
    """Every round-2 operator degrades to zero rows on empty input."""
    from datapatterns_spark.operators.curation import curate_documents
    from datapatterns_spark.operators.embeddings import (
        normalize_embeddings,
        quantize_embeddings,
    )
    from datapatterns_spark.operators.packing import pack_sequences
    from datapatterns_spark.operators.textanalysis import redact_pii

    docs = spark.createDataFrame([], "doc_id long, text string")
    assert D.conversation_dedup(
        spark.createDataFrame([], "conv_id string, turn_idx int, text string")
    ).collect() == []
    assert D.incremental_exact_dedup(docs, None).collect() == []
    d, sigs = D.incremental_minhash_dedup(docs, None)
    assert d.collect() == [] and sigs.collect() == []
    assert pack_sequences(docs).collect() == []
    assert redact_pii(docs).collect() == []
    assert curate_documents(docs, min_quality=0.1, redact=True).collect() == []
    emb = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert normalize_embeddings(emb).collect() == []
    assert quantize_embeddings(emb).collect() == []
