"""Exact-vs-sketch tolerance tests (SURVEY.md §5.4): the approx mode's
HLL cardinality and percentile_approx quantiles must track the exact
mode within documented error bounds."""

import pytest

from datapatterns_spark.operators.profile import profile


@pytest.fixture(scope="module")
def lineitem(spark):
    return spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")


def _by_attr(df):
    return {r["attribute"]: r.asDict(recursive=True) for r in df.collect()}


def test_hll_cardinality_tolerance(spark, lineitem):
    exact = _by_attr(profile(lineitem, features=("cardinality",), mode="exact"))
    approx = _by_attr(profile(lineitem, features=("cardinality",), mode="approx"))
    for attr, e in exact.items():
        a = approx[attr]["cardinality"]
        if e["cardinality"] == 0:
            assert a == 0
        else:
            rel = abs(a - e["cardinality"]) / e["cardinality"]
            assert rel < 0.05, (attr, e["cardinality"], a)


def test_sketch_quantiles_tolerance(spark, lineitem):
    feats = ("min_max", "mean", "std_dev", "quartiles")
    exact = _by_attr(profile(lineitem, features=feats, mode="exact"))
    approx = _by_attr(profile(lineitem, features=feats, mode="approx"))
    for attr, e in exact.items():
        a = approx[attr]
        # min/max/mean/stddev are exact in both modes
        for k in ("numeric_min", "numeric_max", "numeric_mean", "numeric_std_dev"):
            assert a[k] == pytest.approx(e[k], abs=1e-4), (attr, k)
        # quantiles: sketch within a small value tolerance of the
        # reference's positional quartiles
        spread = (e["numeric_max"] - e["numeric_min"]) or 1.0
        for k in ("numeric_lower_quartile", "numeric_median", "numeric_upper_quartile"):
            assert abs(a[k] - e[k]) <= 0.02 * spread + 1e-9, (attr, k, e[k], a[k])


def test_approx_profile_modes_match_exact_for_low_card(spark, lineitem):
    from datapatterns_spark.operators.profile import ProfileParams

    limit = ProfileParams().approx_mode_card_limit
    exact = _by_attr(profile(lineitem, features=("modes", "cardinality"), mode="exact"))
    approx = _by_attr(profile(lineitem, features=("modes", "cardinality"), mode="approx"))
    for attr in exact:
        if exact[attr]["cardinality"] <= limit * 0.9:
            # low-card attributes: approx modes are exact
            assert exact[attr]["modes"] == approx[attr]["modes"], attr
        elif exact[attr]["cardinality"] > limit * 1.1:
            # high-card attributes are skipped in approx mode
            # (documented deviation)
            assert approx[attr]["modes"] == [], attr


def test_fill_and_lengths_identical_across_modes(spark, lineitem):
    feats = ("fill_rate", "lengths")
    exact = _by_attr(profile(lineitem, features=feats, mode="exact"))
    approx = _by_attr(profile(lineitem, features=feats, mode="approx"))
    assert exact == approx


def test_heavy_pattern_candidate_path(spark):
    """The near-unique pattern space path (sampled candidates + exact
    resolution) must surface dominant patterns with EXACT counts and
    keep rare/popular disjoint."""
    from pyspark.sql import functions as F

    from datapatterns_spark.operators.profile import (
        ProfileParams,
        _profile_flat,
    )
    from datapatterns_spark.plans.schema_walk import walk_schema

    # 800 rows of one dominant pattern, 400 of a second, plus ~1000
    # rows spread over 23*13=299 distinct short letter/digit-run
    # patterns (each unique pattern stays under the 100-char pattern
    # truncation)
    df = spark.range(2200).select(
        F.when(F.col("id") < 800, F.lit("AB12"))
        .when((F.col("id") >= 800) & (F.col("id") < 1200), F.lit("zz zz"))
        .otherwise(
            F.concat(
                F.repeat(F.lit("X"), (F.col("id") % 23 + 1).cast("int")),
                F.repeat(F.lit("7"), (F.col("id") % 13 + 1).cast("int")),
            )
        )
        .alias("t")
    )
    attrs, _ = walk_schema(df.schema, None)
    # limit=10 < the ~19 sampled-distinct-pattern estimate (the 1/16
    # value-hash gate samples whole values, so ~300 true patterns
    # estimate as ~19) -> the column classifies HEAVY and exercises the
    # sampled-candidates + exact-resolution machinery; max_patterns
    # stays well under the candidate count so the rare side is fed
    params = ProfileParams(
        features=("patterns", "fill_rate"),
        mode="approx",
        approx_pattern_limit=10,
        max_patterns=10,
    )
    out = _profile_flat(df, attrs, params, "", "").collect()[0].asDict(recursive=True)
    pats = {p["data_pattern"]: p["rec_count"] for p in out["popular_patterns"]}
    # exact resolved counts for the dominant patterns (800 "AB12" rows
    # plus the 3 generated "XX77" values share pattern AA99)
    assert pats["AA99"] == 803
    assert pats["aa aa"] == 400
    # rare patterns disjoint from popular ones (anti-join J3)
    rare = {p["data_pattern"] for p in out["rare_patterns"]}
    assert rare.isdisjoint(set(pats))
    assert len(rare) > 0


def test_nth_digit_integral_fast_path_matches_generic(spark):
    from pyspark.sql import functions as F

    from datapatterns_spark.functions.benford_digit import nth_digit

    df = spark.range(-5000, 5000).select(F.col("id").cast("long").alias("v"))
    for pos in (1, 2, 3, 4):
        mismatch = (
            df.select(
                nth_digit(F.col("v"), pos).alias("slow"),
                nth_digit(F.col("v"), pos, integral=True).alias("fast"),
            )
            .filter(F.col("slow") != F.col("fast"))
            .count()
        )
        assert mismatch == 0, pos


def test_nth_digit_fractional_fast_path_matches_generic(spark):
    from pyspark.sql import functions as F

    from datapatterns_spark.functions.benford_digit import nth_digit

    # dense coverage of renderings: integers-as-double, fractions,
    # sub-1 values with leading zeros, scientific notation (tiny/huge),
    # specials
    df = (
        spark.range(-3000, 3000)
        .select((F.col("id") / 7.0).alias("v"))
        .union(spark.range(1, 200).select((F.lit(1.0) / F.pow(F.lit(10.0), F.col("id") % 12)).alias("v")))
        .union(spark.range(1, 200).select((F.col("id") * F.pow(F.lit(10.0), F.col("id") % 19)).alias("v")))
        .union(
            spark.createDataFrame(
                [(0.0,), (None,), (float("nan"),), (float("inf"),), (float("-inf"),), (1e-300,), (9.99e307,)],
                "v double",
            )
        )
    )
    for pos in (1, 2, 3, 4):
        mismatch = (
            df.select(
                "v",
                nth_digit(F.col("v"), pos).alias("slow"),
                nth_digit(F.col("v"), pos, fractional=True).alias("fast"),
            )
            .filter(
                F.col("slow").eqNullSafe(F.col("fast")) == F.lit(False)
            )
            .collect()
        )
        assert mismatch == [], (pos, mismatch[:5])


def test_driver_tail_matches_cluster_tail(spark, lineitem):
    """The driver-side approx finishing (collect bounded follow-ups,
    finish top-k/modes/breakdown/correlations in Python, emit one
    literal frame) must be value-identical to the cluster-side
    assembly it replaces — full feature set, mixed kinds, ties,
    correlations included."""
    import os

    rows_driver = profile(lineitem, mode="approx").collect()
    os.environ["DP_APPROX_TAIL"] = "cluster"
    try:
        rows_cluster = profile(lineitem, mode="approx").collect()
    finally:
        del os.environ["DP_APPROX_TAIL"]
    a = [r.asDict(recursive=True) for r in rows_driver]
    b = [r.asDict(recursive=True) for r in rows_cluster]
    assert a == b


def test_heavy_pattern_estimate_mode(spark, monkeypatch):
    """DP_PATTERN_COUNTS=estimate: one-stage heavy path — no resolution
    re-scan; dominant patterns still surface, counts are scaled sample
    counts (multiples of the sample modulus) within sampling error."""
    from pyspark.sql import functions as F

    from datapatterns_spark.operators.profile import (
        ProfileParams,
        _profile_flat,
    )
    from datapatterns_spark.plans.schema_walk import walk_schema

    df = spark.range(2200).select(
        F.when(F.col("id") < 800, F.lit("AB12"))
        .when((F.col("id") >= 800) & (F.col("id") < 1200), F.lit("zz zz"))
        .otherwise(
            F.concat(
                F.repeat(F.lit("X"), (F.col("id") % 23 + 1).cast("int")),
                F.repeat(F.lit("7"), (F.col("id") % 13 + 1).cast("int")),
            )
        )
        .alias("t")
    )
    attrs, _ = walk_schema(df.schema, None)
    params = ProfileParams(
        features=("patterns", "fill_rate"),
        mode="approx",
        approx_pattern_limit=10,
        max_patterns=10,
    )
    monkeypatch.setenv("DP_PATTERN_COUNTS", "estimate")
    out = _profile_flat(df, attrs, params, "", "").collect()[0].asDict(recursive=True)
    pats = {p["data_pattern"]: p["rec_count"] for p in out["popular_patterns"]}
    assert "AA99" in pats and "aa aa" in pats
    # seeded 1/16 Bernoulli -> scaled counts within sampling error
    assert abs(pats["AA99"] - 803) <= 0.35 * 803
    assert abs(pats["aa aa"] - 400) <= 0.35 * 400
    # counts are pure scale-ups of sampled counts
    assert all(c % 16 == 0 for c in pats.values())
    rare = {p["data_pattern"] for p in out["rare_patterns"]}
    assert rare.isdisjoint(set(pats))
    assert len(rare) > 0
