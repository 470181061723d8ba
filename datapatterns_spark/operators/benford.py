"""Benford() — significant-digit distribution + chi-squared conformance.

Spark-first reimplementation of /root/reference/Benford.ecl:90-329:
one melt scan extracts the Nth significant digit for every column,
one aggregation computes the ten digit percentages per column
(DECIMAL4_1 semantics -> rounded to 1 decimal), and the chi-squared
statistic is computed from the *rounded* percentages against the
published expected distribution (Benford.ecl:116-138, 286-299).

Output contract (Benford.ecl:302-326): the expected-distribution row
first (chi_squared = the critical value, num_values = total rows),
then one row per analyzed column in schema order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.benford_digit import nth_digit
from ..plans.local import lit_df
from ..plans.schema_walk import walk_schema
from .profile import _deterministic_sample

# Expected distributions for significant-digit positions 1..4
# (Benford.ecl:117-138).  Position 1 has no zero digit (sentinel -1).
EXPECTED = {
    1: [-1.0, 30.1, 17.6, 12.5, 9.7, 7.9, 6.7, 5.8, 5.1, 4.6],
    2: [12.0, 11.4, 10.9, 10.4, 10.0, 9.7, 9.3, 9.0, 8.8, 8.5],
    3: [10.2, 10.1, 10.1, 10.1, 10.0, 10.0, 9.9, 9.9, 9.9, 9.8],
    4: [10.0, 10.0, 10.0, 10.0, 10.0, 10.0, 10.0, 10.0, 10.0, 10.0],
}

# 99%-probability chi-squared critical values: 8 dof for digit 1 (no
# zero), 9 dof otherwise (Benford.ecl:104-114).
CRITICAL_1 = 20.090
CRITICAL_N = 21.666

DIGIT_NAMES = ["zero", "one", "two", "three", "four", "five", "six", "seven", "eight", "nine"]

# Spark simpleString names of integer types — these take nth_digit's
# regex-free substring fast path
INTEGRAL_TYPES = frozenset({"tinyint", "smallint", "int", "bigint"})
# float/double take the translate-based fast path (scientific/NaN/Inf
# renderings fall back to the generic scanner inside nth_digit)
FRACTIONAL_TYPES = frozenset({"float", "double"})


def benford(
    df: DataFrame,
    field_list: list[str] | str | None = None,
    digit: int = 1,
    sample_size: int = 100,
) -> DataFrame:
    """Digit-distribution vs Benford's Law for every (selected) column."""
    if isinstance(field_list, str):
        field_list = [f for f in field_list.replace(" ", "").split(",") if f] or None
    clamped = min(max(int(digit), 1), 4)  # Benford.ecl:92-96
    critical = CRITICAL_1 if clamped == 1 else CRITICAL_N
    expected = EXPECTED[clamped]

    attrs, _children = walk_schema(df.schema, field_list)
    if not attrs:
        raise ValueError("no analyzable attributes found")
    sampled = _deterministic_sample(df, sample_size)
    total = sampled.count()

    def _dec_scale(t: str) -> int | None:
        # "decimal(12,3)" -> 3; None for non-decimal types
        if not t.startswith("decimal("):
            return None
        return int(t[t.rindex(",") + 1 : -1])

    structs = [
        F.struct(
            F.lit(a.name).alias("attribute"),
            nth_digit(
                F.col(a.name),
                clamped,
                integral=a.given_type in INTEGRAL_TYPES,
                fractional=a.given_type in FRACTIONAL_TYPES,
                decimal_scale=_dec_scale(a.given_type),
            ).alias("n"),
        )
        for a in attrs
    ]
    melted = sampled.select(F.inline(F.array(*structs))).filter(F.col("n") != 10)

    pct = [
        F.round(
            F.count(F.when(F.col("n") == d, 1)) / F.count(F.lit(1)) * 100, 1
        ).alias(DIGIT_NAMES[d])
        for d in range(10)
    ]
    agg = melted.groupBy("attribute").agg(
        *pct, F.count(F.lit(1)).alias("num_values")
    )

    spark = df.sparkSession
    order_rows = [(a.name, i + 1) for i, a in enumerate(attrs)]
    order_df = lit_df(spark, order_rows, "attribute string, _ord int")
    # columns where every value lacked a usable digit still get a
    # zero-filled row (ECL's aggregate TABLE over an empty set)
    agg = (
        order_df.join(agg, "attribute", "left")
        .na.fill({n: 0.0 for n in DIGIT_NAMES})
        .na.fill({"num_values": 0})
    )
    if clamped == 1:
        agg = agg.withColumn("zero", F.lit(-1.0))  # Benford.ecl:264

    # chi-squared over the rounded percentages (Benford.ecl:286-299);
    # the zero digit participates only for positions > 1
    terms = []
    for d in range(10):
        if d == 0 and clamped == 1:
            continue
        e = expected[d]
        o = F.col(DIGIT_NAMES[d])
        terms.append((o - F.lit(e)) * (o - F.lit(e)) / F.lit(e))
    chi = terms[0]
    for t in terms[1:]:
        chi = chi + t
    agg = agg.withColumn("chi_squared", F.round(chi, 3))

    expected_row = lit_df(
        spark,
        [
            tuple(
                [f"-- EXPECTED DIGIT {clamped} --"]
                + [float(x) for x in expected]
                + [float(critical), total, 0]
            )
        ],
        "attribute string, "
        + ", ".join(f"{n} double" for n in DIGIT_NAMES)
        + ", chi_squared double, num_values long, _ord int",
    )
    cols = ["attribute", *DIGIT_NAMES, "chi_squared", "num_values", "_ord"]
    out = agg.select(*cols).unionByName(expected_row.select(*cols))
    return out.orderBy("_ord").drop("_ord")
