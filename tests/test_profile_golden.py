"""Golden-parity tests for profile() — direct ports of the reference's
self-test fixtures (/root/reference/Tests.ecl, groups listed in
FIXTURES.md 1-11).  Every asserted number is the reference's own
golden expectation."""

import pyspark.sql.types as T
import pytest

from datapatterns_spark.operators.profile import profile


def prow(spark, data, schema, **kw):
    df = spark.createDataFrame(data, schema)
    rows = profile(df, **kw).collect()
    return {r["attribute"]: r.asDict(recursive=True) for r in rows}


# ---- 1. basic_string (Tests.ecl:30-75) ----
def test_basic_string(spark):
    out = prow(
        spark, [(s,) for s in ["Dan", "Steve", "", "Mike", "Dan", "Sebastian", "Dan"]], "s string"
    )["s"]
    assert out["rec_count"] == 7
    assert out["fill_count"] == 6
    assert out["fill_rate"] == pytest.approx(85.714286)
    assert out["cardinality"] == 4
    assert out["best_attribute_type"] == "string9"
    assert out["modes"] == [{"value": "Dan", "rec_count": 3}]
    assert (out["min_length"], out["max_length"], out["ave_length"]) == (3, 9, 4)
    pats = {p["data_pattern"]: p["rec_count"] for p in out["popular_patterns"]}
    assert pats == {"Aaa": 3, "Aaaa": 1, "Aaaaa": 1, "Aaaaaaaaa": 1}
    assert out["is_numeric"] is False


# ---- 2. basic_numeric (Tests.ecl:81-126) ----
def test_basic_numeric(spark):
    vals = [-1000, 500, -250, 2000, 1500, -2000, 2000]
    out = prow(spark, [(v,) for v in vals], "n long")["n"]
    assert out["rec_count"] == 7
    assert out["fill_count"] == 7  # no zeros
    assert out["cardinality"] == 6
    assert out["is_numeric"] is True
    assert out["modes"] == [{"value": "2000", "rec_count": 2}]
    assert out["numeric_min"] == -2000.0
    assert out["numeric_max"] == 2000.0
    assert out["numeric_mean"] == pytest.approx(392.8571)
    assert out["numeric_std_dev"] == pytest.approx(1438.3593)
    assert out["numeric_lower_quartile"] == -1000.0
    assert out["numeric_median"] == 500.0
    assert out["numeric_upper_quartile"] == 2000.0
    pats = {p["data_pattern"]: p["rec_count"] for p in out["popular_patterns"]}
    assert pats == {"9999": 3, "-9999": 2, "-999": 1, "999": 1}


# ---- 3. empty/default values over many types (Tests.ecl:134-258) ----
def test_empty_types(spark):
    schema = T.StructType(
        [
            T.StructField("f_boolean", T.BooleanType()),
            T.StructField("f_int64", T.LongType()),
            T.StructField("f_real8", T.DoubleType()),
            T.StructField("f_decimal", T.DecimalType(32, 6)),
            T.StructField("f_string", T.StringType()),
            T.StructField("f_data", T.BinaryType()),
            T.StructField("f_data16", T.BinaryType()),
        ]
    )
    from decimal import Decimal

    out = prow(
        spark,
        [(False, 0, 0.0, Decimal(0), "", b"", b"\x00" * 16)],
        schema,
    )
    # boolean: always filled, cardinality 1, pattern B, length 1
    b = out["f_boolean"]
    assert (b["fill_count"], b["cardinality"]) == (1, 1)
    assert b["popular_patterns"][0]["data_pattern"] == "B"
    assert (b["min_length"], b["max_length"]) == (1, 1)
    # zero numerics: unfilled (allowZero=False), zero stats
    for name in ("f_int64", "f_real8", "f_decimal"):
        n = out[name]
        assert n["fill_count"] == 0, name
        assert n["cardinality"] == 0, name
        assert n["popular_patterns"] == [], name
        assert n["numeric_mean"] == 0.0, name
    # empty string / empty binary: unfilled
    assert out["f_string"]["fill_count"] == 0
    assert out["f_data"]["fill_count"] == 0
    # fixed 16-byte binary: filled, length 16
    d16 = out["f_data16"]
    assert d16["fill_count"] == 1
    assert (d16["min_length"], d16["max_length"]) == (16, 16)


def test_empty_types_allow_zero(spark):
    out = prow(spark, [(0,)], "n long", allow_zero=True)["n"]
    assert out["fill_count"] == 1
    assert out["cardinality"] == 1


# ---- 4. unicode patterns (Tests.ecl:265-284) ----
def test_unicode_pattern(spark):
    out = prow(spark, [("abcdë",), ("ABCDË",)], "s string")["s"]
    pats = {p["data_pattern"]: p["rec_count"] for p in out["popular_patterns"]}
    assert pats == {"aaaaa": 1, "AAAAA": 1}


# ---- 5. punctuation preserved (Tests.ecl:290-307) ----
def test_punctuation_pattern(spark):
    out = prow(spark, [("This! Is- Not. Helpful?",)], "s string")["s"]
    assert out["popular_patterns"][0]["data_pattern"] == "Aaaa! Aa- Aaa. Aaaaaaa?"


# ---- 6. best integer/unsigned types (Tests.ecl:313-356) ----
def test_best_type_integers(spark):
    data = [("-100", "-100", "-1000", "-10000", "-100000")]
    out = prow(spark, data, "s1 string, s2 string, s3 string, s4 string, s5 string")
    exp = ["integer2", "integer2", "integer3", "integer3", "integer4"]
    for i, e in enumerate(exp, 1):
        assert out[f"s{i}"]["best_attribute_type"] == e, f"s{i}"


def test_best_type_unsigned(spark):
    data = [("100", "100", "1000", "10000", "100000")]
    out = prow(spark, data, "s1 string, s2 string, s3 string, s4 string, s5 string")
    exp = ["unsigned2", "unsigned2", "unsigned2", "unsigned3", "unsigned3"]
    for i, e in enumerate(exp, 1):
        assert out[f"s{i}"]["best_attribute_type"] == e, f"s{i}"


# ---- 7. best real / NaN-overflow types (Tests.ecl:362-404) ----
def test_best_type_reals(spark):
    data = [("99.99", "-99.99", "9.1234e-10", ".123", "99.0")]
    out = prow(spark, data, "s1 string, s2 string, s3 string, s4 string, s5 string")
    exp = ["real4", "real4", "real8", "real4", "real4"]
    for i, e in enumerate(exp, 1):
        assert out[f"s{i}"]["best_attribute_type"] == e, f"s{i}"


def test_best_type_nan_overflow(spark):
    data = [
        (
            "123456789012345678901",  # 21 digits: too long for unsigned
            "-12345678901234567890",  # 20 digits signed: too long
            "9.1234e-1000",  # exponent too long
            "99.1234567890123456",  # >15 fraction digits
            "123456789012345678901.0",  # >15 integer digits
        )
    ]
    out = prow(spark, data, "s1 string, s2 string, s3 string, s4 string, s5 string")
    assert out["s1"]["best_attribute_type"] == "string21"
    assert out["s2"]["best_attribute_type"] == "string21"  # 21 chars incl. sign
    assert out["s3"]["best_attribute_type"] == "string12"
    assert out["s4"]["best_attribute_type"] == "string19"
    assert out["s5"]["best_attribute_type"] == "string23"


# ---- 8. embedded child record (Tests.ecl:410-487) ----
def test_embedded_child(spark):
    schema = T.StructType(
        [
            T.StructField("s", T.StringType()),
            T.StructField(
                "foo",
                T.StructType(
                    [
                        T.StructField("x", T.IntegerType()),
                        T.StructField("y", T.IntegerType()),
                        T.StructField("z", T.IntegerType()),
                    ]
                ),
            ),
        ]
    )
    out = prow(spark, [("Dan", (123, 345, 567)), ("Mike", (987, 765, 543))], schema)
    assert set(out) == {"s", "foo.x", "foo.y", "foo.z"}
    fx = out["foo.x"]
    assert fx["numeric_mean"] == 555.0
    assert fx["numeric_std_dev"] == 432.0
    assert fx["numeric_median"] == 555.0
    assert len(fx["correlations"]) == 2
    assert {c["attribute"] for c in fx["correlations"]} == {"foo.y", "foo.z"}


# ---- 9. leading zeros stay strings (Tests.ecl:493-512) ----
def test_leading_zeros(spark):
    data = [
        ("0100", "1234", "0001", "7809", "-0600"),
        ("0020", "0001", "0023", "0001", "600"),
    ]
    out = prow(spark, data, "s1 string, s2 string, s3 string, s4 string, s5 string")
    for i in range(1, 5):
        assert out[f"s{i}"]["best_attribute_type"] == "string4", f"s{i}"
    assert out["s5"]["best_attribute_type"] == "integer3"


# ---- 10. large strings -> variable-length recommendation (Tests.ecl:519-548) ----
def test_large_strings(spark):
    import random

    rng = random.Random(42)

    def rs(n):
        return "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(n))

    data = [
        ("small", "tiny", "s", "four", "600"),
        (rs(5000), rs(500), rs(500), rs(1050), "601"),
    ]
    out = prow(spark, data, "s1 string, s2 string, s3 string, s4 string, s5 string")
    assert out["s1"]["best_attribute_type"] == "string"  # 5000 > 5*1000
    assert out["s3"]["best_attribute_type"] == "string500"
    assert out["s5"]["best_attribute_type"] == "unsigned2"


# ---- 11. SET OF (array) columns (Tests.ecl:554-595) ----
def test_set_of(spark):
    schema = T.StructType(
        [
            T.StructField("n", T.IntegerType()),
            T.StructField("my_set", T.ArrayType(T.IntegerType())),
        ]
    )
    data = [
        (1, [1, 2, 3, 4]),
        (100, [9, 8]),
        (200, [4] * 11),
        (300, []),
        (150, [5, 6]),
    ]
    out = prow(spark, data, schema)["my_set"]
    assert out["rec_count"] == 5
    assert out["fill_count"] == 4
    assert out["fill_rate"] == pytest.approx(80.0)
    assert out["cardinality"] == 4
    assert out["is_numeric"] is False
    # lengths are ELEMENT COUNTS (Profile.ecl:819-820)
    assert (out["min_length"], out["max_length"], out["ave_length"]) == (2, 11, 4)


# ---- feature shaping ----
def test_feature_subset(spark):
    df = spark.createDataFrame([("a",)], "s string")
    out = profile(df, features=("fill_rate", "cardinality"))
    assert out.columns == [
        "attribute",
        "given_attribute_type",
        "rec_count",
        "fill_count",
        "fill_rate",
        "cardinality",
    ]


# ---- mode tie semantics (hard part #3, Profile.ecl:1163-1175) ----
def test_mode_ties(spark):
    # a:2, b:2, c:1 -> both a and b are modes; c not; nothing if all 1s
    df = spark.createDataFrame([("a",), ("a",), ("b",), ("b",), ("c",)], "s string")
    out = profile(df).collect()[0].asDict(recursive=True)
    assert [(m["value"], m["rec_count"]) for m in out["modes"]] == [("a", 2), ("b", 2)]
    df2 = spark.createDataFrame([("a",), ("b",), ("c",)], "s string")
    out2 = profile(df2).collect()[0].asDict(recursive=True)
    assert out2["modes"] == []


def test_empty_input(spark):
    df = spark.createDataFrame([], "s string, n long")
    rows = profile(df).collect()
    assert len(rows) == 2
    for r in rows:
        assert r["rec_count"] == 0
        assert r["fill_count"] == 0
        assert r["best_attribute_type"] == r["given_attribute_type"]
