"""NormalizeProfileResults() — melt a Profile result into
(attribute, key, value) triples for profile-vs-profile diffing.

Spark-first reimplementation of
/root/reference/NormalizeProfileResults.ecl:25-104: scalar columns are
stringified; the nested child datasets are serialized
``item:count|item:count`` (patterns/modes/breakdowns) and
``attr:corr`` (correlations) joined with '|'
(NormalizeProfileResults.ecl:76-82).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NESTED_SERIALIZERS = {
    "popular_patterns": ("data_pattern", "rec_count"),
    "rare_patterns": ("data_pattern", "rec_count"),
    "modes": ("value", "rec_count"),
    "cardinality_breakdown": ("value", "rec_count"),
}


def _serialize(col_name: str, dt: T.DataType) -> Column:
    c = F.col(col_name)
    if isinstance(dt, T.ArrayType) and isinstance(dt.elementType, T.StructType):
        if col_name in _NESTED_SERIALIZERS:
            key_f, cnt_f = _NESTED_SERIALIZERS[col_name]
            items = F.transform(
                c,
                lambda s: F.concat(
                    F.trim(s[key_f].cast("string")), F.lit(":"), s[cnt_f].cast("string")
                ),
            )
        elif col_name == "correlations":
            items = F.transform(
                c,
                lambda s: F.concat(
                    F.trim(s["attribute"]),
                    F.lit(":"),
                    F.round(s["corr"], 6).cast("string"),
                ),
            )
        else:
            items = F.transform(c, lambda s: s.cast("string"))
        return F.coalesce(F.array_join(items, "|"), F.lit(""))
    if isinstance(dt, T.BooleanType):
        return F.when(c, "true").otherwise("false")
    return F.coalesce(c.cast("string"), F.lit(""))


def normalize_profile_results(profile_df: DataFrame) -> DataFrame:
    """Melt one-row-per-attribute profile output into
    (attribute, key, value) string triples, in profile column order."""
    structs = [
        F.struct(
            F.lit(f.name).alias("key"),
            _serialize(f.name, f.dataType).alias("value"),
        )
        for f in profile_df.schema.fields
        if f.name != "attribute"
    ]
    return profile_df.select(
        F.col("attribute").cast("string").alias("attribute"),
        F.inline(F.array(*structs)),
    )


def compare_profiles(old: DataFrame, new: DataFrame) -> DataFrame:
    """Profile-vs-profile diff — the workflow NormalizeProfileResults
    exists for (/root/reference/NormalizeProfileResults.ecl:1-24:
    "compare the results of two different Profile runs").

    Normalizes both profile results and full-outer-joins the triples:
    one row per (attribute, key) with ``value_old`` / ``value_new``
    (NULL when the attribute/stat exists on one side only) and a
    ``changed`` flag.  Both inputs are one-row-per-attribute profile
    outputs, so the join is tiny regardless of data scale."""
    a = normalize_profile_results(old).withColumnRenamed("value", "value_old")
    b = normalize_profile_results(new).withColumnRenamed("value", "value_new")
    return a.join(b, ["attribute", "key"], "full_outer").withColumn(
        "changed", ~F.col("value_old").eqNullSafe(F.col("value_new"))
    )
