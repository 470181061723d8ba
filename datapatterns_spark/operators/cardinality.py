"""Cardinality() — full value->count histogram for every column.

Spark-first reimplementation of /root/reference/Cardinality.ecl:36-398:
one melt scan -> ``groupBy(attribute, value).count()`` (the reference
expands one ``TABLE(..., value, MERGE)`` per column; Spark's partial
aggregation gives the same two-phase merge), output sorted
``(attribute, -rec_count, value)`` (Cardinality.ecl:395).

Unlike Profile, values are the *raw* string form (no trim, no filled
filter — Cardinality.ecl:296-299) and child datasets are exploded and
appended with dotted names (Cardinality.ecl:350-391).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..plans.schema_walk import (
    KIND_ARRAY,
    KIND_BOOLEAN,
    AttrInfo,
    walk_schema,
)
from .profile import _deterministic_sample


def _raw_value_expr(a: AttrInfo) -> Column:
    c = F.col(a.name)
    if a.kind == KIND_BOOLEAN:
        return F.when(c, F.lit("true")).otherwise(F.lit("false"))
    if a.kind == KIND_ARRAY:
        return F.when(c.isNull(), F.lit("")).otherwise(
            F.concat_ws(", ", F.transform(c, lambda e: e.cast("string")))
        )
    return F.coalesce(c.cast("string"), F.lit(""))


def cardinality(
    df: DataFrame,
    field_list: list[str] | str | None = None,
    sample_size: int = 100,
) -> DataFrame:
    """Return (attribute, value, rec_count) for every distinct value of
    every (selected) column, unlimited."""
    if isinstance(field_list, str):
        field_list = [f for f in field_list.replace(" ", "").split(",") if f] or None
    attrs, children = walk_schema(df.schema, field_list)
    sampled = _deterministic_sample(df, sample_size)

    frames: list[DataFrame] = []

    def histo(frame: DataFrame, attr_list: list[AttrInfo], prefix: str) -> DataFrame:
        structs = [
            F.struct(
                F.lit(prefix + a.name).alias("attribute"),
                _raw_value_expr(a).alias("value"),
            )
            for a in attr_list
        ]
        return (
            frame.select(F.inline(F.array(*structs)))
            .groupBy("attribute", "value")
            .agg(F.count(F.lit(1)).alias("rec_count"))
        )

    if attrs:
        frames.append(histo(sampled, attrs, ""))
    for child in children:
        child_fields = None
        if field_list:
            p = child.name.lower() + "."
            child_fields = [f[len(p):] for f in field_list if f.lower().startswith(p)] or None
        exploded = sampled.select(F.explode(F.col(child.name)).alias("_r")).select("_r.*")
        cattrs, _ = walk_schema(exploded.schema, child_fields)
        if cattrs:
            frames.append(histo(exploded, cattrs, f"{child.name}."))
    if not frames:
        raise ValueError("no profilable attributes found")
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.orderBy("attribute", F.desc("rec_count"), "value")
