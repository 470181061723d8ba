"""JVM-side literal DataFrames for small driver-known tables.

``spark.createDataFrame(rows)`` in classic PySpark produces a
pickled-Python-RDD-backed plan (``Scan ExistingRDD``): every action on
it — and on anything joined with it — must launch Python worker
processes.  In this engine tiny driver-side tables (attribute
metadata, verdict grids, Benford expected rows, drift baselines) sit
inside nearly every plan, so that overhead lands on every query;
measured on the bench host, a 16x6-row crossJoin of two such frames
costs ~20s while the JVM-literal equivalent runs in ~0.4s.

:func:`lit_df` builds the same table as a pure-JVM plan instead:
``range(1) -> inline(array(struct(...)))`` over foldable literals —
Catalyst collapses it to a LocalRelation, joins against it broadcast,
and no Python worker is ever involved.  Use it for any frame whose
rows are already in driver memory and small (it embeds the values in
the plan; keep it under a few thousand rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _schema(schema: str | T.StructType) -> T.StructType:
    if isinstance(schema, T.StructType):
        return schema
    return T.StructType.fromDDL(schema)


def lit_df(
    spark: SparkSession,
    rows: list[tuple],
    schema: str | T.StructType,
) -> DataFrame:
    """A small literal DataFrame evaluated entirely JVM-side."""
    st = _schema(schema)
    if not rows:
        return spark.range(0).select(
            *[F.lit(None).cast(f.dataType).alias(f.name) for f in st.fields]
        )
    def cell(v, f: T.StructField):
        # F.lit([]) cannot infer an element type; emit a typed empty
        # array literal instead
        if isinstance(v, (list, tuple)) and len(v) == 0:
            return F.array().cast(f.dataType).alias(f.name)
        return F.lit(v).cast(f.dataType).alias(f.name)

    structs = [
        F.struct(*[cell(v, f) for f, v in zip(st.fields, row)]) for row in rows
    ]
    return spark.range(1).select(F.inline(F.array(*structs)))
