"""Pluggable table source/sink — Iceberg first, parquet fallback.

The target deployment reads Iceberg tables (BASELINE.json input_hint);
this sandbox has no Iceberg runtime jar, so the adapter resolves in
order (SURVEY.md §7 hard part 9):

1. an Iceberg catalog table (``spark.table`` / ``format("iceberg")``),
2. a plain parquet path.

Everything downstream sees only DataFrames, so the engine is
source-agnostic.  ``snapshot_id()`` feeds the checkpoint manifest's
lineage column; for parquet it derives a content stamp from file
metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_table(spark: SparkSession, ref: str) -> DataFrame:
    """Read ``ref`` as an Iceberg catalog table if resolvable, else as
    a parquet path."""
    if not ref.endswith(".parquet") and "/" not in ref:
        try:
            return spark.table(ref)
        except Exception:
            pass
    try:
        return spark.read.format("iceberg").load(ref)
    except Exception:
        return balance_scan(spark.read.parquet(ref))


def balance_scan(df: DataFrame, min_bytes: int = 256 * 1024) -> DataFrame:
    """Guard against unsplittable small inputs serializing the engine.

    A parquet scan parallelizes at ROW-GROUP granularity: a table
    written as one file with one 600k-row row group runs every
    downstream expression on ONE core no matter the cluster width
    (measured: Benford's 4-column melt over such a file took 10.4s at
    local[32] — a 32x loss).  At deployment scale inputs have
    thousands of files/row groups and this function is a structural
    no-op, decided from driver-side metadata only:

    * ``len(inputFiles) >= defaultParallelism`` -> untouched (the
      common 100 TB case; nothing is ever listed or parsed beyond the
      file names Spark already holds);
    * enough total row groups to feed every core -> untouched (Spark
      splits files by byte range and each row group lands in one
      split);
    * tiny total bytes (< ``min_bytes``) -> untouched (a single task
      finishes faster than a shuffle round-trip);
    * otherwise -> one round-robin ``repartition`` to cluster width.
      Catalyst still pushes filters and column pruning below the
      added exchange, so the scan stays pruned and the shuffle only
      carries the columns the query needs.

    Non-local or non-parquet files (no readable footer) are left
    untouched — remote table formats manage their own split sizes.
    """
    import os

    spark = df.sparkSession
    cores = spark.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:
        return df
    if not files or len(files) >= cores:
        return df
    paths = []
    for f in files:
        p = f[7:] if f.startswith("file://") else f[5:] if f.startswith("file:") else f
        if not os.path.exists(p):
            return df  # remote store: trust its layout
        paths.append(p)
    total_bytes = sum(os.path.getsize(p) for p in paths)
    if total_bytes < min_bytes:
        return df
    try:
        import pyarrow.parquet as pq

        row_groups = sum(pq.ParquetFile(p).metadata.num_row_groups for p in paths)
    except Exception:
        return df
    if row_groups >= cores:
        return df
    return df.repartition(cores)


def read_csv(
    spark: SparkSession,
    path: str,
    sep: str = ",",
    header: bool = True,
    schema: str | None = None,
) -> DataFrame:
    """CSV source (S2): ``DATASET(..., CSV(SEPARATOR, HEADING))``
    analogue (/root/reference/README.md:612).  Schema inference only
    when no explicit layout is given — the reference always has a
    compile-time layout, so prefer passing ``schema``."""
    reader = spark.read.option("sep", sep).option("header", header)
    if schema:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    multiline: bool = False,
) -> DataFrame:
    """JSON-lines source (one record per line by default — the
    splittable layout; ``multiline=True`` for whole-file documents,
    which parse per FILE and should be avoided for large inputs).
    The reference reads only FLAT/CSV (README.md:316-318, 612); JSON
    rounds out the ingest surface for transcript dumps.  Prefer an
    explicit ``schema``: inference costs a full extra pass over the
    data and infers from a sample otherwise."""
    reader = spark.read.option("multiLine", multiline)
    if schema:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source — same columnar pushdown/pruning guarantees as
    parquet (predicate pushdown + column projection reach the scan),
    sharing the small-input split guard."""
    return balance_scan(spark.read.orc(path))


def write_table(
    df: DataFrame,
    ref: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """OUTPUT(..., OVERWRITE, COMPRESSED) analogue (README.md:630):
    Iceberg table when the ref is a catalog name, else parquet
    (compressed by default)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if "/" not in ref and not ref.endswith(".parquet"):
        try:
            writer.saveAsTable(ref)
            return
        except Exception:
            pass
    writer.parquet(ref)


def snapshot_id(spark: SparkSession, ref: str) -> str:
    """Lineage stamp for the manifest: the Iceberg snapshot id when
    available, else a deterministic stamp over the parquet file
    listing (name + size)."""
    try:
        snap = spark.sql(f"SELECT snapshot_id FROM {ref}.snapshots ORDER BY committed_at DESC LIMIT 1")
        return str(snap.collect()[0][0])
    except Exception:
        pass
    try:
        import hashlib
        import os

        h = hashlib.sha256()
        if os.path.isdir(ref):
            for name in sorted(os.listdir(ref)):
                p = os.path.join(ref, name)
                h.update(f"{name}:{os.path.getsize(p)};".encode())
        elif os.path.exists(ref):
            h.update(f"{ref}:{os.path.getsize(ref)};".encode())
        return h.hexdigest()[:16]
    except Exception:
        return "unknown"
