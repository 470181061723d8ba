"""SparkSession factory tuned for the profiling/validation workload.

Defaults chosen for scale (AQE on, Arrow on, skew handling on) — see
SURVEY.md §4.  Local test runs override parallelism via ``master``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Shuffle partition count: at cluster scale this should be ~2-3x total
# cores; AQE coalesces small partitions at runtime so a higher static
# number is safe.  Locally we match the core count.
_DEFAULT_SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_SHUFFLE", "32")


def get_spark(
    app_name: str = "datapatterns-spark",
    master: str | None = None,
    shuffle_partitions: str | int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-appropriate defaults.

    AQE is enabled for runtime re-planning (skew joins, partition
    coalescing), Arrow for any pandas interchange, and ANSI mode is
    disabled so malformed casts yield NULL (the engine's "unfilled"
    semantics) rather than errors.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # Make the package importable by Python *workers* regardless of the
    # driver's cwd: pickled pandas-UDF closures resolve module
    # references by import on the worker side.  (On a real cluster the
    # same is achieved with ``spark-submit --py-files``.)
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if pkg_root not in os.environ.get("PYTHONPATH", "").split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_root + os.pathsep + os.environ.get("PYTHONPATH", "")
        ).rstrip(os.pathsep)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or _DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.ansi.enabled", "false")
        # Propagate a bucketed table's SORTED BY order into the scan's
        # outputOrdering (only applies when each bucket is one file,
        # which is how prepare_transcripts_bucketed writes).  With it,
        # group-scope window checks over a CLUSTERED BY conv_id /
        # SORTED BY (conv_id, turn_idx) table plan with no Exchange
        # AND no Sort — the layout a 10^12-row Iceberg deployment
        # (bucket(conv_id) partition transform + sort order) provides.
        .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
