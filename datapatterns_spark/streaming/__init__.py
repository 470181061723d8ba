"""Streaming surface.

The reference has **no streaming operators** — every entry point is a
batch macro over a bounded DATASET (SURVEY.md §2.10; checked across
Profile/Cardinality/Benford/Validation/BestRecordStructure).  This
engine is likewise batch-over-table; "resumable from checkpoint" in
the north_rule is *batch* resumability (the per-partition manifest in
``operators.manifest``), not Structured Streaming state.

For pipelines that want rolling validation of an append stream, the
one supported bridge is ``foreachBatch``: run the batch check suite
per micro-batch and append verdicts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def validation_sink(checks, partition_col: str, output_path: str, key_cols=None):
    """Return a ``foreachBatch`` function that runs the batch check
    suite on each micro-batch and appends per-partition verdicts +
    violations.  Usage::

        stream.writeStream.foreachBatch(
            validation_sink(checks, "part", "/out")).start()
    """
    from ..operators.constraints import run_checks

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        verdicts, violations = run_checks(
            batch_df, checks, partition_col=partition_col, key_cols=key_cols
        )
        (
            verdicts.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(f"{output_path}/verdicts")
        )
        (
            violations.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(f"{output_path}/violations")
        )

    return _sink
