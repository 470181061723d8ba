"""BestRecordStructure() — emit the "best" record definition from
Profile's type inference.

Spark-first reimplementation of
/root/reference/BestRecordStructure.ecl:37-472.  The reference
assembles ECL RECORD/END text lines from Profile's
``best_attribute_type``; the heavy lifting is schema *metadata*, so
(per SURVEY.md §2.3 J6/J7) the assembly runs driver-side over the
tiny profile result.  Child datasets become nested ``DATASET(...)``
layouts; embedded records are reconstructed from their dotted names.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .profile import profile


def best_record_structure(
    df: DataFrame,
    sampling: int = 100,
    layout_name: str = "NewLayout",
) -> DataFrame:
    """Return a one-string-column DataFrame of ECL-style layout lines
    (BestRecordStructure.ecl:279-309)."""
    prof = profile(
        df,
        features=("best_ecl_types",),
        sample_size=sampling,
    ).collect()
    best = {r["attribute"]: r["best_attribute_type"] for r in prof}

    lines: list[str] = [f"{layout_name} := RECORD"]
    # group dotted names into nested records in first-seen order
    emitted_prefixes: list[str] = []

    def close_prefixes(current: str) -> None:
        while emitted_prefixes and not current.startswith(emitted_prefixes[-1] + "."):
            emitted_prefixes.pop()
            lines.append("    " * (len(emitted_prefixes) + 1) + "END;")

    for attr, btype in best.items():
        parts = attr.split(".")
        prefix = ".".join(parts[:-1])
        close_prefixes(attr)
        opened = ".".join(emitted_prefixes[-1].split(".")) if emitted_prefixes else ""
        if prefix and prefix != opened:
            # open nested record(s) for each new level
            known = opened.split(".") if opened else []
            for i in range(len(known), len(parts) - 1):
                rec_name = parts[i]
                lines.append("    " * (i + 1) + f"{rec_name} := RECORD")
                emitted_prefixes.append(".".join(parts[: i + 1]))
        depth = len(parts)
        lines.append("    " * depth + f"{btype} {parts[-1]};")
    while emitted_prefixes:
        emitted_prefixes.pop()
        lines.append("    " * (len(emitted_prefixes) + 1) + "END;")
    lines.append("END;")

    spark = df.sparkSession
    from ..plans.local import lit_df

    return lit_df(spark, [(ln,) for ln in lines], "txt string")
