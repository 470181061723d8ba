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


def _generic_class(type_name: str) -> str:
    """The reference's ``__NeedCoercion`` generic-type classes
    (BestRecordStructure.ecl:68-94): coercion is emitted only when the
    CLASS changes (string/data/boolean/numeric), not for width-only
    changes.  Accepts both ECL best-type names and Spark
    ``simpleString`` given types."""
    t = type_name.lower()
    for p, cls in (
        ("set of", "set"),
        ("array", "set"),
        ("string", "string"),
        ("qstring", "string"),
        ("varstring", "string"),
        ("utf", "string"),
        ("unicode", "string"),
        ("varunicode", "string"),
        ("data", "data"),
        ("binary", "data"),
        ("boolean", "boolean"),
        ("integer", "numeric"),
        ("unsigned", "numeric"),
        ("real", "numeric"),
        ("decimal", "numeric"),
        ("udecimal", "numeric"),
        ("tinyint", "numeric"),
        ("smallint", "numeric"),
        ("int", "numeric"),
        ("bigint", "numeric"),
        ("float", "numeric"),
        ("double", "numeric"),
    ):
        if t.startswith(p):
            return cls
    return t


def ecl_to_spark_type(ecl: str) -> str:
    """Map a best-type ECL name (the lattice's output,
    functions/besttype.py) to the narrowest safe Spark DDL type.
    Spark has no unsigned integers (SURVEY §1.2), so ``unsignedN``
    widens to the next signed size; ``unsigned8`` needs
    ``decimal(20,0)`` to hold the full range."""
    t = ecl.lower().strip()
    if t.startswith("set of "):
        return f"array<{ecl_to_spark_type(t[7:])}>"
    if t == "boolean":
        return "boolean"
    if t.startswith("unsigned"):
        n = int(t[8:] or 8)
        return {1: "smallint", 2: "int", 3: "int", 4: "bigint",
                5: "bigint", 6: "bigint", 7: "bigint"}.get(n, "decimal(20,0)")
    if t.startswith("integer"):
        n = int(t[7:] or 8)
        return {1: "tinyint", 2: "smallint", 3: "int", 4: "int"}.get(n, "bigint")
    if t == "real4":
        return "float"
    if t.startswith("real"):
        return "double"
    if t.startswith("udecimal") or t.startswith("decimal"):
        body = t.split("decimal", 1)[1]
        if "_" in body:
            p, s = body.split("_", 1)
            return f"decimal({int(p)},{int(s)})"
        return f"decimal({int(body or 38)},0)" if (body or "").isdigit() else "decimal(38,0)"
    if t.startswith("data"):
        return "binary"
    return "string"


def apply_best_types(df: DataFrame, sampling: int = 100) -> DataFrame:
    """The Spark-native analogue of the reference's rewrite TRANSFORM
    (``emitTransform``, BestRecordStructure.ecl:14-16, 390-404): cast
    every top-level scalar column to the Spark type recommended by the
    best-type lattice, keeping column order.  A cast is applied only
    when the generic type class changes (the reference's
    ``__NeedCoercion`` rule) — width-only recommendations (e.g. int
    already stored as bigint) keep the stored type, mirroring
    ``SELF := r`` passthrough.  Nested structs/arrays pass through
    unchanged (the reference rewrites children via per-child PROJECTs;
    our child datasets are profiled separately)."""
    from pyspark.sql import functions as F

    prof = profile(df, features=("best_ecl_types",), sample_size=sampling).collect()
    best = {r["attribute"]: r["best_attribute_type"] for r in prof}
    given = {r["attribute"]: r["given_attribute_type"] for r in prof}
    temporal = {"timestamp", "timestamp_ntz", "date"}
    cols = []
    for f_ in df.schema.fields:
        b = best.get(f_.name)
        g = given.get(f_.name, "")
        # native temporal columns stay native: the lattice would
        # recommend their rendered string form (the reference has no
        # timestamp type and profiles one as its string value), but a
        # stored TimestampType is already the best representation here
        if b and g not in temporal and _generic_class(g) != _generic_class(b):
            cols.append(F.col(f_.name).cast(ecl_to_spark_type(b)).alias(f_.name))
        else:
            cols.append(F.col(f_.name))
    return df.select(*cols)


def best_record_structure(
    df: DataFrame,
    sampling: int = 100,
    layout_name: str = "NewLayout",
    emit_transform: bool = False,
) -> DataFrame:
    """Return a one-string-column DataFrame of ECL-style layout lines
    (BestRecordStructure.ecl:279-309).  With ``emit_transform`` the
    result appends the reference's rewrite-TRANSFORM block
    (``emitTransform=TRUE``, BestRecordStructure.ecl:390-440): a
    ``Make_<layout>`` TRANSFORM with one coercion assignment per field
    whose generic type class changes, a ``SELF := r`` passthrough, and
    the sample PROJECT kickoff lines."""
    prof = profile(
        df,
        features=("best_ecl_types",),
        sample_size=sampling,
    ).collect()
    best = {r["attribute"]: r["best_attribute_type"] for r in prof}
    given = {r["attribute"]: r["given_attribute_type"] for r in prof}

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

    if emit_transform:
        # the reference's transform block (BestRecordStructure.ecl:
        # 390-440): coercions only where the generic class changes,
        # uppercased target types (Std.Str.ToUpperCase, :258), dotted
        # SELF paths for embedded-record fields, then the passthrough
        # and the sample PROJECT kickoff
        lines.append("//----------")
        lines.append(
            f"{layout_name} Make_{layout_name}(r) := TRANSFORM"
        )
        for attr, btype in best.items():
            if _generic_class(given.get(attr, "")) != _generic_class(btype):
                lines.append(
                    f"    SELF.{attr} := ({btype.upper()})r.{attr};"
                )
        lines.append("    SELF := r;")
        lines.append("END;")
        lines.append("//----------")
        lines.append(f"newDS := PROJECT(oldDS, Make_{layout_name}(LEFT));")

    spark = df.sparkSession
    from ..plans.local import lit_df

    return lit_df(spark, [(ln,) for ln in lines], "txt string")
