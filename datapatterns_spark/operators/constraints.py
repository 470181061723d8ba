"""Constraint/validation layer for large-scale tables — the new
capabilities mandated by BASELINE.json §north_star on top of the
reference's row-scope Validate() (SURVEY.md §2.11):

* uniqueness over a key (e.g. ``(conv_id, turn_idx)``),
* referential/domain membership (role/tool domains),
* monotone timestamps within a group (conversation),
* row-level rules (reusing the Validate spec DSL),
* distribution drift vs a stored baseline (PSI on fixed bins, KS on
  binned ECDFs — both mergeable, computed per partition),
* Benford first-digit conformance as a pass/fail check.

Everything emits **per-partition verdict rows**
``(partition, check_name, passed, violation_count, sample_violations)``
plus a violation side-table, mirroring the reference's per-row
violations (Validation.ecl:286-296) lifted to partition grain.

Scale notes: row checks run in ONE narrow pass (no shuffle); all
group-scope checks share ONE shuffle on the group key (window
functions over the same partitioning); verdict aggregation is a
single ``groupBy(partition, check)``.  Hot groups are protected by
AQE skew handling; the group key is expected to be high-cardinality
(conversations), so salting is only needed for the histogram path
(done via two-phase aggregation on (partition, check, bin)).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .benford import CRITICAL_1, CRITICAL_N, EXPECTED
from ..functions.benford_digit import nth_digit
from .validation import expand_helpers

SAMPLE_VIOLATIONS = 5


# ---------------------------------------------------------------------------
# check definitions
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class Check:
    name: str
    kind: str  # "row" | "group" | "stat"
    params: dict = dc_field(default_factory=dict)


def unique(name: str, cols: list[str]) -> Check:
    """Key-uniqueness check (north_star: uniqueness on
    (conv_id, turn_idx)); violations are every row of a duplicated
    key."""
    return Check(name, "group", {"op": "unique", "cols": cols})


def in_domain(name: str, col: str, values: list[str]) -> Check:
    """Referential/domain check: col must be one of ``values``."""
    qv = ", ".join("'" + v.replace("'", "\\'") + "'" for v in values)
    return Check(name, "row", {"expr": f"`{col}` IN ({qv})", "col": col})


def row_rule(name: str, sql_expr: str) -> Check:
    """Arbitrary row-level rule — TRUE means valid (the Validate()
    contract, Validation.ecl:106)."""
    return Check(name, "row", {"expr": sql_expr})


def monotonic(name: str, ts_col: str, group_by: str, order_by: str) -> Check:
    """ts must be non-decreasing within ``group_by`` when ordered by
    ``order_by`` (north_star: monotone ts within conversation)."""
    return Check(
        name, "group", {"op": "monotonic", "ts": ts_col, "group": group_by, "order": order_by}
    )


def benford_conformance(name: str, col: str, digit: int = 1) -> Check:
    """Benford digit-distribution conformance as a pass/fail check —
    the reference reports chi-squared vs a critical value
    (Benford.ecl:104-114); here the comparison becomes the verdict."""
    return Check(name, "stat", {"op": "benford", "col": col, "digit": digit})


def drift_psi(
    name: str,
    col: str,
    baseline: dict[int, float] | list[float],
    bins: int = 32,
    lo: float | None = None,
    hi: float | None = None,
    threshold: float = 0.2,
    categorical: bool = False,
) -> Check:
    """Population-stability-index drift vs a stored baseline
    distribution.  ``baseline`` maps bin-index (numeric) or is
    produced by :func:`baseline_histogram`.  PSI > threshold fails."""
    return Check(
        name,
        "stat",
        {
            "op": "psi",
            "col": col,
            "baseline": dict(enumerate(baseline)) if isinstance(baseline, list) else baseline,
            "bins": bins,
            "lo": lo,
            "hi": hi,
            "threshold": threshold,
            "categorical": categorical,
        },
    )


def drift_ks(
    name: str,
    col: str,
    baseline: dict[int, float] | list[float],
    bins: int = 64,
    lo: float | None = None,
    hi: float | None = None,
    threshold: float = 0.1,
) -> Check:
    """Kolmogorov-Smirnov drift on binned ECDFs vs a baseline."""
    return Check(
        name,
        "stat",
        {
            "op": "ks",
            "col": col,
            "baseline": dict(enumerate(baseline)) if isinstance(baseline, list) else baseline,
            "bins": bins,
            "lo": lo,
            "hi": hi,
            "threshold": threshold,
        },
    )


# ---------------------------------------------------------------------------
# baseline helpers (drift)
# ---------------------------------------------------------------------------
def _bin_expr(col: str, bins: int, lo: float, hi: float) -> Column:
    c = F.col(col).cast("double")
    idx = F.floor((c - F.lit(lo)) / F.lit((hi - lo) / bins)).cast("int")
    return F.least(F.greatest(idx, F.lit(0)), F.lit(bins - 1))


def _cat_bin_expr(col: str, bins: int) -> Column:
    return F.pmod(F.xxhash64(F.col(col).cast("string")), F.lit(bins)).cast("int")


def baseline_histogram(
    df: DataFrame,
    col: str,
    bins: int = 32,
    lo: float | None = None,
    hi: float | None = None,
    categorical: bool = False,
) -> tuple[dict[int, float], float, float]:
    """Compute a normalized fixed-bin histogram to store as a drift
    baseline.  Returns (bin->fraction, lo, hi).  Mergeable across
    snapshots by re-normalizing summed counts."""
    if categorical:
        b = _cat_bin_expr(col, bins)
        lo, hi = 0.0, float(bins)
    else:
        if lo is None or hi is None:
            r = df.agg(
                F.min(F.col(col).cast("double")), F.max(F.col(col).cast("double"))
            ).collect()[0]
            lo = float(r[0]) if lo is None else lo
            hi = float(r[1]) if hi is None else hi
            if hi <= lo:
                hi = lo + 1.0
        b = _bin_expr(col, bins, lo, hi)
    counts = df.filter(F.col(col).isNotNull()).groupBy(b.alias("bin")).count().collect()
    total = sum(r["count"] for r in counts) or 1
    return {int(r["bin"]): r["count"] / total for r in counts}, lo, hi


# ---------------------------------------------------------------------------
# the suite runner
# ---------------------------------------------------------------------------
def run_checks(
    df: DataFrame,
    checks: list[Check],
    partition_col: str | Column | None = None,
    key_cols: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Run every check, returning ``(verdicts, violations)``.

    ``verdicts``: one row per (partition, check) —
    ``partition, check_name, passed, violation_count, metric,
    sample_violations``.
    ``violations``: side-table of violating rows —
    ``partition, check_name, key, detail``.

    ``partition_col`` defaults to a constant (whole-table grain); pass
    an Iceberg partition column (or any expression) for per-partition
    verdicts.  ``key_cols`` identify rows in the violation table.
    """
    spark = df.sparkSession
    part = (
        F.lit("__all__")
        if partition_col is None
        else (F.col(partition_col) if isinstance(partition_col, str) else partition_col)
    ).cast("string").alias("partition")
    keys = key_cols or []
    key_expr = (
        F.to_json(F.struct(*[F.col(k) for k in keys])) if keys else F.lit("")
    ).alias("key")

    row_checks = [c for c in checks if c.kind == "row"]
    group_checks = [c for c in checks if c.kind == "group"]
    stat_checks = [c for c in checks if c.kind == "stat"]

    violation_frames: list[DataFrame] = []

    # ---- row checks: ONE narrow pass, violations exploded ----
    if row_checks:
        entries = []
        for c in row_checks:
            test = F.expr(expand_helpers(c.params["expr"], df.columns))
            ok = F.coalesce(test.cast("boolean"), F.lit(False))
            entries.append(F.when(~ok, F.lit(c.name)).otherwise(F.lit(None)))
        arr = F.array_compact(F.array(*entries))
        rows = (
            df.select(part, key_expr, arr.alias("_fails"))
            .filter(F.size("_fails") > 0)
            .select(
                "partition",
                "key",
                F.explode("_fails").alias("check_name"),
                F.lit("row rule failed").alias("detail"),
            )
        )
        violation_frames.append(rows)

    # ---- group checks: ONE shuffle on the group key ----
    for c in group_checks:
        p = c.params
        if p["op"] == "unique":
            w = Window.partitionBy(*[F.col(x) for x in p["cols"]])
            rows = (
                df.select(
                    part,
                    key_expr,
                    *[F.col(x) for x in p["cols"]],
                    F.count(F.lit(1)).over(w).alias("_n"),
                )
                .filter(F.col("_n") > 1)
                .select(
                    "partition",
                    "key",
                    F.lit(c.name).alias("check_name"),
                    F.concat(
                        F.lit("duplicate key ("),
                        F.concat_ws(",", *[F.col(x).cast("string") for x in p["cols"]]),
                        F.lit(") x"),
                        F.col("_n").cast("string"),
                    ).alias("detail"),
                )
            )
        elif p["op"] == "monotonic":
            w = Window.partitionBy(p["group"]).orderBy(p["order"])
            prev = F.lag(F.col(p["ts"])).over(w)
            rows = (
                df.select(part, key_expr, F.col(p["ts"]).alias("_ts"), prev.alias("_prev"))
                .filter(F.col("_prev").isNotNull() & (F.col("_ts") < F.col("_prev")))
                .select(
                    "partition",
                    "key",
                    F.lit(c.name).alias("check_name"),
                    F.concat(
                        F.lit("ts regression: "),
                        F.col("_ts").cast("string"),
                        F.lit(" < "),
                        F.col("_prev").cast("string"),
                    ).alias("detail"),
                )
            )
        else:  # pragma: no cover
            raise ValueError(f"unknown group op {p['op']}")
        violation_frames.append(rows)

    # ---- verdict assembly for row+group checks ----
    all_check_names = [c.name for c in row_checks + group_checks]
    verdict_frames: list[DataFrame] = []
    parts_df = df.select(part).distinct()
    if violation_frames:
        viol = violation_frames[0]
        for v in violation_frames[1:]:
            viol = viol.unionByName(v)
        # the verdict aggregation AND the returned side-table both
        # consume this; without a persist every downstream action
        # re-runs all row+group check passes
        viol = viol.persist()
    else:
        viol = spark.createDataFrame(
            [], "partition string, key string, check_name string, detail string"
        )
    if all_check_names:
        grid = parts_df.crossJoin(
            spark.createDataFrame([(n,) for n in all_check_names], "check_name string")
        )
        agg = viol.filter(F.col("check_name").isin(all_check_names)).groupBy(
            "partition", "check_name"
        ).agg(
            F.count(F.lit(1)).alias("violation_count"),
            F.slice(F.collect_list("detail"), 1, SAMPLE_VIOLATIONS).alias(
                "sample_violations"
            ),
        )
        verdicts = (
            grid.join(agg, ["partition", "check_name"], "left")
            .na.fill({"violation_count": 0})
            .select(
                "partition",
                "check_name",
                (F.col("violation_count") == 0).alias("passed"),
                "violation_count",
                F.lit(None).cast("double").alias("metric"),
                F.coalesce(
                    F.col("sample_violations"), F.expr("cast(array() as array<string>)")
                ).alias("sample_violations"),
            )
        )
        verdict_frames.append(verdicts)

    # ---- stat checks: per-partition aggregates ----
    for c in stat_checks:
        verdict_frames.append(_stat_verdict(df, c, part))

    if not verdict_frames:
        raise ValueError("no checks supplied")
    verdicts = verdict_frames[0]
    for v in verdict_frames[1:]:
        verdicts = verdicts.unionByName(v)
    return verdicts.orderBy("partition", "check_name"), viol


def _stat_verdict(df: DataFrame, c: Check, part: Column) -> DataFrame:
    p = c.params
    if p["op"] == "benford":
        digit = min(max(int(p["digit"]), 1), 4)
        expected = EXPECTED[digit]
        critical = CRITICAL_1 if digit == 1 else CRITICAL_N
        n = nth_digit(F.col(p["col"]), digit)
        d = df.select(part, n.alias("n")).filter(F.col("n") != 10)
        pcts = [
            F.round(F.count(F.when(F.col("n") == i, 1)) / F.count(F.lit(1)) * 100, 1)
            for i in range(10)
        ]
        terms = []
        for i in range(10):
            if i == 0 and digit == 1:
                continue
            e = float(expected[i])
            terms.append((pcts[i] - e) * (pcts[i] - e) / e)
        chi = terms[0]
        for t in terms[1:]:
            chi = chi + t
        g = d.groupBy("partition").agg(F.round(chi, 3).alias("metric"))
        return g.select(
            "partition",
            F.lit(c.name).alias("check_name"),
            (F.col("metric") <= critical).alias("passed"),
            F.lit(0).cast("long").alias("violation_count"),
            F.col("metric").cast("double"),
            F.expr("cast(array() as array<string>)").alias("sample_violations"),
        )

    # drift checks share the binned-histogram machinery
    bins = int(p["bins"])
    if p.get("categorical"):
        b = _cat_bin_expr(p["col"], bins)
    else:
        b = _bin_expr(p["col"], bins, float(p["lo"]), float(p["hi"]))
    counts = (
        df.filter(F.col(p["col"]).isNotNull())
        .groupBy(part, b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("partition")
    frac = counts.withColumn("frac", F.col("cnt") / F.sum("cnt").over(w))
    spark = df.sparkSession
    base = spark.createDataFrame(
        [(int(k), float(v)) for k, v in p["baseline"].items()],
        "bin int, base_frac double",
    )
    # complete the bin grid so missing bins count as ~0
    grid = (
        frac.select("partition")
        .distinct()
        .crossJoin(spark.range(bins).select(F.col("id").cast("int").alias("bin")))
    )
    joined = (
        grid.join(frac.select("partition", "bin", "frac"), ["partition", "bin"], "left")
        .join(F.broadcast(base), "bin", "left")
        .na.fill({"frac": 0.0, "base_frac": 0.0})
    )
    eps = 1e-6
    if p["op"] == "psi":
        a = F.greatest(F.col("frac"), F.lit(eps))
        bfr = F.greatest(F.col("base_frac"), F.lit(eps))
        term = (a - bfr) * F.log(a / bfr)
        g = joined.groupBy("partition").agg(F.round(F.sum(term), 6).alias("metric"))
    elif p["op"] == "ks":
        wb = Window.partitionBy("partition").orderBy("bin")
        cdf = joined.withColumn("cdf_a", F.sum("frac").over(wb)).withColumn(
            "cdf_b", F.sum("base_frac").over(wb)
        )
        g = cdf.groupBy("partition").agg(
            F.round(F.max(F.abs(F.col("cdf_a") - F.col("cdf_b"))), 6).alias("metric")
        )
    else:  # pragma: no cover
        raise ValueError(f"unknown stat op {p['op']}")
    return g.select(
        "partition",
        F.lit(c.name).alias("check_name"),
        (F.col("metric") <= float(p["threshold"])).alias("passed"),
        F.lit(0).cast("long").alias("violation_count"),
        F.col("metric").cast("double"),
        F.expr("cast(array() as array<string>)").alias("sample_violations"),
    )
