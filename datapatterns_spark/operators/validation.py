"""Validation.Validate() / Validation.Fix() — row-level rule checks
and rule-driven repairs.

Spark-first reimplementation of /root/reference/Validation.ecl:

* ``validate(df, spec)`` parses the semicolon-delimited
  ``name:expr`` spec (Validation.ecl:237-277) where ``expr`` is a
  boolean **Spark SQL** expression over the row's columns (the ECL
  analogue accepted ECL expressions), expands the reference's helper
  functions (Validation.ecl:129-168), and appends a
  ``validation_results {num_violations, violations}`` struct in a
  single narrow ``select`` — zero shuffles, exactly like the
  reference's single PROJECT (Validation.ecl:286-296).
* ``fix(df, spec)`` parses ``membership:fix`` rules
  (Validation.ecl:484-554): the membership test is boolean algebra
  over violation names; fixes are ``field := expr`` reassignment,
  ``Swap(f1, f2)`` or ``SkipRecord()``, applied sequentially so each
  fix sees the previous fixes' output.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_REC_NAME = "validation_results"

# Helper macro expansions (Validation.ecl:129-168).  Each maps
# Helper(arg) -> a Spark SQL snippet; args may be any expression
# without unbalanced parens at the top level.
_HELPERS = {
    "OnlyDigits": r"regexp_replace(cast({0} as string), '[^0-9]', '')",
    "OnlyChars": r"regexp_replace(cast({0} as string), '[^\\p{{L}}]', '')",
    "WithoutPunct": r"regexp_replace(cast({0} as string), '\\p{{Punct}}', '')",
    "Patternize": (
        r"translate(regexp_replace(regexp_replace(cast({0} as string),"
        r" '\\p{{Lu}}', 'A'), '[\\p{{Ll}}\\p{{Lt}}\\p{{Lm}}\\p{{Lo}}]', 'a'),"
        r" '0123456789', '9999999999')"
    ),
    "StrLen": r"length(cast({0} as string))",
    "IsOnlyDigits": r"(cast({0} as string) rlike '^[0-9]+$')",
    "IsOnlyUppercase": r"(cast({0} as string) rlike '^\\p{{Lu}}+$')",
    "IsOnlyLowercase": r"(cast({0} as string) rlike '^\\p{{Ll}}+$')",
    "IsDecimalNumber": (
        r"(cast({0} as string) rlike '^-?(([0-9]+(\\.[0-9]*)?)|([0-9]*\\.[0-9]+))$')"
    ),
}

_HELPER_RE = {
    name: re.compile(rf"\b{name}\s*\(([^()]*)\)", re.IGNORECASE)
    for name in _HELPERS
}


def expand_helpers(expr: str, columns: list[str]) -> str:
    """Expand the reference's helper pseudo-functions into Spark SQL.

    Iterates until fixpoint so nested helper calls resolve
    inside-out."""
    if re.search(r"\bAllFieldsFilled\(\)", expr, re.IGNORECASE):
        all_filled = " AND ".join(
            f"(coalesce(trim(cast(`{c}` as string)), '') != '')" for c in columns
        )
        expr = re.sub(
            r"\bAllFieldsFilled\(\)", f"({all_filled})", expr, flags=re.IGNORECASE
        )
    for _ in range(10):
        changed = False
        for name, rx in _HELPER_RE.items():
            new = rx.sub(lambda m, n=name: _HELPERS[n].format(m.group(1)), expr)
            if new != expr:
                expr, changed = new, True
        if not changed:
            break
    return expr


def parse_spec(spec: str) -> list[tuple[str, str]]:
    """Split a ``name:expr;name:expr`` spec (Validation.ecl:237-263).
    Names start with a letter and may contain letters, digits,
    periods, dashes and underscores."""
    out = []
    for part in spec.split(";"):
        part = part.strip()
        if not part:
            continue
        m = re.match(r"^\s*([A-Za-z][\w.\-]*)\s*:(.+)$", part, re.DOTALL)
        if not m:
            raise ValueError(f"malformed validation spec entry: {part!r}")
        out.append((m.group(1), m.group(2).strip()))
    return out


def validate(
    df: DataFrame,
    spec: str,
    rec_name: str = DEFAULT_REC_NAME,
) -> DataFrame:
    """Append ``{num_violations, violations}`` per row.  A test
    returning FALSE (or NULL) marks its name as a violation —
    matching ``IF(NOT(test), name, '')`` (Validation.ecl:264)."""
    tests = parse_spec(spec)
    if not tests:
        raise ValueError("no tests supplied")
    cols = df.columns
    entries = []
    for name, expr in tests:
        test = F.expr(expand_helpers(expr, cols))
        # NULL test results count as failures (NOT(NULL) is NULL -> ECL
        # semantics have no NULL; a non-TRUE result is a violation)
        entries.append(
            F.when(~F.coalesce(test.cast("boolean"), F.lit(False)), F.lit(name)).otherwise(
                F.lit("")
            )
        )
    violations = F.filter(F.array(*entries), lambda x: x != "")
    return df.withColumn(
        rec_name,
        F.struct(
            F.size(violations).alias("num_violations"),
            violations.alias("violations"),
        ),
    )


def _membership_expr(constraint: str, rec_name: str) -> Column:
    """Rewrite a violation-name boolean clause into Spark SQL over the
    violations array (Validation.ecl:193-199): every bare word that is
    not a boolean operator becomes
    ``array_contains(rec.violations, 'word')``."""

    def repl(m: re.Match) -> str:
        w = m.group(0)
        if w.upper() in ("AND", "OR", "NOT", "TRUE", "FALSE"):
            return w
        return f"array_contains({rec_name}.violations, '{w}')"

    sql = re.sub(r"[A-Za-z][\w.\-]*", repl, constraint)
    return F.expr(sql)


_SWAP_RE = re.compile(r"^Swap\(\s*([\w.]+)\s*,\s*([\w.]+)\s*\)$", re.IGNORECASE)
_SKIP_RE = re.compile(r"^SkipRecord\(\)$", re.IGNORECASE)
_ASSIGN_RE = re.compile(r"^([\w.]+)\s*:=\s*(.+)$", re.DOTALL)


def fix(
    df: DataFrame,
    spec: str,
    rec_name: str = DEFAULT_REC_NAME,
) -> DataFrame:
    """Apply repairs driven by violation membership, then strip the
    validation struct (Validation.ecl:385-556).  Fixes run in spec
    order, each seeing the prior fixes' output."""
    working = df
    cols = [c for c in df.columns if c != rec_name]
    for part in spec.split(";"):
        part = part.strip()
        if not part:
            continue
        constraint, _, action = part.partition(":")
        constraint, action = constraint.strip(), action.strip()
        if not constraint or not action:
            raise ValueError(f"malformed fix spec entry: {part!r}")
        cond = _membership_expr(constraint, rec_name)

        if _SKIP_RE.match(action):
            working = working.filter(~F.coalesce(cond, F.lit(False)))
            continue
        m = _SWAP_RE.match(action)
        if m:
            f1, f2 = m.group(1), m.group(2)
            t1 = working.schema[f1].dataType
            t2 = working.schema[f2].dataType
            old1 = F.col(f1)
            working = working.withColumns(
                {
                    f1: F.when(cond, F.col(f2).cast(t1)).otherwise(F.col(f1)),
                    f2: F.when(cond, old1.cast(t2)).otherwise(F.col(f2)),
                }
            )
            continue
        m = _ASSIGN_RE.match(action)
        if m:
            target, rhs = m.group(1), m.group(2)
            if target not in working.columns:
                raise ValueError(f"fix target {target!r} is not a column")
            t = working.schema[target].dataType
            rhs_col = F.expr(expand_helpers(rhs, cols))
            working = working.withColumn(
                target, F.when(cond, rhs_col.cast(t)).otherwise(F.col(target))
            )
            continue
        raise ValueError(f"unrecognized fix action: {action!r}")
    return working.drop(rec_name)
