"""Exhaustive parity for the reference's exact quartile position
arithmetic (Profile.ecl:1104-1139; SURVEY.md §7 hard part 2).

Every multiset size n=1..10 — odd/even n, odd/even halfN, duplicated
values, all-equal values, negatives — in ONE profile() call (each case
is its own column), compared against an independent pure-Python
re-implementation of the ECL rules:

* valueEndPos = cumulative count through each sorted distinct value;
  pick(pos) = MIN value with endPos >= pos = sorted[pos-1]; ECL MIN of
  an empty set is 0, so pick(pos > n) = 0 (hit at n=2: q3Pos1 = 3).
* q2 = AVE(pick(halfN + n%2), pick(q2p1 + (n+1)%2))
* q1 = AVE(pick(halfN DIV 2 + halfN%2), pick(q1p1 + (halfN+1)%2)),
  0 when halfN = 0
* q3 = AVE(pick(max(q2p1,q2p2) + halfN DIV 2 + halfN%2),
  pick(q3p1 - (halfN+1)%2)), 0 when halfN = 0
"""

import pytest

from datapatterns_spark.operators.profile import profile


def _ecl_quartiles(xs: list[float]) -> tuple[float, float, float]:
    xs = sorted(xs)
    n = len(xs)
    half = n // 2

    def pick(pos: int) -> float:
        return float(xs[pos - 1]) if 1 <= pos <= n else 0.0

    q2p1 = half + n % 2
    q2p2 = q2p1 + (n + 1) % 2
    med = (pick(q2p1) + pick(q2p2)) / 2
    q1p1 = half // 2 + half % 2
    q1p2 = q1p1 + (half + 1) % 2
    q1 = (pick(q1p1) + pick(q1p2)) / 2 if half > 0 else 0.0
    q3p1 = max(q2p1, q2p2) + half // 2 + half % 2
    q3p2 = q3p1 - (half + 1) % 2
    q3 = (pick(q3p1) + pick(q3p2)) / 2 if half > 0 else 0.0
    return q1, med, q3


def _cases() -> dict[str, list[float]]:
    cases: dict[str, list[float]] = {}
    for n in range(1, 11):
        # distinct, sign-mixed, unsorted on purpose
        distinct = [((-1) ** i) * (i + 1) * 10.0 for i in range(n)]
        cases[f"d{n}"] = distinct
        # duplicate-heavy: first value repeated to length n
        cases[f"r{n}"] = [7.0] * n
        if n >= 3:
            # half the entries collapsed onto one duplicated value
            dup = distinct[: n - n // 2] + [distinct[0]] * (n // 2)
            cases[f"m{n}"] = dup
    return cases


def test_quartile_position_parity(spark):
    cases = _cases()
    width = max(len(v) for v in cases.values())
    names = sorted(cases)
    rows = [
        tuple(
            cases[c][i] if i < len(cases[c]) else None  # NULL = unfilled
            for c in names
        )
        for i in range(width)
    ]
    df = spark.createDataFrame(rows, ", ".join(f"{c} double" for c in names))
    out = {
        r["attribute"]: r
        for r in profile(df, features=("quartiles",)).collect()
    }
    assert set(out) == set(names)
    for c in names:
        q1, med, q3 = _ecl_quartiles(cases[c])
        got = (
            out[c]["numeric_lower_quartile"],
            out[c]["numeric_median"],
            out[c]["numeric_upper_quartile"],
        )
        assert got == pytest.approx((q1, med, q3), abs=1e-9), (
            f"{c}: {sorted(cases[c])} -> {got} != {(q1, med, q3)}"
        )
