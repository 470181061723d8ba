"""Property test for best-type inference (Profile.ecl:1002-1023
semantics): whatever type the lattice recommends for a string column
must LOSSLESSLY represent every filled value of that column.

The golden tests pin the reference's specific fixtures; this test
generates a seeded random corpus of themed value mixtures (pure
unsigned, signed, leading zeros, floats, exp notation, >19-digit
overflows, text/unicode/punctuation mixes and cross-contaminations)
and asserts the round-trip property per recommended type — the
property that makes BestRecordStructure's rewrite TRANSFORM safe.
"""

from __future__ import annotations

import random
import re

from datapatterns_spark.operators.profile import profile

_THEMES = {
    "unsigned": lambda r: str(r.randrange(0, 10 ** r.randrange(1, 10))),
    "signed": lambda r: str(-r.randrange(1, 10 ** r.randrange(1, 9))),
    "plus_signed": lambda r: f"+{r.randrange(0, 10**5)}",
    "leading_zero": lambda r: "0" + str(r.randrange(0, 10**4)),
    "float": lambda r: f"{r.randrange(-10**6, 10**6)}.{r.randrange(0, 10**6)}",
    "exp": lambda r: f"{r.randrange(1, 10)}.{r.randrange(0, 10**6)}e-{r.randrange(1, 99)}",
    "overflow": lambda r: str(r.randrange(10**20, 10**24)),
    "text": lambda r: "".join(
        r.choice("abcXYZ ,.!?ßü日9") for _ in range(r.randrange(1, 12))
    ),
    "empty": lambda r: "",
}


def _mk_columns(seed: int, n_cols: int, n_rows: int):
    rng = random.Random(seed)
    names, cols = [], []
    themes = list(_THEMES)
    # one guaranteed-pure column per theme, so every lattice branch
    # (unsigned/integer/real/string) is exercised no matter how the
    # random mixtures contaminate
    for t in themes:
        names.append(f"pure_{t}")
        cols.append([_THEMES[t](rng) for _ in range(n_rows)])
    for i in range(n_cols):
        # one or two themes per column: the second contaminates ~30%
        a = rng.choice(themes)
        b = rng.choice(themes)
        vals = [
            _THEMES[b if rng.random() < 0.3 else a](rng)
            for _ in range(n_rows)
        ]
        names.append(f"c{i}_{a}_{b}")
        cols.append(vals)
    return names, cols


def _parses_unsigned(v: str) -> bool:
    return re.fullmatch(r"\+?[0-9]+", v) is not None and not (
        len(v.lstrip("+")) > 1 and v.lstrip("+").startswith("0")
    )


def _parses_signed(v: str) -> bool:
    body = v.lstrip("+-")
    return (
        re.fullmatch(r"[-+]?[0-9]+", v) is not None
        and not (len(body) > 1 and body.startswith("0"))
    )


def _parses_real(v: str) -> bool:
    try:
        float(v)
    except ValueError:
        return False
    # the lattice only folds plain/exp decimal forms into reals
    return re.fullmatch(r"[-+]?[0-9]*\.?[0-9]+([eEaA][-+]?[0-9]+)?", v) is not None


def test_best_type_is_lossless(spark):
    names, cols = _mk_columns(seed=1302, n_cols=36, n_rows=25)
    rows = list(zip(*cols))
    df = spark.createDataFrame(rows, ", ".join(f"{n} string" for n in names))
    best = {
        r["attribute"]: r["best_attribute_type"]
        for r in profile(df, features=("best_ecl_types", "fill_rate")).collect()
    }
    assert set(best) == set(names)
    for i, name in enumerate(names):
        t = best[name]
        filled = [v.strip() for v in cols[i] if v.strip()]
        if t.startswith("unsigned"):
            bad = [v for v in filled if not _parses_unsigned(v)]
        elif t.startswith("integer"):
            bad = [v for v in filled if not _parses_signed(v)]
        elif t.startswith("real"):
            bad = [v for v in filled if not _parses_real(v)]
        else:
            # string/utf8/data keeps everything verbatim
            bad = []
        assert not bad, f"{name}: {t} cannot represent {bad[:3]}"
