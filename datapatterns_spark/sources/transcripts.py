"""Deterministic synthetic transcript table (FIXTURES.md §12 — the
BASELINE.json input_hint workload):

``(conv_id string, turn_idx int, role string, text string,
tool string, ts timestamp)``

Fully distributed generation: ``spark.range(n_conversations)`` ->
per-conversation length from a hash -> ``explode(sequence(...))`` ->
every field derived from ``xxhash64(conv, turn, salt)`` expressions.
No Python in the loop, no driver-side data, identical output for a
given (n_conversations, seed) at any parallelism.

Planted anomalies (rate-controlled, hash-gated, ground truth exactly
countable):

* duplicate ``(conv_id, turn_idx)`` keys (turn_idx collapsed onto the
  previous turn),
* out-of-domain roles (``agent``/empty),
* tool set on non-tool roles / out-of-domain tools,
* timestamp regressions (one negative delta),
* ~1% empty text, a few non-ASCII rows.

Skew: conversations whose hash lands in the hot bucket (~0.1%) are
~100x longer — the "viral conv_id" case the salting/AQE path must
survive (SURVEY.md §7 hard part 8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ROLE_DOMAIN = ["system", "user", "assistant", "tool"]
TOOL_DOMAIN = ["", "search", "browser", "python", "bash", "calculator"]

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey "
    "xray yankee zulu query result token stream agent tool call answer 42 1999 "
    "3.14 Hello World FOO Bar baz qux"
).split()


def _h(seed: int, *cols) -> F.Column:
    """Deterministic 64-bit hash of (seed, *cols)."""
    return F.xxhash64(F.lit(seed), *cols)


def generate_transcripts(
    spark: SparkSession,
    n_conversations: int = 1000,
    seed: int = 42,
    violation_rate: float = 1e-4,
    hot_fraction: float = 0.001,
    hot_multiplier: int = 100,
    partitions: int | None = None,
) -> DataFrame:
    """Build the transcript DataFrame.  ``violation_rate`` gates each
    planted-anomaly family independently (per turn)."""
    gate = max(1, int(round(1.0 / violation_rate)))
    hot_gate = max(1, int(round(1.0 / hot_fraction)))

    conv = spark.range(n_conversations).withColumnRenamed("id", "cid")
    if partitions:
        conv = conv.repartition(partitions, "cid")

    is_hot = F.pmod(_h(seed + 1, F.col("cid")), F.lit(hot_gate)) == 0
    base_len = (F.pmod(_h(seed + 2, F.col("cid")), F.lit(26)) + 5).cast("int")
    conv = conv.withColumn(
        "conv_len",
        F.when(is_hot, base_len * hot_multiplier).otherwise(base_len),
    )

    rows = conv.select(
        "cid",
        F.explode(F.sequence(F.lit(0), F.col("conv_len") - 1)).alias("t"),
    )
    cid, t = F.col("cid"), F.col("t")
    hrole = F.pmod(_h(seed + 3, cid, t), F.lit(100))
    role = (
        F.when(t == 0, F.lit("system"))
        .when(hrole < 40, F.lit("user"))
        .when(hrole < 85, F.lit("assistant"))
        .otherwise(F.lit("tool"))
    )
    # planted out-of-domain roles
    role_bad = F.pmod(_h(seed + 4, cid, t), F.lit(gate)) == 0
    role = F.when(
        role_bad,
        F.when(F.pmod(_h(seed + 5, cid, t), F.lit(2)) == 0, F.lit("agent")).otherwise(
            F.lit("")
        ),
    ).otherwise(role)

    tool = F.when(
        role == "tool",
        F.element_at(
            F.array(*[F.lit(x) for x in TOOL_DOMAIN[1:]]),
            (F.pmod(_h(seed + 6, cid, t), F.lit(len(TOOL_DOMAIN) - 1)) + 1).cast("int"),
        ),
    ).otherwise(F.lit(""))
    # planted tool violations: a tool set on a non-tool row or junk tool
    tool_bad = F.pmod(_h(seed + 7, cid, t), F.lit(gate)) == 0
    tool = F.when(tool_bad, F.lit("teleport")).otherwise(tool)

    # text: 3..60 words from the soup, ~1% empty, occasional non-ASCII
    n_words = (F.pmod(_h(seed + 8, cid, t), F.lit(58)) + 3).cast("int")
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda i: F.element_at(
            F.array(*[F.lit(w) for w in _WORDS]),
            (F.pmod(_h(seed + 9, cid, t, i), F.lit(len(_WORDS))) + 1).cast("int"),
        ),
    )
    text = F.concat_ws(" ", words)
    text = F.when(F.pmod(_h(seed + 10, cid, t), F.lit(100)) == 0, F.lit("")).otherwise(text)
    text = F.when(
        F.pmod(_h(seed + 11, cid, t), F.lit(500)) == 0,
        F.concat(F.lit("très bïen — "), text),
    ).otherwise(text)

    # ts: strictly increasing 10s steps + 0..4s jitter; planted
    # regression subtracts an hour at one turn
    ts_reg = (F.pmod(_h(seed + 12, cid, t), F.lit(gate)) == 0) & (t > 0)
    secs = (
        t.cast("long") * 10
        + F.pmod(_h(seed + 13, cid, t), F.lit(5))
        - F.when(ts_reg, F.lit(3600)).otherwise(F.lit(0))
    )
    ts = F.timestamp_seconds(F.lit(1_700_000_000) + cid * 86_400 + secs)

    # planted duplicate keys: collapse turn t onto t-1
    dup = (F.pmod(_h(seed + 14, cid, t), F.lit(gate)) == 0) & (t > 0)
    turn_idx = F.when(dup, t - 1).otherwise(t).cast("int")

    return rows.select(
        F.format_string("conv-%08d", cid).alias("conv_id"),
        turn_idx.alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )


def generate_drifted_transcripts(
    spark: SparkSession,
    n_conversations: int = 1000,
    seed: int = 42,
    role_shift: float = 0.10,
    text_scale: float = 1.5,
    **kw,
) -> DataFrame:
    """FIXTURES.md §14 drift pair: same seed, role distribution shifted
    and text lengths scaled — KS/PSI must fire for exactly these."""
    df = generate_transcripts(spark, n_conversations, seed, **kw)
    cid_h = F.xxhash64(F.lit(seed + 99), F.col("conv_id"), F.col("turn_idx"))
    shifted_role = F.when(
        (F.col("role") == "assistant")
        & (F.pmod(cid_h, F.lit(100)) < int(role_shift * 100)),
        F.lit("user"),
    ).otherwise(F.col("role"))
    scaled_text = F.when(
        F.length("text") > 0,
        F.concat(
            F.col("text"),
            F.lit(" "),
            F.substring(
                F.repeat(F.col("text"), 2),
                1,
                (F.length("text") * (text_scale - 1.0)).cast("int"),
            ),
        ),
    ).otherwise(F.col("text"))
    return df.withColumn("role", shifted_role).withColumn("text", scaled_text)


# Stored baseline profile of turn_idx (the drift reference snapshot:
# 50k conversations, seed 42 — the generator's per-turn distribution is
# scale-invariant, so the constants hold at any table size; bin 31/63
# is the clamped tail of the ~0.1% hot conversations).  Regenerate with
# scripts/make_drift_baseline.py.
_TURN_PSI_BASELINE = [  # 32 bins, lo=0, hi=64
    0.102759, 0.102752, 0.100793, 0.093055, 0.085198, 0.077357, 0.069320, 0.061202,
    0.053204, 0.045319, 0.037507, 0.029800, 0.021986, 0.014072, 0.006035, 0.000125,
    0.000125, 0.000125, 0.000125, 0.000125, 0.000125, 0.000125, 0.000125, 0.000125,
    0.000125, 0.000125, 0.000125, 0.000125, 0.000125, 0.000125, 0.000126, 0.097634,
]
_TURN_KS_BASELINE = [  # 64 bins, lo=0, hi=64
    0.051382, 0.051377, 0.051376, 0.051376, 0.051377, 0.049416, 0.047480, 0.045576,
    0.043587, 0.041610, 0.039672, 0.037684, 0.035692, 0.033628, 0.031586, 0.029616,
    0.027606, 0.025598, 0.023641, 0.021678, 0.019721, 0.017787, 0.015881, 0.013919,
    0.011993, 0.009993, 0.008022, 0.006050, 0.003999, 0.002036, 0.000063, 0.000063,
    0.000063, 0.000063, 0.000063, 0.000063, 0.000063, 0.000063, 0.000063, 0.000063,
    0.000063, 0.000063, 0.000063, 0.000063, 0.000063, 0.000063, 0.000063, 0.000063,
    0.000063, 0.000063, 0.000063, 0.000063, 0.000063, 0.000063, 0.000063, 0.000063,
    0.000063, 0.000063, 0.000063, 0.000063, 0.000063, 0.000064, 0.000062, 0.097572,
]


def transcript_check_suite(
    ts_table: str = "ts",
    include_stats: bool = True,
) -> list:
    """The flagship check suite for the transcript workload
    (BASELINE.json north_star): uniqueness, referential domains,
    row rules, ts monotonicity, plus the stat-check layer the
    north_star names — distribution drift (PSI + KS vs the stored
    baseline profile above) and Benford first-digit conformance.
    All stat checks share ONE melt pass in run_checks."""
    from ..operators import constraints as C

    checks = [
        C.unique("unique_turn", ["conv_id", "turn_idx"]),
        C.in_domain("role_domain", "role", ROLE_DOMAIN),
        C.in_domain("tool_domain", "tool", TOOL_DOMAIN),
        C.row_rule(
            "tool_only_for_tool_role",
            "tool = '' OR role = 'tool'",
        ),
        C.row_rule("text_not_null", "text IS NOT NULL"),
        C.monotonic("ts_monotonic", "ts", "conv_id", "turn_idx"),
    ]
    if include_stats:
        checks += [
            C.drift_psi(
                "turn_psi", "turn_idx", _TURN_PSI_BASELINE,
                bins=32, lo=0.0, hi=64.0, threshold=0.10,
            ),
            C.drift_ks(
                "turn_ks", "turn_idx", _TURN_KS_BASELINE,
                bins=64, lo=0.0, hi=64.0, threshold=0.05,
            ),
            # Benford conformance emitted as a verdict: sequential turn
            # indices are NOT Benford-distributed, so this check reports
            # a true non-conformance (metric = chi-squared)
            C.benford_conformance("turn_benford", "turn_idx", digit=1),
        ]
    return checks
