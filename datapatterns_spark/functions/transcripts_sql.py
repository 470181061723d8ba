"""DuckDB-SQL replication of the synthetic transcript generator and
its flagship check-suite verdicts.

``sources/transcripts.py::generate_transcripts`` derives every field
from ``xxhash64(lit(seed+k), cid, t)`` expressions — pure integer
arithmetic — so an independent engine can regenerate the identical
table from ``(n_conversations, seed)`` alone.  This module generates a
single-statement DuckDB pipeline that does exactly that (seed folds
precomputed in Python via :mod:`xxh64_sql`'s pure-Python hashInt/
hashLong; per-row folds as chained CTEs) and then reproduces the
``transcript_check_suite`` verdicts:

* row checks (role/tool domains, tool-role rule, text-not-null) as
  plain conditional counts;
* uniqueness as rows-in-duplicated-``(cid, turn_idx)``-groups;
* ts monotonicity over the (turn_idx, ts)-tiebroken window — the same
  deterministic ordering the engine uses;
* PSI / KS drift vs the stored literal baselines and Benford digit-1
  chi² vs the reference's expected table + critical value.

Text is never regenerated: no suite verdict depends on its content
(``text_not_null`` can't fail — the generator plants empty strings,
not NULLs), so the word-soup loop is skipped entirely.

This closes the last rows-only entry query: the driver's DuckDB
oracle independently re-derives the flagship suite's verdicts from
first principles.
"""

from __future__ import annotations

from .xxh64_sql import (
    hash_int_steps,
    hash_long_steps,
    multi_hash_sql,
    xxh64_int_py,
)

M64 = 1 << 64


def _pm(h: str, m: int) -> str:
    """Spark ``pmod(signed64, m)`` over an unsigned HUGEINT column."""
    s = f"(CASE WHEN {h} >= {1 << 63} THEN {h} - {M64} ELSE {h} END)"
    return f"((({s} % {m}) + {m}) % {m})"


def transcript_rows_sql(
    n_conversations: int,
    seed: int = 42,
    violation_rate: float = 1e-4,
    hot_fraction: float = 0.001,
    hot_multiplier: int = 100,
) -> str:
    """Relation ``(cid, t, turn_idx, role, tool, secs)`` identical to
    ``generate_transcripts`` (ts kept as its integer seconds offset —
    order-isomorphic to the timestamp, which is all the checks use)."""
    gate = max(1, int(round(1.0 / violation_rate)))
    hot_gate = max(1, int(round(1.0 / hot_fraction)))
    c = {k: xxh64_int_py(seed + k, 42) for k in (1, 2, 3, 4, 5, 6, 7, 12, 13, 14)}

    conv_hashes = multi_hash_sql(
        f"(SELECT i::HUGEINT AS cid FROM range({n_conversations}) r(i))",
        ["cid"],
        [(f"h{k}", str(c[k]), hash_long_steps("cid")) for k in (1, 2)],
        "cv",
    )
    turn_hashes = multi_hash_sql(
        "rows0",
        ["cid", "t"],
        [
            (f"h{k}", str(c[k]), hash_long_steps("cid") + hash_int_steps("t"))
            for k in (3, 4, 5, 6, 7, 12, 13, 14)
        ],
        "tv",
    )
    base_len = f"({_pm('h2', 26)} + 5)"
    return f"""(
WITH convs AS (
  SELECT cid,
         CASE WHEN {_pm('h1', hot_gate)} = 0
              THEN {base_len} * {hot_multiplier}
              ELSE {base_len} END AS conv_len
  FROM ({conv_hashes})
),
rows0 AS (
  SELECT cid,
         UNNEST(generate_series(0::BIGINT, (conv_len - 1)::BIGINT))::HUGEINT AS t
  FROM convs
),
th AS ({turn_hashes}),
tr1 AS (
  SELECT cid, t,
         CASE WHEN {_pm('h4', gate)} = 0
              THEN (CASE WHEN {_pm('h5', 2)} = 0 THEN 'agent' ELSE '' END)
              WHEN t = 0 THEN 'system'
              WHEN {_pm('h3', 100)} < 40 THEN 'user'
              WHEN {_pm('h3', 100)} < 85 THEN 'assistant'
              ELSE 'tool' END AS role,
         {_pm('h6', 5)} AS tool_pick,
         {_pm('h7', gate)} = 0 AS tool_bad,
         ({_pm('h12', gate)} = 0 AND t > 0) AS ts_reg,
         {_pm('h13', 5)} AS jitter,
         ({_pm('h14', gate)} = 0 AND t > 0) AS dup
  FROM th
)
SELECT cid, t,
       (CASE WHEN dup THEN t - 1 ELSE t END)::BIGINT AS turn_idx,
       role,
       CASE WHEN tool_bad THEN 'teleport'
            WHEN role = 'tool'
            THEN list_extract(['search', 'browser', 'python', 'bash',
                               'calculator'], (tool_pick + 1)::BIGINT)
            ELSE '' END AS tool,
       (t * 10 + jitter - CASE WHEN ts_reg THEN 3600 ELSE 0 END)::BIGINT AS secs
FROM tr1
)"""


def transcript_suite_sql(
    n_conversations: int,
    seed: int,
    violation_rate: float,
    psi_baseline: list[float],
    ks_baseline: list[float],
    benford_expected: dict[int, float],
    benford_critical: float,
    psi_threshold: float = 0.10,
    ks_threshold: float = 0.05,
) -> str:
    """Full verdict statement: ``(check_name, passed, violation_count)``
    for the nine transcript_check_suite checks."""
    rows = transcript_rows_sql(n_conversations, seed, violation_rate)
    psi_base = ", ".join(repr(v) for v in psi_baseline)
    ks_base = ", ".join(repr(v) for v in ks_baseline)
    exp_vals = ", ".join(repr(benford_expected[d]) for d in range(1, 10))
    eps = "1e-6"
    return f"""
WITH tr AS MATERIALIZED ({rows}),
rc AS (
  SELECT COUNT(*) AS tot,
         SUM(CASE WHEN role NOT IN ('system', 'user', 'assistant', 'tool')
                  THEN 1 ELSE 0 END) AS role_bad,
         SUM(CASE WHEN tool NOT IN ('', 'search', 'browser', 'python',
                                    'bash', 'calculator')
                  THEN 1 ELSE 0 END) AS tool_bad,
         SUM(CASE WHEN NOT (tool = '' OR role = 'tool')
                  THEN 1 ELSE 0 END) AS tool_only
  FROM tr),
uq AS (
  SELECT COALESCE(SUM(n), 0) AS vc
  FROM (SELECT COUNT(*) AS n FROM tr GROUP BY cid, turn_idx
        HAVING COUNT(*) > 1)),
mono AS (
  SELECT COUNT(*) AS vc FROM (
    SELECT secs,
           LAG(secs) OVER (PARTITION BY cid ORDER BY turn_idx, secs) AS prev
    FROM tr)
  WHERE prev IS NOT NULL AND secs < prev),
b32 AS (
  SELECT LEAST(GREATEST(CAST(FLOOR(turn_idx / 2.0) AS INT), 0), 31) AS b,
         COUNT(*) AS n
  FROM tr GROUP BY 1),
psi AS (
  SELECT SUM((GREATEST(COALESCE(n, 0) * 1.0 / tot, {eps})
              - GREATEST(base, {eps}))
             * LN(GREATEST(COALESCE(n, 0) * 1.0 / tot, {eps})
                  / GREATEST(base, {eps}))) AS v
  FROM (SELECT UNNEST(range(32)) AS b, UNNEST([{psi_base}]) AS base)
  LEFT JOIN b32 USING (b) CROSS JOIN rc),
b64 AS (
  SELECT LEAST(GREATEST(CAST(FLOOR(turn_idx / 1.0) AS INT), 0), 63) AS b,
         COUNT(*) AS n
  FROM tr GROUP BY 1),
ks AS (
  SELECT MAX(ABS(ca - cb)) AS v FROM (
    SELECT SUM(COALESCE(n, 0) * 1.0 / tot) OVER (ORDER BY b) AS ca,
           SUM(base) OVER (ORDER BY b) AS cb
    FROM (SELECT UNNEST(range(64)) AS b, UNNEST([{ks_base}]) AS base)
    LEFT JOIN b64 USING (b) CROSS JOIN rc)),
bf AS (
  SELECT CAST(substr(CAST(turn_idx AS VARCHAR), 1, 1) AS INT) AS d,
         COUNT(*) AS n
  FROM tr WHERE turn_idx > 0 GROUP BY 1),
chi AS (
  SELECT SUM(POW(ROUND(COALESCE(n, 0) * 100.0
                       / (SELECT SUM(n) FROM bf), 1) - exp, 2) / exp) AS v
  FROM (SELECT UNNEST(range(1, 10)) AS d, UNNEST([{exp_vals}]) AS exp)
  LEFT JOIN bf USING (d))
SELECT * FROM (
  SELECT 'unique_turn' AS check_name, vc = 0 AS passed,
         vc::BIGINT AS violation_count FROM uq
  UNION ALL SELECT 'role_domain', role_bad = 0, role_bad::BIGINT FROM rc
  UNION ALL SELECT 'tool_domain', tool_bad = 0, tool_bad::BIGINT FROM rc
  UNION ALL SELECT 'tool_only_for_tool_role', tool_only = 0,
            tool_only::BIGINT FROM rc
  UNION ALL SELECT 'text_not_null', TRUE, 0::BIGINT
  UNION ALL SELECT 'ts_monotonic', vc = 0, vc::BIGINT FROM mono
  UNION ALL SELECT 'turn_psi', ROUND(v, 6) <= {psi_threshold!r},
            0::BIGINT FROM psi
  UNION ALL SELECT 'turn_ks', ROUND(v, 6) <= {ks_threshold!r},
            0::BIGINT FROM ks
  UNION ALL SELECT 'turn_benford', ROUND(v, 3) <= {benford_critical!r},
            0::BIGINT FROM chi
)
"""
