"""DuckDB twin of :mod:`datapatterns_spark.sources.stock` — regenerates
the synthetic stock-quote table from (n_rows, seed) with the pure-SQL
XXH64 pipeline, so Benford oracles over it are value-exact (same
convention as :mod:`.transcripts_sql`)."""

from __future__ import annotations

from .transcripts_sql import _pm
from .xxh64_sql import hash_long_steps, multi_hash_sql, xxh64_int_py


def stock_rows_sql(n_rows: int, seed: int = 42) -> str:
    """Relation with the exact columns/values of
    ``generate_stock_quotes(spark, n_rows, seed)``."""
    c = {k: xxh64_int_py(seed + k, 42) for k in (1, 2, 3, 4, 5)}
    hashes = multi_hash_sql(
        f"(SELECT i::HUGEINT AS rid FROM range({n_rows}) r(i))",
        ["rid"],
        [(f"h{k}", str(c[k]), hash_long_steps("rid")) for k in (1, 2, 3, 4, 5)],
        "stk",
    )
    uo, uc = _pm("h1", 215**3), _pm("h2", 215**3)
    ud, ue, us = _pm("h3", 5 * 12 * 28), _pm("h4", 3 * 26**3), _pm("h5", 1_000_000)

    def millis(u: str) -> str:
        return (
            f"(({u} % 215 + 1) * (({u} // 215) % 215 + 1)"
            f" * (({u} // 46225) % 215 + 1))"
        )

    def price(m: str) -> str:
        return f"CAST({m} / 1000.0 AS DECIMAL(12,3))"

    # AS MATERIALIZED on every multiply-referenced CTE: DuckDB inlines
    # CTEs per reference, so without it each downstream mention re-runs
    # (and multiplies) the whole upstream hash pipeline — the NOTES_r2
    # ninth-session lesson, re-learned here as a 20-minute 50k-row query
    return f"""(
WITH sth AS MATERIALIZED ({hashes}),
stu AS MATERIALIZED (
  SELECT rid, {uo} AS uo, {uc} AS uc, {ud} AS ud, {ue} AS ue, {us} AS us
  FROM sth
),
stm AS MATERIALIZED (
  SELECT rid, ud, ue, us, {millis('uo')} AS om, {millis('uc')} AS cm FROM stu
)
SELECT
  CAST((2018 + ud % 5) * 10000 + (1 + (ud // 5) % 12) * 100
       + (1 + (ud // 60) % 28) AS INT) AS trade_date,
  list_extract(['NYSE', 'NASDAQ', 'AMEX'], (ue % 3 + 1)::BIGINT) AS exchange_code,
  chr(65 + ((ue // 3) % 26)::INT) || chr(65 + ((ue // 78) % 26)::INT)
    || chr(65 + ((ue // 2028) % 26)::INT) AS stock_symbol,
  {price('om')} AS opening_price,
  {price('greatest(om, cm)')} AS high_price,
  {price('least(om, cm)')} AS low_price,
  {price('cm')} AS closing_price,
  us::BIGINT AS shares_traded
FROM stm
)"""
