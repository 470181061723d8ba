"""The DuckDB replication of the transcript generator
(functions/transcripts_sql.py) must reproduce ``generate_transcripts``
row-for-row — that equality is what makes the transcript_suite oracle
an independent first-principles check rather than a copied answer."""

from __future__ import annotations

import duckdb

from datapatterns_spark.functions.transcripts_sql import transcript_rows_sql
from datapatterns_spark.sources.transcripts import generate_transcripts

EPOCH = 1_700_000_000


def test_sql_generator_matches_spark(spark):
    n, seed, rate = 300, 7, 0.01
    spark_rows = set()
    for r in generate_transcripts(
        spark, n_conversations=n, seed=seed, violation_rate=rate
    ).collect():
        cid = int(r["conv_id"][5:])
        secs = int(r["ts"].timestamp()) - EPOCH - cid * 86_400
        spark_rows.add((cid, r["turn_idx"], r["role"], r["tool"], secs))

    sql = f"SELECT cid, turn_idx, role, tool, secs FROM {transcript_rows_sql(n, seed, rate)}"
    duck_rows = {
        (int(c), int(t), role, tool, int(s))
        for c, t, role, tool, s in duckdb.connect().execute(sql).fetchall()
    }
    assert duck_rows == spark_rows


def test_sql_generator_plants_anomalies(spark):
    """The replication must reproduce the PLANTED anomalies too, not
    just the happy path."""
    sql = f"""
WITH tr AS ({transcript_rows_sql(2000, 42, 0.003)})
SELECT SUM(CASE WHEN role NOT IN ('system','user','assistant','tool') THEN 1 ELSE 0 END),
       SUM(CASE WHEN tool = 'teleport' THEN 1 ELSE 0 END),
       SUM(CASE WHEN turn_idx <> t THEN 1 ELSE 0 END)
FROM tr"""
    role_bad, teleport, dups = duckdb.connect().execute(sql).fetchone()
    assert role_bad > 0 and teleport > 0 and dups > 0


def test_stock_sql_generator_matches_spark(spark):
    """The Benford-walkthrough stock table (sources/stock.py) must be
    regenerated bit-for-bit by its DuckDB twin — decimals compared as
    their rendered strings, exactly as the Benford digit logic sees
    them."""
    from datapatterns_spark.functions.stock_sql import stock_rows_sql
    from datapatterns_spark.sources.stock import generate_stock_quotes

    n = 3000
    spark_rows = {
        tuple(str(v) for v in r)
        for r in generate_stock_quotes(spark, n).collect()
    }
    duck_rows = {
        tuple(str(v) for v in r)
        for r in duckdb.connect()
        .execute(f"SELECT * FROM {stock_rows_sql(n)}")
        .fetchall()
    }
    assert duck_rows == spark_rows
