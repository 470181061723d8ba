"""Deterministic synthetic stock-quote table — the shape of the
reference README's Benford walkthrough (README.md:594-727 and
:846-865: ~20.9M rows of trade_date / exchange_code / stock_symbol /
opening..closing price / shares_traded, Benford run over the price and
date columns).

Fully distributed generation: ``spark.range(n_rows)`` with every field
derived from ``xxhash64(seed+k, rid)`` by pure INTEGER arithmetic
(products of uniforms for log-normal-ish, Benford-leaning prices; no
transcendentals, no doubles except one exactly-representable /1000.0
before a DECIMAL cast) — so DuckDB regenerates the identical table
from (n_rows, seed) via the pure-SQL XXH64 pipeline
(:func:`datapatterns_spark.functions.stock_sql.stock_rows_sql`) and
value-level oracles hold bit-for-bit at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EXCHANGES = ["NYSE", "NASDAQ", "AMEX"]


def _h(seed: int, *cols) -> F.Column:
    return F.xxhash64(F.lit(seed), *cols)


def generate_stock_quotes(
    spark: SparkSession,
    n_rows: int = 20_959_177,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """(trade_date int, exchange_code, stock_symbol, opening_price,
    high_price, low_price, closing_price decimal(12,3), shares_traded
    long) — pure function of (n_rows, seed)."""
    df = spark.range(n_rows).withColumnRenamed("id", "rid")
    if partitions:
        df = df.repartition(partitions)
    rid = F.col("rid")
    # price millis = product of three independent uniforms on [1, 215]
    # (sums of logs -> approximately log-normal -> Benford-leaning
    # leading digits), all integer math: u < 215^3 carries the three
    # digits base 215
    df = (
        df.withColumn("uo", F.pmod(_h(seed + 1, rid), F.lit(215**3)))
        .withColumn("uc", F.pmod(_h(seed + 2, rid), F.lit(215**3)))
        .withColumn("ud", F.pmod(_h(seed + 3, rid), F.lit(5 * 12 * 28)))
        .withColumn("ue", F.pmod(_h(seed + 4, rid), F.lit(3 * 26**3)))
        .withColumn("us", F.pmod(_h(seed + 5, rid), F.lit(1_000_000)))
    )
    millis = (
        "((%(u)s %% 215 + 1) * ((%(u)s div 215) %% 215 + 1)"
        " * ((%(u)s div 46225) %% 215 + 1))"
    )
    df = df.withColumn("om", F.expr(millis % {"u": "uo"})).withColumn(
        "cm", F.expr(millis % {"u": "uc"})
    )
    price = "CAST(%s / 1000.0 AS DECIMAL(12,3))"
    return df.select(
        F.expr(
            "CAST((2018 + ud % 5) * 10000 + (1 + (ud div 5) % 12) * 100"
            " + (1 + (ud div 60) % 28) AS INT)"
        ).alias("trade_date"),
        F.expr(
            "element_at(array('NYSE','NASDAQ','AMEX'), CAST(ue % 3 + 1 AS INT))"
        ).alias("exchange_code"),
        F.expr(
            "concat(chr(65 + (ue div 3) % 26), chr(65 + (ue div 78) % 26),"
            " chr(65 + (ue div 2028) % 26))"
        ).alias("stock_symbol"),
        F.expr(price % "om").alias("opening_price"),
        F.expr(price % "greatest(om, cm)").alias("high_price"),
        F.expr(price % "least(om, cm)").alias("low_price"),
        F.expr(price % "cm").alias("closing_price"),
        F.col("us").alias("shares_traded"),
    )
