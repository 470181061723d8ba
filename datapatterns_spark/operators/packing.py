"""Sequence packing for LLM pretraining pipelines (not in the
reference): concatenate document token streams and cut them into
fixed-size packs — the standard "concat and chunk" batching that turns
a ragged corpus into uniform ``max_tokens`` training sequences with
zero padding waste.

Spark-first shape: documents are assigned to ``n_shards`` hash shards
and ordered deterministically inside each (``xxhash64`` of the id, so
any parallelism and any input partitioning produce the same packs).
One window cumsum per shard gives each document its token span
``[start, end)`` in the shard's concatenated stream; a document
straddling pack boundaries explodes into one row per touched pack
with the in-document token range.  The only shuffle is the per-shard
Exchange+Sort over slim ``(id, n_tokens)`` rows — shards are uniform
by construction, so no window key is hot, and the whole thing scales
with ``n_shards`` (the global-ordering formulation would serialize
into ONE window task).

Everything is a pure expression: no Python, no collect, exactly
reproducible in SQL (the entry's DuckDB oracle replays the hash
ordering via the pure-SQL XXH64 pipeline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str | None = None,
    text_col: str = "text",
    max_tokens: int = 2048,
    n_shards: int = 64,
    seed: int = 42,
) -> DataFrame:
    """``(shard, pack, doc_id, tok_start, n_tokens)`` — one row per
    (document, pack) span.

    ``tokens_col`` names a precomputed token-count column; otherwise
    whitespace tokens of ``text_col`` are counted.  Zero-token
    documents are dropped (they occupy no span).  Within a shard,
    every pack holds exactly ``max_tokens`` tokens except the last.
    ``pack`` numbers from 0 per shard; a global pack key is
    ``(shard, pack)``.
    """
    if tokens_col is None:
        from .textanalysis import whitespace_token_count

        toks = whitespace_token_count(F.col(text_col))
    else:
        toks = F.col(tokens_col).cast("long")
    b = int(max_tokens)
    d = (
        df.select(F.col(id_col).alias("doc_id"), toks.alias("n_tok"))
        .filter(F.col("n_tok") > 0)
        .withColumn(
            "shard",
            F.pmod(F.xxhash64(F.lit(seed), F.col("doc_id")), F.lit(n_shards)),
        )
        .withColumn("ord", F.xxhash64(F.lit(seed + 1), F.col("doc_id")))
    )
    w = Window.partitionBy("shard").orderBy("ord", "doc_id")
    d = d.withColumn("end", F.sum("n_tok").over(w)).withColumn(
        "start", F.col("end") - F.col("n_tok")
    )
    # integer division, never float: start/b as a double rounds up at
    # ~1e13-token shard offsets for non-power-of-two budgets and would
    # misassign boundary spans (and diverge from the integer-exact
    # SQL oracle)
    d = d.withColumn(
        "pack",
        F.explode(
            F.sequence(
                F.expr(f"start div {b}"),
                F.expr(f"(end - 1) div {b}"),
            )
        ),
    )
    lo = F.greatest(F.col("pack") * b, F.col("start"))
    hi = F.least((F.col("pack") + 1) * b, F.col("end"))
    return d.select(
        "shard",
        "pack",
        "doc_id",
        (lo - F.col("start")).alias("tok_start"),
        (hi - lo).alias("n_tokens"),
    )
