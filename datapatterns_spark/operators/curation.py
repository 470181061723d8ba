"""End-to-end document curation — the composed pipeline a
training-data run executes before text reaches tokenization:

    annotate (language, quality) -> filter -> dedup -> redact

Each stage is one of this package's operators (``lang_id`` /
``quality_score`` / exact-or-MinHash dedup / ``redact_pii``), so the
composition inherits their scale shapes: annotation and redaction are
map-only projections, the exact-dedup keep-list is a slim hash
``groupBy`` + join (never a window over text), and the MinHash path
reuses the banded-LSH + connected-components machinery.  Everything
is deterministic, so the exact-dedup configuration is value-checked
end-to-end against a composed DuckDB oracle (`curate_documents`
driver entry).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def curate_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float | None = None,
    languages: list[str] | None = None,
    dedup: str | None = "exact",
    redact: bool = False,
    minhash_threshold: float = 0.8,
    max_dup_line_frac: float | None = None,
    max_top_ngram_char_frac: float | None = None,
    min_lm_score: float | None = None,
    lm_model: DataFrame | None = None,
    cut_span_n: int | None = None,
    cut_span_min_count: int = 2,
    cut_span_winnow_w: int = 1,
) -> DataFrame:
    """Curated ``(doc_id, lang_guess, quality, [n_tokens_cut,]
    [pii_total,] text)``.

    Stages (all optional except annotation):

    * quality gate: ``quality >= min_quality``;
    * language gate: ``lang_guess`` in ``languages``;
    * repetition gates (Gopher rules, :func:`repetition_stats`):
      drop documents whose duplicate-line fraction or top-n-gram
      character coverage exceeds the given bounds;
    * span cutting (``cut_span_n=n``): corpus-wide duplicated token
      spans (word ``n``-grams seen >= ``cut_span_min_count`` times —
      licence boilerplate, templated chrome) are CUT from each
      surviving document instead of dropping the document
      (:func:`~datapatterns_spark.operators.dedup.duplicate_token_spans`
      + ``cut_duplicate_spans``; the Lee et al. 2022 order — cut
      before dedup, so near-identical pages whose only difference was
      boilerplate become exact duplicates and collapse).  The kept
      text becomes the NORMALIZED token stream (the span positions'
      frame of reference) and ``n_tokens_cut`` is added.
      ``cut_span_winnow_w`` engages the winnowing volume lever at
      10^12-token scale (detection floor ``n + w - 1`` tokens);
    * dedup ``"exact"``: one survivor (min id) per
      ``xxhash64(normalized_text)`` key — slim-key shuffle, hot
      duplicates collapse map-side;
    * dedup ``"minhash"``: near-dup pairs -> connected components ->
      drop every non-canonical cluster member;
    * ``redact=True``: PII scrub of the surviving text (adds
      ``pii_total``).

    Dedup runs AFTER the gates, so the canonical survivor is the
    minimum id among rows that passed filtering.
    """
    from .dedup import normalized_text
    from .textanalysis import lang_id, quality_score, redact_pii

    d = df.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    ).withColumns(
        {
            "lang_guess": lang_id(F.col("text")),
            "quality": quality_score(F.col("text")),
        }
    )
    if min_quality is not None:
        d = d.filter(F.col("quality") >= float(min_quality))
    if languages:
        d = d.filter(F.col("lang_guess").isin(list(languages)))
    if max_dup_line_frac is not None or max_top_ngram_char_frac is not None:
        # inline column expressions on the SAME scan — a stats-frame
        # semi-join would rescan the full text a second time
        from .textanalysis import repetition_cols

        rc = repetition_cols("text")
        if max_dup_line_frac is not None:
            d = d.filter(rc["dup_line_frac"] <= float(max_dup_line_frac))
        if max_top_ngram_char_frac is not None:
            d = d.filter(
                rc["top_ngram_char_frac"] <= float(max_top_ngram_char_frac)
            )
    if min_lm_score is not None:
        # CCNet-style LM perplexity gate: score the gated batch under
        # ``lm_model`` (a char_bigram_counts frame — pass a model
        # trained on a reference corpus for cross-batch-stable
        # thresholds; None self-trains on this batch) and keep docs
        # scoring at or above the floor.  The model broadcast-joins;
        # the only added shuffle is the slim per-doc score agg.
        from .textanalysis import lm_quality_score

        scores = lm_quality_score(
            d, model=lm_model, text_col="text", id_col="doc_id"
        ).select(F.col("id").alias("doc_id"), "lm_score")
        d = (
            d.join(scores, "doc_id")
            .filter(F.col("lm_score") >= float(min_lm_score))
            .drop("lm_score")
        )

    cut = cut_span_n is not None
    if cut:
        from .dedup import cut_duplicate_spans, duplicate_token_spans

        spans = duplicate_token_spans(
            d, "text", "doc_id",
            n=int(cut_span_n),
            min_count=int(cut_span_min_count),
            winnow_w=int(cut_span_winnow_w),
        )
        trimmed = cut_duplicate_spans(d, spans, "text", "doc_id").select(
            F.col("id").alias("doc_id"), "text", "n_tokens_cut"
        )
        # every input doc comes back (span-free docs pass through with
        # n_tokens_cut = 0), so this join replaces text 1:1
        d = d.drop("text").join(trimmed, "doc_id")

    if dedup == "exact":
        d = d.withColumn("_k", F.xxhash64(normalized_text(F.col("text"))))
        canon = d.groupBy("_k").agg(F.min("doc_id").alias("_canon"))
        d = (
            d.join(canon, "_k")
            .filter(F.col("doc_id") == F.col("_canon"))
            .drop("_k", "_canon")
        )
    elif dedup == "minhash":
        from .dedup import dedup_components, minhash_lsh_pairs

        pairs = minhash_lsh_pairs(
            d, "text", "doc_id", threshold=minhash_threshold
        )
        losers = (
            dedup_components(pairs.select("id_a", "id_b"))
            .filter(~F.col("keep"))
            .select(F.col("node").alias("doc_id"))
        )
        d = d.join(losers, "doc_id", "left_anti")
    elif dedup is not None:
        raise ValueError(f"unknown dedup mode {dedup!r}")

    if redact:
        from .textanalysis import PII_PATTERNS

        # derive the per-kind count columns to drop from PII_PATTERNS
        # itself — a hardcoded list would silently leak an undropped
        # n_<kind> column (and change this function's schema) the day
        # a pattern kind is added to redact_pii's defaults
        d = (
            redact_pii(d, "text")
            .drop("text", *[f"n_{k}" for k in PII_PATTERNS])
            .withColumnRenamed("redacted", "text")
        )
        return d.select(
            "doc_id", "lang_guess", "quality",
            *(["n_tokens_cut"] if cut else []), "pii_total", "text",
        )
    return d.select(
        "doc_id", "lang_guess", "quality",
        *(["n_tokens_cut"] if cut else []), "text",
    )
