"""Text-analysis operators for training-data pipelines (not in the
reference): language ID, quality scoring, token counting, document
fingerprinting, winnowing (MOSS) fingerprints/near-dups, and PII
detection/redaction.  All pure built-in expressions — no Python
UDFs."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import normalized_text
from ..materialize import materialize

# marker-word lists per language for the n-gram/stopword heuristic
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "sich", "auf"],
    "fr": ["le", "la", "les", "et", "est", "des", "une", "dans", "que", "pour"],
    "es": ["el", "la", "los", "de", "que", "y", "en", "un", "por", "con"],
    "it": ["il", "la", "di", "che", "e", "un", "per", "con", "del", "una"],
}

_EN_STOPWORDS = _LANG_MARKERS["en"] + ["a", "an", "as", "at", "be", "by", "on", "or"]

# whitespace split plus a BPE-ish regex that also counts punctuation
# runs and digit runs as tokens
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"


def whitespace_token_count(col: Column) -> Column:
    t = F.trim(F.coalesce(col, F.lit("")))
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def bpe_token_count(col: Column) -> Column:
    return F.coalesce(
        F.regexp_count(F.coalesce(col, F.lit("")), F.lit(BPE_TOKEN_RE)), F.lit(0)
    )


def _marker_hits(col: Column, markers: list[str]) -> Column:
    toks = F.split(normalized_text(col), " ")
    marker_arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(toks, lambda t: F.array_contains(marker_arr, t)))


def lang_id(col: Column) -> Column:
    """Best-guess language code by stopword-marker vote; 'und'
    (undetermined) when nothing matches."""
    scored = F.array(
        *[
            F.struct(
                (-_marker_hits(col, markers)).alias("neg"),
                F.lit(lang).alias("lang"),
            )
            for lang, markers in _LANG_MARKERS.items()
        ]
    )
    best = F.array_sort(scored)[0]
    return F.when(best["neg"] < 0, best["lang"]).otherwise(F.lit("und"))


def quality_score(col: Column) -> Column:
    """Heuristic quality in [0,1]: length band, alpha ratio, low punct
    density, stopword presence, reasonable mean word length."""
    t = F.coalesce(col, F.lit(""))
    n = F.length(t)
    alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    punct = F.length(F.regexp_replace(t, r"[^\p{Punct}]", ""))
    words = whitespace_token_count(t)
    stop = _marker_hits(t, _EN_STOPWORDS)
    len_ok = F.when((n >= 20) & (n <= 8000), 1.0).when(n > 0, 0.4).otherwise(0.0)
    alpha_ratio = F.when(n > 0, alpha / n).otherwise(F.lit(0.0))
    punct_ok = F.when(n > 0, 1.0 - F.least(punct / n * 4, F.lit(1.0))).otherwise(0.0)
    stop_ok = F.when(words > 0, F.least(stop / words * 5, F.lit(1.0))).otherwise(0.0)
    mean_wl = F.when(words > 0, n / words).otherwise(F.lit(0.0))
    wl_ok = F.when((mean_wl >= 3) & (mean_wl <= 12), 1.0).otherwise(0.3)
    return F.round(
        0.3 * len_ok + 0.25 * alpha_ratio + 0.15 * punct_ok + 0.15 * stop_ok + 0.15 * wl_ok,
        4,
    )


def fingerprint(col: Column) -> Column:
    """64-bit content fingerprint of the normalized text (rolling-hash
    analogue; xxhash64 over the canonical form)."""
    return F.xxhash64(normalized_text(col))


# ---------------------------------------------------------------------------
# character-bigram language-model quality scoring (round 3)
# ---------------------------------------------------------------------------
def _char_bigrams(text_col: Column) -> Column:
    """Array of character bigrams of the normalized text (empty for
    texts shorter than 2 chars — sequence(1, 0) would DESCEND in
    Spark, so the short case is guarded explicitly).

    Built from a one-pass codepoint split + zip of adjacent slices,
    NOT per-index ``substr``: substr on UTF8 counts codepoints, so
    each call seeks from the string start — O(len) per call, O(len^2)
    per document.  Measured on the 50k-doc sf1.0 corpus: 22-29 s ->
    1.4-1.9 s for the identical 22.1M bigrams.  ``(?s).`` matches one
    CODEPOINT in Java regex, so astral chars split exactly as substr
    counted them."""
    s = normalized_text(text_col)
    chars = F.regexp_extract_all(s, F.lit("(?s)."), 0)
    m = F.size(chars)
    grams = F.zip_with(
        F.slice(chars, 1, m - 1),
        F.slice(chars, 2, m - 1),
        lambda a, b: F.concat(a, b),
    )
    return F.when(m >= 2, grams).otherwise(
        F.array().cast("array<string>")
    )


def char_bigram_counts(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Train data for the character-bigram LM: ``(bg, cnt)`` counts
    over the corpus's normalized text.  One scan -> explode ->
    map-side-combinable groupBy; the result is bounded by the squared
    character alphabet (a few thousand rows at any corpus size), so it
    broadcasts."""
    return (
        df.select(F.explode(_char_bigrams(F.col(text_col))).alias("bg"))
        .groupBy("bg")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# Model-size ceiling for the literal-map scoring path: below it the
# whole per-(bigram, first-char) log-prob table rides the PLAN as two
# create_map literals and scoring is a map-only array fold — no
# explode, no joins, no shuffle.  Spark's GetMapValue on a literal map
# is a LINEAR key scan, so the ceiling is sized by measurement, not
# plan size: at the natural 132-row sf1.0 model literal ~= join
# (4.7-5.8 vs 5.5-5.6 s); at a planted 4000-row all-miss model the
# scan costs 4x the join (18.1 vs 4.4 s).  512 keeps the worst-case
# scan comfortably under the join's constant while covering real
# normalized-text alphabets; bigger models (mixed-script, CJK) take
# the broadcast-join formulation, which is unbounded-safe.  Same
# house pattern as similarity.LITERAL_CENTROID_LIMIT.
LM_LITERAL_LIMIT = 512


def _lm_score_literal(
    df, model, uni, vocab, text_col, id_col, alpha
) -> DataFrame:
    """Literal-map scoring path: one map-only pass, zero shuffles.

    The quantized ln() terms are computed IN Spark on the tiny
    model/uni frames (the same expressions the join path evaluates
    per-row), so both paths produce bit-identical lp9 longs and the
    oracle stays exact regardless of which path runs."""

    def quant(x: Column) -> Column:
        return F.floor(F.log(x) * F.lit(1e9) + F.lit(0.5)).cast("long")

    present = (
        model.join(uni, F.substring("bg", 1, 1) == F.col("_a"), "left")
        .select(
            "bg",
            quant(
                (F.col("cnt") + F.lit(alpha))
                / (F.coalesce(F.col("fcnt"), F.lit(0)) + F.lit(alpha * vocab))
            ).alias("lp9"),
        )
        .collect()  # bounded: caller guarantees <= LM_LITERAL_LIMIT rows
    )
    unseen = uni.select(
        "_a",
        quant(F.lit(alpha) / (F.col("fcnt") + F.lit(alpha * vocab))).alias(
            "lp9"
        ),
    ).collect()  # bounded by the alphabet
    g = (
        df.sparkSession.range(1)
        .select(quant(F.lit(alpha) / F.lit(alpha * vocab)).alias("lp9"))
        .collect()[0]["lp9"]
    )
    m_bg = F.create_map(
        *[l for r in present for l in (F.lit(r["bg"]), F.lit(r["lp9"]))]
    )
    m_a = (
        F.create_map(
            *[l for r in unseen for l in (F.lit(r["_a"]), F.lit(r["lp9"]))]
        )
        if unseen
        else None
    )

    def per_bigram(bg: Column) -> Column:
        # try_element_at: null on miss under ANSI mode too (plain
        # element_at raises MAP_KEY_DOES_NOT_EXIST there, and scoring
        # a corpus under an EXTERNAL model legitimately misses keys)
        cands = [F.try_element_at(m_bg, bg)]
        if m_a is not None:
            cands.append(F.try_element_at(m_a, F.substring(bg, 1, 1)))
        cands.append(F.lit(g))
        return F.coalesce(*cands)

    base = df.select(
        F.col(id_col).alias("id"),
        _char_bigrams(F.col(text_col)).alias("_arr"),
    )
    n = F.size("_arr")
    s = F.aggregate(
        "_arr", F.lit(0).cast("long"), lambda acc, bg: acc + per_bigram(bg)
    )
    return base.select(
        "id",
        n.cast("long").alias("n_bigrams"),
        F.when(n > 0, F.round(s / (n * F.lit(1e9)), 6))
        .otherwise(F.lit(0.0))
        .alias("lm_score"),
    )


def lm_quality_score(
    df: DataFrame,
    model: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.5,
) -> DataFrame:
    """Per-document language-model quality score — the CCNet-style
    perplexity gate of web-scale curation pipelines (Wenzek et al.
    2020 use a 5-gram KenLM; this is the dependency-free char-bigram
    analogue with identical plumbing): average add-alpha conditional
    log-probability ``mean ln P(b|a)`` of the document's normalized
    character stream under ``model`` (``char_bigram_counts`` output;
    trained on ``df`` itself when None).  Natural-language text scores
    high; mojibake/binary spew/repetitive boilerplate score low —
    threshold on ``lm_score`` as a curation gate.

    Returns ``(id, n_bigrams, lm_score)`` with score 0.0 for
    sub-2-char docs (``id`` assumed unique, as throughout the
    pipeline).  Scale shape, two formulations with bit-identical
    output: models up to ``LM_LITERAL_LIMIT`` rows (any natural
    language) ride the plan as literal maps and scoring is ONE
    map-only array fold — no explode, no join, no shuffle; larger
    models broadcast into the explode+join formulation, whose corpus
    pass scans once and shuffles only slim per-doc partial sums.
    Cross-engine determinism: each ln() term is quantized to integer
    1e-9 units with the floor(x+0.5) rule (the one rounding identical
    across engines), summed exactly as longs, and only the final mean
    is rounded."""
    if model is None:
        model = char_bigram_counts(df, text_col)
    # the model frame feeds THREE consumers (vocab collect, the
    # conditional-denominator agg, the scoring join) — eager
    # materialize so the corpus bigram pass runs once, not three
    # times (balanced-scan sf0.1: 4.7 -> ~3.5 s; single-task input:
    # 47 -> 32 s); under the default mode it is freed by the
    # ContextCleaner when scoring completes (never a persist leak)
    model = materialize(model)
    # conditional denominators c(a.) and the alphabet size V (distinct
    # successor chars + 1 unseen slot) — both tiny, derived from the
    # model, evaluated once
    uni = model.groupBy(F.substring("bg", 1, 1).alias("_a")).agg(
        F.sum("cnt").alias("fcnt")
    )
    vocab = model.select(
        F.countDistinct(F.substring("bg", 2, 1)).alias("v")
    ).collect()[0]["v"] + 1
    # literal-map fast path: for alphabet-bounded models the whole
    # log-prob table fits the plan and scoring needs NO explode, NO
    # joins and NO shuffle — one array fold per row.  Result is
    # bit-identical to the join path (terms computed in Spark on the
    # same tiny frames); the join path remains for over-limit models.
    n_model_rows = model.count()
    if 0 < n_model_rows <= LM_LITERAL_LIMIT:
        return _lm_score_literal(
            df, model, uni, vocab, text_col, id_col, alpha
        )
    docs = df.select(
        F.col(id_col).alias("id"),
        F.explode_outer(_char_bigrams(F.col(text_col))).alias("bg"),
    )
    scored = (
        docs.join(F.broadcast(model), "bg", "left")
        .join(
            F.broadcast(uni),
            F.substring("bg", 1, 1) == F.col("_a"),
            "left",
        )
        .select(
            "id",
            F.when(F.col("bg").isNull(), F.lit(None)).otherwise(
                F.floor(
                    F.log(
                        (F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(alpha))
                        / (
                            F.coalesce(F.col("fcnt"), F.lit(0))
                            + F.lit(alpha * vocab)
                        )
                    )
                    * F.lit(1e9)
                    + F.lit(0.5)
                ).cast("long")
            ).alias("lp9"),
        )
    )
    return (
        scored.groupBy("id")
        .agg(
            F.count("lp9").alias("n_bigrams"),
            F.sum("lp9").alias("_s"),
        )
        .select(
            "id",
            F.col("n_bigrams").cast("long").alias("n_bigrams"),
            F.when(
                F.col("n_bigrams") > 0,
                F.round(F.col("_s") / (F.col("n_bigrams") * F.lit(1e9)), 6),
            )
            .otherwise(F.lit(0.0))
            .alias("lm_score"),
        )
    )


# winnowing (MOSS-style document fingerprinting): polynomial rolling
# hash over character k-grams, then the minimum of every w-window of
# consecutive k-gram hashes.  The selected set is the classic
# winnowing guarantee set (any shared substring of length >= k+w-1
# yields a shared fingerprint), which is what plagiarism/near-dup
# pipelines index.  Modulus/base chosen so every intermediate fits a
# 64-bit long (acc < 2^31, acc*257 + cp < 2^40).
_WINNOW_MOD = (1 << 31) - 1
_WINNOW_BASE = 257


# PII patterns chosen to behave identically under Java regex (Spark)
# and RE2 (DuckDB): no lookaround, no backreferences, explicit
# character classes.  Ordered — redaction applies them in sequence, so
# e.g. an SSN never half-matches as a phone after substitution.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    "phone": r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    kinds: list[str] | None = None,
    token_fmt: str = "[{kind}]",
) -> DataFrame:
    """Detect + redact PII-shaped spans — the scrubbing pass every
    training-data pipeline runs before text leaves curation.

    Adds ``redacted`` (text with each match replaced by
    ``token_fmt``, patterns applied in ``PII_PATTERNS`` order),
    ``n_<kind>`` match counts (counted on the PRE-redaction text, so
    counts are independent of application order), and ``pii_total``.
    Pure ``regexp_count`` / ``regexp_replace`` expressions — one
    projection, no shuffle, no Python; at 100 TB this is a map-only
    pass that pipelines into whatever scan feeds it.
    """
    kinds = list(PII_PATTERNS) if kinds is None else kinds
    txt = F.coalesce(F.col(text_col), F.lit(""))
    counts = [
        F.regexp_count(txt, F.lit(PII_PATTERNS[k])).alias(f"n_{k}")
        for k in kinds
    ]
    red = txt
    for k in kinds:
        red = F.regexp_replace(
            red, PII_PATTERNS[k], token_fmt.format(kind=k.upper())
        )
    out = df.select("*", *counts, red.alias("redacted"))
    return out.withColumn(
        "pii_total",
        sum((F.col(f"n_{k}") for k in kinds[1:]), F.col(f"n_{kinds[0]}")),
    )


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 2,
) -> DataFrame:
    """Gopher-style within-document repetition measures (Rae et al.
    2021, "Scaling Language Models" §A1.1 — the standard web-corpus
    repetition filters), all pure array expressions:

    * ``dup_line_frac`` — fraction of lines that are duplicates of an
      earlier line;
    * ``dup_line_char_frac`` — fraction of characters sitting in
      duplicated lines;
    * ``top_ngram_char_frac`` — fraction of characters covered by the
      single most frequent word ``ngram``-gram (boilerplate pages
      repeat one phrase; clean prose doesn't).

    One map-only projection — no shuffle, no Python; compose with
    ``quality_score`` thresholds to drop repetitive documents.
    """
    cols = repetition_cols(text_col, ngram)
    return df.select(
        F.col(id_col).alias("doc_id"),
        *[c.alias(n) for n, c in cols.items()],
    )


def repetition_cols(text_col: str = "text", ngram: int = 2):
    """The repetition measures as raw COLUMN expressions
    (``{name: Column}``) so callers can filter inline on the same scan
    instead of joining back a stats frame (a second full text scan at
    corpus scale)."""
    txt = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.filter(F.split(txt, "\n"), lambda l: F.trim(l) != "")
    n_lines = F.size(lines)
    n_distinct = F.size(F.array_distinct(lines))
    line_chars = F.aggregate(lines, F.lit(0), lambda acc, l: acc + F.length(l))
    # chars in lines occurring exactly once, via ONE fold over the
    # SORTED lines (equal values are adjacent): add each new value's
    # length, retract it the moment its run reaches 2.  O(n log n)
    # per document — a naive per-distinct-value count is O(n^2) and
    # dies on long boilerplate docs.
    sl = F.array_sort(lines)
    line_state = F.aggregate(
        sl,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("single"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.when(
                x == acc["prev"],
                F.when(
                    acc["run"] == 1, acc["single"] - F.length(x)
                ).otherwise(acc["single"]),
            )
            .otherwise(acc["single"] + F.length(x))
            .alias("single"),
        ),
    )
    uniq_line_chars = line_state["single"]

    toks = F.split(normalized_text(txt), " ")
    n_toks = F.size(toks)
    grams = F.when(
        n_toks >= ngram,
        F.transform(
            F.sequence(F.lit(0), n_toks - ngram),
            lambda i: F.concat_ws(
                " ",
                *[F.element_at(toks, (i + k + 1).cast("int")) for k in range(ngram)],
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # most frequent n-gram via the same sorted-run fold; ties on count
    # resolve to the lexicographically LARGEST gram (= max(struct(cnt,
    # gram)), the rule a groupBy-based oracle reproduces)
    sg = F.array_sort(grams)
    gram_state = F.aggregate(
        sg,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
            F.lit("").alias("bestg"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
            F.when(
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
                >= acc["best"],
                x,
            )
            .otherwise(acc["bestg"])
            .alias("bestg"),
        ),
    )
    text_chars = F.length(normalized_text(txt))
    r6 = lambda c: F.round(c, 6)  # noqa: E731
    return {
        "dup_line_frac": r6(
            F.when(n_lines > 0, (n_lines - n_distinct) / n_lines).otherwise(0.0)
        ),
        "dup_line_char_frac": r6(
            F.when(
                line_chars > 0, (line_chars - uniq_line_chars) / line_chars
            ).otherwise(0.0)
        ),
        "top_ngram_char_frac": r6(
            F.when(
                (text_chars > 0) & (F.size(grams) > 0),
                gram_state["best"] * F.length(gram_state["bestg"]) / text_chars,
            ).otherwise(0.0)
        ),
    }


def contamination_check(
    corpus: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_text_col: str = "text",
    eval_id_col: str = "eval_id",
    n: int = 13,
) -> DataFrame:
    """Benchmark decontamination: ``(doc_id, eval_id, shared_grams)``
    for every corpus document sharing at least one word ``n``-gram
    with an eval-set document (13-grams are the standard
    contamination unit, e.g. GPT-3 appendix C / PaLM §8).

    Scale shape: the EVAL side is small by definition, so its distinct
    grams BROADCAST — the corpus side is one map-side explode feeding
    a broadcast hash join, and the only aggregation keys are actual
    matches (tiny).  The corpus is never shuffled.
    """
    from .dedup import shingles

    ce = corpus.select(
        F.col(id_col).alias("doc_id"),
        F.explode(shingles(F.col(text_col), n)).alias("g"),
    )
    ee = eval_df.select(
        F.col(eval_id_col).alias("eval_id"),
        F.explode(shingles(F.col(eval_text_col), n)).alias("g"),
    ).distinct()
    return (
        ce.join(F.broadcast(ee), "g")
        .groupBy("doc_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("shared_grams"))
    )


def winnow_table(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    k: int = 5, w: int = 4,
) -> DataFrame:
    """One row per (document, fingerprint) — the invertible index shape
    a near-dup join consumes (``fps.groupBy("fp")`` finds candidates).

    Pure built-in higher-order expressions: one narrow pass, no
    shuffle, no Python.  Documents shorter than ``k`` chars yield no
    rows; documents with fewer than ``w`` k-grams yield the single
    overall minimum (degenerate window).

    Each stage (codepoints -> k-gram hashes -> window minima) is a
    SEPARATE Project so the previous stage's array is evaluated once
    per row: lambda bodies get no subexpression elimination, so
    inlining ``khash`` into the window-min transform would re-hash the
    whole document once per window position — O(len^2 * k) per row
    (measured: minutes instead of milliseconds at 500x300 chars).
    Catalyst's CollapseProject keeps the stages apart because each
    alias is non-cheap and referenced more than once."""
    s = normalized_text(F.col(text_col))
    cps = F.transform(F.split(s, ""), lambda c: F.ascii(c).cast("long"))
    staged = df.select(F.col(id_col), cps.alias("_cps"))

    cpsc = F.col("_cps")
    nk = (F.size(cpsc) - k + 1).cast("int")

    def _khash(i: Column) -> Column:
        return F.aggregate(
            F.sequence(F.lit(0), F.lit(k - 1)),
            F.lit(0).cast("long"),
            lambda acc, j: (
                acc * _WINNOW_BASE + F.element_at(cpsc, (i + j).cast("int"))
            )
            % _WINNOW_MOD,
        )

    # guard: Spark's sequence(1, n) DESCENDS when n < 1 — never build it
    khash = F.when(
        nk >= 1, F.transform(F.sequence(F.lit(1), nk), _khash)
    ).otherwise(F.array().cast("array<long>"))
    staged = staged.select(F.col(id_col), khash.alias("_kh"))

    khc = F.col("_kh")
    nw = (F.size(khc) - w + 1).cast("int")

    def _winmin(p: Column) -> Column:
        return F.aggregate(
            F.sequence(F.lit(0), F.lit(w - 1)),
            F.lit(_WINNOW_MOD).cast("long"),
            lambda m, j: F.least(m, F.element_at(khc, (p + j).cast("int"))),
        )

    mins = (
        F.when(nw >= 1, F.transform(F.sequence(F.lit(1), nw), _winmin))
        .when(F.size(khc) >= 1, F.array(F.array_min(khc)))
        .otherwise(F.array().cast("array<long>"))
    )
    return staged.select(
        F.col(id_col),
        F.explode(F.array_sort(F.array_distinct(mins))).alias("fp"),
    )


def winnow_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 4,
    min_shared_frac: float = 0.5,
    max_fp_df: int = 1000,
) -> DataFrame:
    """Near-duplicate pairs via shared winnowing fingerprints:
    ``(id_a, id_b, shared, n_min, score)`` for every pair whose shared
    fingerprint count is >= ``min_shared_frac`` of the smaller doc's
    fingerprint set (containment — robust when lengths differ).

    Scale shape: candidate pairs come from an inverted-index self-join
    on fingerprint, after dropping *stop-fingerprints* present in more
    than ``max_fp_df`` documents (a ubiquitous boilerplate fragment
    fans out quadratically and carries no discriminative signal — the
    standard document-frequency cap).  Per-fingerprint fan-out is then
    bounded by ``max_fp_df**2``; everything else is groupBy + two
    joins against the tiny per-doc size frame."""
    fps = winnow_table(df, text_col, id_col, k=k, w=w)
    sizes = fps.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_fp"))
    hot = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df_cnt"))
        .filter(F.col("df_cnt") > max_fp_df)
        .select("fp")
    )
    pruned = fps.join(hot, "fp", "left_anti")
    a, b = pruned.alias("a"), pruned.alias("b")
    shared = (
        a.join(b, "fp")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_fp").alias("_na"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_fp").alias("_nb"))
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("n_min", F.least("_na", "_nb"))
        # integer-exact threshold (no float boundary): shared/n_min >= frac
        .filter(
            F.col("shared") * F.lit(1_000_000)
            >= F.lit(int(round(min_shared_frac * 1_000_000))) * F.col("n_min")
        )
        .select(
            "id_a",
            "id_b",
            "shared",
            "n_min",
            (F.col("shared") / F.col("n_min")).alias("score"),
        )
    )


def analyze_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full text-analysis column block."""
    c = F.col(text_col)
    return df.withColumns(
        {
            "ws_tokens": whitespace_token_count(c),
            "bpe_tokens": bpe_token_count(c),
            "lang_guess": lang_id(c),
            "quality": quality_score(c),
            "fingerprint": fingerprint(c),
        }
    )
