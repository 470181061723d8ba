"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship profile; ``queries()`` maps
every implemented operator family (SURVEY.md §2 + the training-data
pipeline ops) to a callable on the driver-generated parquet tables;
``oracle_sql()`` provides DuckDB-equivalent SQL for each
SQL-expressible query.  Column names/aliases match pairwise so the
driver's order-insensitive value-hash comparison lines up.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# table helpers
# ---------------------------------------------------------------------------
LI_NUMERIC = [
    "l_orderkey",
    "l_partkey",
    "l_suppkey",
    "l_linenumber",
    "l_quantity",
    "l_extendedprice",
    "l_discount",
    "l_tax",
]
LI_STRING = ["l_returnflag", "l_linestatus"]
EVENT_TYPES = ["click", "view", "purchase", "signup", "logout"]  # domain guess;
# the domain check is exercised by whatever subset exists (see q)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # balance_scan: the testdata tables are single-row-group files, so a
    # raw scan cannot split below one task; the guard is a no-op on
    # well-laid-out (multi-file / multi-row-group) production tables.
    from datapatterns_spark.sources.tables import balance_scan

    return balance_scan(spark.read.parquet(f"{sf_dir}/{name}.parquet"))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full profile of lineitem at sf0.001."""
    from datapatterns_spark.operators.profile import profile

    return profile(_t(spark, "/root/testdata/sf0.001", "lineitem"))


# ---------------------------------------------------------------------------
# SQL-building helpers for the oracles
# ---------------------------------------------------------------------------
def _union_src(cols: list[tuple[str, str]], table: str, where: str = "") -> str:
    """UNION ALL of SELECT '<attr>' AS attribute, <expr> ... per column."""
    parts = []
    for attr, expr in cols:
        w = f" WHERE {where.format(c=attr)}" if where else ""
        parts.append(f"SELECT '{attr}' AS attribute, {expr.format(c=attr)} FROM {table}{w}")
    return " UNION ALL ".join(parts)


_NUM_FILLED = "{c} IS NOT NULL AND {c} <> 0"
_STR_FILLED = "length(trim(coalesce(CAST({c} AS VARCHAR), ''))) > 0"

# the pattern palette in DuckDB (RE2): Lu->A, lower-ish->a, digits->9
_PATTERN_SQL = (
    "translate(regexp_replace(regexp_replace({v}, '\\p{{Lu}}', 'A', 'g'),"
    " '[\\p{{Ll}}\\p{{Lt}}\\p{{Lm}}\\p{{Lo}}]', 'a', 'g'),"
    " '0123456789', '9999999999')"
)
# best-type flags need '0' kept literal (digits 1-9 only -> 9)
_PATTERN0_SQL = (
    "translate(regexp_replace(regexp_replace({v}, '\\p{{Lu}}', 'A', 'g'),"
    " '[\\p{{Ll}}\\p{{Lt}}\\p{{Lm}}\\p{{Lo}}]', 'a', 'g'),"
    " '123456789', '999999999')"
)

# NOTE: DuckDB's RE2 does not understand Java's \p{Punct}; POSIX
# [[:punct:]] is the same ASCII set Spark's \p{Punct} matches.
_NORM_SQL = (
    "trim(regexp_replace(regexp_replace(lower(coalesce({v}, '')),"
    " '[[:punct:]]', ' ', 'g'), '\\s+', ' ', 'g'))"
)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------
def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from datapatterns_spark.operators import constraints as C
    from datapatterns_spark.operators import dedup as D
    from datapatterns_spark.operators import similarity as S
    from datapatterns_spark.operators import textanalysis as TA
    from datapatterns_spark.operators.benford import benford
    from datapatterns_spark.operators.cardinality import cardinality
    from datapatterns_spark.operators.profile import profile
    from datapatterns_spark.operators.validation import validate
    from datapatterns_spark.sources.transcripts import (
        generate_transcripts,
        transcript_check_suite,
    )

    def q_profile_fill_lengths(spark, sf):
        """Fill stats over lineitem + length stats over documents in
        one entry (the round-3 entry consolidation; formerly
        profile_fill + profile_lengths, unchanged semantics — the
        discriminator is the src column)."""
        fills = profile(_t(spark, sf, "lineitem"), features=("fill_rate",)).select(
            F.lit("lineitem").alias("src"),
            "attribute",
            "rec_count",
            "fill_count",
            F.col("fill_rate").cast("double").alias("fill_rate"),
            F.lit(None).cast("long").alias("min_length"),
            F.lit(None).cast("long").alias("max_length"),
            F.lit(None).cast("long").alias("ave_length"),
        )
        lengths = profile(
            _t(spark, sf, "documents"),
            field_list=["text", "lang", "source"],
            features=("lengths",),
        ).select(
            F.lit("documents").alias("src"),
            "attribute",
            F.lit(None).cast("long").alias("rec_count"),
            F.lit(None).cast("long").alias("fill_count"),
            F.lit(None).cast("double").alias("fill_rate"),
            F.col("min_length").cast("long").alias("min_length"),
            F.col("max_length").cast("long").alias("max_length"),
            F.col("ave_length").cast("long").alias("ave_length"),
        )
        return fills.unionByName(lengths)

    def q_profile_numeric(spark, sf):
        p = profile(
            _t(spark, sf, "lineitem"),
            field_list=LI_NUMERIC,
            features=("min_max", "mean", "std_dev", "quartiles"),
        )
        return p.select(
            "attribute",
            F.col("numeric_min").alias("nmin"),
            F.col("numeric_max").alias("nmax"),
            F.col("numeric_mean").alias("nmean"),
            F.col("numeric_std_dev").alias("nstd"),
            F.col("numeric_lower_quartile").alias("q1"),
            F.col("numeric_median").alias("q2"),
            F.col("numeric_upper_quartile").alias("q3"),
        )

    def q_profile_cardinality(spark, sf):
        return profile(
            _t(spark, sf, "lineitem"), features=("cardinality",)
        ).select("attribute", "cardinality")

    def q_profile_modes(spark, sf):
        p = profile(
            _t(spark, sf, "lineitem"), field_list=LI_STRING, features=("modes",)
        )
        m = p.select("attribute", F.explode("modes").alias("m"))
        return m.select(
            "attribute", F.col("m.value").alias("value"), F.col("m.rec_count").alias("rec_count")
        )

    def q_profile_patterns(spark, sf):
        p = profile(
            _t(spark, sf, "documents"),
            field_list=["lang", "source", "text"],
            features=("patterns",),
        )
        e = p.select("attribute", F.explode("popular_patterns").alias("pp"))
        return e.select(
            "attribute",
            F.col("pp.data_pattern").alias("data_pattern"),
            F.col("pp.rec_count").alias("rec_count"),
            F.col("pp.example").alias("example"),
        )

    def q_profile_best_type(spark, sf):
        return profile(
            _t(spark, sf, "events"),
            field_list=["event_type", "props"],
            features=("best_ecl_types",),
        ).select("attribute", "best_attribute_type")

    def q_cardinality_histogram(spark, sf):
        return cardinality(_t(spark, sf, "events"), field_list=["event_type"])

    def q_benford_digits(spark, sf):
        """Benford digit-1 AND digit-2 distributions in one entry (the
        round-3 entry consolidation; formerly benford_digit1 +
        benford_digit2, unchanged per-digit semantics — the full
        NthDigit rule incl. implied trailing zeros for digit 2)."""
        li = _t(spark, sf, "lineitem")
        d1 = benford(
            li,
            field_list=["l_orderkey", "l_quantity", "l_extendedprice", "l_discount"],
        ).withColumn("digit", F.lit(1))
        d2 = benford(
            li,
            field_list=["l_orderkey", "l_quantity", "l_extendedprice"],
            digit=2,
        ).withColumn("digit", F.lit(2))
        return d1.unionByName(d2)

    def q_benford_stock(spark, sf):
        # the reference README's Benford stock-data walkthrough
        # (README.md:846-865) at correctness scale: same column shape,
        # deterministic synthetic quotes (sources/stock.py), exact
        # DuckDB oracle regenerating the table from (n_rows, seed).
        # bench.py runs the same workload at the walkthrough's 20.9M
        # rows as a second headline.
        from datapatterns_spark.sources.stock import generate_stock_quotes

        return benford(
            generate_stock_quotes(spark, 50_000),
            field_list=["opening_price", "closing_price", "trade_date"],
        )

    def q_validate(spark, sf):
        """Both Validate() rule surfaces in one entry (round-4 entry
        consolidation; formerly validate_rules + validate_allfilled,
        unchanged semantics): expression/helper rules over lineitem
        (src='lineitem') unioned with the AllFieldsFilled() helper
        over customer (src='customer')."""

        def grouped(v, src):
            return (
                v.groupBy(
                    F.concat_ws(
                        ",", F.col("validation_results.violations")
                    ).alias("violations"),
                    F.col("validation_results.num_violations").alias(
                        "num_violations"
                    ),
                )
                .agg(F.count(F.lit(1)).alias("n"))
                .select(F.lit(src).alias("src"), "*")
            )

        v1 = validate(
            _t(spark, sf, "lineitem"),
            "QtyPositive:l_quantity > 0;"
            "DiscSmall:l_discount <= 0.06;"
            "TaxSmall:l_tax <= 0.04;"
            "FlagUpper:IsOnlyUppercase(l_returnflag)",
        )
        v2 = validate(
            _t(spark, sf, "customer"),
            "AllFilled:AllFieldsFilled();BalPos:c_acctbal >= 0",
        )
        return grouped(v1, "lineitem").unionByName(grouped(v2, "customer"))

    def q_constraint_verdicts(spark, sf):
        ev = _t(spark, sf, "events")
        checks = [
            C.unique("unique_user_ts", ["user_id", "ts"]),
            C.in_domain("event_type_domain", "event_type", EVENT_TYPES),
            C.monotonic("ts_monotonic_by_event", "ts", "user_id", "event_id"),
            C.row_rule("value_not_negative", "value >= 0"),
        ]
        verdicts, _ = C.run_checks(ev, checks, key_cols=["event_id"])
        return verdicts.select("check_name", "passed", "violation_count")

    def q_verdicts_per_partition(spark, sf):
        """Per-PARTITION verdict grain (the north_rule's output shape):
        one (partition, check) row per o_orderpriority value, with a
        duplicate-key group that spans partitions counted by each
        member row's own partition."""
        od = _t(spark, sf, "orders")
        checks = [
            C.unique("unique_cust_date", ["o_custkey", "o_orderdate"]),
            C.in_domain("status_closed", "o_orderstatus", ["O", "F"]),
            C.row_rule("price_positive", "o_totalprice >= 0"),
        ]
        verdicts, _ = C.run_checks(
            od, checks, partition_col="o_orderpriority", key_cols=["o_orderkey"]
        )
        return verdicts.select(
            "partition", "check_name", "passed", "violation_count"
        )

    def q_drift_metrics(spark, sf):
        """All three drift detectors (PSI / JS / KS) in ONE run_checks
        pass over lineitem — one scan computes every histogram (the
        round-3 entry consolidation; formerly drift_psi + drift_js +
        drift_ks, unchanged semantics per metric)."""
        li = _t(spark, sf, "lineitem")
        checks = [
            C.drift_psi(
                "qty_psi", "l_quantity", [1.0 / 32] * 32,
                bins=32, lo=1.0, hi=51.0, threshold=0.05,
            ),
            C.drift_js(
                "qty_js", "l_quantity", [1.0 / 32] * 32,
                bins=32, lo=1.0, hi=51.0, threshold=0.02,
            ),
            C.drift_ks(
                "price_ks", "l_extendedprice", [1.0 / 64] * 64,
                bins=64, lo=900.0, hi=105000.0, threshold=0.1,
            ),
        ]
        verdicts, _ = C.run_checks(li, checks)
        return verdicts.select("check_name", "passed", "metric")

    def q_constraint_alternation(spark, sf):
        """no_consecutive (alternation-class) check over events: flag
        users firing the same event_type twice in a row."""
        ev = _t(spark, sf, "events")
        verdicts, _ = C.run_checks(
            ev,
            [
                C.no_consecutive(
                    "no_repeat_event_type", "event_type", "user_id", "event_id"
                )
            ],
        )
        return verdicts.select("check_name", "passed", "violation_count")

    def q_validate_fixes(spark, sf):
        """Both Fix() forms in one entry (the round-3 entry
        consolidation; formerly validate_fix + validate_fix_swap,
        unchanged semantics): assignment + SkipRecord() over lineitem
        (aggregate digest row, label 'lineitem_fix') unioned with
        Swap() over part (per-brand counts)."""
        from datapatterns_spark.operators.validation import fix as vfix

        v1 = validate(
            _t(spark, sf, "lineitem"),
            "QtyBig:l_quantity <= 45;DiscSmall:l_discount <= 0.06",
        )
        f1 = vfix(v1, "QtyBig: l_quantity := 45; DiscSmall: SkipRecord()").agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("l_quantity").cast("double")), 2).alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice").cast("double")), 2).alias("sum_price"),
        ).select(F.lit("lineitem_fix").alias("label"), "n", "sum_qty", "sum_price")

        v2 = validate(_t(spark, sf, "part"), "SizeSmall:p_size <= 25")
        f2 = (
            vfix(v2, "SizeSmall: Swap(p_brand, p_type)")
            .groupBy(F.col("p_brand").alias("label"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(
                "label",
                "n",
                F.lit(None).cast("double").alias("sum_qty"),
                F.lit(None).cast("double").alias("sum_price"),
            )
        )
        return f1.unionByName(f2)

    def q_similarity_topk(spark, sf):
        emb = _t(spark, sf, "embeddings")
        qs = emb.filter(F.col("vec_id").isin([1, 2, 3]))
        r = S.brute_force_topk(emb, qs, k=5)
        # 4-decimal rounding: float32 sum order differs between engines
        # at the 6th decimal
        return r.select(
            "query_id", "neighbor_id", F.round("cos", 4).alias("cos"), "rank"
        )

    def q_exact_dedup(spark, sf):
        return D.dedup_exact(_t(spark, sf, "documents"), "text", "doc_id").select("doc_id")

    def q_ngram_jaccard(spark, sf):
        return D.ngram_jaccard_pairs(
            _t(spark, sf, "documents"), "text", "doc_id", n=3, threshold=0.7
        )

    def q_text_annotate(spark, sf):
        """Per-document text analysis in ONE map-only select: token
        counts (whitespace + BPE-ish), language id, quality score and
        the normalized-text fingerprint (the round-3 entry
        consolidation; formerly text_tokens + text_langid +
        text_quality + text_fingerprint, unchanged per-column
        semantics).  One scan, zero shuffles, zero Python."""
        d = _t(spark, sf, "documents")
        return d.select(
            "doc_id",
            TA.whitespace_token_count(F.col("text")).alias("ws_tokens"),
            TA.bpe_token_count(F.col("text")).alias("bpe_tokens"),
            TA.lang_id(F.col("text")).alias("lang_guess"),
            TA.quality_score(F.col("text")).alias("quality"),
            TA.fingerprint(F.col("text")).alias("fp"),
        )

    def q_profile_correlations(spark, sf):
        p = profile(
            _t(spark, sf, "lineitem"),
            field_list=LI_NUMERIC,
            features=("correlations",),
        )
        e = p.select("attribute", F.explode("correlations").alias("c"))
        return e.select(
            "attribute",
            F.col("c.attribute").alias("other"),
            F.round("c.corr", 4).alias("corr"),
        )

    def q_profile_breakdown(spark, sf):
        p = profile(
            _t(spark, sf, "events"),
            field_list=["event_type"],
            features=("cardinality_breakdown",),
        )
        e = p.select("attribute", F.explode("cardinality_breakdown").alias("b"))
        return e.select(
            "attribute",
            F.col("b.value").alias("value"),
            F.col("b.rec_count").alias("rec_count"),
        )

    def q_dedup_embedding(spark, sf):
        return D.embedding_cosine_pairs(
            _t(spark, sf, "embeddings"),
            "embedding",
            "vec_id",
            threshold=0.45,
            method="brute",
        ).select("id_a", "id_b")  # cos dropped: a 0.45555 re-round tie
        # flips between engines; pair membership has >5e-4 margin

    def q_profile_normalize_compare(spark, sf):
        """NormalizeProfileResults + profile-vs-profile diff in one
        entry (the round-3 entry consolidation; formerly
        normalize_profile + profile_compare, unchanged semantics).
        part='profile' rows are the melted key/value triples of the
        whole-table profile; part='compare' rows diff that profile
        against the non-'en' subset (the reference's stated
        NormalizeProfileResults workflow), integer-valued stats only."""
        from datapatterns_spark.operators.normalize import (
            compare_profiles,
            normalize_profile_results,
        )

        docs = _t(spark, sf, "documents")
        fields = ["lang", "source"]

        p = profile(
            docs,
            field_list=fields,
            features=("fill_rate", "cardinality", "lengths"),
        )
        n = normalize_profile_results(p).filter(
            F.col("key").isin(
                "rec_count", "fill_count", "cardinality",
                "min_length", "max_length", "ave_length",
            )
        )
        a = n.select(
            F.lit("profile").alias("part"),
            "attribute",
            "key",
            F.col("value").alias("value_old"),
            F.lit(None).cast("string").alias("value_new"),
            F.lit(None).cast("boolean").alias("changed"),
        )

        feats = ("fill_rate", "lengths")
        old = profile(docs, field_list=fields, features=feats)
        new = profile(
            docs.filter(F.col("lang") != "en"), field_list=fields, features=feats
        )
        b = compare_profiles(old, new).filter(
            F.col("key").isin(
                "rec_count", "fill_count",
                "min_length", "max_length", "ave_length",
            )
        ).select(
            F.lit("compare").alias("part"),
            "attribute",
            "key",
            "value_old",
            "value_new",
            "changed",
        )
        return a.unionByName(b)

    # --- (ann_ivf gained an exact literal-centroid oracle later; the
    # truly rows-only entries are the multimodal real-decode ones) ---
    def q_ann_ivf(spark, sf):
        emb = _t(spark, sf, "embeddings")
        qs = emb.filter(F.col("vec_id").isin([1, 2, 3]))
        # refine_sweeps=0 pins the raw seeded centroids so the DuckDB
        # oracle can replay them as literals; the library default is
        # one Lloyd sweep (recall/balance measured in BASELINE.md)
        return S.ivf_topk(
            emb, qs, k=5, n_cells=16, n_probe=8, dim=64, refine_sweeps=0
        )

    def q_best_record(spark, sf):
        from datapatterns_spark.operators.best_record import best_record_structure

        return best_record_structure(_t(spark, sf, "events"))

    def q_apply_best_types(spark, sf):
        """Spark-native rewrite TRANSFORM (the reference's
        emitTransform, BestRecordStructure.ecl:14-16): columns stored
        as strings are cast to the lattice's recommendation; native
        temporal and already-numeric columns pass through."""
        from datapatterns_spark.operators.best_record import apply_best_types

        src = _t(spark, sf, "orders").select(
            F.col("o_orderkey").cast("string").alias("o_orderkey"),
            F.col("o_totalprice").cast("string").alias("o_totalprice"),
            "o_orderstatus",
            "o_orderdate",
        )
        return apply_best_types(src)

    def q_sample_stratified(spark, sf):
        """Seeded per-stratum uniform draw (k docs per language) —
        deterministic across runs/engines via the shared xxhash64
        ranking; skew-free via the salted two-phase top-k."""
        from datapatterns_spark.operators.sampling import sample_stratified

        d = _t(spark, sf, "documents").select("doc_id", "lang")
        return sample_stratified(d, ["lang"], k=40, key_cols=["doc_id"], seed=7)

    def q_embedding_transform(spark, sf):
        """Embedding utilities in one entry (the round-3 entry
        consolidation; formerly embedding_normalize +
        embedding_quantize, unchanged per-column semantics): L2
        normalization digests (pre-norm, first unit component —
        double-fold arithmetic replayed exactly in DuckDB) joined onto
        the symmetric-int8 quantization codes (per-vector scale +
        every exact integer code, posexploded)."""
        from datapatterns_spark.operators.embeddings import (
            l2_norm,
            normalize_embeddings,
            quantize_embeddings,
        )

        emb = _t(spark, sf, "embeddings")
        nrm = normalize_embeddings(emb).select(
            "vec_id",
            F.round(l2_norm(F.col("embedding")), 6).alias("norm"),
            F.round(F.element_at("embedding_unit", 1), 6).alias("u0"),
        )
        q = (
            quantize_embeddings(emb)
            .select(
                "vec_id",
                F.round("scale", 6).alias("scale6"),
                F.posexplode("codes"),
            )
            .withColumnRenamed("col", "code")
        )
        return q.join(nrm, "vec_id")

    def q_text_lm_score(spark, sf):
        """Char-bigram LM quality scores (the CCNet-style perplexity
        gate): model self-trained on the corpus, every doc scored by
        mean add-alpha conditional log-prob.  Exact oracle: each ln()
        term is quantized to integer 1e-9 units with the cross-engine
        floor(x+0.5) rule and summed as longs."""
        return TA.lm_quality_score(_t(spark, sf, "documents"))

    def q_text_contamination(spark, sf):
        """Benchmark decontamination: 8-gram overlap of the corpus
        against a planted eval set (every 40th document re-labeled).
        Broadcast eval grams; the corpus never shuffles."""
        docs = _t(spark, sf, "documents").select("doc_id", "text")
        ev = docs.filter("doc_id % 40 = 0").select(
            F.col("doc_id").alias("eval_id"), "text"
        )
        return TA.contamination_check(docs, ev, n=8)

    def q_text_repetition(spark, sf):
        """Gopher repetition measures over documents — dup-line
        fraction, dup-line char fraction, top-2-gram char coverage.
        Spark computes them map-only via sorted-run folds; the oracle
        recomputes with an independent unnest+groupBy algorithm."""
        return TA.repetition_stats(_t(spark, sf, "documents"))

    def q_text_redact(spark, sf):
        """PII detect + redact over documents with deterministically
        planted emails/phones (every 5th doc) — counts on the pre-
        redaction text, sequential pattern substitution.  Map-only
        plan: no shuffle, no Python."""
        docs = _t(spark, sf, "documents")
        planted = docs.select(
            "doc_id",
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.coalesce(F.col("text"), F.lit("")),
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com or 555-123-4567"),
                ),
            ).otherwise(F.col("text")).alias("text"),
        )
        out = TA.redact_pii(planted)
        return out.select(
            "doc_id", "n_email", "n_ssn", "n_phone", "n_ipv4",
            "pii_total", "redacted",
        )

    def q_pack_sequences(spark, sf):
        """Concat-and-chunk sequence packing over documents: sharded
        hash ordering, per-shard cumsum window, straddling docs split
        across packs."""
        from datapatterns_spark.operators.packing import pack_sequences

        return pack_sequences(
            _t(spark, sf, "documents"), max_tokens=64, n_shards=4
        )

    def q_curate_documents(spark, sf):
        """Composed curation pipeline: quality + language gates ->
        exact dedup (min-id survivor per normalized-text hash) -> PII
        redaction.  Oracle composes the quality/langid/XXH64/redact
        SQL twins end-to-end."""
        from datapatterns_spark.operators.curation import curate_documents

        return curate_documents(
            _t(spark, sf, "documents"),
            min_quality=0.2,
            languages=["en", "de", "fr"],
            redact=True,
        )

    def q_winnow(spark, sf):
        """Winnowing (MOSS) fingerprints AND the near-dup pairs built
        from them in one entry (the round-3 entry consolidation;
        formerly text_winnow + dedup_winnow, unchanged semantics).
        kind='fp' rows are (doc_id, fingerprint) from the k-gram
        rolling hash + w-window minima (expression-only); kind='pair'
        rows are the shared-fingerprint near-dup pairs (df-capped
        inverted-index self-join).  Integral columns only."""
        docs = _t(spark, sf, "documents")
        fps = TA.winnow_table(docs, "text", "doc_id").select(
            F.lit("fp").alias("kind"),
            F.col("doc_id").cast("long").alias("a"),
            F.col("fp").cast("long").alias("b"),
            F.lit(None).cast("long").alias("c"),
            F.lit(None).cast("long").alias("d"),
        )
        pairs = TA.winnow_near_dups(
            docs, "text", "doc_id", min_shared_frac=0.5, max_fp_df=100,
        ).select(
            F.lit("pair").alias("kind"),
            F.col("id_a").cast("long").alias("a"),
            F.col("id_b").cast("long").alias("b"),
            F.col("shared").cast("long").alias("c"),
            F.col("n_min").cast("long").alias("d"),
        )
        return fps.unionByName(pairs)

    def q_minhash_lsh(spark, sf):
        return D.minhash_lsh_pairs(
            _t(spark, sf, "documents"), "text", "doc_id", threshold=0.7
        )

    def q_simhash(spark, sf):
        return D.simhash_pairs(_t(spark, sf, "documents"), "text", "doc_id", max_hamming=3)

    def q_dedup_conversations(spark, sf):
        """Whole-conversation exact dedup over pseudo-conversations
        built from the documents table (conv = doc_id div 20, turn =
        doc_id mod 20) with planted clones (every 7th conversation
        re-labeled +100000).  Fingerprint folds are commutative
        groupBy aggregates — map-side combinable, hot-conversation
        safe."""
        docs = _t(spark, sf, "documents")
        base = docs.select(
            F.expr("doc_id div 20").alias("conv_id"),
            F.expr("doc_id % 20").alias("turn_idx"),
            "text",
        )
        clones = base.filter("conv_id % 7 = 0").withColumn(
            "conv_id", F.col("conv_id") + 100000
        )
        return D.conversation_dedup(base.unionByName(clones))

    def q_dedup_incremental(spark, sf):
        """Two-batch incremental exact dedup: batch 1 (doc_id < 250)
        seeds the fingerprint store; batch 2 (the rest, plus every
        50th batch-1 text re-labeled +10000) classifies against it."""
        from datapatterns_spark.operators.dedup import incremental_exact_dedup

        docs = _t(spark, sf, "documents").select("doc_id", "text")
        b1 = docs.filter("doc_id < 250")
        store = (
            incremental_exact_dedup(b1, None)
            .filter("status = 'unique'")
            .select("fp")
        )
        b2 = docs.filter("doc_id >= 250").unionByName(
            b1.filter("doc_id % 50 = 0").select(
                (F.col("doc_id") + 10000).alias("doc_id"), "text"
            )
        )
        return incremental_exact_dedup(b2, store)

    def q_dedup_incremental_minhash(spark, sf):
        """Near-dup incremental dedup vs a MinHash SIGNATURE store:
        batch 1 (doc_id < 250) signatures are the store; batch 2 (the
        rest + every 50th batch-1 text re-labeled +10000) classifies
        by signature-estimated Jaccard over shared LSH band buckets —
        no rescan of prior text.  Exact oracle: the estimator is pure
        integer minhash arithmetic."""
        from datapatterns_spark.operators.dedup import (
            incremental_minhash_dedup,
            minhash_signatures,
        )

        docs = _t(spark, sf, "documents").select("doc_id", "text")
        b1 = docs.filter("doc_id < 250")
        store = minhash_signatures(b1, "text", "doc_id")
        b2 = docs.filter("doc_id >= 250").unionByName(
            b1.filter("doc_id % 50 = 0").select(
                (F.col("doc_id") + 10000).alias("doc_id"), "text"
            )
        )
        decisions, _ = incremental_minhash_dedup(b2, store, threshold=0.7)
        return decisions

    def q_dedup_spans(spark, sf):
        """Exact-substring duplicate SPANS (Lee et al. 2022 suffix-
        array dedup, n-gram formulation): maximal token spans covered
        by 8-grams occurring >= 2 times corpus-wide, merged per doc.
        Output is pure integer positions, so the oracle replays the
        pipeline on gram STRINGS (the Spark side joins on xxhash64 of
        the gram — a collision would only over-merge, ~1e-11 at this
        scale)."""
        return D.duplicate_token_spans(
            _t(spark, sf, "documents"), "text", "doc_id", n=8, min_count=2
        )

    def q_dedup_spans_winnow(spark, sf):
        """Round 5: the winnowing volume lever under full oracle
        audit.  Same span semantics as dedup_spans but with
        ``winnow_w=4`` — gram positions selected by rightmost-window-
        minimum over the Spark ``xxhash64`` gram hashes, islands
        merged with slack w.  The oracle replays the ENTIRE selection
        in DuckDB: the pure-SQL xxhash64 twin (functions/xxh64_sql.py)
        reproduces the exact hash values, a composite-key window
        ``arg_min`` reproduces the rightmost-min rule, and the span
        assembly runs over selected positions only — so the lever's
        math (not just its planted-test behavior) is pinned."""
        return D.duplicate_token_spans(
            _t(spark, sf, "documents"), "text", "doc_id",
            n=8, min_count=2, winnow_w=4,
        )

    def q_dedup_components(spark, sf):
        """Near-dup pairs -> dedup clusters + canonical keep-list via
        large-star/small-star connected components."""
        pairs = D.minhash_lsh_pairs(
            _t(spark, sf, "documents"), "text", "doc_id", threshold=0.7
        )
        return D.dedup_components(pairs.select("id_a", "id_b"))

    def q_transcript_suite(spark, sf):
        df = generate_transcripts(spark, n_conversations=2000, seed=42, violation_rate=0.003)
        verdicts, _ = C.run_checks(
            df, transcript_check_suite(), key_cols=["conv_id", "turn_idx"]
        )
        return verdicts.select("check_name", "passed", "violation_count")

    def q_profile_approx(spark, sf):
        """The 10^12-row profile path.  Projected to its DETERMINISTIC
        columns so the driver gets an exact value check: counts,
        lengths and numeric moments are exact even in approx mode
        (single-pass sums); cardinality/quartiles are HLL/percentile
        sketches (excluded here — tolerance-tested in
        tests/test_scale_modes.py)."""
        p = profile(_t(spark, sf, "lineitem"), mode="approx")
        return p.select(
            "attribute", "rec_count", "fill_count",
            "min_length", "max_length", "ave_length",
            "numeric_min", "numeric_max", "numeric_mean", "numeric_std_dev",
        )

    def q_multimodal_transform(spark, sf):
        """Feature extraction, resize AND frame sampling through the
        Arrow mapInPandas plumbing with the fake deterministic decoder
        (the round-3/4 entry consolidations; formerly
        multimodal_features + multimodal_resize + multimodal_frames,
        unchanged semantics).  Rows with part='transform' carry the
        features+resize join over a 200-row media table; rows with
        part='frames' carry per-video sampled-frame counts over a
        120-row table (n_frames; other columns null)."""
        from datapatterns_spark.operators import multimodal as MM

        media = MM.make_fake_media_table(spark, n=200)
        feats = MM.extract_features(media, fake=True)
        # f0 rescaled back to its integral 16-bit source so the DuckDB
        # oracle compares exactly (float32 round-trip error ~4e-3 << 0.5)
        f = feats.select(
            "media_id",
            "n_bytes",
            F.round(F.element_at("features", 1) * 65535)
            .cast("long")
            .alias("f0_scaled"),
        )
        resized = MM.resize_media(media, width=64, height=48, fake=True)
        # payload is ASCII hex by convention -> compare as text
        r = resized.select(
            "media_id",
            F.col("media").cast("string").alias("media"),
            "width",
            "height",
        )
        transform = f.join(r, "media_id").select(
            F.lit("transform").alias("part"),
            "media_id", "n_bytes", "f0_scaled", "media", "width", "height",
            F.lit(None).cast("long").alias("n_frames"),
        )
        media2 = MM.make_fake_media_table(spark, n=120)
        frames = (
            MM.sample_frames(media2, every_ms=1000, fake=True)
            .groupBy("media_id")
            .agg(F.count(F.lit(1)).alias("n_frames"))
            .select(
                F.lit("frames").alias("part"),
                "media_id",
                F.lit(None).cast("long").alias("n_bytes"),
                F.lit(None).cast("long").alias("f0_scaled"),
                F.lit(None).cast("string").alias("media"),
                F.lit(None).cast("int").alias("width"),
                F.lit(None).cast("int").alias("height"),
                "n_frames",
            )
        )
        return transform.unionByName(frames)

    def q_multimodal_real(spark, sf):
        """The REAL decode paths (no fake=True anywhere): stdlib
        PNG/JPEG/GIF/AVI/WAV codecs inside the Arrow mapInPandas
        workers.  part='features' rows carry (k=payload bytes,
        v=features[0] scaled to a long); part='frames' rows carry
        (k=frame timestamp ms, v=PNG-re-encoded frame byte length) for
        every video sampled at 250 ms.  Pixel decoding is not
        SQL-expressible, so the DuckDB oracle SELECTs a checked-in
        expected-output fixture derived from the pure-Python codecs
        (scripts/make_multimodal_fixture.py; Spark-vs-pure codec
        parity is itself pinned by tests/test_codecs.py) — the round-4
        consolidation of the formerly rows-only
        multimodal_real_features + multimodal_real_frames entries."""
        from datapatterns_spark.operators import multimodal as MM

        media = MM.make_real_media_table(spark, n=24)
        feats = MM.extract_features(media)  # fake defaults to False
        fpart = feats.select(
            F.lit("features").alias("part"),
            "media_id",
            F.col("n_bytes").alias("k"),
            F.round(F.element_at("features", 1).cast("double") * 65535)
            .cast("long")
            .alias("v"),
        )
        frames = MM.sample_frames(
            media.filter("meta.media_type = 'video'"), every_ms=250
        )
        rpart = frames.select(
            F.lit("frames").alias("part"),
            "media_id",
            F.col("frame_ms").alias("k"),
            F.octet_length("frame").cast("long").alias("v"),
        )
        return fpart.unionByName(rpart)

    def q_profile_incremental(spark, sf):
        """Mergeable per-partition profile states folded into a table
        profile: merge of per-o_orderpriority states must equal a
        whole-table pass exactly for every decomposable statistic."""
        from datapatterns_spark.operators.incremental import (
            merge_states,
            profile_state,
        )

        states = profile_state(
            _t(spark, sf, "orders"),
            "o_orderpriority",
            field_list=["o_orderkey", "o_custkey", "o_orderstatus"],
        )
        return merge_states(states).select(
            "attribute",
            "rec_count",
            "fill_count",
            "fill_rate",
            "min_length",
            "max_length",
            "ave_length",
            F.col("numeric_min").alias("nmin"),
            F.col("numeric_max").alias("nmax"),
            F.col("numeric_mean").alias("nmean"),
            F.col("numeric_std_dev").alias("nstd"),
        )

    def q_profile_quantile_sketch(spark, sf):
        """Mergeable t-digest quantile state (round 4): per-partition
        sketches merged into table quartiles, checked against the DATA
        rather than against a SQL twin (a t-digest has no tractable
        SQL re-derivation).  Output rows carry the MEASURED exact rank
        of each merged estimate, bucketed to the nearest 0.25 — equal
        to the target quantile only when the sketch meets its rank
        error contract (<1%, vs the 12.5% bucket half-width).  Two
        drift rows pin digest_drift at its analytic extremes: KS of a
        distribution against itself (0) and against a
        disjoint-support shift (1).

        Round-5 hardening: structural rows pin each merged digest as a
        GENUINE compressed sketch — centroid count inside the k1-scale
        contract band [delta/4, 1.5*delta] (a degenerate one-centroid
        digest, which could land the right rank bucket by luck on a
        skewed column, fails the floor; an uncompressed value dump
        fails the ceiling) and the serialized payload exactly
        31 + 16*centroids bytes (the TD1 wire format)."""
        from datapatterns_spark.operators.incremental import (
            digest_drift,
            merge_states,
            profile_state,
        )

        orders = _t(spark, sf, "orders")
        attrs = ["o_orderkey", "o_custkey", "o_totalprice"]
        delta = 100.0
        st = profile_state(
            orders, "o_orderpriority", field_list=attrs,
            quantile_delta=delta,
        )
        merged = merge_states(st)
        est = {
            r["attribute"]: r.asDict()
            for r in merged.select(
                "attribute",
                "numeric_lower_quartile",
                "numeric_median",
                "numeric_upper_quartile",
            ).collect()
        }  # 3 tiny rows — driver-bounded by len(attrs)
        # exact rank of each estimate in ONE aggregation over orders
        # (fill rule matches the state pass: non-null, non-zero)
        aggs = []
        qcols = {
            0.25: "numeric_lower_quartile",
            0.5: "numeric_median",
            0.75: "numeric_upper_quartile",
        }
        for a in attrs:
            v = F.when(
                F.col(a).isNotNull() & (F.col(a).cast("double") != 0),
                F.col(a).cast("double"),
            )
            for q, col in qcols.items():
                e = float(est[a][col])
                aggs.append(
                    (F.count(F.when(v <= e, 1)) / F.count(v)).alias(
                        f"{a}::{q}"
                    )
                )
        ranks = orders.agg(*aggs).collect()[0]
        rows = [
            ("rank", a, q, round(ranks[f"{a}::{q}"] * 4) / 4)
            for a in attrs
            for q in qcols
        ]
        # drift extremes: even vs odd orderkey halves (same
        # distribution -> KS ~0 -> bucket 0), and a disjoint-support
        # shift of o_totalprice (KS = 1 exactly)
        even = orders.where(F.col("o_orderkey") % 2 == 0)
        odd = orders.where(F.col("o_orderkey") % 2 == 1)
        span = orders.agg(
            (F.max("o_totalprice") - F.min("o_totalprice")).alias("s")
        ).collect()[0]["s"]
        shifted = orders.withColumn(
            "o_totalprice", F.col("o_totalprice") + 10.0 * float(span)
        )
        pr = ["o_totalprice"]
        mk = lambda d: profile_state(  # noqa: E731
            d, "o_orderpriority", field_list=pr, quantile_delta=100.0
        )
        same_ks = digest_drift(mk(even), mk(odd)).collect()[0]["ks"]
        far_ks = digest_drift(mk(even), mk(shifted)).collect()[0]["ks"]
        rows.append(("drift_same", "o_totalprice", 0.0, round(same_ks * 4) / 4))
        rows.append(("drift_far", "o_totalprice", 1.0, round(far_ks * 4) / 4))
        # structural pins: per-attribute merged digest shape (the state
        # frame is (n_partitions x n_attrs) slim rows — driver-bounded)
        from datapatterns_spark.functions.tdigest import TDigest

        by_attr: dict[str, list] = {}
        for r in st.select("attribute", "q_sketch").collect():
            by_attr.setdefault(r["attribute"], []).append(
                TDigest.from_bytes(bytes(r["q_sketch"]))
            )
        for a in attrs:
            d = TDigest.merge_all(by_attr[a])
            c = int(d.means.size)
            rows.append(
                ("centroids", a, 1.0,
                 1.0 if delta / 4 <= c <= 1.5 * delta else 0.0)
            )
            rows.append(
                ("sketch_bytes", a, 1.0,
                 1.0 if len(d.to_bytes()) == 31 + 16 * c else 0.0)
            )
        from datapatterns_spark.plans.local import lit_df

        return lit_df(
            spark, rows, "part string, attribute string, q double, val double"
        )

    def q_streaming_state(spark, sf):
        """Round 5: the streaming surface made gate-auditable.  One
        bounded multi-micro-batch Structured Streaming run (the
        documents table re-laid as a 4-file directory, read with
        maxFilesPerTrigger=1 under trigger(availableNow) -> 4 real
        micro-batches through a checkpointed foreachBatch) drives BOTH
        streaming sinks; the emitted rows are the batch twins:

        * ``profile``: the rolling merged profile from
          profile_state_sink + stream_profile — every decomposable
          statistic must equal a whole-table batch pass exactly
          (micro-batch boundaries must not show);
        * ``dedup``: dedup_sink's persistent fingerprint store — its
          row count and distinct-fp count equal the corpus's distinct
          normalized-text count (each fp appended exactly once across
          batches), and total decisions equal the corpus size.

        Every emitted number is ORDER-INDEPENDENT of micro-batch
        boundaries by construction, so the SQL oracle needs no
        knowledge of the file split.  Results are collected to
        literals so the stream's temp dirs don't outlive the call."""
        import shutil
        import tempfile

        from datapatterns_spark.plans.local import lit_df
        from datapatterns_spark.streaming import (
            dedup_sink,
            profile_state_sink,
            stream_profile,
        )

        base = tempfile.mkdtemp(prefix="dp_gate_stream_")
        try:
            docs = spark.read.parquet(f"{sf}/documents.parquet")
            inp = f"{base}/in"
            docs.repartition(4, "doc_id").write.parquet(inp)
            schema = docs.schema

            def run(sink, name):
                q = (
                    spark.readStream.schema(schema)
                    .option("maxFilesPerTrigger", 1)
                    .parquet(inp)
                    .writeStream.foreachBatch(sink)
                    .option("checkpointLocation", f"{base}/ckpt_{name}")
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination(300)
                assert not q.isActive

            run(
                profile_state_sink(
                    f"{base}/prof", field_list=["doc_id", "lang", "n_chars"]
                ),
                "prof",
            )
            run(dedup_sink(f"{base}/store", f"{base}/ded"), "ded")

            stats = [
                "rec_count", "fill_count", "fill_rate", "min_length",
                "max_length", "ave_length", "nmin", "nmax", "nmean",
                "nstd",
            ]
            prof = stream_profile(spark, f"{base}/prof").select(
                "attribute",
                "rec_count",
                "fill_count",
                "fill_rate",
                "min_length",
                "max_length",
                "ave_length",
                F.col("numeric_min").alias("nmin"),
                F.col("numeric_max").alias("nmax"),
                F.col("numeric_mean").alias("nmean"),
                F.col("numeric_std_dev").alias("nstd"),
            )
            rows = []
            for r in prof.collect():  # 3 attribute rows
                d = r.asDict()
                for s in stats:
                    v = d[s]
                    rows.append(
                        ("profile", d["attribute"], s,
                         None if v is None else float(v))
                    )
            store = spark.read.parquet(f"{base}/store")
            rows.append(("dedup", "store", "store_rows", float(store.count())))
            rows.append(
                ("dedup", "store", "n_unique_fp",
                 float(store.select("fp").distinct().count()))
            )
            rows.append(
                ("dedup", "decisions", "n_docs",
                 float(spark.read.parquet(f"{base}/ded/decisions").count()))
            )
            return lit_df(
                spark, rows,
                "part string, attribute string, stat string, val double",
            )
        finally:
            shutil.rmtree(base, ignore_errors=True)

    # Round-3 note: the driver's correctness gate records at most 50
    # entries (CORRECTNESS_r02 covered exactly the first 50 of 60), so
    # same-grain entries are consolidated — every operator keeps
    # coverage, the mapping is documented in COVERAGE.md §"entry
    # consolidation".
    return {
        "profile_fill_lengths": q_profile_fill_lengths,
        "profile_numeric_stats": q_profile_numeric,
        "profile_cardinality": q_profile_cardinality,
        "profile_modes": q_profile_modes,
        "profile_patterns": q_profile_patterns,
        "profile_best_type": q_profile_best_type,
        "cardinality_histogram": q_cardinality_histogram,
        "benford_digits": q_benford_digits,
        "benford_stock": q_benford_stock,
        "validate_rules": q_validate,
        "constraint_verdicts": q_constraint_verdicts,
        "verdicts_per_partition": q_verdicts_per_partition,
        "drift_metrics": q_drift_metrics,
        "constraint_alternation": q_constraint_alternation,
        "validate_fixes": q_validate_fixes,
        "similarity_topk": q_similarity_topk,
        "dedup_exact": q_exact_dedup,
        "dedup_ngram_jaccard": q_ngram_jaccard,
        "text_annotate": q_text_annotate,
        "profile_correlations": q_profile_correlations,
        "profile_cardinality_breakdown": q_profile_breakdown,
        "dedup_embedding_cosine": q_dedup_embedding,
        "profile_normalize_compare": q_profile_normalize_compare,
        "dedup_minhash_lsh": q_minhash_lsh,
        "dedup_simhash": q_simhash,
        "transcript_suite": q_transcript_suite,
        "profile_approx": q_profile_approx,
        "multimodal_transform": q_multimodal_transform,
        "multimodal_real": q_multimodal_real,
        "ann_ivf_topk": q_ann_ivf,
        "best_record_structure": q_best_record,
        "apply_best_types": q_apply_best_types,
        "sample_stratified": q_sample_stratified,
        "dedup_spans": q_dedup_spans,
        "dedup_spans_winnow": q_dedup_spans_winnow,
        "dedup_components": q_dedup_components,
        "dedup_conversations": q_dedup_conversations,
        "dedup_incremental": q_dedup_incremental,
        "dedup_incremental_minhash": q_dedup_incremental_minhash,
        "text_redact": q_text_redact,
        "text_repetition": q_text_repetition,
        "text_lm_score": q_text_lm_score,
        "text_contamination": q_text_contamination,
        "embedding_transform": q_embedding_transform,
        "pack_sequences": q_pack_sequences,
        "curate_documents": q_curate_documents,
        "winnow": q_winnow,
        "profile_incremental": q_profile_incremental,
        "profile_quantile_sketch": q_profile_quantile_sketch,
        "streaming_state": q_streaming_state,
    }


# ---------------------------------------------------------------------------
# oracles
# ---------------------------------------------------------------------------
def oracle_sql() -> dict[str, str]:
    # ---- profile_fill ----
    fill_parts = []
    for c in LI_NUMERIC:
        fill_parts.append(
            f"SELECT '{c}' AS attribute, COUNT(*) AS rec_count,"
            f" CAST(SUM(CASE WHEN {c} IS NOT NULL AND {c} <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS fill_count"
            f" FROM lineitem"
        )
    for c in LI_STRING:
        fill_parts.append(
            f"SELECT '{c}' AS attribute, COUNT(*) AS rec_count,"
            f" CAST(SUM(CASE WHEN length(trim(coalesce({c},''))) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS fill_count"
            f" FROM lineitem"
        )
    fill_parts.append(
        "SELECT 'l_shipdate' AS attribute, COUNT(*) AS rec_count,"
        " CAST(SUM(CASE WHEN l_shipdate IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS fill_count"
        " FROM lineitem"
    )
    profile_fill = (
        "SELECT attribute, rec_count, fill_count,"
        " ROUND(fill_count * 100.0 / rec_count, 6) AS fill_rate FROM ("
        + " UNION ALL ".join(fill_parts)
        + ")"
    )

    # ---- profile_numeric_stats (exact ECL quartile position math) ----
    src = _union_src(
        [(c, f"CAST({c} AS DOUBLE) AS v") for c in LI_NUMERIC],
        "lineitem",
        where=_NUM_FILLED,
    )
    profile_numeric = f"""
WITH src AS ({src}),
hist AS (SELECT attribute, v, COUNT(*) AS cnt FROM src GROUP BY 1, 2),
pos AS (
  SELECT attribute, v, cnt,
         SUM(cnt) OVER (PARTITION BY attribute ORDER BY v) AS cum,
         SUM(cnt) OVER (PARTITION BY attribute) AS total
  FROM hist),
p AS (
  SELECT *,
         total // 2 AS half,
         (total // 2) + (total % 2) AS q2p1,
         (total // 2) + (total % 2) + ((total + 1) % 2) AS q2p2,
         ((total // 2) // 2) + ((total // 2) % 2) AS q1p1,
         ((total // 2) // 2) + ((total // 2) % 2) + (((total // 2) + 1) % 2) AS q1p2
  FROM pos),
p2 AS (
  SELECT *,
         GREATEST(q2p1, q2p2) + ((half) // 2) + (half % 2) AS q3p1,
         GREATEST(q2p1, q2p2) + ((half) // 2) + (half % 2) - ((half + 1) % 2) AS q3p2
  FROM p)
SELECT attribute,
       ROUND(MIN(v), 4) AS nmin,
       ROUND(MAX(v), 4) AS nmax,
       ROUND(SUM(v * cnt) / SUM(cnt), 4) AS nmean,
       ROUND(SQRT(SUM(v * v * cnt) / SUM(cnt) - (SUM(v * cnt) / SUM(cnt)) * (SUM(v * cnt) / SUM(cnt))), 4) AS nstd,
       ROUND(CASE WHEN MAX(half) > 0 THEN (MIN(CASE WHEN cum >= q1p1 THEN v END) + MIN(CASE WHEN cum >= q1p2 THEN v END)) / 2 ELSE 0 END, 4) AS q1,
       ROUND((MIN(CASE WHEN cum >= q2p1 THEN v END) + MIN(CASE WHEN cum >= q2p2 THEN v END)) / 2, 4) AS q2,
       ROUND(CASE WHEN MAX(half) > 0 THEN (MIN(CASE WHEN cum >= q3p1 THEN v END) + MIN(CASE WHEN cum >= q3p2 THEN v END)) / 2 ELSE 0 END, 4) AS q3
FROM p2 GROUP BY attribute
"""

    # ---- profile_cardinality ----
    card_parts = []
    for c in LI_NUMERIC:
        card_parts.append(
            f"SELECT '{c}' AS attribute, CAST(COUNT(DISTINCT CAST({c} AS VARCHAR)) AS BIGINT)"
            f" AS cardinality FROM lineitem WHERE {c} IS NOT NULL AND {c} <> 0"
        )
    for c in LI_STRING:
        card_parts.append(
            f"SELECT '{c}' AS attribute, CAST(COUNT(DISTINCT trim({c})) AS BIGINT)"
            f" AS cardinality FROM lineitem WHERE length(trim(coalesce({c},''))) > 0"
        )
    card_parts.append(
        "SELECT 'l_shipdate' AS attribute, CAST(COUNT(DISTINCT l_shipdate) AS BIGINT)"
        " AS cardinality FROM lineitem WHERE l_shipdate IS NOT NULL"
    )
    profile_cardinality = " UNION ALL ".join(card_parts)

    # ---- profile_lengths (trimmed, filled only, weighted trunc ave) ----
    len_parts = [
        f"SELECT '{c}' AS attribute, length(trim(coalesce({c},''))) AS len FROM documents"
        f" WHERE length(trim(coalesce({c},''))) > 0"
        for c in ["text", "lang", "source"]
    ]
    profile_lengths = (
        "SELECT attribute, CAST(MIN(len) AS BIGINT) AS min_length,"
        " CAST(MAX(len) AS BIGINT) AS max_length,"
        " CAST(FLOOR(SUM(len) * 1.0 / COUNT(*)) AS BIGINT) AS ave_length FROM ("
        + " UNION ALL ".join(len_parts)
        + ") GROUP BY attribute"
    )

    # ---- profile_fill_lengths (round-3 consolidation of the two) ----
    profile_fill_lengths_sql = f"""
SELECT 'lineitem' AS src, attribute, rec_count, fill_count, fill_rate,
       CAST(NULL AS BIGINT) AS min_length, CAST(NULL AS BIGINT) AS max_length,
       CAST(NULL AS BIGINT) AS ave_length
FROM ({profile_fill})
UNION ALL
SELECT 'documents', attribute, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
       CAST(NULL AS DOUBLE), min_length, max_length, ave_length
FROM ({profile_lengths})
"""

    # ---- profile_modes (top-5 tied at max, count > 1) ----
    mode_src = _union_src(
        [(c, f"trim({c}) AS value") for c in LI_STRING], "lineitem", where=_STR_FILLED
    )
    profile_modes = f"""
WITH src AS ({mode_src}),
vh AS (SELECT attribute, value, COUNT(*) AS rec_count FROM src GROUP BY 1, 2),
m AS (SELECT *, MAX(rec_count) OVER (PARTITION BY attribute) AS mx,
             ROW_NUMBER() OVER (PARTITION BY attribute ORDER BY rec_count DESC, value) AS rn
      FROM vh)
SELECT attribute, value, rec_count FROM m WHERE rn <= 5 AND rec_count = mx AND rec_count > 1
"""

    # ---- profile_patterns (top 100 by count desc, pattern asc) ----
    pat_v = _PATTERN_SQL.format(v="substr(value, 1, 100)")
    pat_src = _union_src(
        [(c, f"trim({c}) AS value") for c in ["lang", "source", "text"]],
        "documents",
        where=_STR_FILLED,
    )
    profile_patterns = f"""
WITH src AS ({pat_src}),
pat AS (SELECT attribute, {pat_v} AS data_pattern,
               COUNT(*) AS rec_count, MIN(substr(value, 1, 100)) AS example
        FROM src GROUP BY 1, 2),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY attribute ORDER BY rec_count DESC, data_pattern) AS rn FROM pat)
SELECT attribute, data_pattern, rec_count, example FROM r WHERE rn <= 100
"""

    # ---- profile_best_type (flags AND-fold + ladder) ----
    bt_src = _union_src(
        [(c, f"trim(CAST({c} AS VARCHAR)) AS value") for c in ["event_type", "props"]],
        "events",
        where=_STR_FILLED,
    )
    pat0 = _PATTERN0_SQL.format(v="value")

    def _bt_lattice(src_sql: str) -> str:
        """Best-type lattice (flags AND-fold + Len2Size ladder) over a
        ``(attribute, value)`` union source — reused by
        profile_best_type and best_record_structure."""
        return f"""
WITH src AS ({src_sql}),
pv AS (SELECT attribute, value, {pat0} AS pat FROM src),
fl AS (SELECT attribute, length(value) AS len,
              regexp_matches(value, '[^\\x00-\\x7F]') AS uni,
              CASE
                WHEN regexp_matches(pat, '^0[09]{{1,18}}$') THEN 0
                WHEN regexp_matches(pat, '^\\-[09]{{1,19}}$') THEN 13
                WHEN regexp_matches(pat, '^[09]{{1,19}}$') THEN 15
                WHEN regexp_matches(pat, '^\\+?[09]{{1,20}}$') THEN 14
                WHEN regexp_matches(pat, '^(\\-|\\+)?[09]{{0,15}}\\.[09]{{1,15}}$') THEN 12
                WHEN regexp_matches(pat, '^(\\-|\\+)?[09]\\.[09]{{1,6}}[aA]\\-[09]{{1,3}}$') THEN 8
                ELSE 0 END AS flag
       FROM pv),
agg AS (SELECT attribute, BIT_AND(flag) AS flags, MAX(len) AS maxlen,
               COALESCE(MIN(CASE WHEN len > 0 THEN len END), 0) AS minlen,
               BOOL_OR(uni) AS uni
        FROM fl GROUP BY attribute)
SELECT attribute,
  CASE
    WHEN (flags & 2) <> 0 THEN 'unsigned' || CAST(CASE WHEN maxlen < 3 THEN 1 WHEN maxlen < 5 THEN 2 WHEN maxlen < 7 THEN 3 WHEN maxlen < 9 THEN 4 WHEN maxlen < 11 THEN 5 WHEN maxlen < 14 THEN 6 WHEN maxlen < 16 THEN 7 ELSE 8 END AS VARCHAR)
    WHEN (flags & 1) <> 0 THEN 'integer' || CAST(CASE WHEN maxlen < 3 THEN 1 WHEN maxlen < 5 THEN 2 WHEN maxlen < 7 THEN 3 WHEN maxlen < 9 THEN 4 WHEN maxlen < 11 THEN 5 WHEN maxlen < 14 THEN 6 WHEN maxlen < 16 THEN 7 ELSE 8 END AS VARCHAR)
    WHEN (flags & 4) <> 0 THEN 'real' || (CASE WHEN maxlen < 8 THEN '4' ELSE '8' END)
    WHEN (flags & 8) <> 0 THEN 'real8'
    WHEN uni THEN 'utf8'
    ELSE 'string' || (CASE WHEN maxlen > 0 AND maxlen < minlen * 1000 THEN CAST(maxlen AS VARCHAR) ELSE '' END)
  END AS best_attribute_type
FROM agg
"""

    profile_best_type = _bt_lattice(bt_src)

    # ---- best_record_structure (layout lines from the same lattice) ----
    # Spark renders a timestamp's string form as
    # 'yyyy-MM-dd HH:mm:ss[.fraction]' with trailing fraction zeros
    # trimmed; replicated here so ts goes through the string lattice
    # exactly as profile sees it.  The given-numeric columns keep their
    # given type (Profile.ecl:1002-1023's numeric passthrough) — schema
    # metadata, emitted as literals.
    _ts_render = (
        "strftime(ts, '%Y-%m-%d %H:%M:%S') || "
        "CASE WHEN strftime(ts, '%f') = '000000' THEN '' "
        "ELSE '.' || rtrim(strftime(ts, '%f'), '0') END"
    )
    brs_src = (
        "SELECT 'event_type' AS attribute, trim(CAST(event_type AS VARCHAR)) AS value"
        " FROM events WHERE " + _STR_FILLED.format(c="event_type")
        + " UNION ALL SELECT 'props' AS attribute, trim(CAST(props AS VARCHAR)) AS value"
        " FROM events WHERE " + _STR_FILLED.format(c="props")
        + f" UNION ALL SELECT 'ts' AS attribute, {_ts_render} AS value"
        " FROM events WHERE ts IS NOT NULL"
    )
    # apply_best_types: the lattice itself is oracled end-to-end by
    # profile_best_type / best_record_structure; this oracle pins the
    # REWRITE — the expected inferred targets (o_orderkey 5-digit
    # unsigned3 -> INTEGER, o_totalprice 8-digit float -> DOUBLE) as
    # literal casts, plus passthrough of string/timestamp columns.  A
    # drifted inference changes the Spark schema and fails the match.
    apply_best_types_sql = """
SELECT CAST(o_orderkey AS INTEGER) AS o_orderkey,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice,
       o_orderstatus,
       o_orderdate
FROM orders
"""

    best_record_sql = f"""
WITH best AS ({_bt_lattice(brs_src)})
SELECT 'NewLayout := RECORD' AS txt
UNION ALL SELECT '    bigint event_id;'
UNION ALL SELECT '    ' || best_attribute_type || ' ts;' FROM best WHERE attribute = 'ts'
UNION ALL SELECT '    bigint user_id;'
UNION ALL SELECT '    ' || best_attribute_type || ' event_type;' FROM best WHERE attribute = 'event_type'
UNION ALL SELECT '    double value;'
UNION ALL SELECT '    ' || best_attribute_type || ' props;' FROM best WHERE attribute = 'props'
UNION ALL SELECT 'END;'
"""

    # ---- multimodal (deterministic fake-decode stubs) ----
    # make_fake_media_table: payload = ascii(sha256_hex('42:' || id)) x 8;
    # every third id (0,3,...) is a 5000ms video, others are images with
    # duration 0.  sample_frames(every_ms=1000) -> 5 frames per video.
    multimodal_frames_sql = (
        "SELECT CAST(3 * i AS BIGINT) AS media_id, CAST(5 AS BIGINT) AS n_frames "
        "FROM range(40) t(i)"
    )
    # extract_features: n_bytes = len(payload) = 512; features[0] =
    # first 2 bytes of sha256(payload) / 65535 (float32) — compared via
    # its integral 16-bit source.
    multimodal_features_sql = """
WITH ids AS (SELECT CAST(i AS BIGINT) AS media_id FROM range(200) t(i)),
pl AS (SELECT media_id, repeat(sha256('42:' || media_id), 8) AS payload FROM ids),
h AS (SELECT media_id, CAST(length(payload) AS BIGINT) AS n_bytes, sha256(payload) AS hx FROM pl)
SELECT media_id, n_bytes,
  CAST((strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 4096
     + (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1) * 256
     + (strpos('0123456789abcdef', substr(hx, 3, 1)) - 1) * 16
     + (strpos('0123456789abcdef', substr(hx, 4, 1)) - 1) AS BIGINT) AS f0_scaled
FROM h
"""

    # ---- verdicts_per_partition (per-partition verdict grain) ----
    verdicts_per_partition_sql = """
WITH parts AS (SELECT DISTINCT o_orderpriority AS partition FROM orders),
dup AS (
  SELECT o.o_orderpriority AS partition, COUNT(*) AS vc
  FROM orders o
  JOIN (SELECT o_custkey, o_orderdate FROM orders
        GROUP BY 1, 2 HAVING COUNT(*) > 1) d
    USING (o_custkey, o_orderdate)
  GROUP BY 1),
dom AS (
  SELECT o_orderpriority AS partition,
         SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F') OR o_orderstatus IS NULL
                  THEN 1 ELSE 0 END) AS vc
  FROM orders GROUP BY 1),
pr AS (
  SELECT o_orderpriority AS partition,
         SUM(CASE WHEN NOT (o_totalprice >= 0) OR o_totalprice IS NULL
                  THEN 1 ELSE 0 END) AS vc
  FROM orders GROUP BY 1)
SELECT partition, 'unique_cust_date' AS check_name,
       COALESCE(vc, 0) = 0 AS passed,
       COALESCE(vc, 0)::BIGINT AS violation_count
FROM parts LEFT JOIN dup USING (partition)
UNION ALL SELECT partition, 'status_closed', vc = 0, vc::BIGINT FROM dom
UNION ALL SELECT partition, 'price_positive', vc = 0, vc::BIGINT FROM pr
"""

    # ---- transcript_suite (flagship checks, generator re-derived) ----
    # generate_transcripts is pure xxhash64 arithmetic, so DuckDB can
    # regenerate the identical table from (n, seed) and re-derive every
    # suite verdict from first principles (functions/transcripts_sql.py)
    from datapatterns_spark.functions.transcripts_sql import (
        transcript_suite_sql,
    )
    from datapatterns_spark.operators.constraints import CRITICAL_1, EXPECTED
    from datapatterns_spark.sources.transcripts import (
        _TURN_KS_BASELINE,
        _TURN_PSI_BASELINE,
    )

    transcript_suite_oracle = transcript_suite_sql(
        n_conversations=2000,
        seed=42,
        violation_rate=0.003,
        psi_baseline=_TURN_PSI_BASELINE,
        ks_baseline=_TURN_KS_BASELINE,
        benford_expected=EXPECTED[1],
        benford_critical=CRITICAL_1,
    )

    # ---- multimodal_resize (fake resize: sha256(payload + "WxH")) ----
    multimodal_resize_sql = """
WITH ids AS (SELECT CAST(i AS BIGINT) AS media_id FROM range(200) t(i)),
pl AS (SELECT media_id, repeat(sha256('42:' || media_id), 8) AS payload FROM ids)
SELECT media_id, sha256(payload || '64x48') AS media,
       64 AS width, 48 AS height
FROM pl
"""

    # ---- multimodal_transform (round-3/4 consolidations: features +
    # resize joined over one fake media table, unioned with per-video
    # sampled-frame counts over another) ----
    multimodal_transform_sql = f"""
WITH mf AS MATERIALIZED ({multimodal_features_sql}),
mr AS MATERIALIZED ({multimodal_resize_sql})
SELECT 'transform' AS part, mf.media_id, mf.n_bytes, mf.f0_scaled,
       mr.media, mr.width, mr.height, CAST(NULL AS BIGINT) AS n_frames
FROM mf JOIN mr ON mr.media_id = mf.media_id
UNION ALL
SELECT 'frames', f.media_id, NULL, NULL, NULL, NULL, NULL, f.n_frames
FROM ({multimodal_frames_sql}) f
"""

    # ---- multimodal_real: checked-in expected-output fixture derived
    # from the pure-Python codecs (scripts/make_multimodal_fixture.py;
    # pixel decode itself is not SQL-expressible, codec parity pinned
    # by tests/test_codecs.py) ----
    multimodal_real_sql = (
        "SELECT part, media_id, k, v FROM "
        "'/root/repo/tests/fixtures/multimodal_real_expected.parquet'"
    )

    # ---- text_winnow (winnowing fingerprints, k=5 w=4) ----
    # identical modular fold as the Spark expression: mod applied after
    # every (acc*257 + codepoint) step, all arithmetic in BIGINT.
    _wn_norm = _NORM_SQL.format(v="text")
    text_winnow_sql = f"""
WITH d AS (SELECT doc_id, {_wn_norm} AS s FROM documents),
p AS (SELECT doc_id, s, length(s) - 4 AS nk FROM d WHERE length(s) >= 5),
pos AS (
  SELECT doc_id, nk, s, unnest(generate_series(1, nk)) AS i FROM p
),
kh AS (
  SELECT doc_id, nk, i,
    ((((((((CAST(ord(substr(s, CAST(i AS INT), 1)) AS BIGINT) % 2147483647) * 257
      + ord(substr(s, CAST(i AS INT) + 1, 1))) % 2147483647) * 257
      + ord(substr(s, CAST(i AS INT) + 2, 1))) % 2147483647) * 257
      + ord(substr(s, CAST(i AS INT) + 3, 1))) % 2147483647) * 257
      + ord(substr(s, CAST(i AS INT) + 4, 1))) % 2147483647 AS h
  FROM pos
),
win AS (
  SELECT doc_id, nk, i,
    min(h) OVER (PARTITION BY doc_id ORDER BY i
                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mh
  FROM kh
)
SELECT DISTINCT doc_id, mh AS fp FROM win WHERE nk >= 4 AND i <= nk - 3
UNION
SELECT doc_id, MIN(h) AS fp FROM kh WHERE nk < 4 GROUP BY doc_id
"""

    # ---- winnow (round-3 consolidation: fingerprints + near-dup
    # pairs over the SAME shared fps CTE; formerly text_winnow +
    # dedup_winnow) ----
    winnow_sql = f"""
WITH wfp AS MATERIALIZED ({text_winnow_sql}),
sizes AS (SELECT doc_id, COUNT(*) AS n_fp FROM wfp GROUP BY doc_id),
hot AS (SELECT fp FROM wfp GROUP BY fp HAVING COUNT(*) > 100),
pruned AS (SELECT * FROM wfp WHERE fp NOT IN (SELECT fp FROM hot)),
sh AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
       FROM pruned a JOIN pruned b USING (fp) WHERE a.doc_id < b.doc_id
       GROUP BY 1, 2),
wpairs AS (
  SELECT id_a, id_b, shared, least(sa.n_fp, sb.n_fp) AS n_min
  FROM sh
  JOIN sizes sa ON sa.doc_id = sh.id_a
  JOIN sizes sb ON sb.doc_id = sh.id_b
  WHERE shared * 1000000 >= 500000 * least(sa.n_fp, sb.n_fp))
SELECT 'fp' AS kind, CAST(doc_id AS BIGINT) AS a, CAST(fp AS BIGINT) AS b,
       CAST(NULL AS BIGINT) AS c, CAST(NULL AS BIGINT) AS d
FROM wfp
UNION ALL
SELECT 'pair', CAST(id_a AS BIGINT), CAST(id_b AS BIGINT),
       CAST(shared AS BIGINT), CAST(n_min AS BIGINT)
FROM wpairs
"""

    # ---- xxhash64-exact oracles (text_fingerprint / simhash / minhash) ----
    # DuckDB has no xxhash; functions/xxh64_sql.py GENERATES a single-
    # statement SQL pipeline reproducing Spark's XxHash64 bit-for-bit
    # (HUGEINT mod-2^64 arithmetic, lane folds via list_reduce) — so the
    # hash-valued operators get exact oracles instead of rows-only.
    from datapatterns_spark.functions.xxh64_sql import (
        hash_int_steps,
        hash_long_steps,
        multi_hash_sql,
        to_signed,
        xxh64_int_py,
        xxh64_str_sql,
    )
    from datapatterns_spark.operators.dedup import MINHASH_P, minhash_coeffs

    # ---- pack_sequences (concat-and-chunk packing, B=64, 4 shards) ----
    _pk_hash = multi_hash_sql(
        "(SELECT doc_id,"
        " CASE WHEN trim(coalesce(text, '')) = '' THEN 0"
        " ELSE len(string_split_regex(trim(coalesce(text, '')), '\\s+'))"
        " END AS n_tok FROM documents)",
        ["doc_id", "n_tok"],
        [
            ("h1", str(xxh64_int_py(42, 42)), hash_long_steps("doc_id")),
            ("h2", str(xxh64_int_py(43, 42)), hash_long_steps("doc_id")),
        ],
        "pk",
    )
    _pk_s1, _pk_s2 = to_signed("h1"), to_signed("h2")
    pack_sequences_sql = f"""
WITH ph AS MATERIALIZED ({_pk_hash}),
base AS MATERIALIZED (
  SELECT doc_id, n_tok,
         ((({_pk_s1}) % 4 + 4) % 4) AS shard,
         ({_pk_s2}) AS ord
  FROM ph WHERE n_tok > 0),
c AS (
  SELECT doc_id, n_tok, shard,
         SUM(n_tok) OVER (PARTITION BY shard ORDER BY ord, doc_id) AS e
  FROM base),
spans AS (
  SELECT shard, doc_id, e - n_tok AS s, e,
         unnest(generate_series(((e - n_tok) // 64)::BIGINT, ((e - 1) // 64)::BIGINT)) AS pack
  FROM c)
SELECT CAST(shard AS BIGINT) AS shard, CAST(pack AS BIGINT) AS pack, doc_id,
       CAST(GREATEST(pack * 64, s) - s AS BIGINT) AS tok_start,
       CAST(LEAST((pack + 1) * 64, e) - GREATEST(pack * 64, s) AS BIGINT) AS n_tokens
FROM spans
"""


    # ---- sample_stratified: seeded per-stratum uniform draw ----
    # Spark ranks by xxhash64(lit(7), doc_id) = hashLong(doc_id,
    # seed=hashInt(7, 42)); the int fold of the literal seed is a
    # constant precomputed here, the long fold replays per row.
    _ss_seed = xxh64_int_py(7, 42)
    _ss_hash = multi_hash_sql(
        "(SELECT doc_id::HUGEINT AS did, doc_id, lang FROM documents)",
        ["did", "doc_id", "lang"],
        [("h1", str(_ss_seed), hash_long_steps("did"))],
        "smp",
    )
    sample_stratified_sql = f"""
WITH ranked AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang
                            ORDER BY {to_signed("h1")}, doc_id) AS sample_rank
  FROM ({_ss_hash})
)
SELECT doc_id, lang, CAST(sample_rank AS INTEGER) AS sample_rank
FROM ranked WHERE sample_rank <= 40
"""

    norm_text = _NORM_SQL.format(v="text")
    text_fp_sql = xxh64_str_sql(
        "documents", ["doc_id"], norm_text, out="fp", cte_prefix="fp"
    )

    # ---- text_lm_score (char-bigram LM, self-trained, add-alpha) ----
    _lm_norm = _NORM_SQL.format(v="text")
    text_lm_score_sql = f"""
WITH lmnt AS MATERIALIZED (SELECT doc_id, {_lm_norm} AS s FROM documents),
lmbg AS MATERIALIZED (
  SELECT doc_id,
         UNNEST(list_transform(range(1, length(s)),
                               i -> substr(s, CAST(i AS INT), 2))) AS bg
  FROM lmnt WHERE length(s) >= 2),
lmmodel AS MATERIALIZED (SELECT bg, COUNT(*) AS cnt FROM lmbg GROUP BY bg),
lmuni AS MATERIALIZED (
  SELECT substr(bg, 1, 1) AS a, SUM(cnt) AS fcnt FROM lmmodel GROUP BY 1),
lmv AS (SELECT COUNT(DISTINCT substr(bg, 2, 1)) + 1 AS v FROM lmmodel),
lmlp AS (
  SELECT b.doc_id,
         CAST(FLOOR(LN((COALESCE(m.cnt, 0) + 0.5)
                       / (COALESCE(u.fcnt, 0) + 0.5 * (SELECT v FROM lmv)))
                    * 1000000000 + 0.5) AS BIGINT) AS lp9
  FROM lmbg b
  LEFT JOIN lmmodel m USING (bg)
  LEFT JOIN lmuni u ON substr(b.bg, 1, 1) = u.a),
lmagg AS (SELECT doc_id, COUNT(*) AS n_bigrams, SUM(lp9) AS s
          FROM lmlp GROUP BY doc_id)
SELECT lmnt.doc_id AS id,
       CAST(COALESCE(lmagg.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       COALESCE(ROUND(lmagg.s / (lmagg.n_bigrams * 1000000000.0), 6), 0.0)
         AS lm_score
FROM lmnt LEFT JOIN lmagg USING (doc_id)
"""

    # ---- text_contamination (8-gram eval overlap) ----
    _ct_norm = _NORM_SQL.format(v="text")
    _ct_gram8 = (
        "list_transform(range(1, len(tk) - 6),"
        " i -> concat_ws(' ', tk[i], tk[i + 1], tk[i + 2], tk[i + 3],"
        " tk[i + 4], tk[i + 5], tk[i + 6], tk[i + 7]))"
    )
    text_contamination_sql = f"""
WITH cg AS MATERIALIZED (
  SELECT doc_id, UNNEST(g) AS g FROM (
    SELECT doc_id,
           CASE WHEN len(tk) >= 8 THEN list_distinct({_ct_gram8})
                ELSE [array_to_string(tk, ' ')] END AS g
    FROM (SELECT doc_id, string_split({_ct_norm}, ' ') AS tk
          FROM documents))),
eg AS MATERIALIZED (
  SELECT DISTINCT doc_id AS eval_id, g FROM cg WHERE doc_id % 40 = 0)
SELECT c.doc_id, e.eval_id, CAST(COUNT(*) AS BIGINT) AS shared_grams
FROM cg c JOIN eg e ON c.g = e.g
GROUP BY 1, 2
"""

    # ---- text_repetition (independent unnest+groupBy algorithm) ----
    _rp_norm = _NORM_SQL.format(v="t")
    text_repetition_sql = f"""
WITH d AS MATERIALIZED (SELECT doc_id, COALESCE(text, '') AS t FROM documents),
l AS (SELECT doc_id,
             UNNEST(list_filter(string_split(t, chr(10)), x -> trim(x) <> '')) AS line
      FROM d),
lc AS (SELECT doc_id, line, COUNT(*) AS c, length(line) AS len
       FROM l GROUP BY doc_id, line),
lstats AS (SELECT doc_id, SUM(c) AS n_lines, COUNT(*) AS n_distinct,
                  SUM(c * len) AS total_chars,
                  SUM(CASE WHEN c = 1 THEN len ELSE 0 END) AS single_chars
           FROM lc GROUP BY doc_id),
nt AS MATERIALIZED (SELECT doc_id, {_rp_norm} AS ntext FROM d),
tk AS (SELECT doc_id, string_split(ntext, ' ') AS toks FROM nt),
g AS (SELECT doc_id,
             UNNEST(list_transform(range(1, len(toks)),
                                   i -> toks[i] || ' ' || toks[i + 1])) AS gram
      FROM tk WHERE len(toks) >= 2),
gc AS (SELECT doc_id, gram, COUNT(*) AS c FROM g GROUP BY doc_id, gram),
gtop AS (SELECT doc_id, c, gram FROM (
           SELECT doc_id, c, gram,
                  row_number() OVER (PARTITION BY doc_id
                                     ORDER BY c DESC, gram DESC) AS rn
           FROM gc) WHERE rn = 1)
SELECT d.doc_id,
  ROUND(CASE WHEN COALESCE(n_lines, 0) > 0
        THEN (n_lines - n_distinct) * 1.0 / n_lines ELSE 0 END, 6)
    AS dup_line_frac,
  ROUND(CASE WHEN COALESCE(total_chars, 0) > 0
        THEN (total_chars - single_chars) * 1.0 / total_chars ELSE 0 END, 6)
    AS dup_line_char_frac,
  ROUND(CASE WHEN length(nt.ntext) > 0 AND gtop.c IS NOT NULL
        THEN gtop.c * length(gtop.gram) * 1.0 / length(nt.ntext)
        ELSE 0 END, 6) AS top_ngram_char_frac
FROM d
LEFT JOIN lstats ON lstats.doc_id = d.doc_id
LEFT JOIN gtop ON gtop.doc_id = d.doc_id
JOIN nt ON nt.doc_id = d.doc_id
"""

    # ---- text_redact (PII patterns are Java-regex/RE2-portable:
    # no lookaround, explicit classes; DuckDB needs the 'g' flag) ----
    from datapatterns_spark.operators.textanalysis import PII_PATTERNS

    _pii_order = ["email", "ssn", "phone", "ipv4"]
    _red_expr = "t"
    for _k in _pii_order:
        _red_expr = (
            f"regexp_replace({_red_expr}, '{PII_PATTERNS[_k]}',"
            f" '[{_k.upper()}]', 'g')"
        )
    _pii_counts = ",\n  ".join(
        f"CAST(length(regexp_extract_all(t, '{PII_PATTERNS[k]}')) AS INT)"
        f" AS n_{k}"
        for k in _pii_order
    )
    text_redact_sql = f"""
WITH planted AS MATERIALIZED (
  SELECT doc_id,
         COALESCE(CASE WHEN doc_id % 5 = 0
              THEN COALESCE(text, '') || ' contact user' || doc_id::VARCHAR
                   || '@example.com or 555-123-4567'
              ELSE text END, '') AS t
  FROM documents)
SELECT doc_id,
  {_pii_counts},
  CAST({' + '.join(f"length(regexp_extract_all(t, '{PII_PATTERNS[k]}'))" for k in _pii_order)} AS INT) AS pii_total,
  {_red_expr} AS redacted
FROM planted
"""

    # ---- dedup_simhash: votes over token hashes -> hex -> banded pairs ----
    # Spark: h = xxhash64(tok, lit(0)) = hashInt(0, hashBytes(tok, 42));
    # vote per bit b = 2*((h >> b) & 1) - 1, summed over the token STREAM
    # (occurrences, not distinct); hex digits uppercase (F.conv parity).
    tok_rel = (
        f"(SELECT id, UNNEST(string_split(t, ' ')) AS tok FROM "
        f"(SELECT doc_id AS id, {norm_text} AS t FROM documents))"
    )
    sim_hash_pipe = xxh64_str_sql(
        tok_rel, ["id"], "tok", signed=False,
        extra_steps=hash_int_steps(0), cte_prefix="sh", out="h",
    )
    sim_votes = ", ".join(
        f"SUM(CASE WHEN (h // {1 << b}) % 2 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(64)
    )
    sim_value = " + ".join(
        f"CASE WHEN v{b} > 0 THEN {1 << b}::HUGEINT ELSE 0::HUGEINT END"
        for b in range(64)
    )

    def _hex4(c: str) -> str:
        # 4 uppercase hex chars -> int (no hex-literal cast in DuckDB 1.0)
        return (
            "("
            + " + ".join(
                f"(strpos('0123456789abcdef', substr(lower({c}), {i + 1}, 1)) - 1)"
                f" * {16 ** (3 - i)}"
                for i in range(4)
            )
            + ")"
        )

    sim_hamming = " + ".join(
        f"bit_count(xor({_hex4(f'substr(ha, {i * 4 + 1}, 4)')},"
        f" {_hex4(f'substr(hb, {i * 4 + 1}, 4)')}))"
        for i in range(4)
    )
    simhash_sql = f"""
WITH hv AS MATERIALIZED (SELECT id, {sim_votes} FROM ({sim_hash_pipe}) GROUP BY id),
hx AS MATERIALIZED (SELECT id, lpad(to_hex(({sim_value})::UBIGINT), 16, '0') AS h FROM hv),
chunks AS MATERIALIZED (
  SELECT id, h, band, substr(h, band*4 + 1, 4) AS chunk
  FROM hx CROSS JOIN (SELECT UNNEST([0, 1, 2, 3]) AS band)),
cand AS MATERIALIZED (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.h AS ha, b.h AS hb
  FROM chunks a JOIN chunks b
    ON a.band = b.band AND a.chunk = b.chunk AND a.id < b.id)
SELECT id_a, id_b, CAST({sim_hamming} AS INT) AS hamming
FROM cand WHERE {sim_hamming} <= 3
"""

    # ---- dedup_minhash_lsh: signatures -> band keys -> verified pairs ----
    # Signature path uses NON-distinct shingles (duplicates don't change
    # a min); verification recomputes DISTINCT shingle sets (Spark
    # array_intersect/array_union semantics).
    mh_p = MINHASH_P
    mh_ab = minhash_coeffs(64)
    gram_win = (
        "list_transform(range(1, len(tk) - 1),"
        " i -> concat_ws(' ', tk[i], tk[i + 1], tk[i + 2]))"
    )
    gram_rel = (
        f"(SELECT id, UNNEST(g) AS gram FROM (SELECT id,"
        f" CASE WHEN len(tk) >= 3 THEN {gram_win}"
        f" ELSE [array_to_string(tk, ' ')] END AS g"
        f" FROM (SELECT doc_id AS id, string_split({norm_text}, ' ') AS tk"
        f" FROM documents)))"
    )
    mh_hash_pipe = xxh64_str_sql(gram_rel, ["id"], "gram", cte_prefix="mh", out="h")
    mh_mins = ", ".join(
        f"MIN((x * {a} + {b}) % {mh_p}) AS m{i}" for i, (a, b) in enumerate(mh_ab)
    )
    mh_band_structs = ", ".join(
        f"{{'band': {bnd}, 'key':"
        f" [m{bnd * 4}, m{bnd * 4 + 1}, m{bnd * 4 + 2}, m{bnd * 4 + 3}]}}"
        for bnd in range(16)
    )
    minhash_sql = f"""
WITH xs AS MATERIALIZED (SELECT id, ((h % {mh_p}) + {mh_p}) % {mh_p} AS x FROM ({mh_hash_pipe})),
sig AS MATERIALIZED (SELECT id, {mh_mins} FROM xs GROUP BY id),
buckets AS MATERIALIZED (
  SELECT id, bk.band AS band, bk.key AS key
  FROM (SELECT id, UNNEST([{mh_band_structs}]) AS bk FROM sig)),
cand AS MATERIALIZED (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM buckets a JOIN buckets b
    ON a.band = b.band AND a.key = b.key AND a.id < b.id),
shc AS MATERIALIZED (
  SELECT id, CASE WHEN len(tk) >= 3 THEN list_distinct({gram_win})
         ELSE [array_to_string(tk, ' ')] END AS sh
  FROM (SELECT doc_id AS id, string_split({norm_text}, ' ') AS tk FROM documents)
  WHERE id IN (SELECT id_a FROM cand UNION SELECT id_b FROM cand)),
scored AS (
  SELECT c.id_a, c.id_b,
         ROUND(len(list_intersect(a.sh, b.sh)) * 1.0 /
               (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) AS jaccard
  FROM cand c JOIN shc a ON a.id = c.id_a JOIN shc b ON b.id = c.id_b)
SELECT id_a, id_b, jaccard FROM scored WHERE jaccard >= 0.7
"""

    # ---- dedup_incremental_minhash (signature-store near-dups) ----
    _mi_cols = ", ".join(f"m{i}" for i in range(64))
    _mi_est = " + ".join(
        f"CASE WHEN a.m{i} = b.m{i} THEN 1 ELSE 0 END" for i in range(64)
    )
    dedup_incremental_minhash_sql = f"""
WITH mxs AS MATERIALIZED (SELECT id, ((h % {mh_p}) + {mh_p}) % {mh_p} AS x FROM ({mh_hash_pipe})),
msig AS MATERIALIZED (SELECT id, {mh_mins} FROM mxs GROUP BY id),
s2 AS MATERIALIZED (
  SELECT id, {_mi_cols} FROM msig WHERE id >= 250
  UNION ALL
  SELECT id + 10000, {_mi_cols} FROM msig WHERE id < 250 AND id % 50 = 0),
s1 AS MATERIALIZED (SELECT id, {_mi_cols} FROM msig WHERE id < 250),
nb AS MATERIALIZED (
  SELECT id, bk.band AS band, bk.key AS key
  FROM (SELECT id, UNNEST([{mh_band_structs}]) AS bk FROM s2)),
sb AS MATERIALIZED (
  SELECT id, bk.band AS band, bk.key AS key
  FROM (SELECT id, UNNEST([{mh_band_structs}]) AS bk FROM s1)),
cs AS (SELECT DISTINCT n.id AS id_a, s.id AS id_b
       FROM nb n JOIN sb s ON n.band = s.band AND n.key = s.key),
cb AS (SELECT DISTINCT l.id AS id_a, r.id AS id_b
       FROM nb l JOIN nb r ON l.band = r.band AND l.key = r.key AND l.id < r.id),
ds AS (SELECT DISTINCT c.id_a AS id
       FROM cs c JOIN s2 a ON a.id = c.id_a JOIN s1 b ON b.id = c.id_b
       WHERE ({_mi_est}) / 64.0 >= 0.7),
db AS (SELECT DISTINCT c.id_b AS id
       FROM cb c JOIN s2 a ON a.id = c.id_a JOIN s2 b ON b.id = c.id_b
       WHERE ({_mi_est}) / 64.0 >= 0.7)
SELECT i.id,
       CASE WHEN i.id IN (SELECT id FROM ds) THEN 'dup_of_store'
            WHEN i.id IN (SELECT id FROM db) THEN 'dup_in_batch'
            ELSE 'unique' END AS status
FROM (SELECT DISTINCT id FROM s2) i
"""

    # ---- embedding normalize / quantize (double folds, Spark order) ----
    _en_n = (
        "sqrt(list_reduce(list_transform(embedding,"
        " x -> x::DOUBLE * x::DOUBLE), (a, b) -> a + b))"
    )
    embedding_normalize_sql = f"""
WITH en AS (SELECT vec_id, embedding, {_en_n} AS n FROM embeddings)
SELECT vec_id, ROUND(n, 6) AS norm,
       ROUND(CASE WHEN n = 0 THEN embedding[1]::DOUBLE
                  ELSE embedding[1]::DOUBLE / n END, 6) AS u0
FROM en
"""
    embedding_quantize_sql = """
WITH eq AS (
  SELECT vec_id, embedding,
         list_max(list_transform(embedding, x -> abs(x::DOUBLE))) / 127.0
           AS scale
  FROM embeddings),
ex AS (
  SELECT vec_id, scale, embedding,
         UNNEST(generate_series(1, len(embedding))) AS p1
  FROM eq)
SELECT vec_id, ROUND(scale, 6) AS scale6,
       CAST(p1 - 1 AS INT) AS pos,
       CAST(CASE WHEN scale = 0 THEN 0
            ELSE GREATEST(-127, LEAST(127,
                 FLOOR(embedding[p1]::DOUBLE / scale + 0.5))) END AS INT)
         AS code
FROM ex
"""

    # ---- embedding_transform (round-3 consolidation: normalize
    # digests joined onto the quantization codes) ----
    embedding_transform_sql = f"""
WITH en2 AS MATERIALIZED ({embedding_normalize_sql}),
eq2 AS MATERIALIZED ({embedding_quantize_sql})
SELECT eq2.vec_id, eq2.scale6, eq2.pos, eq2.code, en2.norm, en2.u0
FROM eq2 JOIN en2 ON en2.vec_id = eq2.vec_id
"""

    # ---- dedup_incremental: two-batch store classification ----
    _di_hash = xxh64_str_sql(
        "documents", ["doc_id"], _NORM_SQL.format(v="text"),
        out="fp", cte_prefix="di",
    )
    dedup_incremental_sql = f"""
WITH allfp AS MATERIALIZED ({_di_hash}),
dstore AS (SELECT DISTINCT fp FROM allfp WHERE doc_id < 250),
b2 AS (
  SELECT doc_id AS id, fp FROM allfp WHERE doc_id >= 250
  UNION ALL
  SELECT doc_id + 10000, fp FROM allfp
  WHERE doc_id < 250 AND doc_id % 50 = 0),
dc AS (SELECT fp, MIN(id) AS canon FROM b2 GROUP BY fp)
SELECT b2.id, b2.fp,
       CASE WHEN b2.fp IN (SELECT fp FROM dstore) THEN 'dup_of_store'
            WHEN b2.id <> dc.canon THEN 'dup_in_batch'
            ELSE 'unique' END AS status
FROM b2 JOIN dc ON b2.fp = dc.fp
"""

    # ---- dedup_conversations: whole-conversation fingerprint dedup ----
    # Pseudo-conversations from documents (conv = doc_id div 20, turn =
    # doc_id % 20) + planted clones; per-turn hash replayed via the
    # pure-SQL XXH64 string pipeline, folds as bit_xor / HUGEINT sum.
    conv_src = (
        "(SELECT doc_id // 20 AS conv_id, doc_id % 20 AS turn_idx, text"
        " FROM documents"
        " UNION ALL"
        " SELECT doc_id // 20 + 100000, doc_id % 20, text FROM documents"
        " WHERE (doc_id // 20) % 7 = 0)"
    )
    conv_hash = xxh64_str_sql(
        conv_src,
        ["conv_id"],
        "turn_idx::VARCHAR || ':' || COALESCE(text, '')",
        cte_prefix="cvd",
        out="h",
    )
    dedup_conversations_sql = f"""
WITH hashed AS MATERIALIZED ({conv_hash}),
fps AS MATERIALIZED (
  SELECT conv_id AS conv, COUNT(*) AS n_turns,
         bit_xor(h) AS fp_xor, SUM(h::HUGEINT) AS fp_sum
  FROM hashed GROUP BY conv_id),
grp AS (
  SELECT n_turns, fp_xor, fp_sum, MIN(conv) AS canonical
  FROM fps GROUP BY 1, 2, 3 HAVING COUNT(*) > 1)
SELECT f.conv, g.canonical, (f.conv = g.canonical) AS keep
FROM fps f JOIN grp g USING (n_turns, fp_xor, fp_sum)
"""


    # ---- dedup_spans (exact-substring duplicate spans, n=8) ----
    _ds_norm = _NORM_SQL.format(v="text")
    dedup_spans_sql = f"""
WITH dsn AS MATERIALIZED (SELECT doc_id, {_ds_norm} AS s FROM documents),
dst AS (SELECT doc_id, string_split(s, ' ') AS tk FROM dsn),
dpos AS MATERIALIZED (
  SELECT doc_id, CAST(UNNEST(range(1, len(tk) - 6)) AS INT) AS i, tk
  FROM dst WHERE len(tk) >= 8),
dgr AS (SELECT doc_id, i, tk[i + 0] || ' ' || tk[i + 1] || ' ' || tk[i + 2] || ' ' || tk[i + 3] || ' ' || tk[i + 4] || ' ' || tk[i + 5] || ' ' || tk[i + 6] || ' ' || tk[i + 7] AS g FROM dpos),
dhot AS (SELECT g FROM dgr GROUP BY g HAVING COUNT(*) >= 2),
ddup AS (SELECT doc_id, i, i + 7 AS e FROM dgr WHERE g IN (SELECT g FROM dhot)),
dmrk AS (
  SELECT doc_id, i, e,
         CASE WHEN i > COALESCE(MAX(e) OVER (PARTITION BY doc_id ORDER BY i
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
              THEN 1 ELSE 0 END AS nw
  FROM ddup),
disl AS (
  SELECT doc_id, i, e,
         SUM(nw) OVER (PARTITION BY doc_id ORDER BY i
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
  FROM dmrk)
SELECT doc_id AS id, CAST(MIN(i) AS BIGINT) AS span_start,
       CAST(MAX(e) AS BIGINT) AS span_end,
       CAST(MAX(e) - MIN(i) + 1 AS BIGINT) AS span_tokens
FROM disl GROUP BY doc_id, isl
"""

    # ---- dedup_spans_winnow: the winnowing lever under full replay ----
    # Selection depends on the ACTUAL Spark xxhash64 gram hash values
    # (rightmost minimum per 4-window), so the oracle computes them
    # with the pure-SQL twin and reproduces the argmin with a
    # composite-key window arg_min: (h, -i) packed as
    # h*2^32 - i in HUGEINT — lexicographic because |i| < 2^32 — so
    # equal hashes pick the RIGHTMOST position, Spark's tie rule.
    _dw_g = " || ' ' || ".join(f"tk[i + {j}]" for j in range(8))
    _dw_gram_rel = (
        f"(SELECT doc_id, i, {_dw_g} AS g"
        f" FROM (SELECT doc_id, CAST(UNNEST(range(1, len(tk) - 6)) AS INT)"
        f" AS i, tk FROM (SELECT doc_id, string_split({_ds_norm}, ' ')"
        f" AS tk FROM documents) WHERE len(tk) >= 8))"
    )
    _dw_pipe = xxh64_str_sql(
        _dw_gram_rel, ["doc_id", "i", "g"], "g", cte_prefix="dw", out="h"
    )
    _dw_key = "(h::HUGEINT * 4294967296) - i::HUGEINT"
    dedup_spans_winnow_sql = f"""
WITH dwh AS MATERIALIZED (SELECT doc_id, i, g, h FROM ({_dw_pipe})),
dwm AS (SELECT doc_id, MAX(i) AS m FROM dwh GROUP BY doc_id),
dwwin AS (
  SELECT doc_id, i AS p,
         arg_min(i, {_dw_key}) OVER (PARTITION BY doc_id ORDER BY i
           ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS sel
  FROM dwh),
dwselpos AS (
  SELECT DISTINCT w.doc_id, w.sel AS i
  FROM dwwin w JOIN dwm m ON w.doc_id = m.doc_id
  WHERE w.p <= m.m - 3
  UNION
  SELECT doc_id, arg_min(i, {_dw_key}) AS i
  FROM dwh WHERE doc_id IN (SELECT doc_id FROM dwm WHERE m < 4)
  GROUP BY doc_id),
dwsel AS (
  SELECT h.doc_id, h.i, h.g
  FROM dwh h JOIN dwselpos s ON h.doc_id = s.doc_id AND h.i = s.i),
dwhot AS (SELECT g FROM dwsel GROUP BY g HAVING COUNT(*) >= 2),
dwdup AS (SELECT doc_id, i, i + 7 AS e FROM dwsel
          WHERE g IN (SELECT g FROM dwhot)),
dwmrk AS (
  SELECT doc_id, i, e,
         CASE WHEN i > COALESCE(MAX(e) OVER (PARTITION BY doc_id ORDER BY i
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 4
              THEN 1 ELSE 0 END AS nw
  FROM dwdup),
dwisl AS (
  SELECT doc_id, i, e,
         SUM(nw) OVER (PARTITION BY doc_id ORDER BY i
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
  FROM dwmrk)
SELECT doc_id AS id, CAST(MIN(i) AS BIGINT) AS span_start,
       CAST(MAX(e) AS BIGINT) AS span_end,
       CAST(MAX(e) - MIN(i) + 1 AS BIGINT) AS span_tokens
FROM dwisl GROUP BY doc_id, isl
"""

    # ---- dedup_components: CC over the minhash pairs ----
    # Independent algorithm as the oracle: a recursive label-
    # propagation closure (min reachable id per node) vs Spark's
    # large-star/small-star — same labels iff both are correct.
    dedup_components_sql = f"""
WITH RECURSIVE
edges0 AS (SELECT id_a, id_b FROM (
{minhash_sql}
) mh),
edges AS (SELECT id_a AS a, id_b AS b FROM edges0
          UNION SELECT id_b, id_a FROM edges0),
walk(node, lab) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.a, w.lab FROM edges e JOIN walk w ON w.node = e.b
)
SELECT node, MIN(lab) AS component, (node = MIN(lab)) AS keep
FROM walk GROUP BY node
"""

    # ---- cardinality_histogram (raw values, no trim/filter) ----
    cardinality_histogram = (
        "SELECT 'event_type' AS attribute, coalesce(CAST(event_type AS VARCHAR), '') AS value,"
        " COUNT(*) AS rec_count FROM events GROUP BY 1, 2"
    )

    # ---- benford (digit 1) ----
    ben_cols = ["l_orderkey", "l_quantity", "l_extendedprice", "l_discount"]
    ben_src_parts = [
        f"SELECT {i + 1} AS ord, '{c}' AS attribute,"
        f" CASE WHEN regexp_extract(CAST({c} AS VARCHAR), '[1-9]') <> ''"
        f" THEN CAST(regexp_extract(CAST({c} AS VARCHAR), '[1-9]') AS INT)"
        f" WHEN contains(CAST({c} AS VARCHAR), '.') THEN 0 ELSE 10 END AS n"
        f" FROM lineitem"
        for i, c in enumerate(ben_cols)
    ]
    digit_names = ["zero", "one", "two", "three", "four", "five", "six", "seven", "eight", "nine"]
    pct_cols = ",\n       ".join(
        f"ROUND(SUM(CASE WHEN n = {d} THEN 1 ELSE 0 END) * 100.0 / COUNT(*), 1) AS {digit_names[d]}"
        for d in range(10)
    )
    expected = {1: 30.1, 2: 17.6, 3: 12.5, 4: 9.7, 5: 7.9, 6: 6.7, 7: 5.8, 8: 5.1, 9: 4.6}
    chi = " + ".join(
        f"(({digit_names[d]} - {e}) * ({digit_names[d]} - {e}) / {e})"
        for d, e in expected.items()
    )
    benford_sql = f"""
WITH src AS ({' UNION ALL '.join(ben_src_parts)}),
agg AS (
  SELECT ord, attribute,
       {pct_cols},
       COUNT(*) AS num_values
  FROM src WHERE n <> 10 GROUP BY ord, attribute),
withchi AS (
  SELECT attribute, CAST(-1.0 AS DOUBLE) AS zero, one, two, three, four, five, six, seven, eight, nine,
         ROUND({chi}, 3) AS chi_squared, CAST(num_values AS BIGINT) AS num_values, ord
  FROM agg)
SELECT attribute, zero, one, two, three, four, five, six, seven, eight, nine, chi_squared, num_values
FROM (
  SELECT * FROM withchi
  UNION ALL
  SELECT '-- EXPECTED DIGIT 1 --', CAST(-1.0 AS DOUBLE), 30.1, 17.6, 12.5, 9.7, 7.9, 6.7, 5.8, 5.1, 4.6,
         CAST(20.090 AS DOUBLE), (SELECT COUNT(*) FROM lineitem), 0
) ORDER BY ord
"""

    # ---- benford_stock (README stock walkthrough; input regenerated
    # in DuckDB from (n_rows, seed) via the pure-SQL XXH64 pipeline) ----
    from datapatterns_spark.functions.stock_sql import stock_rows_sql

    stock_rel = stock_rows_sql(50_000)
    stock_cols = ["opening_price", "closing_price", "trade_date"]
    stock_src_parts = [
        f"SELECT {i + 1} AS ord, '{c}' AS attribute,"
        f" CASE WHEN regexp_extract(CAST({c} AS VARCHAR), '[1-9]') <> ''"
        f" THEN CAST(regexp_extract(CAST({c} AS VARCHAR), '[1-9]') AS INT)"
        f" WHEN contains(CAST({c} AS VARCHAR), '.') THEN 0 ELSE 10 END AS n"
        f" FROM stockq"
        for i, c in enumerate(stock_cols)
    ]
    benford_stock_sql = f"""
WITH stockq AS MATERIALIZED (SELECT * FROM {stock_rel}),
src AS ({' UNION ALL '.join(stock_src_parts)}),
agg AS (
  SELECT ord, attribute,
       {pct_cols},
       COUNT(*) AS num_values
  FROM src WHERE n <> 10 GROUP BY ord, attribute),
withchi AS (
  SELECT attribute, CAST(-1.0 AS DOUBLE) AS zero, one, two, three, four, five, six, seven, eight, nine,
         ROUND({chi}, 3) AS chi_squared, CAST(num_values AS BIGINT) AS num_values, ord
  FROM agg)
SELECT attribute, zero, one, two, three, four, five, six, seven, eight, nine, chi_squared, num_values
FROM (
  SELECT * FROM withchi
  UNION ALL
  SELECT '-- EXPECTED DIGIT 1 --', CAST(-1.0 AS DOUBLE), 30.1, 17.6, 12.5, 9.7, 7.9, 6.7, 5.8, 5.1, 4.6,
         CAST(20.090 AS DOUBLE), (SELECT COUNT(*) FROM stockq), 0
) ORDER BY ord
"""

    # ---- validate ----
    tests = [
        ("QtyPositive", "l_quantity > 0"),
        ("DiscSmall", "l_discount <= 0.06"),
        ("TaxSmall", "l_tax <= 0.04"),
        ("FlagUpper", "regexp_matches(CAST(l_returnflag AS VARCHAR), '^\\p{Lu}+$')"),
    ]
    name_cases = ",\n         ".join(
        f"CASE WHEN ({t}) IS DISTINCT FROM TRUE THEN '{n}' END" for n, t in tests
    )
    cnt_cases = " + ".join(
        f"(CASE WHEN ({t}) IS DISTINCT FROM TRUE THEN 1 ELSE 0 END)" for _, t in tests
    )
    # round-4 consolidation: lineitem rules + customer AllFieldsFilled
    # in one frame, discriminated by src (the af_* pieces are built
    # where the customer helper expansion is derived, below)
    validate_sql_template = """
SELECT 'lineitem' AS src, violations, num_violations, COUNT(*) AS n FROM (
  SELECT concat_ws(',',
         {name_cases}) AS violations,
         CAST({cnt_cases} AS INT) AS num_violations
  FROM lineitem) GROUP BY 1, 2, 3
UNION ALL
SELECT 'customer', violations, num_violations, COUNT(*) AS n FROM (
  SELECT concat_ws(',',
         {af_names}) AS violations,
         CAST({af_cnt} AS INT) AS num_violations
  FROM customer) GROUP BY 1, 2, 3
"""

    # ---- constraint verdicts on events ----
    domain_list = ", ".join(f"'{x}'" for x in EVENT_TYPES)
    constraint_sql = f"""
WITH uq AS (
  SELECT CAST(COALESCE(SUM(cnt), 0) AS BIGINT) AS c FROM (
    SELECT COUNT(*) AS cnt FROM events GROUP BY user_id, ts HAVING COUNT(*) > 1)),
dom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS c FROM events
  WHERE (event_type IN ({domain_list})) IS DISTINCT FROM TRUE),
mono AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS c FROM (
    SELECT ts, LAG(ts) OVER (PARTITION BY user_id ORDER BY event_id) AS p FROM events)
  WHERE p IS NOT NULL AND ts < p),
neg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS c FROM events
  WHERE (value >= 0) IS DISTINCT FROM TRUE)
SELECT 'unique_user_ts' AS check_name, (c = 0) AS passed, c AS violation_count FROM uq
UNION ALL SELECT 'event_type_domain', (c = 0), c FROM dom
UNION ALL SELECT 'ts_monotonic_by_event', (c = 0), c FROM mono
UNION ALL SELECT 'value_not_negative', (c = 0), c FROM neg
"""

    # ---- drift PSI (uniform baseline, fixed lo/hi) ----
    drift_sql = """
WITH hist AS (
  SELECT LEAST(GREATEST(CAST(FLOOR((CAST(l_quantity AS DOUBLE) - 1.0) / (50.0 / 32)) AS INT), 0), 31) AS bin,
         COUNT(*) AS cnt
  FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY 1),
tot AS (SELECT SUM(cnt) AS t FROM hist),
grid AS (SELECT CAST(range AS INT) AS bin FROM range(32)),
j AS (
  SELECT g.bin,
         GREATEST(COALESCE(h.cnt, 0) * 1.0 / (SELECT t FROM tot), 0.000001) AS a,
         GREATEST(1.0 / 32, 0.000001) AS b
  FROM grid g LEFT JOIN hist h ON g.bin = h.bin)
SELECT 'qty_psi' AS check_name,
       (ROUND(SUM((a - b) * LN(a / b)), 6) <= 0.05) AS passed,
       ROUND(SUM((a - b) * LN(a / b)), 6) AS psi
FROM j
"""

    # ---- constraint_alternation (no_consecutive over events) ----
    constraint_alternation_sql = """
WITH lagged AS (
  SELECT event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS p
  FROM events),
c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lagged
      WHERE p IS NOT NULL AND event_type = p)
SELECT 'no_repeat_event_type' AS check_name, (n = 0) AS passed,
       n AS violation_count
FROM c
"""

    # ---- drift JS (uniform baseline, fixed lo/hi) ----
    drift_js_sql = """
WITH hist AS (
  SELECT LEAST(GREATEST(CAST(FLOOR((CAST(l_quantity AS DOUBLE) - 1.0) / (50.0 / 32)) AS INT), 0), 31) AS bin,
         COUNT(*) AS cnt
  FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY 1),
tot AS (SELECT SUM(cnt) AS t FROM hist),
grid AS (SELECT CAST(range AS INT) AS bin FROM range(32)),
j AS (
  SELECT g.bin,
         GREATEST(COALESCE(h.cnt, 0) * 1.0 / (SELECT t FROM tot), 0.000001) AS a,
         GREATEST(1.0 / 32, 0.000001) AS b
  FROM grid g LEFT JOIN hist h ON g.bin = h.bin)
SELECT 'qty_js' AS check_name,
       (ROUND(SUM(0.5 * a * LN(a / ((a + b) / 2)) + 0.5 * b * LN(b / ((a + b) / 2))), 6) <= 0.02) AS passed,
       ROUND(SUM(0.5 * a * LN(a / ((a + b) / 2)) + 0.5 * b * LN(b / ((a + b) / 2))), 6) AS js
FROM j
"""

    # ---- drift KS (uniform baseline, fixed lo/hi, binned ECDFs) ----
    drift_ks_sql = """
WITH hist AS (
  SELECT LEAST(GREATEST(CAST(FLOOR((CAST(l_extendedprice AS DOUBLE) - 900.0) / (104100.0 / 64)) AS INT), 0), 63) AS bin,
         COUNT(*) AS cnt
  FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1),
tot AS (SELECT SUM(cnt) AS t FROM hist),
grid AS (SELECT CAST(range AS INT) AS bin FROM range(64)),
j AS (
  SELECT g.bin,
         COALESCE(h.cnt, 0) * 1.0 / (SELECT t FROM tot) AS frac,
         1.0 / 64 AS base_frac
  FROM grid g LEFT JOIN hist h ON g.bin = h.bin),
cdf AS (
  SELECT SUM(frac) OVER (ORDER BY bin) AS ca,
         SUM(base_frac) OVER (ORDER BY bin) AS cb
  FROM j)
SELECT 'price_ks' AS check_name,
       (ROUND(MAX(ABS(ca - cb)), 6) <= 0.1) AS passed,
       ROUND(MAX(ABS(ca - cb)), 6) AS ks
FROM cdf
"""

    # ---- drift_metrics (round-3 consolidation: PSI + JS + KS) ----
    drift_metrics_sql = f"""
SELECT check_name, passed, psi AS metric FROM ({drift_sql})
UNION ALL SELECT check_name, passed, js AS metric FROM ({drift_js_sql})
UNION ALL SELECT check_name, passed, ks AS metric FROM ({drift_ks_sql})
"""

    # ---- validate with AllFieldsFilled() (Validation.ecl:244-261) ----
    cust_cols = ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]
    allfilled = " AND ".join(
        f"(coalesce(trim(CAST({c} AS VARCHAR)), '') <> '')" for c in cust_cols
    )
    af_tests = [("AllFilled", f"({allfilled})"), ("BalPos", "c_acctbal >= 0")]
    af_names = ",\n         ".join(
        f"CASE WHEN ({t}) IS DISTINCT FROM TRUE THEN '{n}' END" for n, t in af_tests
    )
    af_cnt = " + ".join(
        f"(CASE WHEN ({t}) IS DISTINCT FROM TRUE THEN 1 ELSE 0 END)" for _, t in af_tests
    )
    validate_sql = validate_sql_template.format(
        name_cases=name_cases,
        cnt_cases=cnt_cases,
        af_names=af_names,
        af_cnt=af_cnt,
    )

    # ---- Swap() fix form (Validation.ecl:513-518) ----
    validate_fix_swap_sql = """
SELECT CASE WHEN (p_size <= 25) IS DISTINCT FROM TRUE THEN p_type ELSE p_brand END AS brand,
       COUNT(*) AS n
FROM part GROUP BY 1
"""

    # ---- similarity top-k ----
    similarity_sql = """
WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id IN (1, 2, 3)),
scored AS (
  SELECT q.qid AS query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(q.qv, e.embedding) AS cos
  FROM embeddings e, q WHERE e.vec_id <> q.qid),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn FROM scored)
SELECT query_id, neighbor_id, ROUND(cos, 4) AS cos, CAST(rn AS INT) AS rank FROM r WHERE rn <= 5
"""

    # ---- ann_ivf_topk (exact oracle: centroids are deterministic
    # seeded literals; every double fold replicated in Spark's exact
    # left-to-right order so cell assignment and cosine agree
    # bit-for-bit) ----
    from datapatterns_spark.operators.similarity import _random_centroids

    ivf_cents = _random_centroids(64, 16, 42)

    def _dot_lit(vec_col: str, weights: list[float]) -> str:
        # Spark: F.aggregate(zip_with(vec, lits, x*w), 0.0, s+x) — a
        # left fold; SQL + is left-associative, so the text below adds
        # in the identical order.  Literals go through a VARCHAR cast
        # (bare decimals parse as DECIMAL in DuckDB, not DOUBLE).
        terms = " + ".join(
            f"{vec_col}[{i + 1}]::DOUBLE * ('{w!r}'::DOUBLE)"
            for i, w in enumerate(weights)
        )
        return f"(0.0::DOUBLE + {terms})"

    def _cell_structs(vec_col: str) -> str:
        return ", ".join(
            f"{{'d': -({_dot_lit(vec_col, c)}), 'c': {i}}}"
            for i, c in enumerate(ivf_cents)
        )

    def _fold_cos(qv: str, cv: str) -> str:
        # ordered folds for dot and both norms (dedup.cosine parity)
        dot = (
            f"list_reduce(list_prepend(0.0::DOUBLE,"
            f" list_transform(generate_series(1, 64),"
            f" i -> {qv}[i]::DOUBLE * {cv}[i]::DOUBLE)), (s, x) -> s + x)"
        )
        na = (
            f"sqrt(list_reduce(list_prepend(0.0::DOUBLE,"
            f" list_transform(generate_series(1, 64),"
            f" i -> {qv}[i]::DOUBLE * {qv}[i]::DOUBLE)), (s, x) -> s + x))"
        )
        nb = (
            f"sqrt(list_reduce(list_prepend(0.0::DOUBLE,"
            f" list_transform(generate_series(1, 64),"
            f" i -> {cv}[i]::DOUBLE * {cv}[i]::DOUBLE)), (s, x) -> s + x))"
        )
        return f"({dot}) / (({na}) * ({nb}))"

    ann_ivf_sql = f"""
WITH cor AS MATERIALIZED (
  SELECT vec_id AS neighbor_id,
         list_sort([{_cell_structs("embedding")}])[1].c AS cell
  FROM embeddings),
qc AS MATERIALIZED (
  SELECT vec_id AS query_id,
         UNNEST(list_transform(list_sort([{_cell_structs("embedding")}])[1:8], s -> s.c)) AS cell
  FROM embeddings WHERE vec_id IN (1, 2, 3)),
pairs AS MATERIALIZED (
  SELECT DISTINCT q.query_id, c.neighbor_id
  FROM cor c JOIN qc q USING (cell) WHERE q.query_id <> c.neighbor_id),
scored AS (
  SELECT p.query_id, p.neighbor_id,
         ROUND({_fold_cos("qe.embedding", "ce.embedding")}, 6) AS cos
  FROM pairs p
  JOIN embeddings qe ON qe.vec_id = p.query_id
  JOIN embeddings ce ON ce.vec_id = p.neighbor_id),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn FROM scored)
SELECT query_id, neighbor_id, cos, CAST(rn AS INT) AS rank FROM r WHERE rn <= 5
"""

    # ---- profile_approx (deterministic columns of the approx path:
    # counts, rendered-string lengths, DECIMAL32_4 numeric moments) ----
    pa_parts = []
    for c in LI_NUMERIC:
        pa_parts.append(
            f"SELECT '{c}' AS attribute,"
            f" CASE WHEN {_NUM_FILLED.format(c=c)} THEN 1 ELSE 0 END AS fil,"
            f" CASE WHEN {_NUM_FILLED.format(c=c)}"
            f" THEN length(CAST({c} AS VARCHAR)) END AS len,"
            f" CASE WHEN {_NUM_FILLED.format(c=c)}"
            f" THEN CAST({c} AS DOUBLE) END AS v"
            f" FROM lineitem"
        )
    for c in LI_STRING:
        pa_parts.append(
            f"SELECT '{c}' AS attribute,"
            f" CASE WHEN {_STR_FILLED.format(c=c)} THEN 1 ELSE 0 END AS fil,"
            f" CASE WHEN {_STR_FILLED.format(c=c)}"
            f" THEN length(trim({c})) END AS len,"
            f" CAST(NULL AS DOUBLE) AS v FROM lineitem"
        )
    pa_parts.append(
        "SELECT 'l_shipdate' AS attribute,"
        " CASE WHEN l_shipdate IS NOT NULL THEN 1 ELSE 0 END AS fil,"
        " CASE WHEN l_shipdate IS NOT NULL"
        " THEN length(CAST(l_shipdate AS VARCHAR)) END AS len,"
        " CAST(NULL AS DOUBLE) AS v FROM lineitem"
    )
    profile_approx_sql = (
        "SELECT attribute, COUNT(*) AS rec_count,"
        " CAST(SUM(fil) AS BIGINT) AS fill_count,"
        " CAST(MIN(len) AS BIGINT) AS min_length,"
        " CAST(MAX(len) AS BIGINT) AS max_length,"
        " CAST(FLOOR(SUM(len) * 1.0 / SUM(fil)) AS BIGINT) AS ave_length,"
        " COALESCE(ROUND(MIN(v), 4), 0) AS numeric_min,"
        " COALESCE(ROUND(MAX(v), 4), 0) AS numeric_max,"
        " COALESCE(ROUND(AVG(v), 4), 0) AS numeric_mean,"
        " COALESCE(ROUND(SQRT(AVG(v * v) - AVG(v) * AVG(v)), 4), 0)"
        " AS numeric_std_dev"
        " FROM (" + " UNION ALL ".join(pa_parts) + ") GROUP BY attribute"
    )

    # ---- exact dedup ----
    norm = _NORM_SQL.format(v="text")
    dedup_exact_sql = f"""
SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id FROM documents GROUP BY {norm}
"""

    # ---- n-gram jaccard pairs ----
    ngram_sql = f"""
WITH norm AS (SELECT doc_id AS id, {norm} AS t FROM documents),
toks AS (SELECT id, string_split(t, ' ') AS tk FROM norm),
grams AS (
  SELECT id,
         CASE WHEN len(tk) >= 3
              THEN list_distinct(list_transform(range(1, len(tk) - 1),
                   i -> concat_ws(' ', tk[i], tk[i + 1], tk[i + 2])))
              ELSE [array_to_string(tk, ' ')] END AS g
  FROM toks),
sizes AS (SELECT id, len(g) AS sz FROM grams),
inv AS (SELECT id, UNNEST(g) AS gram FROM grams),
common AS (
  SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS common
  FROM inv a JOIN inv b ON a.gram = b.gram AND a.id < b.id
  GROUP BY 1, 2)
SELECT c.id_a, c.id_b,
       ROUND(c.common * 1.0 / (sa.sz + sb.sz - c.common), 6) AS jaccard
FROM common c JOIN sizes sa ON c.id_a = sa.id JOIN sizes sb ON c.id_b = sb.id
WHERE c.common * 1.0 / (sa.sz + sb.sz - c.common) >= 0.7
"""

    # ---- token counts ----
    text_tokens_sql = """
SELECT doc_id,
       CAST(CASE WHEN trim(coalesce(text, '')) = '' THEN 0
            ELSE len(string_split_regex(trim(coalesce(text, '')), '\\s+')) END AS INT) AS ws_tokens,
       CAST(len(regexp_extract_all(coalesce(text, ''), '[A-Za-z]+|[0-9]+|[^\\sA-Za-z0-9]')) AS INT) AS bpe_tokens
FROM documents
"""

    # ---- language id ----
    markers = {
        "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
        "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "sich", "auf"],
        "fr": ["le", "la", "les", "et", "est", "des", "une", "dans", "que", "pour"],
        "es": ["el", "la", "los", "de", "que", "y", "en", "un", "por", "con"],
        "it": ["il", "la", "di", "che", "e", "un", "per", "con", "del", "una"],
    }
    entries = ", ".join(
        "{neg: -len(list_filter(tk, x -> list_contains(["
        + ", ".join(f"'{w}'" for w in ws)
        + f"], x))), lang: '{lang}'}}"
        for lang, ws in markers.items()
    )
    langid_sql = f"""
WITH norm AS (SELECT doc_id, {norm} AS t FROM documents),
toks AS (SELECT doc_id, string_split(t, ' ') AS tk FROM norm),
scored AS (SELECT doc_id, list_sort([{entries}]) AS s FROM toks)
SELECT doc_id,
       CASE WHEN s[1].neg < 0 THEN s[1].lang ELSE 'und' END AS lang_guess
FROM scored
"""

    # ---- profile_correlations (all numeric pairs, both directions) ----
    pairs = [
        (x, y)
        for i, x in enumerate(LI_NUMERIC)
        for y in LI_NUMERIC[i + 1 :]
    ]
    corr_aggs = ", ".join(
        f"COALESCE(ROUND(ROUND(corr(CAST({x} AS DOUBLE), CAST({y} AS DOUBLE)), 6), 4), 0) AS c{i}"
        for i, (x, y) in enumerate(pairs)
    )
    corr_rows = " UNION ALL ".join(
        f"SELECT '{x}' AS attribute, '{y}' AS other, c{i} AS corr FROM a"
        f" UNION ALL SELECT '{y}', '{x}', c{i} FROM a"
        for i, (x, y) in enumerate(pairs)
    )
    correlations_sql = f"WITH a AS (SELECT {corr_aggs} FROM lineitem) {corr_rows}"

    # ---- profile_cardinality_breakdown (only when distinct <= 64) ----
    breakdown_sql = """
WITH vh AS (
  SELECT 'event_type' AS attribute, trim(event_type) AS value, COUNT(*) AS rec_count
  FROM events WHERE length(trim(coalesce(event_type, ''))) > 0 GROUP BY 2)
SELECT attribute, value, rec_count FROM vh QUALIFY COUNT(*) OVER () <= 64
"""

    # ---- validate_fix (assign + SkipRecord, conditions from original rows) ----
    validate_fix_sql = """
WITH fixed AS (
  SELECT CASE WHEN NOT coalesce(l_quantity <= 45, FALSE) THEN 45 ELSE l_quantity END AS q,
         l_extendedprice AS p
  FROM lineitem
  WHERE coalesce(l_discount <= 0.06, FALSE))
SELECT COUNT(*) AS n,
       ROUND(SUM(CAST(q AS DOUBLE)), 2) AS sum_qty,
       ROUND(SUM(CAST(p AS DOUBLE)), 2) AS sum_price
FROM fixed
"""

    # ---- validate_fixes (round-3 consolidation: fix + fix_swap) ----
    validate_fixes_sql = f"""
SELECT 'lineitem_fix' AS label, n, sum_qty, sum_price FROM ({validate_fix_sql})
UNION ALL
SELECT brand AS label, n, CAST(NULL AS DOUBLE) AS sum_qty,
       CAST(NULL AS DOUBLE) AS sum_price
FROM ({validate_fix_swap_sql})
"""

    # ---- benford digit 2 (full NthDigit rule incl. implied trailing zeros) ----
    ben2_cols = ["l_orderkey", "l_quantity", "l_extendedprice"]
    ben2_src = " UNION ALL ".join(
        f"SELECT {i + 1} AS ord, '{c}' AS attribute,"
        f" CASE WHEN length(sig) >= 2 THEN CAST(substr(sig, 2, 1) AS INT)"
        f" WHEN length(sig) > 0 THEN 0"
        f" WHEN contains(cleaned, '.') THEN 0 ELSE 10 END AS n"
        f" FROM (SELECT regexp_replace(replace(cleaned, '.', ''), '^0+', '') AS sig, cleaned"
        f" FROM (SELECT regexp_replace(CAST({c} AS VARCHAR), '[^0-9.]', '', 'g') AS cleaned"
        f" FROM lineitem))"
        for i, c in enumerate(ben2_cols)
    )
    exp2 = [12.0, 11.4, 10.9, 10.4, 10.0, 9.7, 9.3, 9.0, 8.8, 8.5]
    pct2 = ",\n       ".join(
        f"ROUND(SUM(CASE WHEN n = {d} THEN 1 ELSE 0 END) * 100.0 / COUNT(*), 1) AS {digit_names[d]}"
        for d in range(10)
    )
    chi2 = " + ".join(
        f"(({digit_names[d]} - {exp2[d]}) * ({digit_names[d]} - {exp2[d]}) / {exp2[d]})"
        for d in range(10)
    )
    exp2_vals = ", ".join(str(v) for v in exp2)
    benford2_sql = f"""
WITH src AS ({ben2_src}),
agg AS (
  SELECT ord, attribute,
       {pct2},
       COUNT(*) AS num_values
  FROM src WHERE n <> 10 GROUP BY ord, attribute),
withchi AS (
  SELECT attribute, zero, one, two, three, four, five, six, seven, eight, nine,
         ROUND({chi2}, 3) AS chi_squared, CAST(num_values AS BIGINT) AS num_values, ord
  FROM agg)
SELECT attribute, zero, one, two, three, four, five, six, seven, eight, nine, chi_squared, num_values
FROM (
  SELECT * FROM withchi
  UNION ALL
  SELECT '-- EXPECTED DIGIT 2 --', {exp2_vals},
         CAST(21.666 AS DOUBLE), (SELECT COUNT(*) FROM lineitem), 0
) ORDER BY ord
"""

    # ---- benford_digits (round-3 consolidation: digit 1 + digit 2) ----
    benford_digits_sql = f"""
SELECT *, 1 AS digit FROM ({benford_sql})
UNION ALL
SELECT *, 2 AS digit FROM ({benford2_sql})
"""

    # ---- text_quality (mirror quality_score arithmetic exactly) ----
    stoplist = ", ".join(
        f"'{w}'"
        for w in markers["en"] + ["a", "an", "as", "at", "be", "by", "on", "or"]
    )
    text_quality_sql = f"""
WITH base AS (
  SELECT doc_id, coalesce(text, '') AS t, {norm} AS nt FROM documents),
m AS (
  SELECT doc_id,
         length(t) AS n,
         length(regexp_replace(t, '[^A-Za-z]', '', 'g')) AS alpha,
         length(regexp_replace(t, '[^[:punct:]]', '', 'g')) AS punct,
         CASE WHEN trim(t) = '' THEN 0
              ELSE len(string_split_regex(trim(t), '\\s+')) END AS words,
         len(list_filter(string_split(nt, ' '), x -> list_contains([{stoplist}], x))) AS stop
  FROM base)
SELECT doc_id,
  ROUND(
    0.3 * (CASE WHEN n >= 20 AND n <= 8000 THEN 1.0 WHEN n > 0 THEN 0.4 ELSE 0.0 END)
    + 0.25 * (CASE WHEN n > 0 THEN alpha * 1.0 / n ELSE 0.0 END)
    + 0.15 * (CASE WHEN n > 0 THEN 1.0 - LEAST(punct * 1.0 / n * 4, 1.0) ELSE 0.0 END)
    + 0.15 * (CASE WHEN words > 0 THEN LEAST(stop * 1.0 / words * 5, 1.0) ELSE 0.0 END)
    + 0.15 * (CASE WHEN words > 0 AND n * 1.0 / words >= 3 AND n * 1.0 / words <= 12
              THEN 1.0 ELSE 0.3 END),
  4) AS quality
FROM m
"""

    # ---- text_annotate (round-3 consolidation: tokens + langid +
    # quality + fingerprint, joined per doc) ----
    text_annotate_sql = f"""
WITH tt AS MATERIALIZED ({text_tokens_sql}),
tl AS MATERIALIZED ({langid_sql}),
tq AS MATERIALIZED ({text_quality_sql}),
tf AS MATERIALIZED ({text_fp_sql})
SELECT tt.doc_id, tt.ws_tokens, tt.bpe_tokens, tl.lang_guess, tq.quality, tf.fp
FROM tt
JOIN tl ON tl.doc_id = tt.doc_id
JOIN tq ON tq.doc_id = tt.doc_id
JOIN tf ON tf.doc_id = tt.doc_id
"""

    # ---- curate_documents: composed quality/langid/dedup/redact ----
    _cu_hash = xxh64_str_sql(
        "documents", ["doc_id"], norm, out="k", cte_prefix="cu"
    )
    _cu_pii_total = " + ".join(
        f"length(regexp_extract_all(t, '{PII_PATTERNS[k]}'))"
        for k in _pii_order
    )
    curate_documents_sql = f"""
WITH cq AS MATERIALIZED ({text_quality_sql}),
cl AS MATERIALIZED ({langid_sql}),
ch AS MATERIALIZED ({_cu_hash}),
cb AS MATERIALIZED (
  SELECT d.doc_id, cl.lang_guess, cq.quality, COALESCE(d.text, '') AS t, ch.k
  FROM documents d
  JOIN cq ON cq.doc_id = d.doc_id
  JOIN cl ON cl.doc_id = d.doc_id
  JOIN ch ON ch.doc_id = d.doc_id
  WHERE cq.quality >= 0.2 AND cl.lang_guess IN ('en', 'de', 'fr')),
ck AS (SELECT k, MIN(doc_id) AS canon FROM cb GROUP BY k)
SELECT cb.doc_id, cb.lang_guess, cb.quality,
       CAST({_cu_pii_total} AS INT) AS pii_total,
       {_red_expr} AS text
FROM cb JOIN ck ON cb.k = ck.k AND cb.doc_id = ck.canon
"""


    # ---- embedding cosine near-dup pairs (brute baseline) ----
    dedup_embedding_sql = """
WITH p AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         ROUND(list_cosine_similarity(a.embedding, b.embedding), 6) AS cos6
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
SELECT id_a, id_b FROM p WHERE cos6 >= 0.45
"""

    # ---- normalize_profile (integer-stat keys only; exact strings) ----
    np_stats = " UNION ALL ".join(
        f"SELECT '{c}' AS attribute, COUNT(*) AS rec_count,"
        f" SUM(CASE WHEN length(trim(coalesce({c}, ''))) > 0 THEN 1 ELSE 0 END) AS fill_count,"
        f" COUNT(DISTINCT CASE WHEN length(trim(coalesce({c}, ''))) > 0 THEN trim({c}) END) AS cardinality,"
        f" MIN(CASE WHEN length(trim(coalesce({c}, ''))) > 0 THEN length(trim({c})) END) AS min_length,"
        f" MAX(CASE WHEN length(trim(coalesce({c}, ''))) > 0 THEN length(trim({c})) END) AS max_length,"
        f" CAST(FLOOR(SUM(CASE WHEN length(trim(coalesce({c}, ''))) > 0 THEN length(trim({c})) END) * 1.0"
        f" / SUM(CASE WHEN length(trim(coalesce({c}, ''))) > 0 THEN 1 ELSE 0 END)) AS BIGINT) AS ave_length"
        f" FROM documents"
        for c in ["lang", "source"]
    )
    np_melt = " UNION ALL ".join(
        f"SELECT attribute, '{k}' AS key, CAST({k} AS VARCHAR) AS value FROM s"
        for k in ["rec_count", "fill_count", "cardinality", "min_length", "max_length", "ave_length"]
    )
    normalize_profile_sql = f"WITH s AS ({np_stats}) {np_melt}"

    # ---- profile_compare (profile-vs-profile diff triples) ----
    def _np_side(where: str) -> str:
        return " UNION ALL ".join(
            f"SELECT '{c}' AS attribute, COUNT(*) AS rec_count,"
            f" SUM(CASE WHEN length(trim(coalesce({c}, ''))) > 0 THEN 1 ELSE 0 END) AS fill_count,"
            f" MIN(CASE WHEN length(trim(coalesce({c}, ''))) > 0 THEN length(trim({c})) END) AS min_length,"
            f" MAX(CASE WHEN length(trim(coalesce({c}, ''))) > 0 THEN length(trim({c})) END) AS max_length,"
            f" CAST(FLOOR(SUM(CASE WHEN length(trim(coalesce({c}, ''))) > 0 THEN length(trim({c})) END) * 1.0"
            f" / SUM(CASE WHEN length(trim(coalesce({c}, ''))) > 0 THEN 1 ELSE 0 END)) AS BIGINT) AS ave_length"
            f" FROM documents{where}"
            for c in ["lang", "source"]
        )

    _cmp_keys = ["rec_count", "fill_count", "min_length", "max_length", "ave_length"]
    _cmp_melt = " UNION ALL ".join(
        f"SELECT attribute, '{k}' AS key, CAST({k} AS VARCHAR) AS value FROM {{side}}"
        for k in _cmp_keys
    )
    profile_compare_sql = f"""
WITH so AS ({_np_side('')}),
     sn AS ({_np_side(" WHERE lang <> 'en'")}),
     mo AS ({_cmp_melt.format(side='so')}),
     mn AS ({_cmp_melt.format(side='sn')})
SELECT COALESCE(mo.attribute, mn.attribute) AS attribute,
       COALESCE(mo.key, mn.key) AS key,
       mo.value AS value_old,
       mn.value AS value_new,
       (mo.value IS DISTINCT FROM mn.value) AS changed
FROM mo FULL OUTER JOIN mn ON mo.attribute = mn.attribute AND mo.key = mn.key
"""

    # ---- profile_normalize_compare (round-3 consolidation:
    # normalize_profile triples + profile-vs-profile diff) ----
    profile_normalize_compare_sql = f"""
SELECT 'profile' AS part, attribute, key, value AS value_old,
       CAST(NULL AS VARCHAR) AS value_new, CAST(NULL AS BOOLEAN) AS changed
FROM ({normalize_profile_sql})
UNION ALL
SELECT 'compare', attribute, key, value_old, value_new, changed
FROM ({profile_compare_sql})
"""

    # ---- profile_incremental (merge of per-partition states must
    # equal the whole-table statistics exactly) ----
    incr_src = " UNION ALL ".join(
        [
            # given-numeric: filled = non-null & non-zero; len = digit
            # count of the integer rendering; numeric reading = native
            f"SELECT '{c}' AS attribute,"
            f" ({c} IS NOT NULL AND {c} <> 0) AS fil,"
            f" length(CAST({c} AS VARCHAR)) AS len,"
            f" CASE WHEN {c} IS NOT NULL AND {c} <> 0 THEN CAST({c} AS DOUBLE) END AS v"
            f" FROM orders"
            for c in ["o_orderkey", "o_custkey"]
        ]
        + [
            # string: filled = non-empty trimmed; numeric reading =
            # try_cast of the trimmed value (letters -> NULL)
            "SELECT 'o_orderstatus' AS attribute,"
            " length(trim(coalesce(o_orderstatus, ''))) > 0 AS fil,"
            " length(trim(coalesce(o_orderstatus, ''))) AS len,"
            " TRY_CAST(trim(o_orderstatus) AS DOUBLE) AS v"
            " FROM orders"
        ]
    )
    profile_incremental_sql = f"""
WITH src AS ({incr_src})
SELECT attribute,
       COUNT(*) AS rec_count,
       CAST(SUM(CASE WHEN fil THEN 1 ELSE 0 END) AS BIGINT) AS fill_count,
       ROUND(SUM(CASE WHEN fil THEN 1 ELSE 0 END) * 100.0 / COUNT(*), 6) AS fill_rate,
       COALESCE(MIN(CASE WHEN fil THEN len END), 0) AS min_length,
       COALESCE(MAX(CASE WHEN fil THEN len END), 0) AS max_length,
       COALESCE(CAST(FLOOR(SUM(CASE WHEN fil THEN len END) * 1.0
         / SUM(CASE WHEN fil THEN 1 ELSE 0 END)) AS BIGINT), 0) AS ave_length,
       ROUND(MIN(CASE WHEN fil THEN v END), 4) AS nmin,
       ROUND(MAX(CASE WHEN fil THEN v END), 4) AS nmax,
       ROUND(SUM(CASE WHEN fil THEN v END) / COUNT(CASE WHEN fil THEN v END), 4) AS nmean,
       ROUND(SQRT(SUM(CASE WHEN fil THEN v * v END) / COUNT(CASE WHEN fil THEN v END)
         - (SUM(CASE WHEN fil THEN v END) / COUNT(CASE WHEN fil THEN v END))
         * (SUM(CASE WHEN fil THEN v END) / COUNT(CASE WHEN fil THEN v END))), 4) AS nstd
FROM src GROUP BY attribute
"""

    # ---- profile_quantile_sketch ----
    # The t-digest itself has no tractable SQL re-derivation, so the
    # Spark side outputs MEASURED verdicts (exact rank of each merged
    # estimate against the data, bucketed to the nearest 0.25; KS at
    # its analytic extremes) and the oracle pins the expected verdict
    # grid: val == q for every row.  A sketch violating its rank-error
    # contract (or a drift KS off its analytic value) hash-mismatches.
    pqs_rows = [
        f"SELECT 'rank' AS part, '{a}' AS attribute, CAST({q} AS DOUBLE) AS q,"
        f" CAST({q} AS DOUBLE) AS val"
        for a in ["o_orderkey", "o_custkey", "o_totalprice"]
        for q in [0.25, 0.5, 0.75]
    ] + [
        "SELECT 'drift_same', 'o_totalprice', CAST(0.0 AS DOUBLE),"
        " CAST(0.0 AS DOUBLE)",
        "SELECT 'drift_far', 'o_totalprice', CAST(1.0 AS DOUBLE),"
        " CAST(1.0 AS DOUBLE)",
    ] + [
        # structural pins (round 5): every merged digest must report
        # in-band centroid count and exact wire-format size
        f"SELECT '{part}', '{a}', CAST(1.0 AS DOUBLE), CAST(1.0 AS DOUBLE)"
        for a in ["o_orderkey", "o_custkey", "o_totalprice"]
        for part in ["centroids", "sketch_bytes"]
    ]
    profile_quantile_sketch_sql = " UNION ALL ".join(pqs_rows)

    # ---- streaming_state ----
    # Batch twins of the two streaming sinks: the rolling merged
    # profile equals a whole-table pass (same melt as
    # profile_incremental, over documents), and the dedup store's
    # fingerprint counts equal the corpus's distinct normalized-text
    # count.  Every pinned number is micro-batch-order independent, so
    # the oracle needs no knowledge of the stream's file split.
    _ss_norm = _NORM_SQL.format(v="text")
    ss_src = " UNION ALL ".join(
        [
            f"SELECT '{c}' AS attribute,"
            f" ({c} IS NOT NULL AND {c} <> 0) AS fil,"
            f" length(CAST({c} AS VARCHAR)) AS len,"
            f" CASE WHEN {c} IS NOT NULL AND {c} <> 0"
            f" THEN CAST({c} AS DOUBLE) END AS v"
            f" FROM documents"
            for c in ["doc_id", "n_chars"]
        ]
        + [
            "SELECT 'lang' AS attribute,"
            " length(trim(coalesce(lang, ''))) > 0 AS fil,"
            " length(trim(coalesce(lang, ''))) AS len,"
            " TRY_CAST(trim(lang) AS DOUBLE) AS v"
            " FROM documents"
        ]
    )
    ss_stats = {
        "rec_count": "CAST(COUNT(*) AS DOUBLE)",
        "fill_count": "CAST(SUM(CASE WHEN fil THEN 1 ELSE 0 END) AS DOUBLE)",
        "fill_rate": "CAST(ROUND(SUM(CASE WHEN fil THEN 1 ELSE 0 END)"
                     " * 100.0 / COUNT(*), 6) AS DOUBLE)",
        "min_length": "CAST(COALESCE(MIN(CASE WHEN fil THEN len END), 0)"
                      " AS DOUBLE)",
        "max_length": "CAST(COALESCE(MAX(CASE WHEN fil THEN len END), 0)"
                      " AS DOUBLE)",
        "ave_length": "CAST(COALESCE(CAST(FLOOR(SUM(CASE WHEN fil THEN len"
                      " END) * 1.0 / SUM(CASE WHEN fil THEN 1 ELSE 0 END))"
                      " AS BIGINT), 0) AS DOUBLE)",
        "nmin": "CAST(ROUND(MIN(CASE WHEN fil THEN v END), 4) AS DOUBLE)",
        "nmax": "CAST(ROUND(MAX(CASE WHEN fil THEN v END), 4) AS DOUBLE)",
        "nmean": "CAST(ROUND(SUM(CASE WHEN fil THEN v END)"
                 " / COUNT(CASE WHEN fil THEN v END), 4) AS DOUBLE)",
        "nstd": "CAST(ROUND(SQRT(SUM(CASE WHEN fil THEN v * v END)"
                " / COUNT(CASE WHEN fil THEN v END)"
                " - (SUM(CASE WHEN fil THEN v END)"
                " / COUNT(CASE WHEN fil THEN v END))"
                " * (SUM(CASE WHEN fil THEN v END)"
                " / COUNT(CASE WHEN fil THEN v END))), 4) AS DOUBLE)",
    }
    ss_melt = " UNION ALL ".join(
        f"SELECT 'profile' AS part, attribute, '{s}' AS stat,"
        f" {expr} AS val FROM ss_rows GROUP BY attribute"
        for s, expr in ss_stats.items()
    )
    streaming_state_sql = f"""
WITH ss_rows AS ({ss_src})
SELECT * FROM ({ss_melt})
UNION ALL
SELECT 'dedup', 'store', 'store_rows',
       CAST((SELECT COUNT(*) FROM (SELECT DISTINCT {_ss_norm}
             FROM documents)) AS DOUBLE)
UNION ALL
SELECT 'dedup', 'store', 'n_unique_fp',
       CAST((SELECT COUNT(*) FROM (SELECT DISTINCT {_ss_norm}
             FROM documents)) AS DOUBLE)
UNION ALL
SELECT 'dedup', 'decisions', 'n_docs',
       CAST((SELECT COUNT(*) FROM documents) AS DOUBLE)
"""

    return {
        "profile_fill_lengths": profile_fill_lengths_sql,
        "profile_numeric_stats": profile_numeric,
        "profile_cardinality": profile_cardinality,
        "profile_modes": profile_modes,
        "profile_patterns": profile_patterns,
        "profile_best_type": profile_best_type,
        "cardinality_histogram": cardinality_histogram,
        "benford_digits": benford_digits_sql,
        "benford_stock": benford_stock_sql,
        "validate_rules": validate_sql,
        "constraint_verdicts": constraint_sql,
        "drift_metrics": drift_metrics_sql,
        "constraint_alternation": constraint_alternation_sql,
        "validate_fixes": validate_fixes_sql,
        "similarity_topk": similarity_sql,
        "dedup_exact": dedup_exact_sql,
        "dedup_ngram_jaccard": ngram_sql,
        "text_annotate": text_annotate_sql,
        "profile_correlations": correlations_sql,
        "profile_cardinality_breakdown": breakdown_sql,
        "dedup_embedding_cosine": dedup_embedding_sql,
        "profile_normalize_compare": profile_normalize_compare_sql,
        "profile_incremental": profile_incremental_sql,
        "profile_quantile_sketch": profile_quantile_sketch_sql,
        "streaming_state": streaming_state_sql,
        "best_record_structure": best_record_sql,
        "apply_best_types": apply_best_types_sql,
        "sample_stratified": sample_stratified_sql,
        "dedup_spans": dedup_spans_sql,
        "dedup_spans_winnow": dedup_spans_winnow_sql,
        "dedup_components": dedup_components_sql,
        "dedup_conversations": dedup_conversations_sql,
        "dedup_incremental": dedup_incremental_sql,
        "dedup_incremental_minhash": dedup_incremental_minhash_sql,
        "winnow": winnow_sql,
        "multimodal_transform": multimodal_transform_sql,
        "multimodal_real": multimodal_real_sql,
        "text_redact": text_redact_sql,
        "text_repetition": text_repetition_sql,
        "text_lm_score": text_lm_score_sql,
        "text_contamination": text_contamination_sql,
        "embedding_transform": embedding_transform_sql,
        "pack_sequences": pack_sequences_sql,
        "curate_documents": curate_documents_sql,
        "dedup_simhash": simhash_sql,
        "dedup_minhash_lsh": minhash_sql,
        "ann_ivf_topk": ann_ivf_sql,
        "profile_approx": profile_approx_sql,
        "transcript_suite": transcript_suite_oracle,
        "verdicts_per_partition": verdicts_per_partition_sql,
    }
