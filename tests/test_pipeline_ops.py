"""Tests for the training-data pipeline operators: dedup families,
similarity search, text analysis, multimodal plumbing."""

import pytest
from pyspark.sql import functions as F

from datapatterns_spark.operators import dedup as D
from datapatterns_spark.operators import similarity as S
from datapatterns_spark.operators import textanalysis as TA
from datapatterns_spark.operators.multimodal import (
    extract_features,
    make_fake_media_table,
    sample_frames,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "The quick brown fox jumps over the lazy dog"),
        (2, "The quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "the quick brown fox JUMPS over the lazy dog!!"),  # normalized dup
        (4, "The quick brown fox jumps over the sleepy dog"),  # near dup
        (5, "Completely different content about spark engines"),
        (6, "der schnelle braune fuchs springt und ist nicht da"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(spark, docs):
    dups = D.exact_duplicates(docs, "text", "doc_id").collect()
    ids = {r["doc_id"] for r in dups}
    assert ids == {1, 2, 3}
    assert all(r["canonical_id"] == 1 and r["group_size"] == 3 for r in dups)
    kept = D.dedup_exact(docs, "text", "doc_id").select("doc_id").collect()
    assert {r["doc_id"] for r in kept} == {1, 4, 5, 6}


def test_ngram_jaccard_pairs(spark, docs):
    pairs = D.ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.5).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    # exact dups have jaccard 1.0; near-dup 1<->4 shares most shingles
    assert (1, 2) in got and (1, 3) in got and (2, 3) in got
    assert (1, 4) in got
    assert not any(5 in p or 6 in p for p in got)
    j = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert j[(1, 2)] == 1.0


def test_minhash_lsh_pairs(spark, docs):
    pairs = D.minhash_lsh_pairs(docs, "text", "doc_id", n=3, threshold=0.5).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in got and (1, 3) in got
    # verification step guarantees no false positives
    j = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert all(v >= 0.5 for v in j.values())


def test_minhash_lsh_hot_bucket_emits_linear_star_edges(spark):
    """A planted hot bucket (one boilerplate cluster of n identical
    docs — every band hashes them to the same bucket) must emit O(n)
    anchor-star pairs, not C(n, 2): the round-1 scale killer.  With
    identical texts every star pair survives Jaccard verification, so
    the output is exactly n-1 rows anchored at the minimum id, and the
    cluster stays fully connected for connected_components."""
    n = 3000
    cap = 100
    rows = [(i, "the same boilerplate page text repeated verbatim " * 4)
            for i in range(n)]
    # a couple of unrelated docs in buckets under the cap keep the
    # all-pairs path exercised in the same run
    rows += [(n + 1, "completely different content about gardens and rivers"),
             (n + 2, "completely different content about gardens and rivers")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    m: dict = {}
    pairs = D.minhash_lsh_pairs(
        df, "text", "doc_id", n=3, threshold=0.8, bucket_cap=cap, metrics=m
    ).collect()
    hot = {(r["id_a"], r["id_b"]) for r in pairs if r["id_b"] <= n}
    assert hot == {(0, i) for i in range(1, n)}  # star at min id, O(n)
    assert (n + 1, n + 2) in {(r["id_a"], r["id_b"]) for r in pairs}
    # cap observability: identical docs share every band's bucket ->
    # 16 capped buckets, each dropping C(n,2)-(n-1) all-pairs edges;
    # candidates = n-1 star pairs + the one under-cap pair
    assert m["capped_buckets"] == 16
    assert m["cap_dropped_pairs"] == 16 * (n * (n - 1) // 2 - (n - 1))
    assert m["candidate_pairs"] == (n - 1) + 1


def test_simhash_pairs(spark, docs):
    pairs = D.simhash_pairs(docs, "text", "doc_id", max_hamming=8).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in got and (1, 3) in got  # identical normalized text: distance 0
    h = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    assert h[(1, 2)] == 0
    assert not any((a == 5 or b == 5) for a, b in got)


def test_minhash_lsh_recall_vs_exact(spark):
    """Measured approximation quality of the LSH scale path on real
    testdata: against exact all-pairs n-gram Jaccard at the same
    threshold, the verified-LSH output must (a) be a SUBSET (the exact-
    Jaccard verification allows no false positives) and (b) recall the
    theoretical S-curve floor — at J=0.7 with 16 bands x 4 rows,
    P(candidate) = 1-(1-0.7^4)^16 ~ 0.99."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    exact = {
        (r["id_a"], r["id_b"])
        for r in D.ngram_jaccard_pairs(
            docs, "text", "doc_id", threshold=0.7
        ).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in D.minhash_lsh_pairs(
            docs, "text", "doc_id", threshold=0.7
        ).collect()
    }
    assert exact, "fixture should contain near-dup pairs"
    assert lsh <= exact  # no false positives
    assert len(lsh) / len(exact) >= 0.8  # S-curve recall floor


def test_embedding_pairs_brute_vs_lsh(spark):
    import random

    rng = random.Random(7)
    base = [rng.gauss(0, 1) for _ in range(16)]
    near = [x + rng.gauss(0, 0.01) for x in base]
    far = [rng.gauss(0, 1) for _ in range(16)]
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "vec_id long, embedding array<float>"
    )
    brute = D.embedding_cosine_pairs(df, "embedding", "vec_id", 0.99, method="brute").collect()
    assert {(r["id_a"], r["id_b"]) for r in brute} == {(1, 2)}
    lsh = D.embedding_cosine_pairs(df, "embedding", "vec_id", 0.99, method="lsh").collect()
    assert {(r["id_a"], r["id_b"]) for r in lsh} == {(1, 2)}


def test_similarity_topk_real_embeddings(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.limit(3)
    exact = S.brute_force_topk(emb, queries, k=5)
    rows = exact.collect()
    assert len(rows) == 15
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r["cos"])
    for q, sims in by_q.items():
        assert sorted(sims, reverse=True) == sims  # ranked desc
    # IVF recall vs brute force
    approx = S.ivf_topk(emb, queries, k=5, n_cells=8, n_probe=4)
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in rows}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5  # n_probe=4 of 8 cells


def test_ivf_refined_centroids_deterministic_and_balanced(spark):
    """The Lloyd refinement sweep must (a) be a pure function of
    (data, seed) — repeated runs plan identical literal centroids, so
    IVF results are reproducible — and (b) not worsen cell balance vs
    raw random centroids (hot cells are the scale hazard: a cell
    holding half the corpus makes every probe that touches it a
    half-corpus scan)."""
    from datapatterns_spark.operators.similarity import (
        _nearest_cells,
        _random_centroids,
        _refined_centroids,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    kw = dict(vec_col="embedding", id_col="vec_id", dim=64, n_cells=8, seed=42)
    c1 = _refined_centroids(emb, sweeps=1, **kw)
    c2 = _refined_centroids(emb, sweeps=1, **kw)
    assert c1 == c2  # deterministic
    raw = _random_centroids(64, 8, 42)
    assert c1 != raw  # the sweep actually moved the centroids

    def max_cell_share(cents):
        sizes = (
            emb.select(
                _nearest_cells(F.col("embedding"), cents, 1)[0].alias("cell")
            )
            .groupBy("cell")
            .count()
            .collect()
        )
        total = sum(r["count"] for r in sizes)
        return max(r["count"] for r in sizes) / total

    assert max_cell_share(c1) <= max_cell_share(raw) + 0.02


def test_ivf_refined_recall_not_worse(spark):
    """Refined IVF (library default refine_sweeps=1) must recall at
    least as much of the brute-force top-k as the unrefined seeded
    centroids on real testdata embeddings."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.limit(5)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in S.brute_force_topk(emb, queries, k=5).collect()
    }

    def recall(sweeps):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in S.ivf_topk(
                emb, queries, k=5, n_cells=8, n_probe=4, refine_sweeps=sweeps
            ).collect()
        }
        return len(exact & got) / len(exact)

    r0, r1 = recall(0), recall(1)
    assert r1 >= r0 - 0.04  # refinement must not cost recall
    assert r1 >= 0.5


def test_repetition_stats_differential(spark):
    """Gopher repetition measures vs a pure-Python Counter model on
    planted boilerplate, clean prose, and edge cases."""
    import re
    from collections import Counter

    def norm(t):
        t = re.sub(r"[^\w\s]", " ", t.lower())
        return re.sub(r"\s+", " ", t).strip()

    def model(t):
        lines = [l for l in (t or "").split("\n") if l.strip()]
        if lines:
            dlf = (len(lines) - len(set(lines))) / len(lines)
            lc = Counter(lines)
            total = sum(len(l) for l in lines)
            single = sum(len(l) for l, c in lc.items() if c == 1)
            dlcf = (total - single) / total if total else 0.0
        else:
            dlf = dlcf = 0.0
        nt = norm(t or "")
        toks = nt.split(" ") if nt else []
        grams = [" ".join(toks[i:i + 2]) for i in range(len(toks) - 1)]
        if grams and nt:
            gc = Counter(grams)
            cnt, g = max((c, g) for g, c in gc.items())
            tnf = cnt * len(g) / len(nt)
        else:
            tnf = 0.0
        return (round(dlf, 6), round(dlcf, 6), round(tnf, 6))

    rows = [
        (1, "buy now\nbuy now\nbuy now\nunique line"),
        (2, "clean prose line one\nclean prose line two\nfinal thought"),
        (3, "spam spam spam spam spam"),
        (4, ""),
        (5, None),
        (6, "a\n\n a \nb\nb"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["dup_line_frac"], r["dup_line_char_frac"],
                         r["top_ngram_char_frac"])
           for r in TA.repetition_stats(df).collect()}
    for i, t in rows:
        want = model(t)
        assert all(abs(a - b) < 1e-6 for a, b in zip(got[i], want)), (
            f"doc {i}: got {got[i]} want {want}"
        )
    # the boilerplate doc is flagged, the clean one is not
    assert got[1][0] >= 0.5 and got[2][0] == 0.0
    assert got[3][2] > 0.5
    # map-only plan: no shuffle, no Python
    plan = (
        TA.repetition_stats(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_contamination_check(spark):
    """Corpus docs sharing an n-gram with the eval set are flagged
    with the distinct shared-gram count; clean docs are absent; the
    corpus is never shuffled (broadcast join + match-only agg)."""
    eval_text = ("the quick brown fox jumps over the lazy dog near the "
                 "river bank at dawn")
    corpus = spark.createDataFrame(
        [
            (1, "intro words then " + eval_text + " and a conclusion"),
            (2, "totally unrelated content about trains and stations"),
            (3, eval_text),  # verbatim copy
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, eval_text)], "eval_id long, text string"
    )
    out = {(r["doc_id"], r["eval_id"]): r["shared_grams"]
           for r in TA.contamination_check(corpus, ev, n=5).collect()}
    assert (2, 100) not in out
    assert out[(3, 100)] == 15 - 5 + 1  # all 11 distinct 5-grams
    assert out[(1, 100)] >= 11  # contains the eval text wholly
    plan = (
        TA.contamination_check(corpus, ev, n=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_redact_pii(spark):
    rows = [
        (1, "mail me at bob.smith+x@example.co.uk or call 555-123-4567"),
        (2, "ssn 123-45-6789 from host 10.0.255.3"),
        (3, "nothing sensitive here"),
        (4, None),
        (5, "two mails: a@b.io c@d.org"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r["id"]: r for r in TA.redact_pii(df).collect()}
    assert out[1]["n_email"] == 1 and out[1]["n_phone"] == 1
    assert out[1]["redacted"] == "mail me at [EMAIL] or call [PHONE]"
    assert out[2]["n_ssn"] == 1 and out[2]["n_ipv4"] == 1
    assert out[2]["redacted"] == "ssn [SSN] from host [IPV4]"
    assert out[3]["pii_total"] == 0 and out[3]["redacted"] == rows[2][1]
    assert out[4]["pii_total"] == 0 and out[4]["redacted"] == ""
    assert out[5]["n_email"] == 2 and out[5]["pii_total"] == 2
    assert out[5]["redacted"] == "two mails: [EMAIL] [EMAIL]"
    # map-only: no shuffle, no Python in the plan
    plan = (
        TA.redact_pii(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_embedding_normalize_quantize(spark):
    """L2 normalization yields unit vectors (zero vectors untouched);
    int8 quantize/dequantize round-trips within scale/2 per component;
    both plans are map-only."""
    from datapatterns_spark.operators.embeddings import (
        dequantize_embeddings,
        l2_norm,
        normalize_embeddings,
        quantize_embeddings,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    normed = normalize_embeddings(emb)
    for r in normed.select(l2_norm(F.col("embedding_unit")).alias("n")).collect():
        assert abs(r["n"] - 1.0) < 1e-9
    zero = spark.createDataFrame(
        [(1, [0.0] * 4)], "vec_id long, embedding array<float>"
    )
    zr = normalize_embeddings(zero).collect()[0]
    assert zr["embedding_unit"] == [0.0, 0.0, 0.0, 0.0]

    q = quantize_embeddings(emb)
    rows = dequantize_embeddings(q).select(
        "embedding", "embedding_deq", "scale", "codes"
    ).collect()
    for r in rows:
        assert all(abs(c) <= 127 for c in r["codes"])
        for x, xd in zip(r["embedding"], r["embedding_deq"]):
            assert abs(float(x) - xd) <= r["scale"] / 2 + 1e-12
    plan = (
        dequantize_embeddings(quantize_embeddings(normalize_embeddings(emb)))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_curate_documents(spark):
    """Composed curation: quality+language gates, exact dedup keeps
    the min-id survivor among FILTERED rows, redaction scrubs the
    surviving text."""
    from datapatterns_spark.operators.curation import curate_documents

    good = ("the cat and the dog sat in the house and it was good "
            "for all of them to be there that day")
    rows = [
        (1, good),
        (2, good + "!"),                      # same normalized text as 1
        (3, "der hund und die katze sind nicht in das haus mit auf"),
        (4, "zz@@##"),                        # low quality
        (5, good + " mail me a@b.io today"),  # survives, PII
        (6, "le chat est dans la maison et il est des une que pour"),  # fr
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in curate_documents(
        df, min_quality=0.3, languages=["en", "de"], redact=True
    ).collect()}
    assert set(out) == {1, 3, 5}  # 2 deduped onto 1, 4 low-q, 6 fr
    assert out[1]["lang_guess"] == "en" and out[3]["lang_guess"] == "de"
    assert out[5]["pii_total"] == 1 and "[EMAIL]" in out[5]["text"]
    assert out[1]["pii_total"] == 0

    # repetition gate: a boilerplate doc (one phrase repeated) drops
    # while normal prose survives
    rep_rows = [
        (1, good),
        (2, "the cat and " * 30),  # top-2-gram coverage ~1
    ]
    rdf = spark.createDataFrame(rep_rows, "doc_id long, text string")
    kept = {r["doc_id"] for r in curate_documents(
        rdf, max_top_ngram_char_frac=0.3, dedup=None
    ).collect()}
    assert kept == {1}


def test_pack_sequences(spark):
    """Concat-and-chunk packing: token totals conserved, every
    non-final pack per shard holds exactly max_tokens, output
    deterministic under any input partitioning."""
    from datapatterns_spark.operators.packing import pack_sequences

    rows = [(i, " ".join(["w"] * (1 + (i * 37) % 90))) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_sequences(df, max_tokens=128, n_shards=4)
    got = out.collect()
    total_in = sum(1 + (i * 37) % 90 for i in range(200))
    assert sum(r["n_tokens"] for r in got) == total_in
    by_pack = {}
    for r in got:
        by_pack.setdefault((r["shard"], r["pack"]), 0)
        by_pack[(r["shard"], r["pack"])] += r["n_tokens"]
    last = {s: max(p for (sh, p) in by_pack if sh == s)
            for s in {sh for sh, _ in by_pack}}
    for (s, p), tot in by_pack.items():
        if p != last[s]:
            assert tot == 128, (s, p, tot)
        else:
            assert 0 < tot <= 128
    # spans within each document are contiguous from 0
    spans = {}
    for r in got:
        spans.setdefault(r["doc_id"], []).append((r["tok_start"], r["n_tokens"]))
    for doc, ss in spans.items():
        ss.sort()
        assert ss[0][0] == 0
        for (a, n), (a2, _) in zip(ss, ss[1:]):
            assert a + n == a2
    # deterministic under repartitioning
    got2 = pack_sequences(df.repartition(13), max_tokens=128, n_shards=4).collect()
    key = lambda r: (r["shard"], r["pack"], r["doc_id"], r["tok_start"], r["n_tokens"])
    assert sorted(map(key, got)) == sorted(map(key, got2))


def test_pack_sequences_random_differential(spark):
    """Random corpora vs a pure-Python replay of the packing rule
    (hash order within shards, cumulative spans, boundary splits)."""
    import random

    from datapatterns_spark.operators.packing import pack_sequences

    for seed_corpus in (5, 23):
        rnd = random.Random(seed_corpus)
        rows = [
            (i, " ".join(["w"] * rnd.randrange(1, 40)))
            for i in range(150)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        B, SH = 64, 4
        got = sorted(
            (r["shard"], r["pack"], r["doc_id"], r["tok_start"], r["n_tokens"])
            for r in pack_sequences(df, max_tokens=B, n_shards=SH).collect()
        )
        # python model using Spark's own hash values (collected once)
        hashes = {
            r["doc_id"]: (r["h1"], r["h2"])
            for r in df.select(
                "doc_id",
                F.pmod(F.xxhash64(F.lit(42), "doc_id"), F.lit(SH)).alias("h1"),
                F.xxhash64(F.lit(43), "doc_id").alias("h2"),
            ).collect()
        }
        want = []
        by_shard = {}
        for i, t in rows:
            n = len(t.split())
            by_shard.setdefault(hashes[i][0], []).append((hashes[i][1], i, n))
        for sh, docs in by_shard.items():
            docs.sort()
            pos = 0
            for _, i, n in docs:
                start, end = pos, pos + n
                for p in range(start // B, (end - 1) // B + 1):
                    lo, hi = max(p * B, start), min((p + 1) * B, end)
                    want.append((sh, p, i, lo - start, hi - lo))
                pos = end
        assert got == sorted(want), f"seed={seed_corpus}"


def test_pack_sequences_plan_is_sharded_window(spark):
    """The cumsum window must partition by shard (never a global
    single-task window) and the plan must stay JVM-side."""
    import re

    from datapatterns_spark.operators.packing import pack_sequences

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = (
        pack_sequences(df, max_tokens=8, n_shards=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert re.search(r"windowspecdefinition\(shard#\d+L", plan)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_text_analysis(spark, docs):
    out = {r["doc_id"]: r for r in TA.analyze_documents(docs).collect()}
    assert out[1]["ws_tokens"] == 9
    assert out[1]["bpe_tokens"] == 9
    assert out[3]["bpe_tokens"] > out[3]["ws_tokens"]  # '!!' counted
    assert out[1]["lang_guess"] == "en"
    assert out[6]["lang_guess"] == "de"
    assert out[1]["fingerprint"] == out[2]["fingerprint"] == out[3]["fingerprint"]
    assert 0.0 <= out[1]["quality"] <= 1.0
    assert out[1]["quality"] > 0.5


def test_multimodal_features(spark):
    media = make_fake_media_table(spark, n=30)
    feats = extract_features(media, fake=True)
    rows = feats.collect()
    assert len(rows) == 30
    assert all(len(r["features"]) == 16 for r in rows)
    # deterministic: same payload -> same features
    again = {r["media_id"]: r["features"] for r in extract_features(media, fake=True).collect()}
    assert all(again[r["media_id"]] == r["features"] for r in rows)
    # real decode is an explicit stub
    with pytest.raises(Exception):
        extract_features(media, fake=False).collect()


def test_multimodal_frame_sampling(spark):
    media = make_fake_media_table(spark, n=9)
    frames = sample_frames(media, every_ms=1000, fake=True)
    rows = frames.collect()
    # only every third row is a 5000ms video -> 5 frames each
    vids = {r["media_id"] for r in rows}
    assert all(m % 3 == 0 for m in vids)
    per = {}
    for r in rows:
        per[r["media_id"]] = per.get(r["media_id"], 0) + 1
    assert all(v == 5 for v in per.values())


def test_multimodal_resize(spark):
    import hashlib

    from datapatterns_spark.operators.multimodal import resize_media

    media = make_fake_media_table(spark, n=12)
    rows = resize_media(media, width=64, height=48, fake=True).collect()
    assert len(rows) == 12
    assert all(r["width"] == 64 and r["height"] == 48 for r in rows)
    src = {r["media_id"]: bytes(r["media"]) for r in media.collect()}
    for r in rows:
        want = hashlib.sha256(src[r["media_id"]] + b"64x48").hexdigest().encode()
        assert bytes(r["media"]) == want
    with pytest.raises(Exception):
        resize_media(media, fake=False).collect()


def test_winnow_fingerprints(spark):
    """Differential vs a pure-Python winnowing oracle + the winnowing
    guarantee: docs sharing a substring of length >= k+w-1 share a
    fingerprint."""
    import re
    import string

    M, B, K, W = (1 << 31) - 1, 257, 5, 4

    def norm(t):
        t = (t or "").lower()
        t = re.sub("[" + re.escape(string.punctuation) + "]", " ", t)
        return re.sub(r"\s+", " ", t).strip()

    def py_winnow(t):
        s = norm(t)
        if len(s) < K:
            return []
        hs = []
        for i in range(len(s) - K + 1):
            a = 0
            for ch in s[i : i + K]:
                a = (a * B + ord(ch)) % M
            hs.append(a)
        if len(hs) < W:
            return sorted({min(hs)})
        return sorted({min(hs[p : p + W]) for p in range(len(hs) - W + 1)})

    texts = [
        "Hello, World! Hello world again and again.",
        "très bïen — the query result token stream",
        "",
        "abc",
        "abcde",
        "abcdef g",
        "a shared needle substring xyz here",
        "elsewhere a shared needle substring xyz too",
        "ZZZZZZZZZZZZ",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got: dict[int, set] = {i: set() for i in range(len(texts))}
    for r in TA.winnow_table(df).collect():
        got[r["doc_id"]].add(r["fp"])
    for i, t in enumerate(texts):
        assert got[i] == set(py_winnow(t)), f"doc {i}: {t!r}"
    # guarantee: 6 and 7 share "shared needle substring xyz" (>= k+w-1)
    assert got[6] & got[7]


def test_winnow_near_dups(spark, docs):
    """Exact/near dups share >= 80% of the smaller set's fingerprints;
    unrelated docs never pair."""
    pairs = {
        (r["id_a"], r["id_b"]): r["score"]
        for r in TA.winnow_near_dups(
            docs, "text", "doc_id", min_shared_frac=0.8, max_fp_df=100
        ).collect()
    }
    # 1=2 exact dup, 3 normalizes to the same text -> full containment
    assert pairs[(1, 2)] == 1.0
    assert pairs[(1, 3)] == 1.0
    assert pairs[(2, 3)] == 1.0
    # 4 is a near dup of 1/2/3 ("sleepy" vs "lazy"): shares most fps
    assert any(4 in p for p in pairs)
    # 5 (different content) and 6 (German) pair with nobody
    assert all(5 not in p and 6 not in p for p in pairs)


def test_sample_stratified(spark):
    """Seeded stratified sampling: exactly k per stratum, deterministic
    across plans, identical to a single-window reference ranking."""
    from pyspark.sql import Window

    from datapatterns_spark.operators.sampling import sample_stratified

    df = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.pmod("id", F.lit(3)).cast("string").alias("lang"),
    )
    out = sample_stratified(df, ["lang"], k=10, key_cols=["doc_id"], seed=7)
    rows = [(r["lang"], r["doc_id"], r["sample_rank"]) for r in out.collect()]
    per = {}
    for lang, did, rn in rows:
        per.setdefault(lang, []).append((rn, did))
    assert set(per) == {"0", "1", "2"}
    assert all(sorted(rn for rn, _ in v) == list(range(1, 11)) for v in per.values())
    # deterministic: re-run matches exactly
    rows2 = [(r["lang"], r["doc_id"], r["sample_rank"])
             for r in sample_stratified(df, ["lang"], 10, ["doc_id"], seed=7).collect()]
    assert sorted(rows) == sorted(rows2)
    # different seed draws a different sample
    rows3 = {r["doc_id"] for r in
             sample_stratified(df, ["lang"], 10, ["doc_id"], seed=8).collect()}
    assert rows3 != {d for _, d, _ in rows}
    # reference: plain single-window ranking (no salting)
    h = F.xxhash64(F.lit(7), F.col("doc_id"))
    w = Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    ref = df.withColumn("rn", F.row_number().over(w)).filter("rn <= 10")
    ref_rows = sorted((r["lang"], r["doc_id"], r["rn"]) for r in ref.collect())
    assert sorted(rows) == ref_rows
    # a stratum smaller than k keeps all its rows
    small = df.filter("doc_id < 4")
    got = sample_stratified(small, ["lang"], 10, ["doc_id"], seed=7).count()
    assert got == 4


def _py_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_connected_components_random_graphs(spark):
    """Large-star/small-star labeling matches a union-find oracle on
    random graphs (chains, cliques, singleton-pair mixes)."""
    import random

    from datapatterns_spark.operators.dedup import connected_components

    for seed in (3, 11):
        rnd = random.Random(seed)
        edges = [(rnd.randrange(60), rnd.randrange(60)) for _ in range(70)]
        edges += [(100 + i, 100 + i + 1) for i in range(12)]  # long chain
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r["node"]: r["component"]
            for r in connected_components(df).collect()
        }
        want = _py_components([(a, b) for a, b in edges if a != b])
        # a node appearing ONLY in self-pairs is its own singleton
        # component (nodes are collected before the self-loop filter)
        for a, b in edges:
            want.setdefault(a, a)
            want.setdefault(b, b)
        assert got == want, f"seed={seed}"


def test_conversation_dedup_random_differential(spark):
    """Random conversation corpora (clones, partial clones, permuted
    rows, duplicate turns) against a pure-Python multiset model."""
    import random

    from datapatterns_spark.operators.dedup import conversation_dedup

    for seed in (3, 17):
        rnd = random.Random(seed)
        convs = {}
        for c in range(30):
            turns = [
                (t, f"w{rnd.randrange(6)}")
                for t in range(rnd.randrange(1, 6))
            ]
            if rnd.random() < 0.3 and turns:
                turns.append(turns[rnd.randrange(len(turns))])  # dup turn
            convs[f"c{c}"] = turns
        for c in list(convs)[:8]:  # clones under new ids, rows shuffled
            cl = list(convs[c])
            rnd.shuffle(cl)
            convs[f"{c}_x"] = cl
        rows = [(c, t, s) for c, ts in convs.items() for t, s in ts]
        rnd.shuffle(rows)
        df = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, text string"
        )
        got = {r["conv"]: r["canonical"]
               for r in conversation_dedup(df).collect()}
        # model: group by exact turn multiset
        groups = {}
        for c, ts in convs.items():
            key = tuple(sorted(ts))
            groups.setdefault(key, []).append(c)
        want = {}
        for members in groups.values():
            if len(members) > 1:
                canon = min(members)
                for m in members:
                    want[m] = canon
        assert got == want, f"seed={seed}"


def test_incremental_exact_dedup(spark, tmp_path):
    """Batch-2 docs matching batch-1 text classify as dup_of_store,
    in-batch copies as dup_in_batch (min id survives), new text as
    unique; the streaming sink's per-batch-overwrite + self-excluding
    store read makes replay idempotent."""
    from datapatterns_spark.operators.dedup import incremental_exact_dedup
    from datapatterns_spark.streaming import dedup_sink

    b1 = spark.createDataFrame(
        [(1, "alpha text"), (2, "beta text"), (3, "Alpha TEXT!")],
        "doc_id long, text string",
    )
    d1 = {r["id"]: r["status"]
          for r in incremental_exact_dedup(b1, None).collect()}
    assert d1 == {1: "unique", 2: "unique", 3: "dup_in_batch"}

    store = spark.createDataFrame(
        [(r["fp"],) for r in
         incremental_exact_dedup(b1, None).filter("status='unique'")
         .select("fp").collect()],
        "fp long",
    )
    b2 = spark.createDataFrame(
        [(10, "ALPHA text"), (11, "gamma text"), (12, "gamma  text")],
        "doc_id long, text string",
    )
    d2 = {r["id"]: r["status"]
          for r in incremental_exact_dedup(b2, store).collect()}
    assert d2 == {10: "dup_of_store", 11: "unique", 12: "dup_in_batch"}

    # streaming sink: run batches, then REPLAY batch 1 — decisions
    # must be byte-identical (store read excludes its own partition)
    store_p, out_p = str(tmp_path / "store"), str(tmp_path / "out")
    sink = dedup_sink(store_p, out_p)
    sink(b1, 0)
    sink(b2, 1)
    first = sorted(
        (r["id"], r["status"])
        for r in spark.read.parquet(f"{out_p}/decisions/batch=1").collect()
    )
    assert first == [(10, "dup_of_store"), (11, "unique"),
                     (12, "dup_in_batch")]
    sink(b2, 1)  # replay
    replay = sorted(
        (r["id"], r["status"])
        for r in spark.read.parquet(f"{out_p}/decisions/batch=1").collect()
    )
    assert replay == first
    # store holds exactly the unique fingerprints of both batches
    assert spark.read.parquet(store_p).count() == 3


def test_incremental_minhash_dedup(spark):
    """Near-dup incremental dedup against a signature store: batch-2
    docs near-identical to batch-1 text classify dup_of_store via the
    signature-estimated Jaccard, within-batch near-dups keep the
    smaller id, distinct docs stay unique; signatures round-trip
    through the returned frame as the store format."""
    from datapatterns_spark.operators.dedup import incremental_minhash_dedup

    base = ("the quick brown fox jumps over the lazy dog again and "
            "again every single day of the week without fail")
    other = ("completely different content about gardens rivers and "
             "mountains stretching far beyond the horizon line")
    b1 = spark.createDataFrame(
        [(1, base), (2, other)], "doc_id long, text string"
    )
    m0: dict = {}
    d1, sigs1 = incremental_minhash_dedup(b1, None, threshold=0.7, metrics=m0)
    assert {r["id"]: r["status"] for r in d1.collect()} == {
        1: "unique", 2: "unique"
    }
    # first batch (no store): the documented store_* keys are present
    # and zero, never missing
    assert m0["store_capped_buckets"] == 0
    assert m0["store_cap_dropped_pairs"] == 0
    assert m0["store_candidate_pairs"] == 0
    store = sigs1  # both unique -> whole frame is the store

    b2 = spark.createDataFrame(
        [
            (10, base + " ok"),          # near-dup of stored 1
            (11, "entirely new text about astronomy telescopes and "
                 "the motion of planets across the night sky"),
            (12, "entirely new text about astronomy telescopes and "
                 "the motion of planets across the night sky yes"),
        ],
        "doc_id long, text string",
    )
    m: dict = {}
    d2, _ = incremental_minhash_dedup(b2, store, threshold=0.7, metrics=m)
    assert {r["id"]: r["status"] for r in d2.collect()} == {
        10: "dup_of_store", 11: "unique", 12: "dup_in_batch"
    }
    # cap observability: nothing capped at this size, candidates exist
    # on both sides (10 vs stored 1; 12 vs batch 11)
    assert m["batch_capped_buckets"] == 0 and m["batch_cap_dropped_pairs"] == 0
    assert m["store_capped_buckets"] == 0 and m["store_cap_dropped_pairs"] == 0
    assert m["batch_candidate_pairs"] >= 1 and m["store_candidate_pairs"] >= 1


def test_conversation_dedup(spark):
    """Whole-conversation dedup: cloned conversations (same turn
    multiset under a different conv_id) group to the min-id canonical;
    near-miss conversations (one char off, turn renumbered, or the
    XOR-cancellation adversarial pair) stay apart."""
    rows = []
    for conv, turns in {
        "a": [(0, "hello"), (1, "world")],
        "b": [(1, "world"), (0, "hello")],       # clone of a, rows reordered
        "c": [(0, "hello"), (1, "world!")],      # one char off
        "d": [(1, "hello"), (2, "world")],       # same texts, renumbered
        # XOR-cancellation pair: {x,x,y} vs {y,z,z} both XOR to h(y)
        "e": [(0, "x"), (0, "x"), (1, "y")],
        "f": [(1, "y"), (2, "z"), (2, "z")],
        "g": [(0, "x"), (0, "x"), (1, "y")],     # true clone of e
    }.items():
        rows += [(conv, t, s) for t, s in turns]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    out = {r["conv"]: (r["canonical"], r["keep"])
           for r in D.conversation_dedup(df).collect()}
    assert out == {
        "a": ("a", True), "b": ("a", False),
        "e": ("e", True), "g": ("e", False),
    }


def test_conversation_fingerprints_shape_is_agg_only(spark):
    """The fingerprint pass must be pure hash aggregation (map-side
    combinable — a hot conversation collapses per input partition):
    no Window, no collect_list, no Python eval."""
    df = spark.createDataFrame(
        [("c", 0, "t")], "conv_id string, turn_idx int, text string"
    )
    plan = D.conversation_dedup(df)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "collect_list" not in plan and "collect_set" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_connected_components_self_loops_only(spark):
    """A pair set containing ONLY self-loops still labels every node
    as its own singleton component (the early-return path)."""
    from datapatterns_spark.operators.dedup import connected_components

    df = spark.createDataFrame([(5, 5), (7, 7)], "src long, dst long")
    got = {r["node"]: r["component"]
           for r in connected_components(df).collect()}
    assert got == {5: 5, 7: 7}


def test_ivf_topk_empty_query_set(spark):
    """An empty (filtered-out) query batch is a valid no-op, not a
    dim-probe crash."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = S.ivf_topk(emb, emb.limit(0), k=5)
    assert out.collect() == []
    assert out.columns == ["query_id", "neighbor_id", "cos", "rank"]


def test_connected_components_signature_overflow(spark):
    """Regression for the round-1 red row: the convergence signature
    summed raw ``xxhash64(u, v)`` values, which overflows an int64
    under ANSI mode on real edge sets.  This graph's edge hashes are
    verified to overflow a plain 64-bit sum; the labeling must still
    complete and match union-find."""
    from pyspark.sql import functions as F

    from datapatterns_spark.operators.dedup import connected_components

    # one big clique + chains: enough canonical edges that the int64
    # sum of their hashes overflows (asserted below, not assumed)
    edges = [(a, b) for a in range(40) for b in range(a + 1, 40)]
    edges += [(1000 + i, 1000 + i + 1) for i in range(30)]
    df = spark.createDataFrame(edges, "src long, dst long")
    hashes = [
        r["h"]
        for r in df.select(
            F.xxhash64(
                F.least("src", "dst"), F.greatest("src", "dst")
            ).alias("h")
        ).collect()
    ]
    total = sum(hashes)  # Python int: arbitrary precision
    assert not (-(2**63) <= total < 2**63), (
        "fixture no longer overflows an int64 sum — pick different edges"
    )
    got = {
        r["node"]: r["component"] for r in connected_components(df).collect()
    }
    want = _py_components(edges)
    assert got == want


def test_connected_components_one_action_per_round(spark):
    """Each star round's convergence signature must be the SAME action
    that materializes the round's lazy localCheckpoint — not a
    checkpoint job plus a separate count+hash pass.  Measured as the
    per-round JOB DELTA between runs capped at different round counts
    (self-calibrating: upfront node/edge checkpoints and the final
    collect cancel out).  Under AQE one round's agg plans ~10 stage
    jobs; a reintroduced separate signature pass adds >=2 more per
    round and trips the bound."""
    import warnings as _w

    from datapatterns_spark.operators.dedup import connected_components

    sc = spark.sparkContext
    edges = [(i, i + 1) for i in range(64)]  # chain: needs ~7 rounds
    df = spark.createDataFrame(edges, "src long, dst long")

    def jobs_with_max_iter(mi, tag):
        sc.setJobGroup(tag, tag)
        try:
            with _w.catch_warnings():
                _w.simplefilter("ignore", RuntimeWarning)
                connected_components(df, max_iter=mi).collect()
        finally:
            sc.setJobGroup(None, None)
        return len(sc.statusTracker().getJobIdsForGroup(tag))

    j1 = jobs_with_max_iter(1, "cc-jobs-1r")
    j3 = jobs_with_max_iter(3, "cc-jobs-3r")
    per_round = (j3 - j1) / 2
    assert per_round <= 11, f"{per_round} jobs per CC round (expected ~10)"
    from datapatterns_spark.operators.dedup import dedup_components

    pairs = spark.createDataFrame(
        [("d1", "d2"), ("d2", "d3"), ("d9", "d8")], "id_a string, id_b string"
    )
    out = {r["node"]: (r["component"], r["keep"])
           for r in dedup_components(pairs).collect()}
    assert out == {
        "d1": ("d1", True), "d2": ("d1", False), "d3": ("d1", False),
        "d8": ("d8", True), "d9": ("d8", False),
    }


# ---------------------------------------------------------------------------
# round-3: persist-leak, df-cap default, IVF broadcast-centroid path
# ---------------------------------------------------------------------------
def _sql_cache_is_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_minhash_lsh_leaves_no_cached_frames(spark):
    """minhash_lsh_pairs intermediates (signatures, candidate pairs,
    candidate shingle sets) must NOT sit in the SQL CacheManager after
    the call — a plain persist() there would leak one cached frame per
    call for the session's lifetime in a long-running curation driver.
    The eager localCheckpoint shape is invisible to the CacheManager
    and freed by the ContextCleaner when the result is dropped."""
    spark.catalog.clearCache()
    assert _sql_cache_is_empty(spark)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = D.minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.7)
    assert out.count() > 0
    assert _sql_cache_is_empty(spark), (
        "minhash_lsh_pairs left a frame in the CacheManager (persist leak)"
    )


def test_incremental_minhash_leaves_no_cached_frames(spark):
    """Same contract for incremental_minhash_dedup: the returned
    new_sigs frame is checkpointed, not persisted — callers have no
    unpersist obligation."""
    spark.catalog.clearCache()
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    b1 = docs.filter("doc_id < 100")
    store = D.minhash_signatures(b1, "text", "doc_id")
    # metrics=... exercises the r5 observability path, which adds two
    # materialize() points (cand_b/cand_s) — the leak contract must
    # hold there too
    m: dict = {}
    decisions, sigs = D.incremental_minhash_dedup(
        docs.filter("doc_id >= 100"), store, threshold=0.7, metrics=m
    )
    assert decisions.count() > 0
    assert sigs.count() > 0
    assert m["batch_candidate_pairs"] >= 0
    assert _sql_cache_is_empty(spark)


def test_ngram_jaccard_default_cap_drops_ultra_common_shingle(spark):
    """The DEFAULT max_shingle_df (10k) must protect a caller who
    never reads the docstring: a shingle planted in >10k docs is
    dropped before pairing, so pairs whose ONLY overlap is that
    boilerplate shingle never form (the uncapped alternative would
    emit C(10050, 2) ~ 5*10^7 candidate rows here)."""
    n = 10_050
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("aaa bbb ccc u"), F.col("id").cast("string")).alias("text"),
    )
    # the exactness loss must be OBSERVABLE: the cap warns with the
    # dropped-shingle count the moment it drops anything (the plan is
    # built eagerly enough that the warning fires at call time)
    with pytest.warns(UserWarning, match="dropped 1 over-cap"):
        out = D.ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.3)
    assert out.count() == 0
    # counterfactual at small scale: the same shape UNDER the cap DOES
    # pair (proving the big corpus's emptiness came from the cap, not
    # from the threshold)
    small = spark.range(6).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("aaa bbb ccc u"), F.col("id").cast("string")).alias("text"),
    )
    kept = D.ngram_jaccard_pairs(small, "text", "doc_id", n=3, threshold=0.3)
    assert kept.count() > 0
    # explicit opt-out restores exact semantics at any df
    uncapped = D.ngram_jaccard_pairs(
        small, "text", "doc_id", n=3, threshold=0.3, max_shingle_df=None
    )
    assert uncapped.count() == kept.count()


def test_ivf_broadcast_centroids_match_literal_path(spark, monkeypatch):
    """Above LITERAL_CENTROID_LIMIT the centroids ride a one-row
    broadcast frame instead of the Catalyst tree; results must be
    IDENTICAL to the literal formulation (same argmin ordering)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qs = emb.filter(F.col("vec_id").isin([1, 2, 3]))
    lit = S.ivf_topk(emb, qs, k=5, n_cells=16, n_probe=8, dim=64, refine_sweeps=0)
    a = sorted(map(tuple, lit.collect()))
    monkeypatch.setattr(S, "LITERAL_CENTROID_LIMIT", 1)
    bc = S.ivf_topk(emb, qs, k=5, n_cells=16, n_probe=8, dim=64, refine_sweeps=0)
    b = sorted(map(tuple, bc.collect()))
    assert a == b and len(a) == 15


def test_ivf_large_cell_count_plans_small(spark):
    """n_cells=1024 x dim=256 (~262k centroid doubles) must NOT inline
    literals into the plan — the analyzed plan string stays bounded
    and the query executes.  (The literal formulation at this size
    would put ~3M tokens in the tree.)"""
    vec = F.transform(
        F.sequence(F.lit(1), F.lit(256)),
        lambda i: (F.pmod(F.xxhash64(F.col("id"), i), F.lit(1000)) / 1000.0).cast(
            "double"
        ),
    )
    corpus = spark.range(60).select(F.col("id").alias("vec_id"), vec.alias("embedding"))
    qs = corpus.filter("vec_id < 2")
    out = S.ivf_topk(
        corpus, qs, k=3, n_cells=1024, n_probe=8, dim=256, refine_sweeps=0
    )
    plan = out._jdf.queryExecution().analyzed().toString()
    assert len(plan) < 100_000, f"analyzed plan unexpectedly large: {len(plan)}"
    rows = out.collect()
    assert all(r["rank"] >= 1 for r in rows)


def test_ivf_empty_query_schema_matches_nonempty(spark):
    """The empty-query early return must have the SAME schema as the
    non-empty path — including when corpus and query id columns have
    different types (neighbor_id takes the CORPUS id type)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qs = emb.filter(F.col("vec_id").isin([1, 2, 3])).withColumn(
        "qid", F.col("vec_id").cast("string")
    )
    nonempty = S.ivf_topk(
        emb, qs, query_id_col="qid", k=5, n_cells=16, n_probe=8,
        dim=64, refine_sweeps=0,
    )
    empty = S.ivf_topk(emb, qs.limit(0), query_id_col="qid", k=5)
    assert empty.schema == nonempty.schema
    assert empty.collect() == []


def test_lm_quality_score_differential(spark):
    """Char-bigram LM scoring matches a pure-Python replay of the same
    add-alpha arithmetic exactly (integer-quantized terms), including
    the sub-2-char zero case; natural text outscores keyboard mash
    under a model trained on natural text."""
    import math
    import re as _re
    from collections import Counter

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quiet brown fox rests under the old tree"),
        (3, "zxqj vwkp qqqq zzzz xjxj wqwq"),
        (4, "a"),
        (5, None),
        (6, "the dog and the fox and the tree are there"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r for r in TA.lm_quality_score(df).collect()}

    def norm(t):
        t = (t or "").lower()
        t = _re.sub(r"[!-/:-@\[-`{-~]", " ", t)
        return _re.sub(r"\s+", " ", t).strip()

    grams = {}
    model = Counter()
    for did, t in rows:
        s = norm(t)
        g = [s[i : i + 2] for i in range(len(s) - 1)] if len(s) >= 2 else []
        grams[did] = g
        model.update(g)
    uni = Counter()
    for bg, c in model.items():
        uni[bg[0]] += c
    v = len({bg[1] for bg in model}) + 1
    for did, g in grams.items():
        if not g:
            assert (out[did]["n_bigrams"], out[did]["lm_score"]) == (0, 0.0)
            continue
        s9 = sum(
            math.floor(
                math.log((model[bg] + 0.5) / (uni[bg[0]] + 0.5 * v)) * 1e9 + 0.5
            )
            for bg in g
        )
        assert out[did]["n_bigrams"] == len(g)
        assert abs(out[did]["lm_score"] - round(s9 / (len(g) * 1e9), 6)) < 1e-9
    # ranking property: mash scores below every natural-text doc
    assert out[3]["lm_score"] < min(out[i]["lm_score"] for i in (1, 2, 6))


def test_lm_quality_score_external_model(spark):
    """Scoring a batch under a PRE-TRAINED model (the incremental /
    cross-corpus shape): unseen bigrams fall back to the alpha floor
    instead of erroring."""
    train = spark.createDataFrame(
        [(1, "aaab aaab aaab")], "doc_id long, text string"
    )
    model = TA.char_bigram_counts(train)
    score = spark.createDataFrame(
        [(9, "aaab"), (10, "zzzz")], "doc_id long, text string"
    )
    out = {r["id"]: r for r in TA.lm_quality_score(score, model=model).collect()}
    assert out[9]["lm_score"] > out[10]["lm_score"]
    assert out[10]["n_bigrams"] == 3


def test_lm_quality_score_ansi_mode(spark):
    """The literal-map path must stay null-on-miss under ANSI mode
    (plain element_at raises MAP_KEY_DOES_NOT_EXIST there; scoring
    under an external model legitimately misses keys)."""
    train = spark.createDataFrame(
        [(1, "aaab aaab aaab")], "doc_id long, text string"
    )
    model = TA.char_bigram_counts(train)
    score = spark.createDataFrame([(10, "zzzz")], "doc_id long, text string")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        rows = TA.lm_quality_score(score, model=model).collect()
        assert rows[0]["n_bigrams"] == 3 and rows[0]["lm_score"] < 0
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "false")


def test_duplicate_token_spans(spark):
    """Exact-substring duplicate spans: a 10-token run shared by two
    docs lights up as one merged span in each (8-grams at positions
    1..3 of the run overlap-merge); unique text emits nothing;
    within-doc repetition counts toward the corpus threshold."""
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, f"{shared} one two three"),
        (2, f"zero {shared}"),
        (3, "totally unique words nothing repeats here at all ever done"),
        # within-doc repeat: the same 8 tokens twice in ONE doc
        (4, "p q r s t u v w filler p q r s t u v w"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {}
    for r in D.duplicate_token_spans(df, "text", "doc_id", n=8).collect():
        out.setdefault(r["id"], []).append(
            (r["span_start"], r["span_end"], r["span_tokens"])
        )
    # doc 1: shared run at tokens 1-10 -> grams at 1,2,3 merge to [1,10]
    assert out[1] == [(1, 10, 10)]
    # doc 2: same run shifted by the leading token -> [2,11]
    assert out[2] == [(2, 11, 10)]
    assert 3 not in out
    # doc 4: both copies of the 8-token run are duplicated grams
    # (positions 1 and 10); they don't touch, so two spans
    assert sorted(out[4]) == [(1, 8, 8), (10, 17, 8)]


def test_duplicate_token_spans_winnowed(spark):
    """The winnow_w volume lever: planted boilerplate of
    >= n + w - 1 tokens is still recovered at stride w (content-defined
    selection keeps one shared interior gram alive in every copy), the
    recovered span sits within the documented w-1 gram-position
    boundary slack, the materialized frame shrinks to the winnowing
    density, and winnow_w=1 stays byte-identical to the historical
    exact path."""
    n, w = 5, 4
    # boilerplate long enough for the guarantee: n + w - 1 = 8 tokens
    boiler = "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10 b11 b12"
    rows = [
        (1, f"u1 u2 u3 {boiler} u4 u5 u6"),
        (2, f"{boiler} v1 v2 v3 v4 v5 v6 v7"),
        (3, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    m: dict = {}
    out = {}
    for r in D.duplicate_token_spans(
        df, "text", "doc_id", n=n, winnow_w=w, metrics=m
    ).collect():
        out.setdefault(r["id"], []).append((r["span_start"], r["span_end"]))
    # detection: the planted 12-token run recovered in BOTH copies
    assert 1 in out and 2 in out and 3 not in out
    assert len(out[1]) == 1 and len(out[2]) == 1
    # resolution: true boiler spans are doc1 [4,15], doc2 [1,12];
    # recovered ends may under-reach by up to w-1 gram positions at
    # the start and the span never exceeds the true region
    (s1, e1), (s2, e2) = out[1][0], out[2][0]
    assert 4 <= s1 <= 4 + (w - 1) and e1 <= 15 and e1 >= s1 + n - 1
    assert 1 <= s2 <= 1 + (w - 1) and e2 <= 12 and e2 >= s2 + n - 1
    # volume: the frame holds only selected positions — at most the
    # window count + 1 per doc (winnowing density ~2/(w+1)), strictly
    # under the full gram count
    assert 0 < m["frame_rows"] < m["gram_positions"]
    per_doc_grams = [len(t.split()) - n + 1 for _, t in rows]
    assert m["frame_rows"] <= sum(g - w + 2 for g in per_doc_grams)
    # winnow_w=1 (default) unchanged: exact spans, full frame
    m1: dict = {}
    exact = {
        (r["id"], r["span_start"], r["span_end"])
        for r in D.duplicate_token_spans(
            df, "text", "doc_id", n=n, metrics=m1
        ).collect()
    }
    assert exact == {(1, 4, 15), (2, 1, 12)}
    assert m1["frame_rows"] == m1["gram_positions"] == sum(per_doc_grams)


def test_duplicate_token_spans_winnowed_differential(spark):
    """Randomized differential: the winnowed span pipeline (gram hash
    -> rightmost-window-min selection -> corpus count over selected ->
    slack-w islands) vs an independent imperative Python oracle, over
    seeded random corpora with heavy token reuse (alphabet of 6 tokens
    forces duplicated n-grams, repeats, ties, and short docs).  Gram
    hashes are taken from Spark's own xxhash64 (one tiny batch job) so
    the oracle disagrees only if the SELECTION or MERGE logic does."""
    import random

    n, w, min_count = 3, 4, 2
    rng = random.Random(77)
    alphabet = ["ax", "bx", "cx", "dx", "ex", "fx"]
    docs = {
        did: [rng.choice(alphabet) for _ in range(rng.randrange(0, 26))]
        for did in range(1, 41)
    }
    df = spark.createDataFrame(
        [(d, " ".join(t)) for d, t in docs.items()], "doc_id long, text string"
    )
    got = {}
    for r in D.duplicate_token_spans(
        df, "text", "doc_id", n=n, min_count=min_count, winnow_w=w
    ).collect():
        got.setdefault(r["id"], set()).add(
            (r["span_start"], r["span_end"], r["span_tokens"])
        )

    # --- imperative oracle ---
    grams = {
        d: [" ".join(t[i : i + n]) for i in range(len(t) - n + 1)]
        for d, t in docs.items()
        if len(t) >= n
    }
    uniq = sorted({g for gs in grams.values() for g in gs})
    hdf = spark.createDataFrame([(g,) for g in uniq], "g string")
    hmap = {
        r["g"]: r["h"]
        for r in hdf.select("g", F.xxhash64("g").alias("h")).collect()
    }

    def select_positions(gs):
        m = len(gs)
        h = [hmap[g] for g in gs]
        if m == 0:
            return set()
        if m < w:
            best = 0
            for j in range(1, m):
                if h[j] <= h[best]:
                    best = j  # rightmost tie
            return {best + 1}
        sel = set()
        for p in range(m - w + 1):
            best = p
            for j in range(p + 1, p + w):
                if h[j] <= h[best]:
                    best = j
            sel.add(best + 1)  # 1-based
        return sel

    selected = {d: select_positions(gs) for d, gs in grams.items()}
    counts: dict = {}
    for d, pos in selected.items():
        for i in pos:
            counts[grams[d][i - 1]] = counts.get(grams[d][i - 1], 0) + 1
    want = {}
    for d, pos in selected.items():
        dup = sorted(i for i in pos if counts[grams[d][i - 1]] >= min_count)
        spans = []
        for i in dup:
            e = i + n - 1
            if spans and i <= spans[-1][1] + w:
                spans[-1][1] = max(spans[-1][1], e)
            else:
                spans.append([i, e])
        if spans:
            want[d] = {(s, e, e - s + 1) for s, e in spans}
    assert got == want
    # sanity: the corpus actually exercised the interesting paths
    assert len(want) > 5 and any(len(v) > 1 for v in want.values())


def test_cut_duplicate_spans(spark):
    """Span-level cutting: the duplicated run is removed from each
    doc's normalized token stream, unique docs pass through unchanged
    (normalized), and cut counts match span lengths."""
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, f"{shared} one two three"),
        (2, f"zero {shared}"),
        (3, "Totally unique, words - nothing repeats here at all ever done"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = D.duplicate_token_spans(df, "text", "doc_id", n=8)
    out = {r["id"]: r for r in D.cut_duplicate_spans(df, spans).collect()}
    assert out[1]["text"] == "one two three" and out[1]["n_tokens_cut"] == 10
    assert out[2]["text"] == "zero" and out[2]["n_tokens_cut"] == 10
    assert out[3]["text"] == (
        "totally unique words nothing repeats here at all ever done"
    )
    assert out[3]["n_tokens_cut"] == 0


def test_cut_duplicate_spans_null_and_empty_text(spark):
    """Docstring contract: span-free docs pass through with
    n_tokens_cut = 0 — including NULL and empty text (normalized_text
    coalesces, so the empty branch is taken, never a null count)."""
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "a b c d")], "doc_id long, text string"
    )
    spans = spark.createDataFrame(
        [], "id long, span_start long, span_end long, span_tokens long"
    )
    out = {r["id"]: r for r in D.cut_duplicate_spans(df, spans).collect()}
    for i in (1, 2, 3):
        assert out[i]["n_tokens_cut"] == 0
        assert out[i]["text"] is not None
    assert out[3]["text"] == "a b c d"


def test_curate_documents_cut_spans(spark):
    """cut_span_n stage: corpus-wide boilerplate is CUT from surviving
    documents before dedup (Lee et al. order), so two pages whose only
    difference was the boilerplate placement collapse to one exact
    survivor; n_tokens_cut lands in the output schema."""
    from datapatterns_spark.operators.curation import curate_documents

    boiler = "all rights reserved contact the webmaster for details"
    rows = [
        (1, f"unique prose about rivers and stars {boiler}"),
        (2, f"{boiler} different words concerning deserts and dunes"),
        (3, "another page entirely about mountains and snow today"),
        # 4 duplicates 1 exactly -> after cutting, still dedups onto 1
        (4, f"unique prose about rivers and stars {boiler}"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in curate_documents(df, dedup="exact", cut_span_n=5).collect()
    }
    assert set(out) == {1, 2, 3}  # 4 deduped onto 1
    # the 8-token boiler is cut from every survivor that carried it;
    # doc 1/4's shared prose is ALSO corpus-duplicated (it appears
    # twice), so doc 1 loses everything — the Lee et al. semantics:
    # duplicated means duplicated, boilerplate or not
    assert out[2]["n_tokens_cut"] == 8 and out[3]["n_tokens_cut"] == 0
    assert "webmaster" not in out[2]["text"]
    assert out[2]["text"] == "different words concerning deserts and dunes"
    assert out[1]["n_tokens_cut"] == 14 and out[1]["text"] == ""
    # winnowed variant: same survivors; the boiler (8 tokens =
    # n + w - 1 with n=5, w=4) is at the guaranteed detection floor,
    # so at least its interior selected gram is cut from doc 2
    out_w = {
        r["doc_id"]: r
        for r in curate_documents(
            df, dedup="exact", cut_span_n=5, cut_span_winnow_w=4
        ).collect()
    }
    assert set(out_w) == {1, 2, 3}
    assert out_w[2]["n_tokens_cut"] >= 5
    assert "deserts" in out_w[2]["text"]


def test_curate_documents_lm_gate(spark):
    """min_lm_score gates mojibake out under a model trained on the
    natural-text majority (self-trained here); the pre-trained-model
    path keeps thresholds stable across batches."""
    from datapatterns_spark.operators.curation import curate_documents

    nat = [
        (i, "the quick brown fox jumps over the lazy dog again and again")
        for i in range(10)
    ]
    rows = nat + [(99, "zxqj vwkp qqqq zzzz xjxj wqwq zzkk qqjj")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # find a floor between the mash score and the natural score
    scored = {
        r["id"]: r["lm_score"]
        for r in TA.lm_quality_score(df).collect()
    }
    floor = (scored[99] + scored[0]) / 2
    out = curate_documents(df, dedup=None, min_lm_score=floor)
    kept = {r["doc_id"] for r in out.collect()}
    assert 99 not in kept and 0 in kept
    # pre-trained model path: same gate driven by an external model
    model = TA.char_bigram_counts(spark.createDataFrame(nat, "doc_id long, text string"))
    out2 = curate_documents(df, dedup=None, min_lm_score=floor, lm_model=model)
    assert 99 not in {r["doc_id"] for r in out2.collect()}
