"""Text-analysis operator unit tests (driver oracles cover the bulk;
these pin the BM25 math on a hand-checkable corpus)."""

import math

from geodesk_spark.operators import text


def test_bm25_topk_hand_corpus(spark):
    docs = [
        (1, "apple apple banana"),
        (2, "banana cherry"),
        (3, "cherry cherry cherry date"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = text.bm25_topk(df, k=2).toPandas().sort_values(["doc_id", "rnk"])

    # every doc yields <= k rows, rnk is 1..n, terms unique per doc
    for doc_id, grp in out.groupby("doc_id"):
        assert list(grp.rnk) == list(range(1, len(grp) + 1))
        assert grp.term.is_unique
        # scores are non-increasing with rank
        assert all(a >= b for a, b in zip(grp.score, grp.score[1:]))

    def bm25(tf, dfreq, dl, n_docs=3, sum_dl=9, k1=1.2, b=0.75):
        avgdl = sum_dl / n_docs
        idf = math.log((n_docs - dfreq + 0.5) / (dfreq + 0.5) + 1.0)
        return round(idf * ((tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * (dl / avgdl)))), 6)

    got = {(r.doc_id, r.term): r.score for r in out.itertuples()}
    # doc 1: apple (tf=2, df=1, dl=3) outranks banana (tf=1, df=2)
    assert got[(1, "apple")] == bm25(2, 1, 3)
    assert got[(1, "banana")] == bm25(1, 2, 3)
    assert got[(1, "apple")] > got[(1, "banana")]
    # doc 3: cherry tf=3 beats date tf=1 despite date's rarer idf? both present
    assert got[(3, "cherry")] == bm25(3, 2, 4)
    assert got[(3, "date")] == bm25(1, 1, 4)
    # doc 2: ties on tf=1 → banana before cherry lexicographically
    d2 = out[out.doc_id == 2]
    assert list(d2.term) == sorted(d2.term, key=lambda t: (-got[(2, t)], t))


def test_bm25_empty_and_whitespace_docs(spark):
    df = spark.createDataFrame(
        [(1, "only doc"), (2, ""), (3, "   ")], "doc_id long, text string"
    )
    out = text.bm25_topk(df, k=5).toPandas()
    assert set(out.doc_id) == {1}
    # N counts ALL documents (empty ones raise every idf)
    assert len(out) == 2


def test_decontaminate_planted_overlap(spark):
    """Docs sharing a verbatim eval passage must flag; clean docs must
    not; counts are over DISTINCT shingles (repetition doesn't inflate)."""
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            # full verbatim copy → ratio 1.0
            (1, "the quick brown fox jumps over the lazy dog"),
            # half-contaminated: leaked prefix + novel suffix
            (2, "the quick brown fox circled a red barn twice today ok"),
            # clean
            (3, "completely different words without any leak at all"),
            # repetition of one leaked shingle must count ONCE
            (4, "the quick brown the quick brown the quick brown"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in text.decontaminate(docs, bench, threshold=0.5).collect()
    }
    assert out[1].contaminated and out[1].overlap_ratio == 1.0
    assert out[3].n_hits == 0 and not out[3].contaminated
    # doc 2: 10 words -> 8 distinct shingles, 2 leaked ("the quick brown",
    # "quick brown fox")
    assert out[2].n_hits == 2 and not out[2].contaminated
    # doc 4: distinct shingles collapse the repetition
    assert out[4].n_hits >= 1
    assert out[4].n_shingles < 7  # 9 words -> 7 raw shingles, dups collapse


def test_bm25_retrieve_self_rank1(spark):
    """A document used verbatim as the query must rank itself first."""
    docs = [
        (1, "apple apple banana kiwi"),
        (2, "banana cherry melon"),
        (3, "cherry cherry date plum"),
        (4, "unrelated words entirely here"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    q = spark.createDataFrame([(1, "apple apple banana kiwi")], "qid long, qtext string")
    out = text.bm25_retrieve(df, q, k=3).collect()
    top = [r for r in out if r["rnk"] == 1][0]
    assert top["doc_id"] == 1
    got_docs = {r["doc_id"] for r in out}
    assert 4 not in got_docs  # no shared terms -> never a candidate


def test_repetition_stats_hand_cases(spark):
    from geodesk_spark.operators import text as T

    docs = spark.createDataFrame(
        [
            (1, "a b c a b c a b c"),      # 7 trigrams, 3 distinct
            (2, "all words are unique here friend"),  # 4 trigrams, all distinct
            (3, "x y"),                     # shorter than n → 0 grams
            (4, ""),                        # empty
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in T.repetition_stats(docs, n=3).collect()}
    assert (got[1].n_grams, got[1].n_distinct_grams) == (7, 3)
    assert abs(got[1].dup_ratio - (1 - 3 / 7)) < 2e-6
    assert (got[2].n_grams, got[2].n_distinct_grams, got[2].dup_ratio) == (4, 4, 0.0)
    assert (got[3].n_grams, got[3].dup_ratio) == (0, 0.0)
    assert (got[4].n_grams, got[4].dup_ratio) == (0, 0.0)


def _qln(k: int) -> int:
    # the operator's micro-nat quantizer (floor form) on an integer arg
    return int(math.floor(math.log(k) * 1e6 + 0.5))


def test_ngram_lm_hand_counts(spark):
    """Self-trained bigram LM on a 2-doc corpus: recompute the smoothed
    micro-nat NLL by hand from the exact counts."""
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in text.ngram_lm_score(docs).collect()}
    # model bigrams: d1: (<s>,a),(a,b),(b,a),(a,b)  d2: (<s>,a),(a,b)
    # c2: (<s>,a)=2 (a,b)=3 (b,a)=1 ; c1: <s>=2 a=3 b=1 ; V = |{a,b}| = 2
    nll = lambda c1, c2: _qln(c1 + 2) - _qln(c2 + 1)
    d1 = nll(2, 2) + nll(3, 3) + nll(1, 1) + nll(3, 3)
    d2 = nll(2, 2) + nll(3, 3)
    assert got[1].n_bigrams == 4 and got[1].nll_micro == d1
    assert got[2].n_bigrams == 2 and got[2].nll_micro == d2
    assert abs(got[1].avg_nll - (d1 / 4) / 1e6) < 1e-12
    # more repetitive continuation = lower avg nll than the uniform doc
    assert got[1].avg_nll < math.log(3) + 1e-6


def test_ngram_lm_empty_and_unseen_model(spark):
    """Empty docs keep a zero row; tokens unseen by a held-out model get
    the uniform-backoff probability (c2=0, c1=0 -> ln(V))."""
    docs = spark.createDataFrame(
        [(1, "a a"), (2, ""), (3, "zz")], "doc_id long, text string"
    )
    model = docs.filter("doc_id = 1")  # vocab {a}, V=1
    got = {r.doc_id: r for r in text.ngram_lm_score(docs, model=model).collect()}
    assert (got[2].n_bigrams, got[2].nll_micro, got[2].avg_nll) == (0, 0, 0.0)
    # doc 3: one bigram (<s>, zz): c2=0, c1(<s>)=1, V=1 -> qln(2)-qln(1)
    assert got[3].nll_micro == _qln(2) - _qln(1)
    assert got[1].n_bigrams == 2


def test_dsir_importance_selection(spark):
    """Docs that look like the target rank above docs that don't; the
    selected count is exactly ceil(frac*N) and ranks are a permutation."""
    rows = [(i, "alpha beta gamma delta") for i in range(1, 7)]
    rows += [(i, "zz yy xx ww vv uu tt ss") for i in range(7, 13)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    target = docs.filter("doc_id <= 6")
    out = text.dsir_importance(docs, target, buckets=256, frac=0.25).collect()
    byid = {r.doc_id: r for r in out}
    assert sorted(r.rnk for r in out) == list(range(1, 13))
    assert sum(r.selected for r in out) == 3  # ceil(0.25 * 12)
    # every target-like doc outweighs every out-of-domain doc
    wmin_in = min(byid[i].weight_micro for i in range(1, 7))
    wmax_out = max(byid[i].weight_micro for i in range(7, 13))
    assert wmin_in > wmax_out
    # identical docs share weight; rank ties break on doc_id
    assert byid[1].weight_micro == byid[2].weight_micro
    assert byid[1].rnk < byid[2].rnk


def test_dsir_partition_invariance(spark):
    """Determinism law: weights/ranks identical under repartitioning
    (integer micro-nat sums are order-free)."""
    sf = "/root/testdata/sf0.001"
    d = spark.read.parquet(f"{sf}/documents.parquet")
    t = d.filter("lang = 'en'")
    a = (
        text.dsir_importance(d.repartition(1), t, buckets=512)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        text.dsir_importance(d.repartition(16, "text"), t.repartition(5), buckets=512)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert a.equals(b)


def test_ngram_lm_partition_invariance(spark):
    """Determinism law: micro-nat NLL sums are order-free, so the LM
    scores are identical under repartitioning of docs AND model."""
    sf = "/root/testdata/sf0.001"
    d = spark.read.parquet(f"{sf}/documents.parquet")
    m = d.filter("lang = 'en'")
    a = (
        text.ngram_lm_score(d.repartition(1), model=m.repartition(1))
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        text.ngram_lm_score(d.repartition(16, "text"), model=m.repartition(7))
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert a.equals(b)
    assert (a["nll_micro"] >= 0).all()  # add-1 smoothing: c2+1 <= c1+V


def test_ngram_lm_grouped_per_lang_models(spark):
    """Per-group training: the same text scores differently under its own
    language's model; a group absent from the model falls back to the
    uniform global-vocab distribution (never null)."""
    docs = spark.createDataFrame(
        [
            (1, "a b a b", "en"),
            (2, "a b", "en"),
            (3, "x y x y", "fr"),
            (4, "zz zz", "und"),   # group not in model
        ],
        "doc_id long, text string, lang string",
    )
    model = docs.filter("lang in ('en', 'fr')")
    got = {r.doc_id: r for r in text.ngram_lm_score_grouped(docs, model).collect()}
    # en model: c2(<s>,a)=2, c2(a,b)=3, c2(b,a)=1; c1: <s>=2,a=3,b=1; V_en=2
    nll = lambda c1, c2, v: _qln(c1 + v) - _qln(c2 + 1)
    assert got[1].nll_micro == nll(2, 2, 2) + nll(3, 3, 2) + nll(1, 1, 2) + nll(3, 3, 2)
    # fr model independent: bigrams (<s>,x),(x,y),(y,x),(x,y);
    # c2: (<s>,x)=1, (x,y)=2, (y,x)=1; c1: <s>=1, x=2, y=1; V_fr=2
    assert got[3].nll_micro == nll(1, 1, 2) + nll(2, 2, 2) + nll(1, 1, 2) + nll(2, 2, 2)
    # und: no model rows -> c1=c2=0, V = global distinct cur = |{a,b,x,y}| = 4
    assert got[4].nll_micro == 2 * (_qln(4) - _qln(1))
    assert got[4].lang == "und"


def test_ccnet_quality_buckets_shape(spark):
    """Terciles are per-language, deterministic, and ntile-balanced."""
    sf = "/root/testdata/sf0.001"
    d = spark.read.parquet(f"{sf}/documents.parquet")
    model = d.filter("doc_id % 2 = 0")
    out = text.ccnet_quality_buckets(d, model).toPandas()
    assert set(out["bucket_name"]) == {"head", "middle", "tail"}
    sizes = out.groupby(["lang", "bucket"]).size().unstack()
    # ntile: bucket sizes within a lang differ by at most 1
    assert ((sizes.max(axis=1) - sizes.min(axis=1)) <= 1).all()
    # head is the fluent third: per lang, max(head avg_nll) <= min(tail avg_nll)
    for lang, grp in out.groupby("lang"):
        assert grp.loc[grp.bucket == 1, "avg_nll"].max() <= grp.loc[grp.bucket == 3, "avg_nll"].min() + 1e-9


def test_doremi_reweight_upweights_hard_domain(spark):
    """DoReMi-lite laws: the high-excess (gibberish) domain gets the max
    weight, weights are an exact-integer near-partition of 1e6 (bigint
    rounding: |sum - 1e6| bounded by #domains), target docs track
    weights, and all outputs are integers."""
    from geodesk_spark.operators import text as text_mod

    rows = []
    did = 0
    for i in range(60):  # fluent/typical domain: repeated common bigrams
        rows.append((did, "the cat sat on the mat and the dog sat too", "easy"))
        did += 1
    for i in range(60):  # medium: semi-regular
        rows.append((did, f"alpha beta gamma delta epsilon zeta {i % 7}", "mid"))
        did += 1
    for i in range(60):  # hard: unique gibberish bigrams every doc
        rows.append((did, f"zzq{i}x wfp{i*7}y qqj{i*13}z vvk{i*29}w", "hard"))
        did += 1
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.domain: r for r in text_mod.doremi_reweight(df).collect()}
    assert set(out) == {"easy", "mid", "hard"}
    assert out["hard"].weight_ppm == max(r.weight_ppm for r in out.values())
    assert out["hard"].excess_micro > 0 and out["easy"].excess_micro == 0
    s = sum(r.weight_ppm for r in out.values())
    assert abs(s - 1_000_000) <= len(out)
    ntot = sum(r.n_docs for r in out.values())
    for r in out.values():
        assert isinstance(r.weight_ppm, int) and isinstance(r.target_docs, int)
        assert abs(r.target_docs - r.weight_ppm * ntot / 1e6) <= 1


def test_fuzzy_vocab_match_complete_ed1(spark):
    """SymSpell deletion blocking finds EXACTLY the Levenshtein-≤1
    pairs (insert/delete/substitute/equal) — brute-force verified —
    and transpositions (ed=2) stay out."""
    from geodesk_spark.operators import text as text_mod

    rare = ["helo", "wrold", "pythn", "zzz", "exactly", "sspark", "spork"]
    lex = ["hello", "world", "python", "exactly", "spark", "cat"]
    got = {(r.word, r.suggestion, r.ed)
           for r in text_mod.fuzzy_vocab_match(
               spark.createDataFrame([(w,) for w in rare], "word string"),
               spark.createDataFrame([(w,) for w in lex], "word string"),
           ).collect()}

    def lev(a, b):
        d = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, d[0] = d[0], i
            for j, cb in enumerate(b, 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1,
                                       prev + (ca != cb))
        return d[len(b)]

    exp = {(a, b, lev(a, b)) for a in rare for b in lex if lev(a, b) <= 1}
    assert got == exp
    assert ("wrold", "world", 2) not in got        # transposition is ed 2
    assert ("sspark", "spark", 1) in got           # insertion
    assert ("spork", "spark", 1) in got            # substitution
