"""Corpus-cleaning operators (operators/textclean.py): hand-computed
semantics, oracle parity against the module's own DuckDB twins, and
partition invariance for the one shuffling op."""

import duckdb
import numpy as np
import pytest

from geodesk_spark.operators import textclean


PII_DOC = (
    "reach me at alice.smith+spam@mail.example.com or bob@ex.org today, "
    "server 10.2.47.7 and 192.168.0.1 respond, call 555-0134 or 555 9999 now"
)

C4_DOC = "\n".join(
    [
        "this line is long enough and ends well.",  # kept
        "too short.",  # < 3 words
        "no terminal punctuation here at all",  # no punct
        "contains lorem ipsum filler so it drops.",  # blocklist
        "function() { return 1; }.",  # '{' blocklist
        'a quoted ending counts too she said."',  # kept (quote)
        "is this a question?",  # kept
    ]
)

DUP_DOC = "aa bb\ncc\naa bb\ndd\ncc\naa bb"  # 'aa bb'×3, 'cc'×2, 'dd'×1


def _pdf(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pii_scrub_hand(spark):
    out = textclean.pii_scrub(_pdf(spark, [(1, PII_DOC)])).collect()[0]
    assert (out.n_emails, out.n_ips, out.n_phones) == (2, 2, 2)
    assert out.clean_text == (
        "reach me at <EMAIL> or <EMAIL> today, "
        "server <IP> and <IP> respond, call <PHONE> or <PHONE> now"
    )


def test_pii_scrub_no_pii_is_identity(spark):
    doc = "plain words only, nothing sensitive here"
    out = textclean.pii_scrub(_pdf(spark, [(1, doc)])).collect()[0]
    assert (out.n_emails, out.n_ips, out.n_phones) == (0, 0, 0)
    assert out.clean_text == doc


def test_c4_line_filter_hand(spark):
    out = textclean.c4_line_filter(_pdf(spark, [(1, C4_DOC)])).collect()[0]
    assert out.n_lines == 7
    assert out.n_kept == 3
    assert out.clean_text == (
        "this line is long enough and ends well.\n"
        'a quoted ending counts too she said."\n'
        "is this a question?"
    )
    assert out.kept_ratio == pytest.approx(3 / 7, abs=1e-6)


def test_c4_line_filter_nothing_survives(spark):
    out = textclean.c4_line_filter(_pdf(spark, [(1, "x\ny z")])).collect()[0]
    assert (out.n_lines, out.n_kept, out.clean_text) == (2, 0, "")


def test_dupline_stats_hand(spark):
    out = textclean.dupline_stats(_pdf(spark, [(1, DUP_DOC)])).collect()[0]
    # 6 lines, distinct {aa bb, cc, dd} → 3 duplicate occurrences
    assert (out.n_lines, out.n_dup_lines) == (6, 3)
    assert out.dup_line_frac == pytest.approx(0.5, abs=1e-6)
    # chars: total 5+2+5+2+2+5=21, distinct 5+2+2=9 → dup 12/21
    assert out.dup_char_frac == pytest.approx(np.floor(12 / 21 * 1e6 + 0.5) / 1e6)


def test_bpe_pair_stats_brute(spark):
    rows = [(i, t) for i, t in enumerate(["abab cd", "aba  xy cd", "zz", "q"])]
    out = textclean.bpe_pair_stats(_pdf(spark, rows), k=50).collect()
    got = {(r.pair, r.cnt) for r in out}
    brute = {}
    for _, t in rows:
        for w in t.lower().split():
            if len(w) < 2:
                continue
            for i in range(len(w) - 1):
                brute[w[i : i + 2]] = brute.get(w[i : i + 2], 0) + 1
    assert got == set(brute.items())
    # deterministic order: cnt desc then pair asc
    assert [(r.cnt, r.pair) for r in out] == sorted(
        [(r.cnt, r.pair) for r in out], key=lambda x: (-x[0], x[1])
    )


def test_bpe_pair_stats_partition_invariance(spark):
    rows = [(i, f"word{i} alpha beta{i % 3} gamma") for i in range(40)]
    a = textclean.bpe_pair_stats(_pdf(spark, rows).repartition(1), k=15).collect()
    b = textclean.bpe_pair_stats(_pdf(spark, rows).repartition(8), k=15).collect()
    assert [(r.pair, r.cnt) for r in a] == [(r.pair, r.cnt) for r in b]


GOPHER_GOOD = (
    "the quick brown fox jumps over the lazy dog and then it continues "
    "to have many plain words of normal length that be just fine with "
    "everything here because sentences keep flowing along quite nicely "
    "and nothing looks like spam at all in this very tidy little paragraph of text"
)


def test_gopher_quality_hand(spark):
    docs = [
        (1, GOPHER_GOOD),  # keeps: 50+ words, stopwords present
        (2, "short doc"),  # too few words
        (3, "\n".join(["- item " + str(i) for i in range(10)])),  # all bullets
        (4, "### "*30 + GOPHER_GOOD),  # symbol ratio blown
        (5, ""),  # empty
    ]
    out = {r.doc_id: r for r in textclean.gopher_quality_filter(
        _pdf(spark, docs), min_words=50).collect()}
    assert out[1].keep is True
    assert out[1].n_words == len(GOPHER_GOOD.split())
    assert out[1].alpha_frac == 1.0 and out[1].stop_hits >= 2
    assert out[2].keep is False and out[2].n_words == 2
    assert out[3].keep is False and out[3].bullet_frac == 1.0
    assert out[4].keep is False and out[4].symbol_ratio > 0.1
    assert out[5].keep is False and out[5].n_words == 0


def test_gopher_quality_ellipsis_and_stopword_rules(spark):
    many_ellipsis = "\n".join(
        [f"the line number {i} of this document trails away..." for i in range(10)]
    )
    no_stops = " ".join(f"zork{i} blarg{i} quux{i}" for i in range(30))
    out = {r.doc_id: r for r in textclean.gopher_quality_filter(
        _pdf(spark, [(1, many_ellipsis), (2, no_stops)]), min_words=20).collect()}
    assert out[1].ellipsis_frac == 1.0 and out[1].keep is False
    assert out[2].stop_hits == 0 and out[2].keep is False


@pytest.mark.parametrize(
    "build_spark, build_sql",
    [
        (textclean.pii_scrub, textclean.pii_scrub_sql),
        (textclean.c4_line_filter, textclean.c4_line_filter_sql),
        (textclean.dupline_stats, textclean.dupline_stats_sql),
        (textclean.gopher_quality_filter, textclean.gopher_quality_filter_sql),
    ],
)
def test_oracle_parity_rowwise(spark, build_spark, build_sql):
    """Each op's DuckDB twin returns identical rows on a mixed fixture
    (PII + C4 structure + duplicate lines in the same docs)."""
    rows = [
        (1, PII_DOC),
        (2, C4_DOC),
        (3, DUP_DOC),
        (4, ""),
        (5, "one line mentioning bob@ex.org inside a kept sentence."),
        (6, "dup.\ndup.\nother line is long enough here?\ndup."),
    ]
    got = {r["doc_id"]: r for r in map(lambda r: r.asDict(), build_spark(_pdf(spark, rows)).collect())}
    con = duckdb.connect()
    con.execute(
        "create table documents as select * from (values "
        + ",".join(f"({i}, ?)" for i, _ in rows)
        + ") t(doc_id, text)",
        [t for _, t in rows],
    )
    cols = list(next(iter(got.values())).keys())
    for row in con.execute(build_sql()).fetchall():
        d = dict(zip([c[0] for c in con.description], row))
        g = got[d["doc_id"]]
        for c in cols:
            if isinstance(d[c], float):
                assert g[c] == pytest.approx(d[c]), (d["doc_id"], c, g[c], d[c])
            else:
                assert g[c] == d[c], (d["doc_id"], c, g[c], d[c])


def _bpe_reference(texts, n_merges):
    """Pure-Python Sennrich et al. 2016 trainer: word counts → greedy
    left-to-right merges, tie-break (count desc, pair lexicographic) —
    the independent truth for bpe_train."""
    vocab = {}
    for t in texts:
        for w in t.strip().lower().split():
            vocab[w] = vocab.get(w, 0) + 1
    segs = {w: list(w) for w in vocab}
    merges = []
    for rank in range(1, n_merges + 1):
        counts = {}
        for w, c in vocab.items():
            s = segs[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + c
        if not counts:
            break
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, a + b, cnt))
        for w in segs:
            s, out, i = segs[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = out
    return merges, {w: segs[w] for w in vocab}, vocab


def test_bpe_train_matches_reference(spark):
    """bpe_train: merge list AND every final word segmentation match the
    pure-Python Sennrich reference exactly, on a corpus engineered with
    overlapping-merge chains (aaaa), cross-round remerges (ab+ab→abab)
    and tie-broken pairs."""
    texts = [
        "abab abab cdcd",
        "aaaa aa a banana",
        "low lower lowest newest widest",
        "abab banana aaaa",
        "",
    ]
    rows = [(i, t) for i, t in enumerate(texts)]
    mdf, vdf = textclean.bpe_train(_pdf(spark, rows), n_merges=8)
    got_merges = [
        (r.rank, r.tok_a, r.tok_b, r.merged, r.cnt) for r in mdf.orderBy("rank").collect()
    ]
    want_merges, want_segs, want_vocab = _bpe_reference(texts, 8)
    assert got_merges == want_merges
    got = {r.word: (r.cnt, list(r.seg)) for r in vdf.collect()}
    assert got == {w: (want_vocab[w], want_segs[w]) for w in want_vocab}


def test_bpe_train_stops_when_dry(spark):
    """Single-char words have no pairs: training stops early with an
    empty merge list and identity segmentations."""
    mdf, vdf = textclean.bpe_train(_pdf(spark, [(1, "a b c a")]), n_merges=5)
    assert mdf.count() == 0
    assert {r.word: list(r.seg) for r in vdf.collect()} == {
        "a": ["a"], "b": ["b"], "c": ["c"]
    }


def test_bpe_encode_roundtrip_with_training(spark):
    """bpe_encode with bpe_train's merges: every trained word tokenizes
    to exactly its final training segmentation (train/inference
    consistency), doc token arrays are the word-wise concatenation, and
    UNSEEN words still segment correctly by rank-ordered merges."""
    texts = ["abab abab cdcd", "aaaa aa a banana", "low lower lowest", ""]
    rows = [(i, t) for i, t in enumerate(texts)]
    mdf, vdf = textclean.bpe_train(_pdf(spark, rows), n_merges=6)
    merges = [(r.rank, r.tok_a, r.tok_b) for r in mdf.collect()]
    enc = {r.doc_id: list(r.tokens) for r in
           textclean.bpe_encode(_pdf(spark, rows), merges).collect()}
    segs = {r.word: list(r.seg) for r in vdf.collect()}
    for i, t in enumerate(texts):
        want = [p for w in t.strip().lower().split() for p in segs[w]]
        assert enc[i] == want, i
    # unseen word: apply merges by rank via the Python reference
    ranked = [(a, b) for _, a, b in sorted(merges)]

    def ref(w):
        s = list(w)
        for a, b in ranked:
            out, j = [], 0
            while j < len(s):
                if j + 1 < len(s) and s[j] == a and s[j + 1] == b:
                    out.append(a + b); j += 2
                else:
                    out.append(s[j]); j += 1
            s = out
        return s

    unseen = "ababcdbanana"
    got = textclean.bpe_encode(
        _pdf(spark, [(9, unseen)]), merges).collect()[0]
    assert list(got.tokens) == ref(unseen) and got.n_tokens == len(ref(unseen))


def test_bpe_oracle_parity(spark):
    rows = [(i, f"alpha bravo{i % 4} charlie delta{i % 2} e") for i in range(30)]
    got = [(r.pair, r.cnt) for r in textclean.bpe_pair_stats(_pdf(spark, rows), k=12).collect()]
    con = duckdb.connect()
    con.execute(
        "create table documents as select * from (values "
        + ",".join(f"({i}, ?)" for i, _ in rows)
        + ") t(doc_id, text)",
        [t for _, t in rows],
    )
    want = con.execute(textclean.bpe_pair_stats_sql(k=12)).fetchall()
    assert got == [(p, c) for p, c in want]


def test_bpe_train_sql_oracle_matches_reference():
    """The r5 unrolled-CTE oracle (bpe_train_sql): the 8-round merge
    list from pure DuckDB matches the pure-Python Sennrich reference on
    the adversarial corpus (overlapping aaaa chains, cross-round
    ab+ab→abab remerges, tie-broken pairs) — proving the run-parity
    rewrite of the greedy fold, independently of Spark."""
    import pandas as pd

    texts = [
        "abab abab cdcd",
        "aaaa aa a banana",
        "low lower lowest newest widest",
        "abab banana aaaa",
        "",
    ]
    con = duckdb.connect()
    con.register("docs_pd", pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))
    con.sql("create view documents as select * from docs_pd")
    got = [
        tuple(r)
        for r in con.sql(textclean.bpe_train_sql("documents", n_merges=8))
        .df()
        .itertuples(index=False)
    ]
    want_merges, _, _ = _bpe_reference(texts, 8)
    assert got == [tuple(m) for m in want_merges]
