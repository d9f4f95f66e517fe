"""Dedup skew guards: degenerate LSH buckets stay bounded, hot shingles
are capped before the Jaccard self-join (VERDICT r01 #3/#4)."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from geodesk_spark.operators import dedup

CLIQUE = 10_000


def test_lsh_bucket_cap_bounded(spark):
    """A 10k-doc duplicate clique lands in ONE band bucket per band:
    with the cap it emits chain pairs (n-1), not ~n²/2 clique edges,
    and connected_components still resolves the whole clique into one
    duplicate group."""
    clique = spark.range(CLIQUE).select(
        F.col("id").alias("doc_id"),
        F.lit("the quick brown fox jumps over the lazy dog again").alias("text"),
    )
    distinct = spark.range(CLIQUE, CLIQUE + 200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("unique document number "), F.col("id"),
                 F.lit(" with its own words")).alias("text"),
    )
    docs = clique.unionByName(distinct)
    pairs = dedup.lsh_candidate_pairs(docs, bucket_cap=100)
    pdf = pairs.toPandas()
    # star pairs around the smallest clique id, identical in every band
    # (the near-identical "distinct" docs may add their own small pairs)
    cl = pdf[(pdf["doc_a"] < CLIQUE) & (pdf["doc_b"] < CLIQUE)]
    assert len(cl) == CLIQUE - 1
    assert (cl["doc_a"] == 0).all()
    comps = dedup.connected_components(pairs).toPandas()
    in_clique = comps[comps["doc_id"] < CLIQUE]
    assert len(in_clique) == CLIQUE
    assert (in_clique["comp_id"] == 0).all()


def test_lsh_small_buckets_all_pairs(spark):
    """Below the cap the output is the exact all-pairs expansion."""
    docs = spark.createDataFrame(
        [(i, "identical text body here") for i in range(5)]
        + [(10, "another text entirely different")],
        "doc_id long, text string",
    )
    got = dedup.lsh_candidate_pairs(docs, bucket_cap=100).toPandas()
    want = {(a, b) for a in range(5) for b in range(a + 1, 5)}
    assert {tuple(r) for r in got[["doc_a", "doc_b"]].itertuples(index=False)} == want


def test_jaccard_cap_defaults_on():
    """The hot-shingle skew guard must be ON by default (None is the
    explicit opt-out, not the default — an unguarded quadratic self-join
    is never a safe default at scale)."""
    import inspect

    default = inspect.signature(dedup.ngram_jaccard_pairs).parameters["max_doc_freq"].default
    assert default is not None and default >= 1


def test_jaccard_doc_freq_cap(spark):
    """Hot shingles (df > cap) are dropped from the representation before
    the self-join; expected pairs computed independently with python sets."""
    rng = np.random.default_rng(7)
    hot = "lorem ipsum dolor"  # one 3-gram shared by every doc
    rows = []
    for i in range(120):
        tail = " ".join(f"w{i}_{j}" for j in range(6))
        rows.append((i, f"{hot} {tail}"))
    # two real near-dup docs sharing most of their tails
    rows.append((900, f"{hot} alpha beta gamma delta epsilon zeta"))
    rows.append((901, f"{hot} alpha beta gamma delta epsilon eta"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cap = 50
    got = dedup.ngram_jaccard_pairs(docs, threshold=0.3, max_doc_freq=cap).toPandas()

    def shingles(t):
        w = t.split()
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    sets = {i: shingles(t) for i, t in rows}
    from collections import Counter

    df_count = Counter(s for ss in sets.values() for s in ss)
    sets = {i: {s for s in ss if df_count[s] <= cap} for i, ss in sets.items()}
    want = set()
    ids = sorted(sets)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            inter = len(sets[a] & sets[b])
            if inter and round(inter / len(sets[a] | sets[b]), 6) >= 0.3:
                want.add((a, b))
    assert {tuple(r) for r in got[["doc_a", "doc_b"]].itertuples(index=False)} == want
    assert (900, 901) in want  # the cap must not kill real near-dups


def test_phash_neardup_exact_recall(spark):
    """Pigeonhole guarantee: every planted ≤3-bit pair is found; random
    64-bit pairs produce no false candidates surviving the exact test."""
    import __spark_entry__ as em

    rows = em._phash_fixture()
    imgs = spark.createDataFrame(rows, "image_id string, phash long")
    got = dedup.phash_neardup_pairs(imgs).toPandas()
    want = {(f"dup{i:012d}", f"img{int(i):012d}") for i in range(0, 500, 10)}
    assert {tuple(r) for r in got[["id_a", "id_b"]].itertuples(index=False)} == want
    assert (got["hamming"] <= 3).all() and (got["hamming"] >= 1).all()


def test_phash_neardup_bucket_cap(spark):
    """A degenerate bucket (identical phash shared by many images) emits
    O(n) star pairs instead of a quadratic clique, and the bucket stays
    one diameter-2 component."""
    rows = [(f"flat{i:04d}", 0x1234) for i in range(50)]
    imgs = spark.createDataFrame(rows, "image_id string, phash long")
    got = dedup.phash_neardup_pairs(imgs, bucket_cap=10).toPandas()
    assert len(got) == 49  # star from the smallest id, not C(50,2)=1225
    assert set(got["id_a"]) == {"flat0000"}
    assert (got["hamming"] == 0).all()


def test_embedding_neardup_measured_recall(spark):
    """Pin the sign-LSH blocking quality: precision is exactly 1.0 (every
    emitted pair clears the threshold) and measured recall on the sf0.01
    embeddings corpus stays above the floor we ship with."""
    from geodesk_spark.sources import tables

    e = tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    got = dedup.embedding_neardup_pairs(e, threshold=0.40, sign_dims=4).toPandas()
    found = {(int(a), int(b)) for a, b in got[["id_a", "id_b"]].itertuples(index=False)}

    pdf = e.toPandas()
    M = np.stack(pdf["embedding"].to_numpy())
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    cos = M @ M.T
    ids = pdf["vec_id"].to_numpy()
    iu = np.triu_indices(len(ids), k=1)
    true = {
        (int(min(ids[i], ids[j])), int(max(ids[i], ids[j])))
        for i, j in zip(*iu)
        if round(cos[i, j], 6) >= 0.40
    }
    assert found <= true  # precision 1.0: no false positives
    recall = len(found & true) / len(true) if true else 1.0
    assert len(true) > 0  # corpus must exercise the threshold
    assert recall >= 0.7, f"recall {recall:.2f} below documented floor ({len(found)}/{len(true)})"


def test_neardup_tables_for_analytic():
    """Table count from the threshold: monotone (looser threshold needs
    more tables) and matching the closed form 1-(1-p)^T ≥ target."""
    import math

    prev = 0
    for thr in (0.9, 0.8, 0.6, 0.4, 0.2):
        t = dedup.neardup_tables_for(thr, sign_dims=4, target_recall=0.9)
        assert t >= prev  # looser threshold → never fewer tables
        prev = t
        p = (1 - math.acos(thr) / math.pi) ** 4
        if t < 16:  # not clipped by max_tables
            assert 1 - (1 - p) ** t >= 0.9
            assert t == 1 or 1 - (1 - p) ** (t - 1) < 0.9  # minimal
    assert dedup.neardup_tables_for(0.8, sign_dims=4) == 5
    assert dedup.neardup_tables_for(0.4, sign_dims=4) == 14


def test_embedding_neardup_adaptive_tables(spark):
    """n_tables=None sizes the blocking from the threshold; at 0.40 the
    analytic choice (14 tables) must clear the 0.9 recall target on the
    seeded corpus (dim 64 caps it at 16)."""
    from geodesk_spark.sources import tables

    e = tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    got = dedup.embedding_neardup_pairs(
        e, threshold=0.40, sign_dims=4, n_tables=None
    ).toPandas()
    found = {(int(a), int(b)) for a, b in got[["id_a", "id_b"]].itertuples(index=False)}

    pdf = e.toPandas()
    M = np.stack(pdf["embedding"].to_numpy())
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    cos = M @ M.T
    ids = pdf["vec_id"].to_numpy()
    iu = np.triu_indices(len(ids), k=1)
    true = {
        (int(min(ids[i], ids[j])), int(max(ids[i], ids[j])))
        for i, j in zip(*iu)
        if round(cos[i, j], 6) >= 0.40
    }
    assert found <= true
    recall = len(found & true) / len(true) if true else 1.0
    assert recall >= 0.9, f"adaptive recall {recall:.2f} below analytic target"


def test_connected_components_max_iter_collapse(spark):
    """ADVICE r03: exhausting max_iter before the star fixpoint must
    still yield exactly ONE (doc_id, comp_id) row per vertex (collapsed
    by min + RuntimeWarning), never silent row duplication."""
    import warnings

    # long path graph: 0-1-2-...-19 — needs several star rounds
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(19)], "doc_a long, doc_b long"
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = dedup.connected_components(pairs, max_iter=1).collect()
    rows_per_vertex = {}
    for r in out:
        rows_per_vertex[r["doc_id"]] = rows_per_vertex.get(r["doc_id"], 0) + 1
    assert len(out) == 20
    assert all(n == 1 for n in rows_per_vertex.values())
    # converged run: no warning, exact components
    full = dedup.connected_components(pairs).collect()
    assert {(r["doc_id"], r["comp_id"]) for r in full} == {(i, 0) for i in range(20)}


def test_substring_span_stats(spark):
    """Cross-doc k-token span dedup: planted shared spans are counted,
    short docs stay in the output with zero spans, within-doc repeats
    alone do NOT count as cross-doc duplication."""
    shared = "the quick brown fox jumps over the lazy"  # 8 tokens
    docs = [
        (0, shared + " dog and then some extra words here"),
        (1, "prefix words first " + shared + " tail tokens"),
        (2, "totally unrelated content with eight plus distinct words present"),
        (3, "short doc"),  # < k tokens
        (4, "rep rep rep rep rep rep rep rep rep rep"),  # within-doc only
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in dedup.substring_span_stats(df, k=8).collect()
    }
    assert set(got) == {0, 1, 2, 3, 4}
    assert got[3]["n_spans"] == 0 and got[3]["dup_span_ratio"] == 0.0
    # doc 0: 15 tokens -> 8 spans; exactly 1 (the shared span) is cross-doc
    assert got[0]["n_spans"] == 8 and got[0]["n_dup_spans"] == 1
    assert got[1]["n_dup_spans"] == 1
    assert got[2]["n_dup_spans"] == 0
    # doc 4 repeats within itself only: all 8-grams identical but single-doc
    assert got[4]["n_dup_spans"] == 0
    assert abs(got[0]["dup_span_ratio"] - 0.125) < 1e-9


def test_substring_span_stats_oracle_parity(spark):
    """Spark == DuckDB twin on the real documents table."""
    import duckdb

    sf = "/root/testdata/sf0.001"
    df = spark.read.parquet(f"{sf}/documents.parquet")
    got = (
        dedup.substring_span_stats(df, k=8)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(f"create view documents as select * from '{sf}/documents.parquet'")
    want = (
        con.sql(dedup.substring_span_stats_sql("documents", k=8))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for c in ("doc_id", "n_spans", "n_dup_spans"):
        assert (got[c].astype("int64") == want[c].astype("int64")).all(), c
    assert (got["dup_span_ratio"] == want["dup_span_ratio"]).all()
    assert (want["n_dup_spans"] > 0).any()


def test_substring_span_stats_partition_invariance(spark):
    """Determinism law: the span stats are identical under different
    partitionings/row orders (the window min/max flag is order-free)."""
    sf = "/root/testdata/sf0.001"
    df = spark.read.parquet(f"{sf}/documents.parquet")
    a = (
        dedup.substring_span_stats(df.repartition(1), k=8)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        dedup.substring_span_stats(df.repartition(16, "text"), k=8)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert a.equals(b)
    # structural invariants
    assert (a["n_dup_spans"] <= a["n_spans"]).all()
    assert a["dup_span_ratio"].between(0.0, 1.0).all()


def test_remove_dup_spans_hand_semantics(spark):
    """Canonical occurrence (smallest doc_id, pos) survives; every other
    occurrence of a cross-doc duplicated k-token span is cut; unique
    text and short docs pass through; case is preserved in clean_text
    while keys casefold."""
    docs = spark.createDataFrame(
        [
            (1, "The quick brown fox jumps over lazy dogs tail end"),
            (2, "the quick brown fox jumps over lazy dogs BUT different"),
            (3, "totally unique words nothing shared with anyone else here"),
            (4, "tiny doc"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in dedup.remove_dup_spans(docs, k=8).collect()}
    # doc 1 holds the canonical occurrence -> untouched, original case
    assert got[1].n_removed == 0
    assert got[1].clean_text.startswith("The quick")
    # doc 2: its first 8 tokens duplicate doc 1's span (casefolded) -> cut
    assert got[2].n_removed == 8
    assert got[2].clean_text == "BUT different"
    assert abs(got[2].removed_ratio - 0.8) < 2e-6
    # unique + short docs pass through whitespace-normalized
    assert got[3].n_removed == 0 and got[3].clean_text.startswith("totally")
    assert got[4].n_tokens == 2 and got[4].n_removed == 0


def test_remove_dup_spans_overlap_union(spark):
    """Overlapping removed spans union their coverage (no double count,
    no gap): doc 2 repeats a 10-token run of doc 1 -> three overlapping
    8-grams, 10 tokens removed."""
    run = "a b c d e f g h i j"
    docs = spark.createDataFrame(
        [(1, run + " unique1 tail"), (2, run + " other2 words")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in dedup.remove_dup_spans(docs, k=8).collect()}
    assert got[1].n_removed == 0
    assert got[2].n_removed == 10
    assert got[2].clean_text == "other2 words"


def test_remove_dup_spans_partition_invariance(spark):
    sf = "/root/testdata/sf0.001"
    df = spark.read.parquet(f"{sf}/documents.parquet")
    a = (
        dedup.remove_dup_spans(df.repartition(1), k=8)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        dedup.remove_dup_spans(df.repartition(16, "text"), k=8)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert a.equals(b)
    assert (a["n_removed"] <= a["n_tokens"]).all()


def test_cdc_chunks_shift_robust(spark):
    """The CDC law: inserting bytes near the start of a blob leaves the
    bulk of chunk fingerprints intact (boundaries re-synchronize),
    while fixed-offset blocking would lose every block after the edit;
    distinct random blobs share ~no chunks; pairs detect the planted
    shifted copy."""
    import numpy as np

    from geodesk_spark.operators import dedup as dd

    rng = np.random.default_rng(21)
    base = rng.integers(0, 256, size=20_000, dtype=np.uint8).tobytes()
    shifted = b"INSERTED-PREFIX-BYTES!" + base  # edit at the front
    other = rng.integers(0, 256, size=20_000, dtype=np.uint8).tobytes()

    fa = set(dd.cdc_chunk_fps(base))
    fb = set(dd.cdc_chunk_fps(shifted))
    fo = set(dd.cdc_chunk_fps(other))
    assert len(fa) > 15  # ~2^9-byte chunks over 20 kB
    shared = len(fa & fb) / len(fa | fb)
    assert shared > 0.8, shared  # re-synchronized after the edit
    assert len(fa & fo) / len(fa | fo) < 0.05  # distinct blobs disjoint

    df = spark.createDataFrame(
        [("a", bytearray(base)), ("b", bytearray(shifted)), ("c", bytearray(other)),
         ("n", None)],
        "image_id string, bytes binary",
    )
    pairs = dd.cdc_neardup_pairs(df, min_jaccard=0.5).collect()
    assert [(p.id_a, p.id_b) for p in pairs] == [("a", "b")]
    assert pairs[0].jaccard > 0.8


def test_cdc_neardup_measured_recall(spark):
    """Pin CDC near-dup quality the way the other near-dup paths are
    pinned (r4 verdict ask #8): a planted shifted-copy corpus — 40 base
    blobs, each with a copy carrying a random mid-blob insert edit —
    measured against the brute chunk-Jaccard truth.

    Floors shipped: planted-pair recall >= 0.95 at min_jaccard=0.5,
    precision vs brute truth exactly 1.0 (the distributed path computes
    the same Jaccard the brute path does; the df-cap may only LOWER a
    pair's jaccard, never raise it), and zero cross-pair false
    positives between unrelated random blobs."""
    import numpy as np

    from geodesk_spark.operators import dedup as dd

    rng = np.random.default_rng(55)
    rows, blobs = [], {}
    for i in range(40):
        base = rng.integers(0, 256, size=8192, dtype=np.uint8).tobytes()
        pos = int(rng.integers(500, 7500))
        ins = rng.integers(0, 256, size=int(rng.integers(8, 120)),
                           dtype=np.uint8).tobytes()
        copy = base[:pos] + ins + base[pos:]
        blobs[f"b{i:03d}"] = base
        blobs[f"c{i:03d}"] = copy
    rows = [(k, bytearray(v)) for k, v in sorted(blobs.items())]
    df = spark.createDataFrame(rows, "image_id string, bytes binary")

    got = dd.cdc_neardup_pairs(df, min_jaccard=0.5).toPandas()
    found = {
        (a, b): round(j, 6)
        for a, b, j in got[["id_a", "id_b", "jaccard"]].itertuples(index=False)
    }

    # brute truth: host-side chunk Jaccard over every pair
    fps = {k: set(dd.cdc_chunk_fps(v)) for k, v in blobs.items()}
    ids = sorted(fps)
    true = {}
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            inter = len(fps[a] & fps[b])
            if inter:
                j = inter / len(fps[a] | fps[b])
                if round(j, 6) >= 0.5:
                    true[(a, b)] = round(j, 6)

    planted = {(f"b{i:03d}", f"c{i:03d}") for i in range(40)}
    # precision 1.0: everything emitted is a true pair with the same jaccard
    assert set(found) <= set(true)
    for k in found:
        assert abs(found[k] - true[k]) < 1e-6
    # no unrelated pair sneaks into the truth set (random blobs disjoint)
    assert set(true) <= planted
    recall_true = len(set(found) & set(true)) / len(true)
    recall_planted = len(set(found) & planted) / len(planted)
    print(
        f"CDC near-dup measured: planted_recall={recall_planted:.3f} "
        f"truth_recall={recall_true:.3f} precision=1.000 "
        f"({len(found)} found / {len(true)} true / {len(planted)} planted)"
    )
    assert recall_true >= 0.95, (recall_true, len(found), len(true))
    assert recall_planted >= 0.9, recall_planted
