"""Stratified sampling + sequence packing (operators/sampling.py)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geodesk_spark.operators import sampling


@pytest.fixture(scope="module")
def docs(spark):
    rng = np.random.default_rng(3)
    n = 2000
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(n),
            "lang": rng.choice(["en", "de", "fr", "sw"], n, p=[0.7, 0.2, 0.08, 0.02]),
            "n_tokens": rng.integers(10, 3000, n),
        }
    )
    return spark.createDataFrame(pdf)


def test_stratified_exact_counts(docs):
    """ceil(f·n) from EVERY stratum — the binomial sampler's failure mode
    (an empty small stratum) cannot happen."""
    f = 0.1
    out = sampling.stratified_sample(docs, "lang", f, id_col="doc_id").toPandas()
    n_per = docs.groupBy("lang").count().toPandas().set_index("lang")["count"]
    got = out.groupby("lang").size()
    for lang, n in n_per.items():
        assert got.get(lang, 0) == int(np.ceil(n * f)), lang
    # deterministic: same corpus → same sample
    again = sampling.stratified_sample(docs, "lang", f, id_col="doc_id").toPandas()
    assert sorted(out["doc_id"]) == sorted(again["doc_id"])


def test_pack_sequences_invariants(docs):
    budget = 8192
    out = sampling.pack_sequences(docs, budget, len_col="n_tokens").toPandas()
    assert len(out) == docs.count()  # every doc assigned
    per_bin = out.groupby("bin_id")["n_tokens"].sum()
    max_len = out["n_tokens"].max()
    # straddle semantics: a bin never exceeds budget + (max_len - 1)
    assert (per_bin <= budget + max_len - 1).all()
    # with every doc under the budget, bins are contiguous 0..B and all
    # but the last are at least budget - (max_len - 1) full (oversized
    # docs would instead skip label values — see the property test)
    bins = sorted(per_bin.index)
    assert bins == list(range(len(bins)))
    assert (per_bin.iloc[:-1] >= budget - max_len + 1).all()
    # total token count preserved
    assert per_bin.sum() == out["n_tokens"].sum()


def test_pack_sequences_oversized_doc(spark):
    """A document longer than the budget opens (and overflows) its own
    bin instead of being dropped or crashing."""
    pdf = pd.DataFrame({"doc_id": [1, 2, 3], "n_tokens": [10000, 50, 40]})
    out = sampling.pack_sequences(spark.createDataFrame(pdf), 4096).toPandas()
    big = out[out["doc_id"] == 1].iloc[0]
    assert big["bin_id"] == 0
    rest = out[out["doc_id"] != 1]
    assert (rest["bin_id"] > 0).all()  # nothing shares the overflowed bin


def test_stratified_mix_fractions(docs):
    """Dict fractions = training-data mix: exact per-stratum counts,
    absent strata dropped."""
    mix = {"en": 0.05, "sw": 1.0}
    out = sampling.stratified_sample(docs, "lang", mix, id_col="doc_id").toPandas()
    n_per = docs.groupBy("lang").count().toPandas().set_index("lang")["count"]
    got = out.groupby("lang").size()
    assert got.get("en", 0) == int(np.ceil(n_per["en"] * 0.05))
    assert got.get("sw", 0) == n_per["sw"]  # rare stratum fully kept
    assert set(out["lang"]) <= {"en", "sw"}  # de/fr dropped (default 0)


def test_weighted_sample_deterministic_and_biased(spark):
    from geodesk_spark.operators import sampling

    rows = [(i, "en", 10 if i != 7 else 10_000_000) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")
    s1 = sampling.weighted_sample(df, k=50, weight_col="n_chars")
    s2 = sampling.weighted_sample(df, k=50, weight_col="n_chars")
    ids1 = sorted(r["doc_id"] for r in s1.collect())
    ids2 = sorted(r["doc_id"] for r in s2.collect())
    assert ids1 == ids2 and len(ids1) == 50
    # a 10^6x-weight row is (1 - ~1e-6)^... essentially certain to be drawn
    assert 7 in ids1
    # different seed → different draw
    ids3 = sorted(
        r["doc_id"]
        for r in sampling.weighted_sample(df, k=50, weight_col="n_chars", seed="9").collect()
    )
    assert ids3 != ids1


def test_group_quantiles_hand_case(spark):
    from geodesk_spark.operators import stats

    rows = [("a", float(v), i) for i, v in enumerate([5, 1, 4, 2, 3])] + [
        ("b", 10.0, 100),
        ("b", 20.0, 101),
    ]
    df = spark.createDataFrame(rows, "g string, value double, event_id long")
    out = {
        r["g"]: r
        for r in stats.group_quantiles(df, "g", "value", "event_id").collect()
    }
    # group a: sorted [1,2,3,4,5]; ceil(.5*5)=3 -> 3.0; ceil(.9*5)=5 -> 5.0
    assert out["a"]["n"] == 5 and out["a"]["q5"] == 3.0
    assert out["a"]["q9"] == 5.0 and out["a"]["q99"] == 5.0
    # group b: ceil(.5*2)=1 -> 10.0; ceil(.9*2)=2 -> 20.0
    assert out["b"]["q5"] == 10.0 and out["b"]["q9"] == 20.0


def test_group_linreg_exact_line(spark):
    from geodesk_spark.operators import stats

    # y = 2x + 3 exactly -> slope 2, intercept 3; plus a constant-x group
    rows = [(1, x, 2.0 * x + 3.0) for x in range(0, 100, 7)]
    rows += [(2, 5, 1.0), (2, 5, 3.0)]
    df = spark.createDataFrame(rows, "g long, xr long, value double")
    out = {r["g"]: r for r in stats.group_linreg(df, "g", "xr", "value").collect()}
    assert out[1]["slope"] == 2.0 and out[1]["intercept"] == 3.0
    assert out[2]["slope"] is None and out[2]["intercept"] is None


def test_tag_stats_hand_case(spark):
    from pyspark.sql import functions as F
    from geodesk_spark.operators import tags as tags_mod

    df = spark.createDataFrame(
        [({"a": "x", "b": "p"},), ({"a": "x", "b": "q"},), ({"a": "y"},)],
        "tags map<string,string>",
    )
    out = {r["tag_key"]: r for r in tags_mod.tag_stats(df).collect()}
    assert out["a"]["n_features"] == 3 and out["a"]["n_values"] == 2
    assert out["a"]["top_value"] == "x" and out["a"]["top_n"] == 2
    # b: tie between p and q -> lexicographically smallest wins
    assert out["b"]["top_value"] == "p" and out["b"]["n_features"] == 2


def test_aspect_bucket_batches_invariants(spark):
    """Two-phase per-bucket rank: matches a pandas single-node reference,
    batches fill to exactly batch_size except each bucket's last, and
    the result is independent of input partitioning."""
    import pandas as pd

    from geodesk_spark.operators import images

    rows = [(i, 160 + (i * 7) % 1280, 120 + (i * 11) % 720) for i in range(1, 1001)]
    pdf = pd.DataFrame(rows, columns=["image_id", "w", "h"])
    pdf["bucket"] = (pdf.w * 8 // pdf.h).clip(upper=32)
    pdf = pdf.sort_values(["bucket", "h", "image_id"], ascending=[True, False, True])
    pdf["rank"] = pdf.groupby("bucket").cumcount() + 1
    pdf["batch_id"] = (pdf["rank"] - 1) // 7
    want = {t.image_id: (t.bucket, t.rank, t.batch_id) for t in pdf.itertuples()}

    for n_part in (1, 5):
        df = spark.createDataFrame(rows, "image_id long, w long, h long").repartition(n_part)
        got = {
            r.image_id: (r.bucket, r.rank, r.batch_id)
            for r in images.aspect_bucket_batches(df, batch_size=7).collect()
        }
        assert got == want, n_part

    out = images.aspect_bucket_batches(
        spark.createDataFrame(rows, "image_id long, w long, h long"), batch_size=7
    )
    sizes = out.groupBy("bucket", "batch_id").count().collect()
    per_bucket_max = {}
    for r in sizes:
        per_bucket_max[r.bucket] = max(per_bucket_max.get(r.bucket, -1), r.batch_id)
    for r in sizes:
        if r.batch_id < per_bucket_max[r.bucket]:
            assert r["count"] == 7, (r.bucket, r.batch_id)
        else:
            assert 1 <= r["count"] <= 7


def test_epoch_shards_laws(docs):
    """Pandas-reference parity (exact permutation), dense full shards,
    partition-layout independence, and epoch sensitivity."""
    import hashlib

    size = 128
    out = sampling.epoch_shards(docs, size, id_col="doc_id", seed="s", epoch=1).toPandas()
    n = out.shape[0]
    assert n == docs.count()

    # exact reference permutation
    ids = docs.select("doc_id").toPandas()["doc_id"].tolist()
    keyed = sorted(ids, key=lambda i: (hashlib.md5(f"s|1|{i}".encode()).hexdigest(), i))
    ref = {doc: (rk // size, rk % size) for rk, doc in enumerate(keyed)}
    got = {r.doc_id: (r.shard_id, r.pos) for r in out.itertuples()}
    assert got == ref

    # dense shards: every shard but the last is exactly full
    sizes = out.groupby("shard_id").size().sort_index()
    assert (sizes.iloc[:-1] == size).all() and 0 < sizes.iloc[-1] <= size
    assert sizes.index.tolist() == list(range((n + size - 1) // size))

    # independent of input partitioning
    out2 = sampling.epoch_shards(
        docs.repartition(13), size, id_col="doc_id", seed="s", epoch=1
    ).toPandas()
    got2 = {r.doc_id: (r.shard_id, r.pos) for r in out2.itertuples()}
    assert got2 == ref

    # a different epoch re-mixes
    out3 = sampling.epoch_shards(docs, size, id_col="doc_id", seed="s", epoch=2).toPandas()
    got3 = {r.doc_id: (r.shard_id, r.pos) for r in out3.itertuples()}
    assert got3 != ref


def test_shard_manifest_conservation(docs):
    """Manifest totals must conserve the corpus: Σ n_rows = n,
    Σ payload_sum = Σ n_tokens, Σ id_sum = Σ doc_id."""
    assign = sampling.epoch_shards(docs, 256, id_col="doc_id")
    m = sampling.shard_manifest(assign, docs, "n_tokens").toPandas()
    src = docs.toPandas()
    assert m["n_rows"].sum() == len(src)
    assert m["payload_sum"].sum() == src["n_tokens"].sum()
    assert m["id_sum"].sum() == src["doc_id"].sum()


def test_budget_allocate_water_filling(spark):
    """Water-filling laws: proportionality when nothing caps, exact cap
    + surplus redistribution when a small domain saturates, Σalloc =
    min(total, Σcaps), and parity with an independent host replay."""
    from geodesk_spark.operators import sampling

    rows = [("a", 500_000, 10_000), ("b", 300_000, 200), ("c", 200_000, 10_000)]
    dom = spark.createDataFrame(rows, "domain string, weight_ppm long, cap long")
    got = {r.domain: r.alloc for r in
           sampling.budget_allocate(dom, total=5000, rounds=6).collect()}

    def replay(rows, total, rounds):
        st = {k: {"w": w, "cap": c, "alloc": 0, "fixed": False} for k, w, c in rows}
        for _ in range(rounds):
            S = sum(v["w"] for v in st.values() if not v["fixed"])
            B = total - sum(v["alloc"] for v in st.values() if v["fixed"])
            base, rem = {}, {}
            for k, v in st.items():
                live = (not v["fixed"]) and S > 0
                base[k] = (B * v["w"]) // max(S, 1) if live else 0
                rem[k] = (B * v["w"]) % max(S, 1) if live else -1
            leftover = B - sum(base.values())
            order = sorted(st, key=lambda k: (-rem[k], k))
            plus = {k: 1 if (not st[k]["fixed"]) and order.index(k) < leftover else 0
                    for k in st}
            for k, v in st.items():
                if not v["fixed"]:
                    t = base[k] + plus[k]
                    v["alloc"] = min(t, v["cap"])
                    if t >= v["cap"]:
                        v["fixed"] = True
        return {k: v["alloc"] for k, v in st.items()}

    exp = replay(rows, 5000, 6)
    assert got == exp
    # b saturates (fair share 1500 > cap 200); surplus flows to a and c
    assert got["b"] == 200
    assert sum(got.values()) == 5000
    # a:c keep the 5:2 ratio on the remaining 4800 (within rounding)
    assert abs(got["a"] * 2 - got["c"] * 5) <= 7

    # total above aggregate supply: everything caps
    got2 = {r.domain: r.alloc for r in
            sampling.budget_allocate(dom, total=50_000, rounds=6).collect()}
    assert got2 == {"a": 10_000, "b": 200, "c": 10_000}


def test_leakage_safe_split(spark):
    """Split laws: all members of a component share a split, singletons
    hash on their own id, fractions are respected in aggregate, reruns
    are identical, and reseeding moves assignments."""
    from geodesk_spark.operators import sampling

    docs = spark.createDataFrame([(i,) for i in range(2000)], "doc_id long")
    comp = spark.createDataFrame(
        [(i, (i // 10) * 10) for i in range(0, 1000)],  # groups of 10
        "doc_id long, comp_id long",
    )
    out = sampling.leakage_safe_split(docs, comp).collect()
    assert len(out) == 2000
    by_comp = {}
    for r in out:
        by_comp.setdefault(r.comp_id, set()).add(r.split)
    # every component maps to exactly one split (incl. singleton docs)
    assert all(len(v) == 1 for v in by_comp.values())
    # grouped docs carry their group id; ungrouped docs self-compose
    comp_of = {r.doc_id: r.comp_id for r in out}
    assert comp_of[7] == 0 and comp_of[1500] == 1500
    # aggregate fractions within tolerance (hash uniformity)
    from collections import Counter
    frac = Counter(r.split for r in out)
    assert 0.7 < frac["train"] / 2000 < 0.9
    assert frac["train"] + frac["val"] + frac["test"] == 2000
    # deterministic rerun; reseed changes some assignment
    again = {(r.doc_id, r.split) for r in
             sampling.leakage_safe_split(docs, comp).collect()}
    assert again == {(r.doc_id, r.split) for r in out}
    reseeded = {r.doc_id: r.split for r in
                sampling.leakage_safe_split(docs, comp, seed=7).collect()}
    assert any(reseeded[r.doc_id] != r.split for r in out)
