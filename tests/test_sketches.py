"""HLL sketch: register determinism, mergeability, estimator error."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from geodesk_spark.operators import sketches


@pytest.fixture(scope="module")
def ids_df(spark):
    # 5000 distinct ids, each duplicated a varying number of times.
    rows = [(f"id_{i}", "g") for i in range(5000) for _ in range(1 + i % 3)]
    return spark.createDataFrame(rows, schema="v string, grp string")


def _py_registers(values, p=9):
    regs = {}
    for v in values:
        h = int(hashlib.md5(v.encode()).hexdigest()[:15], 16)
        b = h % (1 << p)
        w = h >> p
        rho = (60 - p) + 1 if w == 0 else (60 - p) - w.bit_length() + 1
        regs[b] = max(regs.get(b, 0), rho)
    return regs


def test_registers_match_python_md5_reference(spark, ids_df):
    got = {
        (r["bucket"]): r["rho"]
        for r in sketches.hll_registers(ids_df, ["grp"], "v").collect()
    }
    exp = _py_registers([f"id_{i}" for i in range(5000)])
    assert got == exp


def test_registers_invariant_to_partitioning(spark, ids_df):
    a = sketches.hll_registers(ids_df.repartition(1), ["grp"], "v").collect()
    b = sketches.hll_registers(ids_df.repartition(16), ["grp"], "v").collect()
    assert sorted((r["bucket"], r["rho"]) for r in a) == sorted(
        (r["bucket"], r["rho"]) for r in b
    )


def test_registers_merge_associatively(spark, ids_df):
    """Sketch states from disjoint scans merge by groupBy(bucket)→max(rho)
    into exactly the whole-data state — the property that makes per-day /
    per-tile rollups free."""
    half1 = ids_df.filter(F.crc32("v") % 2 == 0)
    half2 = ids_df.filter(F.crc32("v") % 2 == 1)
    merged = (
        sketches.hll_registers(half1, ["grp"], "v")
        .unionByName(sketches.hll_registers(half2, ["grp"], "v"))
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("rho"))
        .collect()
    )
    whole = sketches.hll_registers(ids_df, ["grp"], "v").collect()
    assert sorted((r["bucket"], r["rho"]) for r in merged) == sorted(
        (r["bucket"], r["rho"]) for r in whole
    )


def test_estimate_error_bound(spark, ids_df):
    est = sketches.hll_estimate(ids_df, ["grp"], "v").collect()[0]["approx_distinct"]
    rel = abs(est - 5000) / 5000
    assert rel < 3 * sketches.hll_error_bound(9)


def test_estimate_small_range_linear_counting(spark):
    df = spark.createDataFrame(
        [(f"x_{i}", "g") for i in range(40)], schema="v string, grp string"
    )
    est = sketches.hll_estimate(df, ["grp"], "v").collect()[0]["approx_distinct"]
    assert abs(est - 40) / 40 < 0.15


# --- count-min sketch --------------------------------------------------------


def test_cms_never_undercounts_and_exact_python_parity(spark, ids_df):
    """est(v) >= true count for every value; registers match a pure-python
    md5 reference."""
    w, d = 64, 4
    truth = {f"id_{i}": 1 + i % 3 for i in range(200)}
    probe = spark.createDataFrame([(k,) for k in truth], "pv string")
    est = {
        (r["probe_value"]): r["est_count"]
        for r in sketches.cms_estimate(
            ids_df, ["grp"], "v", probe, "pv", w=w, d=d
        ).collect()
    }
    assert set(est) == set(truth)
    assert all(est[k] >= truth[k] for k in truth)

    # python register reference on one depth
    regs = {}
    for i in range(5000):
        for _ in range(1 + i % 3):
            h = int(hashlib.md5(f"cms0:id_{i}".encode()).hexdigest()[:15], 16)
            regs[h % w] = regs.get(h % w, 0) + 1
    got = {
        r["col"]: r["cnt"]
        for r in sketches.cms_registers(ids_df, ["grp"], "v", w=w, d=d)
        .filter(F.col("j") == 0)
        .collect()
    }
    assert got == regs


def test_cms_absent_probe_estimates_zero(spark):
    """A probe value none of whose d registers were ever touched must
    estimate 0 and still appear in the output (regression: the old
    inner join dropped empty registers from the min, overestimating
    absent values and losing all-empty probes entirely)."""
    df = spark.createDataFrame([("g", "present")], "grp string, v string")
    probe = spark.createDataFrame([("present",), ("never_seen",)], "pv string")
    # w large enough that 'never_seen' almost surely misses all 4 of
    # 'present's registers; both rows must come back
    est = {
        r["probe_value"]: r["est_count"]
        for r in sketches.cms_estimate(df, ["grp"], "v", probe, "pv", w=4096, d=4).collect()
    }
    assert set(est) == {"present", "never_seen"}
    assert est["present"] >= 1
    assert est["never_seen"] == 0


def test_cms_registers_partition_invariant(spark, ids_df):
    a = sketches.cms_registers(ids_df.repartition(1), ["grp"], "v", w=32, d=2)
    b = sketches.cms_registers(ids_df.repartition(13), ["grp"], "v", w=32, d=2)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


# --- bloom filter ------------------------------------------------------------


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    members = spark.createDataFrame([(f"m_{i}",) for i in range(2000)], "v string")
    bits = sketches.bloom_bits(members, "v", m=16384, k=4)
    assert bits.count() <= 16384

    probe_in = members.withColumnRenamed("v", "pv")
    flags = sketches.bloom_might_contain(probe_in, bits, "pv", m=16384, k=4)
    assert flags.filter(~F.col("might_contain")).count() == 0  # no false negatives

    probe_out = spark.createDataFrame([(f"x_{i}",) for i in range(2000)], "pv string")
    fp = (
        sketches.bloom_might_contain(probe_out, bits, "pv", m=16384, k=4)
        .filter(F.col("might_contain"))
        .count()
    )
    # theoretical fp ≈ (1 - e^(-kn/m))^k ≈ 0.024 at n=2000,m=16384,k=4
    assert fp / 2000 < 0.08


def test_bloom_duplicate_probe_rows(spark):
    """Duplicate probe rows must each get their own output row with the
    correct flag (regression: grouping by probe columns alone collapsed
    duplicates AND inflated count(bit_idx) to 2k, flipping present
    values to might_contain=false)."""
    members = spark.createDataFrame([("a",), ("b",)], "v string")
    bits = sketches.bloom_bits(members, "v", m=1024, k=4)
    probe = spark.createDataFrame([("a",), ("a",), ("zz",), ("zz",)], "pv string")
    rows = sketches.bloom_might_contain(probe, bits, "pv", m=1024, k=4).collect()
    assert len(rows) == 4
    got = sorted((r["pv"], r["might_contain"]) for r in rows)
    assert got[:2] == [("a", True), ("a", True)]
    # "zz" may be a false positive in principle, but both duplicates must agree
    assert got[2][1] == got[3][1]


def test_hll_merge_equals_direct(spark):
    """Mergeability: registers merged from fine keys == registers
    computed directly at the coarse key, for any split."""
    import numpy as np

    rng = np.random.default_rng(13)
    rows = [
        (int(rng.integers(0, 8)), int(rng.integers(0, 4)), f"u{rng.integers(0, 300)}")
        for _ in range(2000)
    ]
    df = spark.createDataFrame(rows, "fine int, coarse int, v string")
    fine = sketches.hll_registers(df, ["fine", "coarse"], "v", p=5)
    merged = {
        (r["coarse"], r["bucket"]): r["rho"]
        for r in sketches.hll_merge(fine, ["coarse"]).collect()
    }
    direct = {
        (r["coarse"], r["bucket"]): r["rho"]
        for r in sketches.hll_registers(df, ["coarse"], "v", p=5).collect()
    }
    assert merged == direct


# --- KMV / theta sketch -------------------------------------------------------


def _py_kmv(values, k=64):
    hs = sorted({int(hashlib.md5(v.encode()).hexdigest()[:13], 16) for v in values})
    return hs[:k]


def test_kmv_registers_match_python_reference(spark, ids_df):
    regs = sketches.kmv_registers(ids_df, ["grp"], "v", k=64).collect()
    got = [r["h"] for r in sorted(regs, key=lambda r: r["slot"])]
    assert got == _py_kmv([f"id_{i}" for i in range(5000)])


def test_kmv_registers_invariant_to_partitioning(spark, ids_df):
    a = sketches.kmv_registers(ids_df.repartition(1), ["grp"], "v").collect()
    b = sketches.kmv_registers(ids_df.repartition(17), ["grp"], "v").collect()
    assert sorted((r["slot"], r["h"]) for r in a) == sorted(
        (r["slot"], r["h"]) for r in b
    )


def test_kmv_estimate_error_bound_and_exact_small(spark, ids_df):
    k = 64
    regs = sketches.kmv_registers(ids_df, ["grp"], "v", k)
    est = sketches.kmv_estimate(regs, ["grp"], k).collect()[0]
    # full registers: classic estimator, rel error ~ 1/sqrt(k-2) -> 5 sigma
    assert est["n_slots"] == k
    assert abs(est["est_distinct"] - 5000) / 5000 < 5 / (k - 2) ** 0.5
    # below k distinct: exact
    small = spark.createDataFrame(
        [(f"s_{i}", "g") for i in range(40)], "v string, grp string"
    )
    regs_s = sketches.kmv_registers(small, ["grp"], "v", k)
    est_s = sketches.kmv_estimate(regs_s, ["grp"], k).collect()[0]
    assert est_s["n_slots"] == 40 and est_s["est_distinct"] == 40


def test_kmv_merge_equals_direct(spark, ids_df):
    """k smallest of a union == re-rank of concatenated registers."""
    half1 = ids_df.filter(F.col("v") < "id_3")      # lexicographic split
    half2 = ids_df.filter(~(F.col("v") < "id_3"))
    r1 = sketches.kmv_registers(half1, ["grp"], "v")
    r2 = sketches.kmv_registers(half2, ["grp"], "v")
    merged = sketches.kmv_merge(r1.unionByName(r2), ["grp"]).collect()
    direct = sketches.kmv_registers(ids_df, ["grp"], "v").collect()
    assert sorted((r["slot"], r["h"]) for r in merged) == sorted(
        (r["slot"], r["h"]) for r in direct
    )


def test_kmv_set_ops_exact_on_small_sets(spark):
    """Union below k slots -> union, intersection, and Jaccard all EXACT."""
    a = spark.createDataFrame([(f"u_{i}",) for i in range(30)], "v string")
    b = spark.createDataFrame([(f"u_{i}",) for i in range(20, 50)], "v string")
    ra = sketches.kmv_registers(a, [], "v", k=64)
    rb = sketches.kmv_registers(b, [], "v", k=64)
    row = sketches.kmv_set_ops(ra, rb, k=64).collect()[0]
    assert row["est_a"] == 30 and row["est_b"] == 30
    assert row["est_union"] == 50
    assert row["est_intersect"] == 10
    assert row["jaccard_micro"] == 10 * 1_000_000 // 50


def test_kmv_set_ops_estimate_large(spark):
    """Full registers: intersection estimate lands within 5 sigma."""
    a = spark.createDataFrame([(f"x_{i}",) for i in range(4000)], "v string")
    b = spark.createDataFrame([(f"x_{i}",) for i in range(2000, 6000)], "v string")
    ra = sketches.kmv_registers(a, [], "v", k=256)
    rb = sketches.kmv_registers(b, [], "v", k=256)
    row = sketches.kmv_set_ops(ra, rb, k=256).collect()[0]
    assert abs(row["est_union"] - 6000) / 6000 < 5 / (256 - 2) ** 0.5
    # intersection: 2000 true; KMV intersection has higher variance
    assert 1000 < row["est_intersect"] < 3200


def test_heavy_hitters_exact_and_lossless(spark):
    """Output == plain exact HAVING regardless of the sketch prune, and
    the prune is lossless even with a tiny (collision-heavy) sketch."""
    rows = (
        [("hot",)] * 50 + [("warm",)] * 10 + [(f"cold_{i}",) for i in range(200)]
    )
    df = spark.createDataFrame(rows, "v string").repartition(7)
    got = {r["value"]: r["n_exact"]
           for r in sketches.heavy_hitters(df, "v", 10).collect()}
    assert got == {"hot": 50, "warm": 10}
    # tiny sketch: massive collisions inflate estimates but can only ADD
    # candidates, never drop hitters
    got_tiny = {r["value"]: r["n_exact"]
                for r in sketches.heavy_hitters(df, "v", 10, w=4, d=1).collect()}
    assert got_tiny == {"hot": 50, "warm": 10}
    # threshold above every count -> empty
    assert sketches.heavy_hitters(df, "v", 51).count() == 0
