"""Temporal relational operators: exponential half-life decay rollups."""

from pyspark.sql import functions as F


def test_decay_rollup_exact_and_mergeable(spark):
    """Bucket weights, merge-equals-direct, future/ancient drops."""
    from geodesk_spark.operators import relational

    HL = 1_000_000  # 1s half-life
    now = 100 * HL
    rows = [
        # (id, ts_us, value): ages 0, 1, 2.5, 41 half-lives + future
        (1, now - 0, 8.0),
        (2, now - HL, 4.0),
        (3, now - int(2.5 * HL), 2.0),
        (4, now - 41 * HL, 100.0),   # beyond max_buckets -> dropped
        (5, now + HL, 100.0),        # future -> dropped
    ]
    df = spark.createDataFrame(rows, "id long, tsu long, value double").select(
        F.lit("k").alias("k"), F.timestamp_micros("tsu").alias("ts"), "value"
    )
    st = relational.decay_buckets(df, ["k"], now, HL, value_col="value")
    got = {(r["bucket"]): (r["n"], r["value_micro"]) for r in st.collect()}
    assert got == {0: (1, 8_000_000), 1: (1, 4_000_000), 2: (1, 2_000_000)}
    est = relational.decay_estimate(st, ["k"]).collect()[0]
    assert est["n_events"] == 3
    assert est["decayed_count_micro"] == 1_000_000 + 500_000 + 250_000
    assert est["decayed_value_micro"] == 8_000_000 + 2_000_000 + 500_000
    # merge of two shards == direct state
    s1 = relational.decay_buckets(df.limit(2), ["k"], now, HL, value_col="value")
    s2 = relational.decay_buckets(df.subtract(df.limit(2)), ["k"], now, HL,
                                  value_col="value")
    merged = relational.decay_merge(s1.unionByName(s2), ["k"])
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, st.collect()))
