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


def test_theil_sen_robust_to_outliers(spark):
    """Theil–Sen recovers the planted slope where OLS is dragged by the
    outliers, and matches an independent numpy median-of-slopes oracle."""
    import numpy as np

    from geodesk_spark.operators import stats

    rows = []
    rng = np.random.default_rng(11)
    for g in range(4):
        slope = [3, -2, 0, 7][g]
        for i in range(40):
            x = int(i * 5 + (g * 13) % 7)
            y = slope * x + 100 * g + int(rng.integers(-3, 4))
            if i >= 37:
                y += 50_000  # wild HIGH-LEVERAGE outliers (top of x range)
            rows.append((g, x, y))
    df = spark.createDataFrame(rows, "grp long, x long, y long")
    got = {r.grp: r for r in stats.theil_sen(df, "grp", cap=200).collect()}
    ols = {r[0]: r for r in stats.group_linreg(df, "grp", "x", "y").collect()}

    def brute(g):
        pts = sorted((x, y) for gg, x, y in rows if gg == g)
        sl = sorted(
            (y2 - y1) / (x2 - x1)
            for i, (x1, y1) in enumerate(pts)
            for (x2, y2) in pts[i + 1:]
            if x2 != x1
        )
        m = len(sl)
        med = sl[(m - 1) // 2] if m % 2 else (sl[m // 2 - 1] + sl[m // 2]) / 2
        res = sorted(y - med * x for x, y in pts)
        k = len(res)
        ic = res[(k - 1) // 2] if k % 2 else (res[k // 2 - 1] + res[k // 2]) / 2
        return med, ic

    for g in range(4):
        true_slope = [3, -2, 0, 7][g]
        bs, bi = brute(g)
        assert abs(got[g].slope - bs) < 1e-5, (g, got[g].slope, bs)
        assert abs(got[g].intercept - bi) < 1e-4
        # robust: within noise of truth; OLS dragged far off by outliers
        assert abs(got[g].slope - true_slope) < 0.5
        assert abs(ols[g].slope - true_slope) > 2.0
        assert got[g].n_pts == 40


def test_funnel_conversion_semantics(spark):
    """First-touch funnel on planted sequences: strict ordering, the
    anchor window, greedy (earliest) matching, and monotone step
    counts."""
    import datetime as dt

    from geodesk_spark.operators import relational

    t0 = dt.datetime(2026, 1, 1)

    def ev(u, typ, minutes):
        return (u, typ, t0 + dt.timedelta(minutes=minutes))

    rows = [
        # u1: full conversion inside the window
        ev(1, "view", 0), ev(1, "click", 10), ev(1, "purchase", 20),
        # u2: purchase BEFORE click -> stops at click
        ev(2, "view", 0), ev(2, "purchase", 5), ev(2, "click", 10),
        # u3: converts but outside the 30-minute window
        ev(3, "view", 0), ev(3, "click", 10), ev(3, "purchase", 60),
        # u4: view only
        ev(4, "view", 0),
        # u5: greedy anchor at t=0; purchase at 25 still inside window
        ev(5, "view", 0), ev(5, "view", 22), ev(5, "click", 24),
        ev(5, "purchase", 25),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    out = {r.step_name: r.users
           for r in relational.funnel_conversion(
               df, ["view", "click", "purchase"], 30 * 60 * 1_000_000
           ).collect()}
    assert out == {"view": 5, "click": 4, "purchase": 2}
    # steps are monotone non-increasing by construction
    assert out["view"] >= out["click"] >= out["purchase"]


def test_cohort_retention_planted(spark):
    """Cohort cells on planted activity: first-touch assigns the
    cohort, distinct-per-bucket dedups bursts, max_age caps, and age-0
    equals the cohort size."""
    import datetime as dt

    from geodesk_spark.operators import relational

    t0 = dt.datetime(2026, 1, 5)  # anchor
    day = dt.timedelta(days=1)
    rows = []
    # cohort A (bucket of t0): users 1, 2; user 1 returns weeks 1 and 2,
    # user 2 only week 2 (twice — must dedup)
    rows += [(1, t0), (1, t0 + 7 * day), (1, t0 + 14 * day)]
    rows += [(2, t0 + 1 * day), (2, t0 + 14 * day), (2, t0 + 15 * day)]
    # cohort B (next week): user 3, never returns
    rows += [(3, t0 + 8 * day)]
    # user 4: returns far beyond max_age -> capped away
    rows += [(4, t0), (4, t0 + 700 * day)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {}
    for r in relational.cohort_retention(df, 7 * 86_400 * 1_000_000, max_age=8).collect():
        out[(r.cohort_bucket, r.age)] = r.users
    cohorts = sorted({c for c, _ in out})
    a, b = cohorts[0], cohorts[1]
    assert out[(a, 0)] == 3            # users 1, 2, 4
    assert out[(a, 1)] == 1            # user 1
    assert out[(a, 2)] == 2            # users 1, 2 (dedup'd burst)
    assert out[(b, 0)] == 1            # user 3
    assert all(age <= 8 for (_, age) in out)


def test_event_markov_stationary(spark):
    """Stationary distribution on a planted 2-state chain with known
    π: P(a→b) = 1, P(b→a) = 1/2 ⇒ π = (1/3, 2/3); the integer
    fixed-point lands within quantization of the closed form, and an
    absorbing state takes all mass."""
    import datetime as dt

    from geodesk_spark.operators import relational

    t0 = dt.datetime(2026, 1, 1)

    def seq(u, types):
        return [(u, i, t0 + dt.timedelta(minutes=i), ty)
                for i, ty in enumerate(types)]

    # long alternating walk a b b a b b ... realizes P(a→b)=1, P(b→a)=1/2
    walk = []
    pat = ["a", "b", "b"] * 40
    walk += seq(1, pat)
    df = spark.createDataFrame(
        walk, "user_id long, event_id long, ts timestamp, event_type string"
    )
    out = {r.state: r.stat_micro
           for r in relational.event_markov_stationary(df).collect()}
    S = 1 << 20
    assert abs(out["a"] / S - 1 / 3) < 0.02
    assert abs(out["b"] / S - 2 / 3) < 0.02

    # absorbing state: c -> c forever
    ab = seq(2, ["a", "c"] + ["c"] * 30)
    df2 = spark.createDataFrame(
        ab, "user_id long, event_id long, ts timestamp, event_type string"
    )
    out2 = {r.state: r.stat_micro
            for r in relational.event_markov_stationary(df2).collect()}
    assert out2["c"] > 0.95 * S and out2["a"] < 0.05 * S
