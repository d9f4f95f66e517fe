"""Cross-engine randomized parity fuzz for the overlay family: random
convex subject/clip rings (integer vertices — adversarial collinear and
touching configurations arise naturally) run through the FULL Spark
operator against its DuckDB oracle twin, value-for-value.  This tests
the dual-engine expression generator itself (DuckDB list semantics,
slice rules, struct field access), not just the numpy replay."""

import duckdb
import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from geodesk_spark.operators import overlay

_spark = None


def _get_spark(spark):
    global _spark
    _spark = spark
    return spark


def _convex_ring(rng, k, span, cx, cy):
    """Random convex k-gon with INTEGER vertices: k points on a circle at
    sorted angles, rounded — collinear triples and duplicate vertices can
    and do appear, which is the point."""
    ang = np.sort(rng.uniform(0, 2 * np.pi, k))
    r = rng.integers(2, span)
    pts = [
        (int(cx + round(r * np.cos(a))), int(cy + round(r * np.sin(a))))
        for a in ang
    ]
    return pts


def _sql_ring(pts):
    return (
        "["
        + ", ".join(f"{{'x': cast({x} as double), 'y': cast({y} as double)}}" for x, y in pts)
        + "]"
    )


SEEDS = st.integers(min_value=0, max_value=10_000)


@settings(max_examples=8, deadline=None)
@given(seed=SEEDS)
def test_fuzz_overlay_area_engine_parity(spark, seed):
    rng = np.random.default_rng(seed)
    subs = [
        (i, _convex_ring(rng, int(rng.integers(3, 8)), 12, rng.integers(-8, 8), rng.integers(-8, 8)))
        for i in range(6)
    ]
    clips = [
        (100 + i, _convex_ring(rng, 4, 12, rng.integers(-8, 8), rng.integers(-8, 8)))
        for i in range(3)
    ]
    subj = spark.createDataFrame(
        [(s, [{"x": float(x), "y": float(y)} for x, y in pts]) for s, pts in subs],
        "sid long, ring array<struct<x:double,y:double>>",
    )
    clip = spark.createDataFrame(
        [(c, [{"x": float(x), "y": float(y)} for x, y in pts]) for c, pts in clips],
        "cid long, cring array<struct<x:double,y:double>>",
    )
    got = (
        overlay.overlay_area(subj, clip, clip_k=4)
        .toPandas()
        .sort_values(["sid", "cid"])
        .reset_index(drop=True)
    )
    subject_sql = " union all ".join(
        f"select {s} as sid, {_sql_ring(pts)} as r" for s, pts in subs
    )
    clip_sql = " union all ".join(
        f"select {c} as cid, {_sql_ring(pts)} as cr" for c, pts in clips
    )
    want = (
        duckdb.sql(overlay.overlay_area_sql(subject_sql, clip_sql, clip_k=4))
        .df()
        .sort_values(["sid", "cid"])
        .reset_index(drop=True)
    )
    assert got[["sid", "cid"]].values.tolist() == want[["sid", "cid"]].values.tolist()
    assert np.array_equal(got["inter_area"].values, want["inter_area"].values), (
        got,
        want,
    )


@settings(max_examples=8, deadline=None)
@given(seed=SEEDS)
def test_fuzz_zone_line_length_engine_parity(spark, seed):
    rng = np.random.default_rng(seed + 777)
    segs = [
        (
            i,
            float(rng.integers(-15, 16)),
            float(rng.integers(-15, 16)),
            float(rng.integers(-15, 16)),
            float(rng.integers(-15, 16)),
        )
        for i in range(12)
    ]
    clips = [
        (100 + i, _convex_ring(rng, 4, 12, rng.integers(-6, 6), rng.integers(-6, 6)))
        for i in range(3)
    ]
    sdf = spark.createDataFrame(
        segs, "seg_id long, x1 double, y1 double, x2 double, y2 double"
    )
    cdf = spark.createDataFrame(
        [(c, [{"x": float(x), "y": float(y)} for x, y in pts]) for c, pts in clips],
        "cid long, cring array<struct<x:double,y:double>>",
    )
    got = (
        overlay.zone_line_length(sdf, cdf, clip_k=4)
        .toPandas()
        .sort_values(["seg_id", "cid"])
        .reset_index(drop=True)
    )
    segs_sql = " union all ".join(
        f"select {s} as seg_id, cast({x1} as double) as x1, cast({y1} as double) as y1, "
        f"cast({x2} as double) as x2, cast({y2} as double) as y2"
        for s, x1, y1, x2, y2 in segs
    )
    clip_sql = " union all ".join(
        f"select {c} as cid, {_sql_ring(pts)} as cr" for c, pts in clips
    )
    want = (
        duckdb.sql(overlay.zone_line_length_sql(segs_sql, clip_sql, clip_k=4))
        .df()
        .sort_values(["seg_id", "cid"])
        .reset_index(drop=True)
    )
    assert got[["seg_id", "cid"]].values.tolist() == want[["seg_id", "cid"]].values.tolist()
    assert np.array_equal(got["len_in"].values, want["len_in"].values), (got, want)


@settings(max_examples=6, deadline=None)
@given(seed=SEEDS)
def test_fuzz_overlay_general_engine_parity(spark, seed):
    """Random NON-CONVEX zones (star polygons): the general overlay's
    fan/sign/micro-sum pipeline must agree between engines exactly."""
    rng = np.random.default_rng(seed + 31337)

    def star_ring(k, cx, cy):
        ang = np.sort(rng.uniform(0, 2 * np.pi, k))
        pts = []
        for i, a in enumerate(ang):
            r = rng.integers(6, 12) if i % 2 == 0 else rng.integers(2, 5)
            pts.append((int(cx + round(r * np.cos(a))), int(cy + round(r * np.sin(a)))))
        return pts

    subs = [
        (i, _convex_ring(rng, int(rng.integers(3, 7)), 10, rng.integers(-6, 6), rng.integers(-6, 6)))
        for i in range(5)
    ]
    clips = [(100 + i, star_ring(6, rng.integers(-5, 5), rng.integers(-5, 5))) for i in range(3)]
    subj = spark.createDataFrame(
        [(s, [{"x": float(x), "y": float(y)} for x, y in pts]) for s, pts in subs],
        "sid long, ring array<struct<x:double,y:double>>",
    )
    clip = spark.createDataFrame(
        [(str(c), [{"x": float(x), "y": float(y)} for x, y in pts]) for c, pts in clips],
        "cid string, cring array<struct<x:double,y:double>>",
    )
    got = (
        overlay.overlay_area_general(subj, clip, clip_k=6)
        .toPandas()
        .sort_values(["sid", "cid"])
        .reset_index(drop=True)
    )
    subject_sql = " union all ".join(
        f"select {s} as sid, {_sql_ring(pts)} as r" for s, pts in subs
    )
    clip_sql = " union all ".join(
        f"select cast({c} as varchar) as cid, {_sql_ring(pts)} as cr" for c, pts in clips
    )
    want = (
        duckdb.sql(overlay.overlay_area_general_sql(subject_sql, clip_sql, clip_k=6))
        .df()
        .sort_values(["sid", "cid"])
        .reset_index(drop=True)
    )
    assert got[["sid", "cid"]].values.tolist() == want[["sid", "cid"]].values.tolist()
    assert np.array_equal(got["inter_area"].values, want["inter_area"].values), (got, want)
