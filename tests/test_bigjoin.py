"""Shuffle big-big PIP join: parity vs the broadcast flagship + brute force.

The two paths must agree exactly — same band kernel, same ray-cast
convention — so any divergence is a real bug, not float noise.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geodesk_spark.geo import pip
from geodesk_spark.operators import bigjoin, spatial_join, tiling
from geodesk_spark.sources import synth


@pytest.fixture(scope="module")
def world(spark):
    df = synth.images_df(spark, 20_000, with_bytes=False, partitions=8)
    df = tiling.with_point_tiles(tiling.with_imp_coords(df)).cache()
    pdf = df.select("image_id", "x", "y").toPandas()
    yield df, pdf
    df.unpersist()


@pytest.fixture(scope="module")
def layer():
    return synth.polygon_layer()


def _layer_df(spark, layer):
    return spark.createDataFrame(
        [(p["poly_id"], bytearray(p["rings"])) for p in layer],
        schema="poly_id string, rings binary",
    )


def test_big_join_matches_broadcast_and_bruteforce(spark, world, layer):
    df, pdf = world
    got = (
        bigjoin.contains_points_big(df, _layer_df(spark, layer), keep_cols=["image_id"])
        .toPandas()
    )
    got_set = set(map(tuple, got[["image_id", "poly_id"]].to_numpy().tolist()))

    # Broadcast flagship on the identical layer.
    prepared = spatial_join.prepare_layer(layer)
    bc = (
        spatial_join.contains_points(df, prepared, keep_cols=["image_id"])
        .toPandas()
    )
    bc_set = set(map(tuple, bc[["image_id", "poly_id"]].to_numpy().tolist()))
    assert got_set == bc_set

    # Brute force ground truth.
    x = pdf["x"].to_numpy(dtype=np.float64)
    y = pdf["y"].to_numpy(dtype=np.float64)
    exp_set = set()
    for p in layer:
        inside = pip.points_in_polygon(x, y, pip.unpack_rings(p["rings"]))
        for iid in pdf["image_id"].to_numpy()[inside]:
            exp_set.add((iid, p["poly_id"]))
    assert got_set == exp_set
    assert len(got_set) > 100


def test_big_join_anti(spark, world, layer):
    df, pdf = world
    ldf = _layer_df(spark, layer)
    matched = (
        bigjoin.contains_points_big(df, ldf, keep_cols=["image_id"])
        .select("image_id").distinct().count()
    )
    anti = bigjoin.contains_points_big(df, ldf, keep_cols=["image_id"], anti=True).count()
    assert anti == len(pdf) - matched


def test_big_join_no_duplicate_candidates(spark, world, layer):
    """A point matches each polygon through exactly one quadtree leaf —
    the cell join must not introduce duplicate (point, polygon) rows."""
    df, _ = world
    got = bigjoin.contains_points_big(df, _layer_df(spark, layer), keep_cols=["image_id"])
    n = got.count()
    nd = got.distinct().count()
    assert n == nd


def test_big_join_plan_has_no_layer_literals(spark, world, layer):
    """Plan size stays O(1) in the layer: geometry travels as data, so the
    analyzed plan string must not embed per-vertex literals (the broadcast
    jvm_exact path embeds thousands of float literals; this path none)."""
    df, _ = world
    out = bigjoin.contains_points_big(df, _layer_df(spark, layer), keep_cols=["image_id"])
    plan = out._jdf.queryExecution().analyzed().toString()
    ring0 = pip.unpack_rings(layer[0]["rings"])[0]
    assert repr(float(ring0[0, 0])) not in plan
    assert len(plan) < 100_000
