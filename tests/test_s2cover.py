"""S2 polyfill (operators/s2cover.py): covering cells under the center
rule, exact vs brute-force enumeration, and Spark == DuckDB == numpy
bit-parity (the center filter compares deterministic integer imps).
"""

import numpy as np
import pandas as pd
import duckdb
import pytest
from pyspark.sql import functions as F

from geodesk_spark.geo import s2cell as S
from geodesk_spark.operators import s2cover

I32 = (1 << 31) - 1


def _brute(boxes: pd.DataFrame, level: int) -> dict:
    n = 1 << level
    ff, ii, jj = np.meshgrid(
        np.arange(6), np.arange(n), np.arange(n), indexing="ij"
    )
    ff, ii, jj = ff.ravel(), ii.ravel(), jj.ravel()
    cx, cy = S.cell_center_imps(ff, ii, jj, level)
    out = {}
    for r in boxes.itertuples():
        m = (cx >= r.minx) & (cx <= r.maxx) & (cy >= r.miny) & (cy <= r.maxy)
        out[r.fid] = set(zip(ff[m].tolist(), ii[m].tolist(), jj[m].tolist()))
    return out


def _boxes(k: int, seed: int, span_lo: int, span_hi: int,
           y_span: int = I32 // 2) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    x = rng.integers(-I32, I32, k)
    y = rng.integers(-y_span, y_span, k)
    dx = 2 ** rng.integers(span_lo, span_hi, k)
    dy = 2 ** rng.integers(span_lo, span_hi, k)
    return pd.DataFrame(
        {
            "fid": np.arange(k),
            "minx": np.maximum(x - dx, -I32 - 1),
            "maxx": np.minimum(x + dx, I32),
            "miny": np.maximum(y - dy, -I32 - 1),
            "maxy": np.minimum(y + dy, I32),
        }
    )


def _duck(boxes: pd.DataFrame, level: int) -> dict:
    con = duckdb.connect()
    con.register("b", boxes)
    got = con.sql(s2cover.polyfill_sql("b", level)).df()
    out = {}
    for r in got.itertuples():
        out.setdefault(r.fid, set()).add((r.s2_face, r.s2_i, r.s2_j))
    return out


@pytest.mark.parametrize(
    "level,span_lo,span_hi,y_span",
    [
        (6, 22, 27, I32 // 2),  # boxes spanning up to ~16 cells/side
        (8, 20, 26, I32 - 1),   # full latitude range incl. polar faces
        (4, 24, 29, I32 // 2),  # coarse cells, boxes up to a face quadrant
    ],
)
def test_polyfill_matches_brute_force(level, span_lo, span_hi, y_span):
    boxes = _boxes(30, 11 + level, span_lo, span_hi, y_span)
    brute = _brute(boxes, level)
    duck = _duck(boxes, level)
    total = sum(len(v) for v in brute.values())
    assert total > 50  # the sweep actually covered cells
    for fid in brute:
        assert duck.get(fid, set()) == brute[fid], f"fid {fid}"


def test_polyfill_spark_matches_duckdb(spark):
    level = 8
    boxes = _boxes(25, 3, 20, 26)
    duck = _duck(boxes, level)
    sdf = s2cover.polyfill_bbox(spark.createDataFrame(boxes), level)
    got = sdf.toPandas()
    sp = {}
    for r in got.itertuples():
        sp.setdefault(r.fid, set()).add((r.s2_face, r.s2_i, r.s2_j))
    assert sp == duck
    # cell ids encode (face, hilbert) losslessly and match numpy
    f = got["s2_face"].to_numpy()
    d = S._hilbert_d(got["s2_i"].to_numpy(), got["s2_j"].to_numpy(), level)
    assert np.array_equal(
        got["s2_cell"].to_numpy(), f * (1 << (2 * level)) + d
    )


def test_cell_center_three_way_bit_parity(spark):
    level = 10
    n = 1 << level
    rng = np.random.default_rng(23)
    pdf = pd.DataFrame(
        {
            "s2_face": rng.integers(0, 6, 4000),
            "s2_i": rng.integers(0, n, 4000),
            "s2_j": rng.integers(0, n, 4000),
        }
    )
    cx, cy = S.cell_center_imps(
        pdf["s2_face"].to_numpy(), pdf["s2_i"].to_numpy(), pdf["s2_j"].to_numpy(), level
    )
    con = duckdb.connect()
    con.register("cand2", pdf)
    ctes, last = S.cell_center_sql("cand2", "s2_face", "s2_i", "s2_j", level)
    got = con.sql(f"with {ctes} select cx, cy from {last}").df()
    assert np.array_equal(got["cx"].to_numpy(), cx)
    assert np.array_equal(got["cy"].to_numpy(), cy)
    sdf = S.cell_center_cols(
        spark.createDataFrame(pdf), "s2_face", "s2_i", "s2_j", level
    )
    sp = sdf.select("cx", "cy").toPandas()
    assert np.array_equal(sp["cx"].to_numpy(), cx)
    assert np.array_equal(sp["cy"].to_numpy(), cy)


def test_cell_center_roundtrip():
    """center -> forward encode returns the original cell for every cell
    whose center is inside the mercator map (polar cells clamp)."""
    level = 10
    n = 1 << level
    rng = np.random.default_rng(5)
    face = rng.integers(0, 6, 30000)
    i = rng.integers(0, n, 30000)
    j = rng.integers(0, n, 30000)
    cx, cy = S.cell_center_imps(face, i, j, level)
    f2, i2, j2, _ = S.s2_cell(cx, cy, level)
    unclamped = np.abs(cy) < I32
    assert unclamped.mean() > 0.9
    ok = (f2 == face) & (i2 == i) & (j2 == j)
    assert ok[unclamped].all()
