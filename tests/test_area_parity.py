"""box_area_m2 op-order parity (VERDICT r01 #2): the numpy shoelace ×
centroid-scale² kernel must match the DuckDB oracle expression to 9
significant digits (the driver's hash format) on adversarial float
coordinates — int32 extremes, slivers, half-pixel offsets, antipodal
latitudes."""

import duckdb
import numpy as np
import pandas as pd

from geodesk_spark.geo import mercator

I32 = (1 << 31) - 1


def _oracle_sql() -> str:
    """Mirror of driver_queries' _sql_box_area arithmetic, op for op
    (cosh via mercator.det_cosh_sql — bit-identical across engines)."""
    W = mercator.MAP_WIDTH
    EC = mercator.EARTH_CIRCUMFERENCE
    d = lambda c: f"cast({c} as double)"
    t1 = f"({d('minx')} * {d('miny')} - {d('maxx')} * {d('miny')})"
    t2 = f"({d('maxx')} * {d('maxy')} - {d('maxx')} * {d('miny')})"
    t3 = f"({d('maxx')} * {d('maxy')} - {d('minx')} * {d('maxy')})"
    t4 = f"({d('minx')} * {d('miny')} - {d('minx')} * {d('maxy')})"
    a2 = f"((({t1} + {t2}) + {t3}) + {t4})"
    cy = f"(((({d('miny')} + {d('miny')}) + {d('maxy')}) + {d('maxy')}) / 4.0)"
    s_ = f"({EC!r} / {W!r} / {mercator.det_cosh_sql('t')})"
    return f"""
      with c as (select fid, {a2} as a2, ({cy} * 2 * pi() / {W!r}) as t from boxes)
      select fid, case when abs(a2) / 2.0 = 0 then 0.0
                  else (abs(a2) / 2.0) * {s_} * {s_} end as area_m2
      from c order by fid
    """


def _spark_side(minx, miny, maxx, maxy) -> float:
    """The engine kernel over the same 4-vertex ring the driver query
    packs: [(minx,miny),(maxx,miny),(maxx,maxy),(minx,maxy),close]."""
    xs = np.array([minx, maxx, maxx, minx, minx], dtype=np.float64)
    ys = np.array([miny, miny, maxy, maxy, miny], dtype=np.float64)
    return mercator.ring_area_m2(xs, ys)


def test_box_area_adversarial_parity():
    rng = np.random.default_rng(99)
    cases = [
        (-I32 - 1, -I32 - 1, I32, I32),            # whole world
        (0, 0, 1, 1),                              # 1-imp box
        (-1, -1, 0, 0),
        (I32 - 2, I32 - 2, I32, I32),              # polar corner
        (-I32 - 1, I32 - 1, -I32 + 1, I32),        # sliver at the pole
        (7, -3, 7, 9),                             # zero width → area 0
        (123456789, -987654321, 123456790, -987654320),
    ]
    for _ in range(200):
        x0, x1 = sorted(rng.integers(-I32 - 1, I32, size=2).tolist())
        y0, y1 = sorted(rng.integers(-I32 - 1, I32, size=2).tolist())
        cases.append((x0, y0, x1, y1))
    pdf = pd.DataFrame(
        [(i, *c) for i, c in enumerate(cases)],
        columns=["fid", "minx", "miny", "maxx", "maxy"],
    )
    con = duckdb.connect()
    con.register("boxes", pdf)
    odf = con.sql(_oracle_sql()).df()
    for i, (minx, miny, maxx, maxy) in enumerate(cases):
        got = _spark_side(minx, miny, maxx, maxy)
        want = float(odf["area_m2"].iloc[i])
        # det_exp makes the two engines BIT-identical, not merely 9-digit
        # close (the r01/r03 driver env proved 9 digits isn't enough
        # insurance against a different libm build).
        assert np.float64(got).view(np.int64) == np.float64(want).view(np.int64), (
            i, cases[i], got, want,
        )
