"""Ripley's K pair-count core: grid-blocked exact pair counts vs an
obviously-correct brute-force O(n²) replay, plus the cap guard."""

import numpy as np
import pandas as pd

from geodesk_spark.operators import stats

RADII = (64, 256, 1024, 4096)


def _corpus():
    rows = [(i, (i * 48271) % 20011 - 10000, (i * 69621) % 20011 - 10000)
            for i in range(800)]
    # a tight cluster stressing the small radii
    rows += [(1000 + i, 50 + i * 3, -70 + i * 5) for i in range(40)]
    return pd.DataFrame(rows, columns=["id", "x", "y"])


def _brute(pdf):
    xs, ys = pdf.x.values.astype(np.int64), pdf.y.values.astype(np.int64)
    out = {r: 0 for r in RADII}
    for i in range(len(pdf)):
        d2 = (xs[i + 1:] - xs[i]) ** 2 + (ys[i + 1:] - ys[i]) ** 2
        for r in RADII:
            out[r] += int(((d2 > 0) & (d2 <= r * r)).sum())
    return out


def test_ripley_matches_brute(spark):
    pdf = _corpus()
    got = {int(r.r_imp): int(r.pairs)
           for r in stats.ripley_pair_counts(spark.createDataFrame(pdf), RADII).collect()}
    assert got == _brute(pdf)
    # monotone in r by construction
    vals = [got[r] for r in RADII]
    assert vals == sorted(vals)


def test_ripley_cell_cap_guard(spark):
    pdf = _corpus()
    # cap below the cluster cell's population: the capped cells drop,
    # counts can only shrink, and the tiny-radius count loses the
    # cluster's contribution
    full = {int(r.r_imp): int(r.pairs)
            for r in stats.ripley_pair_counts(spark.createDataFrame(pdf), RADII).collect()}
    capped = {int(r.r_imp): int(r.pairs)
              for r in stats.ripley_pair_counts(
                  spark.createDataFrame(pdf), RADII, max_points_per_cell=30
              ).collect()}
    assert all(capped[r] <= full[r] for r in RADII)
    assert capped[64] < full[64]
