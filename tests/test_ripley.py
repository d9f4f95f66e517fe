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


def test_semivariogram_matches_brute(spark):
    """Semivariogram bins vs a brute O(n²) replay, including binning
    edges (lo exclusive / hi inclusive) and the zero-bin contract."""
    pdf = _corpus()
    pdf = pdf.assign(v=(pdf.id * 37) % 211)
    got = {int(r.lag_imp): (int(r.n_pairs), int(r.sum_sq))
           for r in stats.semivariogram(
               spark.createDataFrame(pdf), RADII).collect()}

    xs = pdf.x.values.astype(np.int64)
    ys = pdf.y.values.astype(np.int64)
    vs = pdf.v.values.astype(np.int64)
    bounds = [0] + list(RADII)
    exp = {r: [0, 0] for r in RADII}
    for i in range(len(pdf)):
        d2 = (xs[i + 1:] - xs[i]) ** 2 + (ys[i + 1:] - ys[i]) ** 2
        q = (vs[i + 1:] - vs[i]) ** 2
        for b, r in enumerate(RADII):
            m = (d2 > bounds[b] ** 2) & (d2 <= r * r) & (d2 > 0)
            exp[r][0] += int(m.sum())
            exp[r][1] += int(q[m].sum())
    assert got == {r: tuple(v) for r, v in exp.items()}
    # bins partition the pair set: bin counts sum to the ripley count
    rip = {int(r.r_imp): int(r.pairs)
           for r in stats.ripley_pair_counts(
               spark.createDataFrame(pdf), RADII).collect()}
    assert sum(v[0] for v in got.values()) == rip[RADII[-1]]
