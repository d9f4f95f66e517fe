"""Cross-modal alignment (operators/crossmodal.py): numpy parity + API laws."""

import math

import numpy as np

from geodesk_spark.operators import crossmodal


def _mk(spark, vecs, ids=None):
    ids = ids or list(range(len(vecs)))
    rows = [(i, [float(v) for v in vec]) for i, vec in zip(ids, vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_align_matches_numpy(spark):
    rng = np.random.default_rng(7)
    a = rng.normal(size=(40, 16)).astype(np.float32)
    b = rng.normal(size=(40, 16)).astype(np.float32)
    got = {
        r.vec_id: r.cos_align
        for r in crossmodal.cosine_align(_mk(spark, a), _mk(spark, b)).collect()
    }
    for i in range(40):
        want = float(a[i].astype(np.float64) @ b[i].astype(np.float64)) / (
            math.sqrt(float((a[i].astype(np.float64) ** 2).sum()))
            * math.sqrt(float((b[i].astype(np.float64) ** 2).sum()))
        )
        want = math.floor(want * 1e6 + 0.5) / 1e6
        assert abs(got[i] - want) < 2e-6, i


def test_align_filter_and_known_scores(spark):
    vecs = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [1.0, 1.0, 0.0]]
    caps = [[1.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]]
    out = {
        r.vec_id: r.cos_align
        for r in crossmodal.cosine_align(_mk(spark, vecs), _mk(spark, caps)).collect()
    }
    assert out[0] == 1.0  # identical
    assert out[1] == 0.0  # orthogonal
    kept = crossmodal.align_filter(_mk(spark, vecs), _mk(spark, caps), threshold=0.5)
    assert {r.vec_id for r in kept.collect()} == {0}


def test_align_inner_join_drops_unmatched(spark):
    left = _mk(spark, [[1.0, 0.0], [0.0, 1.0]], ids=[1, 2])
    right = _mk(spark, [[1.0, 0.0]], ids=[1])
    assert {r.vec_id for r in crossmodal.cosine_align(left, right).collect()} == {1}


def test_mismatch_bottomk_orders_worst_first(spark):
    rng = np.random.default_rng(11)
    a = rng.normal(size=(30, 8)).astype(np.float32)
    b = rng.normal(size=(30, 8)).astype(np.float32)
    b[5] = -a[5]  # planted worst pair: cosine exactly -1
    rows = crossmodal.mismatch_bottomk(_mk(spark, a), _mk(spark, b), k=3).collect()
    assert rows[0].vec_id == 5 and rows[0].cos_align == -1.0
    assert [r.cos_align for r in rows] == sorted(r.cos_align for r in rows)
