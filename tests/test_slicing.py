"""SAHI-style slicing: grid coverage laws + sliced-NMS suppression laws."""

from pyspark.sql import functions as F

from geodesk_spark.operators import images


def test_slice_grid_covers_image(spark):
    imgs = spark.createDataFrame(
        [(1, 640, 512), (2, 1536, 1472), (3, 449, 500), (4, 448, 448)],
        "image_id long, w long, h long",
    )
    sl = images.slice_grid(imgs, tile=512, stride=448).collect()
    by_img = {}
    for r in sl:
        by_img.setdefault(r.image_id, []).append(r)
    dims = {1: (640, 512), 2: (1536, 1472), 3: (449, 500), 4: (448, 448)}
    for img, (w, h) in dims.items():
        rows = by_img[img]
        # exact expected grid size
        import math
        assert len(rows) == math.ceil(w / 448) * math.ceil(h / 448)
        # slices stay inside the image and jointly cover every pixel
        covered_x = set()
        covered_y = set()
        for r in rows:
            assert 0 <= r.sx and r.sx + r.sw <= w and r.sw >= 1
            assert 0 <= r.sy and r.sy + r.sh <= h and r.sh >= 1
            covered_x.update(range(r.sx, r.sx + r.sw))
            covered_y.update(range(r.sy, r.sy + r.sh))
        assert covered_x == set(range(w))
        assert covered_y == set(range(h))
        # interior neighbors overlap by exactly tile - stride
        xs = sorted({r.sx for r in rows})
        for a, b in zip(xs, xs[1:]):
            assert b - a == 448


def test_sliced_nms_suppression_laws(spark):
    """Greedy-NMS invariants on the sliced pipeline output: kept boxes
    are mutually below the IoU threshold; every suppressed box has a
    higher-ranked kept suppressor at/above it."""
    from geodesk_spark.driver_queries.lines_raster import _q_slice_detect_nms

    out = _q_slice_detect_nms(spark, "/root/testdata/sf0.001").collect()
    by_img = {}
    for r in out:
        by_img.setdefault(r.image_id, []).append(r)

    def iou_sup(c, p, num=1, den=2):
        iw = min(c.maxx, p.maxx) - max(c.minx, p.minx)
        ih = min(c.maxy, p.maxy) - max(c.miny, p.miny)
        inter = max(iw, 0) * max(ih, 0)
        union = ((c.maxx - c.minx) * (c.maxy - c.miny)
                 + (p.maxx - p.minx) * (p.maxy - p.miny) - inter)
        return den * inter >= num * union

    assert by_img, "no images produced"
    for img, rows in by_img.items():
        rows.sort(key=lambda r: r.rk)
        kept = [r for r in rows if r.kept]
        assert kept, img
        for i, a in enumerate(kept):
            for b in kept[i + 1:]:
                assert not iou_sup(a, b), (img, a.box_id, b.box_id)
        for r in rows:
            if not r.kept:
                assert any(p.rk < r.rk and iou_sup(r, p) for p in kept), (img, r.box_id)
