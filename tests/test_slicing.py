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


def test_letterbox_boxes_geometry(spark):
    """Letterbox remap laws: remapped boxes live inside the canvas,
    padding is symmetric per axis, aspect is preserved through the
    rational scale, and a square image maps corner-to-corner."""
    from geodesk_spark.operators import images

    imgs = spark.createDataFrame(
        [(1, 1000, 500), (2, 500, 1000), (3, 640, 640), (4, 33, 777)],
        "image_id long, w long, h long",
    )
    boxes = spark.createDataFrame(
        [(1, 10, 0, 0, 1000, 500),      # full image 1
         (2, 20, 100, 200, 300, 900),
         (3, 30, 0, 0, 640, 640),       # full square image
         (4, 40, 0, 0, 33, 777)],
        "image_id long, box_id long, minx long, miny long, maxx long, maxy long",
    )
    out = {r.box_id: r for r in images.letterbox_boxes(imgs, boxes, out=640).collect()}

    for r in out.values():
        assert 0 <= r.lminx <= r.lmaxx <= 640
        assert 0 <= r.lminy <= r.lmaxy <= 640
    # image 1 (1000x500): scale 640/1000, sh=320, pad_y=(640-320)//2=160
    r = out[10]
    assert (r.pad_x, r.pad_y, r.scale_den) == (0, 160, 1000)
    assert (r.lminx, r.lminy, r.lmaxx, r.lmaxy) == (0, 160, 640, 160 + 320)
    # square image: identity + zero padding
    r = out[30]
    assert (r.pad_x, r.pad_y) == (0, 0)
    assert (r.lminx, r.lminy, r.lmaxx, r.lmaxy) == (0, 0, 640, 640)
    # exact replay of the rational arithmetic for the interior box
    r = out[20]
    den = 1000
    ex = lambda v: (v * 640) // den
    pad_x = (640 - (500 * 640) // den) // 2
    assert (r.lminx, r.lmaxx) == (ex(100) + pad_x, ex(300) + pad_x)
    assert (r.lminy, r.lmaxy) == (ex(200), ex(900))


def test_crop_boxes_laws(spark):
    """Crop-augmentation laws: surviving boxes sit inside the crop
    window, visibility ≥ 1/4 of the original (cross-multiplied exact),
    fully-inside boxes survive unchanged (shifted), fully-outside boxes
    drop, reruns are byte-stable, and reseeding moves windows."""
    from geodesk_spark.operators import images

    imgs = spark.createDataFrame([(1, 800, 800)], "image_id long, w long, h long")
    # crop is 600x600 at a seeded offset within [0, 200]²
    boxes = spark.createDataFrame(
        [(1, 1, 300, 300, 400, 400),       # deep interior — must survive
         (1, 2, 790, 790, 800, 800),       # far corner — may drop
         (1, 3, 0, 0, 800, 800)],          # whole image: vis = 9/16 ≥ 1/4
        "image_id long, box_id long, minx long, miny long, maxx long, maxy long",
    )
    out = {r.box_id: r for r in images.crop_boxes(imgs, boxes).collect()}
    assert 1 in out and 3 in out
    r = out[1]
    assert 0 <= r.cminx <= r.cmaxx <= r.crop_w
    assert 0 <= r.cminy <= r.cmaxy <= r.crop_h
    assert (r.cmaxx - r.cminx, r.cmaxy - r.cminy) == (100, 100)  # uncut
    r3 = out[3]
    vis = (r3.cmaxx - r3.cminx) * (r3.cmaxy - r3.cminy)
    assert vis == r3.crop_w * r3.crop_h                      # clipped to window
    assert vis * 4 >= 800 * 800 * 1                          # visibility rule
    # determinism + reseed
    a = {(r.box_id, r.cminx, r.cminy) for r in images.crop_boxes(imgs, boxes).collect()}
    b = {(r.box_id, r.cminx, r.cminy) for r in images.crop_boxes(imgs, boxes).collect()}
    assert a == b
    c = {r.box_id: (r.crop_x, r.crop_y)
         for r in images.crop_boxes(imgs, boxes, seed=9).collect()}
    assert c[1] != (out[1].crop_x, out[1].crop_y)
