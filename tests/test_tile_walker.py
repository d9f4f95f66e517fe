"""TileIndexWalker parity (VERDICT r03 #7): our tile_index_walk must
reproduce the reference's walk ORDER, TIP assignment, and NW flags.

The check is adversarial by construction: `build_tile_index` serializes
a GOL-style index into a word array, and `_JavaWalker` below is a
LITERAL transcription of TileIndexWalker.java:58-82 (Level.init) and
:174-305 (next()) reading that array through ByteBuffer-equivalent
getInt/getLong — iterative col/row cursors, childTileMask bit tests,
bit-count slot lookup, relative-pointer descent, TIP arithmetic.  The
engine's tile_index_walk is an independent recursive set-based
implementation; agreement on random forests × random query boxes pins
the semantics.
"""

import numpy as np
import pytest

from geodesk_spark.geo import tile as T
from geodesk_spark.operators import tiling

I31 = 1 << 31


def _get_int(words, byte_ofs):
    assert byte_ofs % 4 == 0
    return words[byte_ofs // 4]


def _get_long(words, byte_ofs):
    # little-endian long from two consecutive words (ByteBuffer.getLong)
    assert byte_ofs % 4 == 0
    i = byte_ofs // 4
    hi = words[i + 1] if i + 1 < len(words) else 0
    return (words[i] & 0xFFFFFFFF) | ((hi & 0xFFFFFFFF) << 32)


class _Level:
    """Literal port of TileIndexWalker.Level (TileIndexWalker.java:42-83)."""

    __slots__ = (
        "parent", "child", "childTileMask", "pChildEntries",
        "topLeftChildTile", "extent", "startCol", "startRow",
        "endCol", "endRow", "currentCol", "currentRow",
    )

    def __init__(self):
        self.parent = self.child = None
        self.extent = 0
        self.topLeftChildTile = 0

    def init(self, words, pEntry, parentTile, bounds):
        zoom = self.topLeftChildTile >> 24
        step = zoom - (parentTile >> 24)
        tileTop = ((parentTile >> 12) & 0xFFF) << step
        tileLeft = (parentTile & 0xFFF) << step
        self.topLeftChildTile = (zoom << 24) | (tileTop << 12) | tileLeft
        minx, miny, maxx, maxy = bounds
        left = (minx + I31) >> (32 - zoom)
        right = (maxx + I31) >> (32 - zoom)
        top = (I31 - 1 - maxy) >> (32 - zoom)
        bottom = (I31 - 1 - miny) >> (32 - zoom)
        self.startCol = max(left - tileLeft, 0)
        self.startRow = max(top - tileTop, 0)
        self.endCol = min(right - tileLeft, self.extent - 1)
        self.endRow = min(bottom - tileTop, self.extent - 1)
        self.currentCol = self.startCol - 1
        self.currentRow = self.startRow
        self.childTileMask = _get_long(words, pEntry + 4)
        self.pChildEntries = pEntry + (12 if self.extent == 8 else 8)


class _JavaWalker:
    """Literal port of TileIndexWalker (constructor :85-107, start
    :114-123, next :174-305; dense-bbox northwestFlags :287-297)."""

    def __init__(self, words, zoom_levels_mask):
        self.words = words
        self.pTileIndex = 0
        self.current = self.root = _Level()
        level = self.root
        zoom_levels_mask >>= 1
        zoom = 0
        while True:
            step = (zoom_levels_mask & -zoom_levels_mask).bit_length() if zoom_levels_mask else 33
            # numberOfTrailingZeros + 1 == bit_length of lowest set bit
            zoom += step
            level.topLeftChildTile = zoom << 24
            level.extent = 1 << step
            zoom_levels_mask >>= step
            if zoom_levels_mask == 0:
                break
            child = _Level()
            level.child = child
            child.parent = level
            level = child

    def start(self, bounds):
        self.bounds = bounds
        self.currentTip = 1
        self.root.init(self.words, self.pTileIndex + 4, 0, bounds)
        self.current = self.root
        self.currentTile = 0
        self.northwestFlags = 0

    def next(self):
        level = self.current
        childTileMask = level.childTileMask
        while True:
            level.currentCol += 1
            if level.currentCol > level.endCol:
                level.currentRow += 1
                if level.currentRow > level.endRow:
                    level = level.parent
                    self.current = level
                    if level is None:
                        return False
                    childTileMask = level.childTileMask
                    continue
                level.currentCol = level.startCol
            childNumber = level.currentRow * level.extent + level.currentCol
            if (childTileMask >> childNumber) & 1:
                # childEntry = Long.bitCount(mask << (63 - childNumber)) - 1
                childEntry = bin((childTileMask << (63 - childNumber)) & ((1 << 64) - 1)).count("1") - 1
                # Tile.relative (Tile.java:375-378): tile + (dRow<<12) + dCol
                self.currentTile = (
                    level.topLeftChildTile
                    + (level.currentRow << 12)
                    + level.currentCol
                )
                minx, _, _, maxy = self.bounds
                z = self.currentTile >> 24
                topY = I31 - 1 - (((self.currentTile >> 12) & 0xFFF) << (32 - z))
                leftX = ((self.currentTile & 0xFFF) << (32 - z)) - I31
                self.northwestFlags = (T.MULTITILE_NORTH if maxy > topY else 0) | (
                    T.MULTITILE_WEST if minx < leftX else 0
                )
                pEntry = level.pChildEntries + childEntry * 4
                pageOrPtr = _get_int(self.words, pEntry)
                if (pageOrPtr & 3) == 1:
                    level = level.child
                    self.current = level
                    pEntry += pageOrPtr ^ 1
                    level.init(self.words, pEntry, self.currentTile, self.bounds)
                self.currentTip = (pEntry - self.pTileIndex) // 4
                return True


def _java_walk(populated, bounds, zooms):
    words, _ = tiling.build_tile_index(populated, zooms)
    mask = 0
    for z in zooms:
        mask |= 1 << z
    w = _JavaWalker(words, mask)
    w.start(bounds)
    out = []
    while w.next():
        out.append((w.currentTile, w.currentTip, w.northwestFlags))
    return out


def _t(z, col, row):
    return (z << 24) | (row << 12) | col


def test_walk_order_pinned_fixture():
    """Hand-checked pre-order fixture: levels (2,4); root 4x4 grid, two
    zoom-2 tiles, one with two zoom-4 children.  The walker must report
    parent, then ITS children, then the next zoom-2 sibling — row-major
    within a level."""
    zooms = (2, 4)
    # zoom-2 tiles (0,1) and (2,1); (0,1) has zoom-4 children (1,4),(2,5)
    pop = {_t(2, 0, 1), _t(2, 2, 1), _t(4, 1, 4), _t(4, 2, 5)}
    world = (-I31, -I31, I31 - 1, I31 - 1)
    got = tiling.tile_index_walk(pop, *world, zooms=zooms)
    tiles = [t for t, _, _ in got]
    assert tiles == [
        _t(2, 0, 1),  # parent first (pre-order)
        _t(4, 1, 4), _t(4, 2, 5),  # then its children, row-major
        _t(2, 2, 1),  # then the next sibling at zoom 2
    ]
    # TIPs are distinct word offsets; parent-with-children TIP is its
    # record position, which precedes its children's slots
    tips = {t: tip for t, tip, _ in got}
    assert len(set(tips.values())) == len(tips)
    assert tips[_t(2, 0, 1)] < tips[_t(4, 1, 4)] < tips[_t(4, 2, 5)]
    # full-world query extends north+west of everything except the
    # worldwide top-left edges
    flags = {t: f for t, _, f in got}
    assert flags[_t(2, 0, 1)] == T.MULTITILE_NORTH  # col 0 => no west
    assert flags[_t(2, 2, 1)] == T.MULTITILE_NORTH | T.MULTITILE_WEST


def test_walk_matches_java_port_random():
    """Random forests x random query boxes: engine recursion == literal
    Java-port walk over the serialized index (order, TIP, flags)."""
    rng = np.random.default_rng(1234)
    zooms = (2, 4, 6)
    for trial in range(25):
        n = int(rng.integers(1, 40))
        pop = set()
        for _ in range(n):
            z = int(rng.choice(zooms))
            col = int(rng.integers(0, 1 << z))
            row = int(rng.integers(0, 1 << z))
            pop.add(_t(z, col, row))
        if rng.random() < 0.3:
            bounds = (-I31, -I31, I31 - 1, I31 - 1)
        else:
            xs = sorted(int(v) for v in rng.integers(-I31, I31 - 1, 2))
            ys = sorted(int(v) for v in rng.integers(-I31, I31 - 1, 2))
            bounds = (xs[0], ys[0], xs[1], ys[1])
        got = tiling.tile_index_walk(pop, *bounds, zooms=zooms)
        want = _java_walk(pop, bounds, zooms)
        assert got == want, (trial, pop, bounds)


def test_walk_default_levels_and_step8():
    """extent==8 masks (step 3) use the two-word childTileMask layout
    (pChildEntries = pEntry + 12); exercise step sizes 2 and 3 mixed."""
    zooms = (3, 6, 8)
    rng = np.random.default_rng(7)
    pop = {
        _t(int(z), int(rng.integers(0, 1 << int(z))), int(rng.integers(0, 1 << int(z))))
        for z in rng.choice(zooms, size=30)
    }
    bounds = (-I31 // 2, -I31 // 3, I31 // 2, I31 // 5)
    assert tiling.tile_index_walk(pop, *bounds, zooms=zooms) == _java_walk(
        pop, bounds, zooms
    )


def test_walk_rejects_unwalkable_levels():
    with pytest.raises(ValueError, match="steps must be 1-3"):
        tiling.build_tile_index({_t(4, 0, 0)}, zooms=(4, 6))


def test_walk_covers_query_tile_list():
    """The walk's tile set equals the dense slow_query_tiles enumeration
    intersected with existing tiles (same bbox->col/row math)."""
    zooms = (2, 4, 6)
    rng = np.random.default_rng(99)
    pop = {
        _t(int(z), int(rng.integers(0, 1 << int(z))), int(rng.integers(0, 1 << int(z))))
        for z in rng.choice(zooms, size=50)
    }
    tree, _ = tiling._tile_tree(pop, zooms)
    bounds = (-(1 << 29), -(1 << 28), 1 << 30, 1 << 27)
    walked = {t for t, _, _ in tiling.tile_index_walk(pop, *bounds, zooms=zooms)}
    dense = {
        t
        for t, _ in tiling.slow_query_tiles(*bounds, zooms=zooms)
        if (t >> 24) in zooms
    }
    assert walked == (dense & tree)


def test_walk_step1_levels_and_sparse_bbox():
    """Step-1 levels (extent 2, 4-bit masks) and a bbox touching nothing."""
    zooms = (1, 2, 3)
    pop = {_t(3, 5, 2), _t(3, 0, 7), _t(2, 1, 1)}
    world = (-I31, -I31, I31 - 1, I31 - 1)
    got = tiling.tile_index_walk(pop, *world, zooms=zooms)
    assert got == _java_walk(pop, world, zooms)
    # a bbox inside an empty quadrant yields nothing
    empty = tiling.tile_index_walk({_t(3, 7, 7)}, -I31, 0, -1, I31 - 1, zooms=zooms)
    # tile (3,7,7) is in the south-east; the north-west query bbox sees
    # only ancestors that overlap it — none, since ancestors of (7,7)
    # are all in the east half
    assert empty == _java_walk({_t(3, 7, 7)}, (-I31, 0, -1, I31 - 1), zooms)
    assert empty == []
