"""Space-filling-curve cell ids (Z-order / Morton).

The reference clusters storage by its TIP walk order over the tile tree
(feature/store/TileIndexWalker.java:174-305) so spatially-near tiles
are file-near.  The cloud-warehouse analog is Z-ordering (Iceberg's
z-order rewrite, Delta OPTIMIZE ZORDER): interleave the tile col/row
bits so one int64 sort key clusters both axes.  Used as a sort/
bucketing key, it turns bbox queries into a handful of contiguous
row-group ranges — the same effect the TIP layout gives the mmap'd GOL.

Both the numpy kernel and the Column/SQL builders run the identical
shift-mask sequence, so the DuckDB oracle hash-matches bit-for-bit.
"""

from __future__ import annotations

import numpy as np

from geodesk_spark.geo import tile as T

# standard 16→32 bit spread (each step doubles the gap between bits)
_SPREAD = [
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
]


def spread_bits(v: np.ndarray) -> np.ndarray:
    """Insert a 0 between each of the low 16 bits (numpy int64)."""
    v = np.asarray(v, dtype=np.int64) & 0xFFFF
    for shift, mask in _SPREAD:
        v = (v | (v << shift)) & mask
    return v


def morton_cell(x: np.ndarray, y: np.ndarray, zoom: int) -> np.ndarray:
    """int64 Z-order id: zoom in the high byte, interleaved (row, col)
    below — sort-compatible within a zoom level."""
    col = np.asarray(T.column_from_x(x, zoom), dtype=np.int64)
    row = np.asarray(T.row_from_y(y, zoom), dtype=np.int64)
    z = (spread_bits(row) << 1) | spread_bits(col)
    return (np.int64(zoom) << 56) | z


def _spread_sql(expr: str) -> str:
    out = f"(({expr}) & 65535)"
    for shift, mask in _SPREAD:
        out = f"((({out} | ({out} << {shift})) ) & {mask})"
    return out


def morton_sql(x_sql: str, y_sql: str, zoom: int) -> str:
    """DuckDB/Spark-SQL twin of morton_cell (same shift-mask order)."""
    step = 1 << (32 - zoom)
    col = f"cast(floor((({x_sql}) + 2147483648) / {step}) as bigint)"
    row = f"cast(floor((2147483647 - ({y_sql})) / {step}) as bigint)"
    return (
        f"(cast({zoom} as bigint) * {1 << 56} + "
        f"(({_spread_sql(row)} << 1) | {_spread_sql(col)}))"
    )


def morton_cell_col(x_col, y_col, zoom: int):
    """Pure-Column Z-order id (JVM, no UDF) — same arithmetic."""
    from pyspark.sql import functions as F

    col = T.column_from_x_col(x_col, zoom).cast("long")
    row = T.row_from_y_col(y_col, zoom).cast("long")

    def spread(v):
        v = v.bitwiseAND(F.lit(0xFFFF))
        for shift, mask in _SPREAD:
            v = (v.bitwiseOR(F.shiftleft(v, shift))).bitwiseAND(F.lit(mask))
        return v

    z = F.shiftleft(spread(row), 1).bitwiseOR(spread(col))
    return F.lit(zoom << 56).cast("long") + z
