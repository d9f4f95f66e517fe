"""geodesk_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch re-expression of the query and data-processing
capabilities of clarisma/geodesk (reference at /root/reference, v2.1.0)
as an idiomatic Apache Spark engine:

- integer pseudo-Mercator ("imp") coordinate system and zoom-0..12
  tile pyramid with the reference's exact numbering / rounding rules
  (geom/Mercator.java, geom/Tile.java),
- tile assignment with multi-tile duplication + NW-flag dedup
  (feature/store/FeatureFlags.java:19-24, TileIndexWalker.java:251-284),
- GOQL tag-query language compiled to Catalyst Columns
  (feature/match/MatcherParser.java),
- spatial predicate joins (point-in-polygon, intersects, within,
  distance, kNN) as three-band broadcast joins
  (feature/filter/*.java, AbstractRelateFilter.java:61-72),
- plus large-scale training-data operators (dedup, ANN, text quality,
  multimodal columns) that the reference does not have but a 100 TB
  pipeline needs.

Everything is DataFrame-first; Python kernels are vectorized
numpy/Arrow via pandas UDFs — no per-row Python in any hot path.
"""

__version__ = "0.1.0"

from geodesk_spark.features import Features  # noqa: F401
from geodesk_spark.session import get_spark  # noqa: F401
