"""User-facing `Features` view — the reference's primary API surface
(feature/Features.java:40-215) re-expressed over a DataFrame.

A `Features` is a lazy, immutable view of typed features; every
refinement returns a NEW view whose underlying DataFrame has one more
predicate/join AND-ed in (the reference composes views by intersecting
type masks and AND-ing matchers/filters, feature/query/View.java:47-117
— Catalyst's plan composition does the same thing here, and the
optimizer folds the stacked filters into one scan predicate).

Expected columns (sources/synth_features.SCHEMA_DDL, or any table with
the same shape): fid long, ftype string ('node'|'way'|'relation'),
is_area boolean, tags map<string,string>, x int, y int (anchor /
bbox-midpoint imps), minx/miny/maxx/maxy int, gkind string,
geom binary.  Graph navigation additionally needs the edge tables
members(rel_id, member_id, role, seq) and way_nodes(way_id, seq, x, y,
node_id).

Terminal ops (`count`, `first`, `is_empty`, `__iter__`, `to_list`)
mirror feature/Features.java:139-215; iteration streams through
toLocalIterator so the driver never holds the full result.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, Row, functions as F

from geodesk_spark.geo import mercator
from geodesk_spark.goql.compiler import compile_goql
from geodesk_spark.operators import graph, predicates, spatial_join


class Features:
    def __init__(
        self,
        df: DataFrame,
        members: DataFrame | None = None,
        way_nodes: DataFrame | None = None,
        base: DataFrame | None = None,
    ):
        self._df = df
        self._members = members
        self._way_nodes = way_nodes
        # graph targets resolve against the UNFILTERED root table: the
        # reference resolves members through the store, not the view
        # (MemberIterator.java:170-187)
        self._base = base if base is not None else df

    # -- construction ----------------------------------------------------
    def _with(self, df: DataFrame) -> "Features":
        return Features(df, self._members, self._way_nodes, base=self._base)

    @property
    def df(self) -> DataFrame:
        """Escape hatch: the underlying DataFrame (the view's plan)."""
        return self._df

    # -- tag / type refinement (Features.java:48-90) ---------------------
    def select(self, goql: str) -> "Features":
        return self._with(self._df.filter(compile_goql(goql)))

    def nodes(self, goql: str | None = None) -> "Features":
        out = self._df.filter(F.col("ftype") == "node")
        return self._with(out if goql is None else out.filter(compile_goql(goql)))

    def ways(self, goql: str | None = None) -> "Features":
        out = self._df.filter(F.col("ftype") == "way")
        return self._with(out if goql is None else out.filter(compile_goql(goql)))

    def relations(self, goql: str | None = None) -> "Features":
        out = self._df.filter(F.col("ftype") == "relation")
        return self._with(out if goql is None else out.filter(compile_goql(goql)))

    # -- id lookup (Features.java:482-501, IdMatcher.java:12-28) ---------
    def node(self, fid: int) -> "Features":
        return self._with(self._df.filter((F.col("ftype") == "node") & (F.col("fid") == fid)))

    def way(self, fid: int) -> "Features":
        return self._with(self._df.filter((F.col("ftype") == "way") & (F.col("fid") == fid)))

    def relation(self, fid: int) -> "Features":
        return self._with(
            self._df.filter((F.col("ftype") == "relation") & (F.col("fid") == fid))
        )

    # -- bbox restriction (Features.java:132, WorldView.java:73-76) ------
    def in_bbox(self, minx: int, miny: int, maxx: int, maxy: int) -> "Features":
        """Feature-bbox ∩ query-bbox; antimeridian-aware when minx > maxx
        (Box.java:16-19, 76-79)."""
        if minx <= maxx:
            xtest = (F.col("maxx") >= minx) & (F.col("minx") <= maxx)
        else:
            xtest = (F.col("maxx") >= minx) | (F.col("minx") <= maxx)
        return self._with(
            self._df.filter(xtest & (F.col("maxy") >= miny) & (F.col("miny") <= maxy))
        )

    def in_lonlat(self, w: float, s: float, e: float, n: float) -> "Features":
        x1 = int(mercator.x_from_lon(w)[()])
        x2 = int(mercator.x_from_lon(e)[()])
        y1 = int(mercator.y_from_lat(s)[()])
        y2 = int(mercator.y_from_lat(n)[()])
        return self.in_bbox(x1, y1, x2, y2)

    def in_box(self, box) -> "Features":
        """Restrict by a geo.box.Box (empty box → empty view,
        EmptyView short-circuit, View.java:47-65)."""
        if box.is_empty:
            return self._with(self._df.filter(F.lit(False)))
        return self.in_bbox(box.minx, box.miny, box.maxx, box.maxy)

    # -- spatial predicates (Features.java:225-330, filter/*.java) -------
    def _relate(self, prepared, predicate: str) -> "Features":
        keep = [c for c in self._df.columns]
        out = predicates.spatial_predicate_join(self._df, prepared, predicate, keep_cols=keep)
        # identity is (fid, ftype): OSM node/way/relation id namespaces
        # overlap, the reference packs type into the id (FeatureId.java:20-29)
        return self._with(out.drop("poly_id").dropDuplicates(["fid", "ftype"]))

    def intersecting(self, prepared) -> "Features":
        return self._relate(prepared, "intersects")

    def within(self, prepared) -> "Features":
        return self._relate(prepared, "within")

    def covered_by(self, prepared) -> "Features":
        return self._relate(prepared, "covered_by")

    def crossing(self, prepared) -> "Features":
        return self._relate(prepared, "crosses")

    def touching(self, prepared) -> "Features":
        return self._relate(prepared, "touches")

    def overlapping(self, prepared) -> "Features":
        return self._relate(prepared, "overlaps")

    def select_spatial(self, prepared, predicate: str) -> "Features":
        """Arbitrary (incl. registered custom) spatial predicate — the
        reference's Features.select(Filter) (Features.java:217)."""
        return self._relate(prepared, predicate)

    def containing_point(self, lon: float, lat: float) -> "Features":
        """Features whose polygon contains the lon/lat point
        (ContainsPointFilter.java:26-72): bbox prefilter JVM-side, exact
        ray-cast only on bbox hits."""
        import numpy as np

        from geodesk_spark.geo import pip

        qx = float(mercator.x_from_lon(lon)[()])
        qy = float(mercator.y_from_lat(lat)[()])
        cand = self._df.filter(
            (F.col("minx") <= qx) & (F.col("maxx") >= qx)
            & (F.col("miny") <= qy) & (F.col("maxy") >= qy)
        )

        def kernel(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                keep = []
                for i, blob in enumerate(pdf["geom"]):
                    if blob is None:
                        keep.append(False)
                        continue
                    rings = pip.unpack_rings(bytes(blob))
                    keep.append(
                        bool(pip.points_in_polygon(np.array([qx]), np.array([qy]), rings)[0])
                    )
                out = pdf[np.array(keep, dtype=bool)]
                if len(out):
                    yield out

        area = cand.filter(F.col("is_area"))
        return self._with(area.mapInPandas(kernel, schema=area.schema))

    def max_meters_from(self, meters: float, lon: float, lat: float) -> "Features":
        """Distance filter on the feature anchor (PointDistanceFilter.java:28-60);
        bbox prune + exact Mercator distance, all JVM columns."""
        out = spatial_join.within_distance(
            self._df, lon, lat, meters, keep_cols=list(self._df.columns)
        )
        return self._with(out.select(*self._df.columns))

    # -- graph navigation (Features.java:98-124) -------------------------
    def members_of(self, goql: str | None = None, role: str | None = None) -> "Features":
        """Members of the relations in THIS view (MemberIterator semantics)."""
        self._need_edges()
        rels = self._df.filter(F.col("ftype") == "relation")
        out = graph.members_of(rels, self._members, self._all_features(), goql=goql, role=role)
        return self._with(out)

    def parents_of(self) -> "Features":
        """Parent relations AND parent ways (the reference's node.parents()
        returns both, StoredNode.java:94-127 + ParentRelationView)."""
        self._need_edges()
        rels = graph.parents_of(self._df, self._members, self._all_features())
        ways = graph.parent_ways_of(self._df, self._way_nodes, self._all_features())
        # (fid, ftype) identity: a way and a relation may share a bare id
        return self._with(rels.unionByName(ways).dropDuplicates(["fid", "ftype"]))

    def nodes_of(self, tagged_only: bool = False) -> "Features":
        self._need_edges()
        ways = self._df.filter(F.col("ftype") == "way")
        out = graph.nodes_of(ways, self._way_nodes, self._all_features(), tagged_only=tagged_only)
        return self._with(out)

    def _need_edges(self):
        if self._members is None or self._way_nodes is None:
            raise ValueError(
                "graph navigation needs the members/way_nodes edge tables: "
                "Features(df, members=..., way_nodes=...)"
            )

    def _all_features(self) -> DataFrame:
        return self._base

    # -- view combination (View.java:176-213) ----------------------------
    def intersect(self, other: "Features") -> "Features":
        """select(Features other) — features present in both views.
        Semi-join on (fid, ftype): bare fids collide across type namespaces
        (FeatureId.java:20-29)."""
        return self._with(
            self._df.join(
                other._df.select("fid", "ftype").distinct(), ["fid", "ftype"], "left_semi"
            )
        )

    # -- terminals (Features.java:139-215) -------------------------------
    def count(self) -> int:
        return self._df.count()

    @property
    def is_empty(self) -> bool:
        return self._df.limit(1).count() == 0

    def first(self) -> Row | None:
        rows = self._df.limit(1).collect()
        return rows[0] if rows else None

    def to_map(
        self, out_dir: str, filename: str = "map.html", limit: int = 10_000, **page_opts
    ) -> str:
        """Render this view as a Leaflet map — the reference's
        ``MapMaker.add(features); save()`` flow (util/MapMaker.java:
        64-88): point features become circle markers, bbox features
        outline polygons, each tooltipped with its typed id.  Collects
        at most ``limit`` rows driver-side — a human-facing map is
        bounded by construction, like the reference's single-writer
        save; pre-filter the view for anything larger.  Returns the
        written page's path.
        """
        import pandas as pd

        from geodesk_spark.operators import tiles_sink

        cols = set(self._df.columns)
        markers = []
        for r in self._df.limit(limit).collect():
            tip = (
                f"{r['ftype']}/{r['fid']}" if {"fid", "ftype"} <= cols else None
            )
            if {"x", "y"} <= cols and r["x"] is not None:
                markers.append(
                    {"kind": "point", "coords": (r["x"], r["y"]), "tooltip": tip}
                )
            elif {"minx", "miny", "maxx", "maxy"} <= cols and r["minx"] is not None:
                ring = [
                    (r["minx"], r["miny"]), (r["maxx"], r["miny"]),
                    (r["maxx"], r["maxy"]), (r["minx"], r["maxy"]),
                    (r["minx"], r["miny"]),
                ]
                markers.append({"kind": "polygon", "coords": [ring], "tooltip": tip})
        return tiles_sink.write_leaflet_page(
            pd.DataFrame(), out_dir, filename=filename, markers=markers, **page_opts
        )

    def _export_geoms(self, point_fn, way_fn, out_col: str, extra=()) -> DataFrame:
        """Shared export scaffolding for to_geojson/to_wkt: nodes through
        ``point_fn(x, y)``, ways through ``way_fn(pts, is_area)`` over the
        sorted way-node vertex arrays; ``extra`` adds (alias, Column)
        pass-through columns (e.g. the properties JSON).

        Ways with NO way-node rows at all are DROPPED by the inner join
        below (documented contract: a vertexless way has no renderable
        geometry; the reference's GOL builder likewise never emits such
        a feature).  Ways whose vertex array exists but is empty fail
        loudly inside the writers (raise_error in way_fn)."""
        cols = set(self._df.columns)
        is_area = (
            F.coalesce(F.col("is_area"), F.lit(False))
            if "is_area" in cols
            else F.lit(False)
        )
        extra_cols = [c.alias(a) for a, c in extra]
        nodes = self._df.filter(F.col("ftype") == "node").select(
            "fid",
            "ftype",
            *extra_cols,
            point_fn(F.col("x"), F.col("y")).alias(out_col),
        )
        if self._way_nodes is None:
            return nodes
        pts = self._way_nodes.groupBy("way_id").agg(
            F.sort_array(F.collect_list(F.struct("seq", "x", "y"))).alias("_pts")
        )
        ways = (
            self._df.filter(F.col("ftype") == "way")
            .join(pts, F.col("fid") == F.col("way_id"))
            .select(
                "fid",
                "ftype",
                *extra_cols,
                way_fn(F.col("_pts"), is_area).alias(out_col),
            )
        )
        return nodes.unionByName(ways)

    def to_geojson(self) -> DataFrame:
        """Per-feature GeoJSON Feature STRINGS as a DataFrame column —
        the reference's ``Feature.toGeoJson()`` (GeoJson.java +
        Mercator.java's precision-7 coordinate writer) lifted to a
        distributed export: nodes → Point, ways → LineString (areas →
        single-ring Polygon, closed iff not already) via the way-node
        table; relation multipolygons are served by
        polygons.relation_geometry and are not re-assembled here.
        Pure-JVM string building (decimal-rendered precision-7 coords,
        to_json properties) — no Python, valid for 10^12-row exports.
        Returns (fid, ftype, geojson)."""
        from geodesk_spark.operators import geometry_ops as _g

        tags_json = (
            F.coalesce(F.to_json(F.col("tags")), F.lit("{}"))
            if "tags" in self._df.columns
            else F.lit("{}")
        )
        out = self._export_geoms(
            _g.geojson_point_col,
            _g.geojson_way_col,
            "_geom",
            extra=[("_props", tags_json)],
        )
        feature = F.concat(
            F.lit('{"type":"Feature","id":"'),
            F.col("ftype"),
            F.lit("/"),
            F.col("fid").cast("string"),
            F.lit('","geometry":'),
            F.col("_geom"),
            F.lit(',"properties":'),
            F.col("_props"),
            F.lit("}"),
        )
        return out.select("fid", "ftype", feature.alias("geojson"))

    def to_wkt(self) -> DataFrame:
        """Per-feature WKT strings (fid, ftype, wkt) — the reference's
        PLANNED ``Feature.toWkt()`` (Feature.java:239, declared but not
        yet shipped there); same distributed pure-JVM writer shape as
        to_geojson."""
        from geodesk_spark.operators import geometry_ops as _g

        return self._export_geoms(_g.wkt_point_col, _g.wkt_way_col, "wkt")

    def to_list(self) -> list[Row]:
        return self._df.collect()

    def __iter__(self) -> Iterator[Row]:
        return self._df.toLocalIterator()

    def contains(self, fid: int, ftype: str | None = None) -> bool:
        """Membership test (WorldView.java:78-102 semi-join form).
        Pass ftype to disambiguate colliding node/way/relation ids."""
        cond = F.col("fid") == fid
        if ftype is not None:
            cond = cond & (F.col("ftype") == ftype)
        return not self._with(self._df.filter(cond)).is_empty
