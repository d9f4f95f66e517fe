"""One-shot splitter: break __spark_entry__.py into geodesk_spark/driver_queries/.

Slices the entry file into CONTIGUOUS blocks at chosen query-function
boundaries (no statement reordering, so each module preserves the
original relative order), computes every module's cross-module imports
from the actual name-reference graph, and errors on forward references
(a block using a name defined in a LATER block would need an import
cycle).  The emitted registry module re-exports QUERIES; the new
__spark_entry__.py is a thin driver shim.

Run from the repo root: python tools/split_entry.py [--check]
--check only reports the planned split + forward refs.
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path

SRC = Path("__spark_entry__.py")
PKG = Path("geodesk_spark/driver_queries")

# block boundaries: (module_name, first _q_/marker name that starts it).
# Everything before the first boundary goes to common.py (imports,
# shared constants, _dist_sql, _derived_orders, _DERIVED_SQL).
BOUNDARIES = [
    ("tiles_cells", "_q_tile_assign"),        # tiles, cells, curves, skew, heading
    ("spatial", "_q_bbox"),                   # bbox/distance/snap/pip/zonal/knn/idw
    ("relational", "_q_agg_pricing"),         # agg/join/window/asof/interval/quantiles
    ("graph_mobility", "_q_pagerank"),        # graph analytics, geofence, mobility, stats
    ("sketches", "_q_weighted_sample"),       # samples, hll/cms/bloom, events_hourly
    ("tiles_sink_stream", "_q_tile_render"),  # render, zorder, streaming
    ("features_goql", "_q_graph_members"),    # feature graph ops, views, goql, text, dedup, ann
    ("polygons", "_q_polygon_assembly"),      # polygon assembly, relations, phash
    ("samples_images", "_q_stratified_sample"),  # sampling, packing, images, pipelines
    ("lines_raster", "_q_raster_pixels"),     # line predicates, raster, centroid, crossing
    ("goql_ann_tail", "_q_goql_regex"),       # tail: goql regex, ivf/pq, kmeans
    ("registry", "QUERIES"),                  # the dict + entry/queries/oracle_sql
]


def stmt_name(node: ast.stmt) -> str | None:
    if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
        return node.name
    if isinstance(node, ast.Assign) and len(node.targets) == 1 and isinstance(
        node.targets[0], ast.Name
    ):
        return node.targets[0].id
    if isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
        return node.target.id
    return None


def defined_names(node: ast.stmt) -> set[str]:
    out = set()
    n = stmt_name(node)
    if n:
        out.add(n)
    if isinstance(node, ast.Assign):
        for t in node.targets:
            for sub in ast.walk(t):
                if isinstance(sub, ast.Name):
                    out.add(sub.id)
    if isinstance(node, (ast.Import, ast.ImportFrom)):
        for a in node.names:
            out.add((a.asname or a.name).split(".")[0])
    return out


def used_names(node: ast.stmt) -> set[str]:
    return {
        sub.id
        for sub in ast.walk(node)
        if isinstance(sub, ast.Name) and isinstance(sub.ctx, ast.Load)
    }


def main() -> int:
    check = "--check" in sys.argv
    src = SRC.read_text()
    lines = src.splitlines(keepends=True)
    tree = ast.parse(src)

    # names hoisted into common to break forward references (their own
    # dependencies are all common-block names — verified by the forward-
    # reference check below, which would flag any violation)
    HOIST = {"_part_features", "RECT", "_box_sql_base"}

    # map statement -> block
    anchor_to_block = {a: m for m, a in BOUNDARIES}
    blocks: list[tuple[str, list[ast.stmt]]] = [("common", [])]
    for node in tree.body:
        n = stmt_name(node)
        if n in anchor_to_block:
            blocks.append((anchor_to_block[n], []))
        if n in HOIST:
            blocks[0][1].append(node)
        else:
            blocks[-1][1].append(node)

    got = [b for b, _ in blocks]
    want = ["common"] + [m for m, _ in BOUNDARIES]
    if got != want:
        print(f"block order mismatch:\n got {got}\n want {want}")
        return 1

    # provider map: name -> (block_index, module)
    provider: dict[str, tuple[int, str]] = {}
    for bi, (mod, stmts) in enumerate(blocks):
        for st in stmts:
            for nm in defined_names(st):
                provider.setdefault(nm, (bi, mod))

    # per-module imports + forward-reference detection
    forward: list[str] = []
    mod_imports: dict[str, dict[str, set[str]]] = {}
    for bi, (mod, stmts) in enumerate(blocks):
        needs: dict[str, set[str]] = {}
        for st in stmts:
            for nm in used_names(st):
                if nm in defined_names(st):
                    continue
                p = provider.get(nm)
                if p is None:
                    continue  # builtin / local / comprehension var
                pbi, pmod = p
                if pbi > bi:
                    forward.append(f"{mod}: uses {nm!r} from later block {pmod}")
                elif pbi != bi:
                    needs.setdefault(pmod, set()).add(nm)
        mod_imports[mod] = needs

    for bi, (mod, stmts) in enumerate(blocks):
        print(f"{mod}: {len(stmts)} stmts, imports from "
              f"{{{', '.join(sorted(mod_imports[mod]))}}}")
    if forward:
        print("\nFORWARD REFERENCES (must fix before splitting):")
        for f in forward:
            print(" ", f)
        return 1
    if check:
        return 0

    PKG.mkdir(parents=True, exist_ok=True)
    header = (
        '"""Driver-contract query builders (split from __spark_entry__.py).\n\n'
        "Auto-split by tools/split_entry.py: statements keep their original\n"
        "relative order; cross-module imports are computed from the actual\n"
        'name-reference graph.  See registry.py for the assembled QUERIES."""\n'
    )
    for mod, stmts in blocks:
        parts = [header, "\nfrom __future__ import annotations\n\n"]
        for dep, names in sorted(mod_imports[mod].items()):
            ns = ",\n    ".join(sorted(names))
            parts.append(
                f"from geodesk_spark.driver_queries.{dep} import (\n    {ns},\n)\n"
            )
        parts.append("\n")
        for i, st in enumerate(stmts):
            if isinstance(st, ast.ImportFrom) and st.module == "__future__":
                continue  # re-emitted at top
            if (
                mod == "common"
                and i == 0
                and isinstance(st, ast.Expr)
                and isinstance(st.value, ast.Constant)
                and isinstance(st.value.value, str)
            ):
                continue  # original module docstring (superseded by header)
            # include decorator lines: FunctionDef.lineno points at `def`,
            # decorators live on earlier lines
            start = st.lineno
            for dec in getattr(st, "decorator_list", []):
                start = min(start, dec.lineno)
            seg = "".join(lines[start - 1 : st.end_lineno])
            parts.append(seg)
            parts.append("\n\n")
        (PKG / f"{mod}.py").write_text("".join(parts))
    (PKG / "__init__.py").write_text(
        '"""Driver-contract query registry package (split from __spark_entry__.py)."""\n'
        "from geodesk_spark.driver_queries.registry import (  # noqa: F401\n"
        "    QUERIES,\n    entry,\n    oracle_sql,\n    queries,\n)\n"
    )
    print(f"\nwrote {len(blocks)} modules to {PKG}/")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
