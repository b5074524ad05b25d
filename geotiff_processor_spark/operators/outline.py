"""Outline chain (SURVEY.md A5/A6, M4): cell-set -> polygon -> GeoJSON.

The reference polygonizes the raster mask into outline features
(``/root/reference/outlines.py:39-99``: Polygonize -> area filter >10 m²
(params.py:50) -> collect into MultiPolygon -> Buffer(0)/MakeValid ->
Simplify(1) -> GeoJSON with gsd/registroid/map_id/date fields,
outlines.py:104-128).

Engine form over pages: per group (map_id analog), the set of occupied
level-p cells is the "mask"; connected components + exact boundary
tracing of the cell union run in a grouped-map ``applyInPandas`` (the
UDTF-shaped pixels->features operator, SURVEY.md §2.10) — pure numpy,
no GDAL/shapely:

1. occupied cells -> connected components (4-neighbor union-find =
   gdal.Polygonize's contiguity rule)
2. component -> exact outer-boundary ring via edge-following (each
   boundary edge appears exactly once; deterministic traversal)
3. area filter: components below ``min_cells`` dropped (minimum_area
   analog)
4. simplify: collinear vertex elimination (exact for rectilinear
   rings — the conservative analog of Simplify(tolerance))
5. emit one row per component with the ring as GeoJSON text.

The grouped-map shuffles only (group_key, cell) pairs — cells are
pre-deduplicated per group, so the shuffle is bounded by the number of
distinct occupied cells, not pages (the same reduction the reference
gets by polygonizing the 20 m downsample, process.py:172-182).
Tile-crossing components within one group are handled exactly (the
whole group's cell set is present); components crossing *group*
boundaries don't exist by construction (groups partition pages).
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _connected_components(cells: np.ndarray) -> dict[tuple[int, int], int]:
    """4-neighbor union-find over (x, y) integer cells."""
    cellset = {(int(x), int(y)) for x, y in cells}
    parent = {c: c for c in cellset}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    for (x, y) in cellset:
        for nb in ((x + 1, y), (x, y + 1)):
            if nb in cellset:
                union((x, y), nb)
    return {c: find(c) for c in cellset}


def _boundary_ring(comp: set[tuple[int, int]]) -> list[tuple[int, int]]:
    """Outer boundary of a 4-connected cell set as a closed lattice-vertex
    ring (counter-clockwise, interior on the left).

    Edge-following with used-edge marking; at pinch vertices (a vertex
    with two outgoing boundary edges — diagonal self-touch) the sharpest
    left turn is taken, mirroring how the reference repairs self-touching
    rings with Buffer(0)/MakeValid (outlines.py:86-89). Interior hole
    rings are intentionally omitted (outer ring only). Starts at the
    lexicographically smallest vertex => deterministic output.
    """
    # boundary edges as directed segments keeping interior on the left
    edges: dict[tuple[int, int], list[tuple[int, int]]] = {}
    for (x, y) in comp:
        segs = []
        if (x, y - 1) not in comp:  # bottom edge, left->right
            segs.append(((x, y), (x + 1, y)))
        if (x + 1, y) not in comp:  # right edge, bottom->top
            segs.append(((x + 1, y), (x + 1, y + 1)))
        if (x, y + 1) not in comp:  # top edge, right->left
            segs.append(((x + 1, y + 1), (x, y + 1)))
        if (x - 1, y) not in comp:  # left edge, top->bottom
            segs.append(((x, y + 1), (x, y)))
        for a, b in segs:
            edges.setdefault(a, []).append(b)

    def turn_rank(din, dout):
        # smaller = sharper left turn (cross product descending)
        return -(din[0] * dout[1] - din[1] * dout[0])

    start = min(edges)
    ring = [start]
    used: set[tuple[tuple[int, int], tuple[int, int]]] = set()
    cur = start
    din = (0, 1)  # arbitrary initial heading; start vertex is convex
    while True:
        outs = [b for b in edges.get(cur, ())
                if (cur, b) not in used]
        if not outs:
            break
        nxt = min(
            outs,
            key=lambda b: turn_rank(din, (b[0] - cur[0], b[1] - cur[1])))
        used.add((cur, nxt))
        ring.append(nxt)
        din = (nxt[0] - cur[0], nxt[1] - cur[1])
        cur = nxt
        if cur == start:
            break
    return ring


def _simplify_rectilinear(ring: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Drop collinear vertices (exact simplification for axis-aligned
    rings — Simplify(1) analog, outlines.py:135-136)."""
    if len(ring) < 4:
        return ring
    pts = ring[:-1]
    out = []
    n = len(pts)
    for i in range(n):
        a, b, c = pts[i - 1], pts[i], pts[(i + 1) % n]
        if (a[0] == b[0] == c[0]) or (a[1] == b[1] == c[1]):
            continue
        out.append(b)
    out.append(out[0])
    return out


def cell_outlines(geocoded: DataFrame, group_col: str = "lang",
                  level: int = 6, min_cells: int = 1) -> DataFrame:
    """Polygonize the occupied-cell mask per group.

    Returns (group, component_id, n_cells, ring_geojson, min_x, min_y,
    max_x, max_y). Cells are level-`level` quadkey grid coords.
    """
    n = 1 << level
    cells = (
        geocoded.select(
            F.col(group_col).alias("grp"),
            F.expr(
                f"cast(floor(least(greatest(lonm + 180000, 0), 359999)"
                f" * {n} / 360000) as bigint)").alias("cx"),
            F.expr(
                f"cast(floor(least(greatest(90000 - latm, 0), 179999)"
                f" * {n} / 180000) as bigint)").alias("cy"),
        )
        .distinct()  # shuffle bounded by occupied cells, not pages
    )
    schema = ("grp string, component_id bigint, n_cells bigint,"
              " ring_geojson string,"
              " min_x bigint, min_y bigint, max_x bigint, max_y bigint")

    def polygonize(key, pdf: pd.DataFrame) -> pd.DataFrame:
        grp = key[0]
        arr = pdf[["cx", "cy"]].to_numpy(np.int64)
        roots = _connected_components(arr)
        comps: dict[tuple[int, int], set] = {}
        for cell, root in roots.items():
            comps.setdefault(root, set()).add(cell)
        rows = []
        ordered = sorted(comps.values(), key=lambda s: min(s))
        for cid, comp in enumerate(ordered):
            if len(comp) < min_cells:
                continue  # minimum_area filter (params.py:50)
            ring = _simplify_rectilinear(_boundary_ring(comp))
            gj = json.dumps({
                "type": "Polygon",
                "coordinates": [[list(p) for p in ring]],
            }, separators=(",", ":"))
            xs = [c[0] for c in comp]
            ys = [c[1] for c in comp]
            rows.append((grp, cid, len(comp), gj,
                         min(xs), min(ys), max(xs) + 1, max(ys) + 1))
        return pd.DataFrame(rows, columns=[
            "grp", "component_id", "n_cells", "ring_geojson",
            "min_x", "min_y", "max_x", "max_y"])

    return cells.groupBy("grp").applyInPandas(polygonize, schema=schema)


def outline_features(outlines: DataFrame, gsd: float = 0.2) -> DataFrame:
    """GeoJSON feature rows mirroring the reference outline schema
    (outlines.py:104-128: gsd, registroid, map_id, date + geometry)."""
    return outlines.select(
        F.to_json(F.struct(
            F.lit("Feature").alias("type"),
            F.struct(
                F.col("grp").alias("map_id"),
                F.lit(gsd).alias("gsd"),
                F.col("n_cells").alias("n_cells"),
            ).alias("properties"),
        )).alias("feature_head"),
        "ring_geojson",
    )
