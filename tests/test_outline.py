"""Outline polygonize: components, boundary rings, shoelace invariant."""

import json

import numpy as np
from pyspark.sql import functions as F

from geotiff_processor_spark.operators import outline
from geotiff_processor_spark.sources import synth


def _shoelace(ring):
    s = 0
    for (x1, y1), (x2, y2) in zip(ring, ring[1:]):
        s += x1 * y2 - x2 * y1
    return s / 2.0


def test_components_split():
    cells = np.array([[0, 0], [1, 0], [5, 5]])
    roots = outline._connected_components(cells)
    assert roots[(0, 0)] == roots[(1, 0)]
    assert roots[(0, 0)] != roots[(5, 5)]


def test_ring_area_equals_cells_lshape():
    comp = {(0, 0), (1, 0), (1, 1)}
    ring = outline._boundary_ring(comp)
    assert ring[0] == ring[-1]
    assert abs(_shoelace(ring)) == len(comp)
    simp = outline._simplify_rectilinear(ring)
    assert abs(_shoelace(simp)) == len(comp)
    assert len(simp) <= len(ring)


def test_ring_terminates_on_diagonal_pinch():
    # (0,0) and (1,1) touch diagonally but are 4-connected via a path
    comp = {(0, 0), (0, 1), (1, 1), (0, -1), (1, -1), (2, -1), (2, 0),
            (2, 1)}
    ring = outline._boundary_ring(comp)
    assert ring[0] == ring[-1]
    assert len(ring) < 100  # terminated


def test_ring_with_hole_outer_only():
    comp = {(x, y) for x in range(3) for y in range(3)} - {(1, 1)}
    ring = outline._boundary_ring(comp)
    simp = outline._simplify_rectilinear(ring)
    # outer ring of the 3x3 square: area 9 (hole omitted by design)
    assert abs(_shoelace(simp)) == 9
    assert sorted(simp[:-1]) == [(0, 0), (0, 3), (3, 0), (3, 3)]


def test_cell_outlines_pipeline(spark, sf_dir):
    g = synth.geocode(synth.build_pages(spark, sf_dir, with_html=False))
    out = outline.cell_outlines(g, group_col="lang", level=6)
    rows = out.collect()
    assert len(rows) > 0
    # per group, total cells across components == distinct occupied cells
    per_grp = {}
    for r in rows:
        per_grp[r["grp"]] = per_grp.get(r["grp"], 0) + r["n_cells"]
        gj = json.loads(r["ring_geojson"])
        assert gj["type"] == "Polygon"
        ring = [tuple(p) for p in gj["coordinates"][0]]
        assert ring[0] == ring[-1]
    n = 1 << 6
    expected = (
        g.select(
            F.col("lang"),
            F.expr(f"cast(floor(least(greatest(lonm + 180000, 0), 359999)"
                   f" * {n} / 360000) as bigint)").alias("cx"),
            F.expr(f"cast(floor(least(greatest(90000 - latm, 0), 179999)"
                   f" * {n} / 180000) as bigint)").alias("cy"),
        ).distinct().groupBy("lang").count().collect())
    for r in expected:
        assert per_grp[r["lang"]] == r["count"]


def test_min_cells_filter(spark, sf_dir):
    g = synth.geocode(synth.build_pages(spark, sf_dir, with_html=False))
    big = outline.cell_outlines(g, group_col="lang", level=6, min_cells=3)
    assert big.filter(F.col("n_cells") < 3).count() == 0
