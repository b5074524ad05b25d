"""Golden regression: every run must reproduce the committed fixtures
row-exactly (north_rule: exact join rows + tile/cell assignments)."""

import json
import os

import pytest

import __spark_entry__ as entrymod

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")

PARQUET_GOLDENS = {
    "pip_assignments": lambda s, d: entrymod._pip(s, d)
    .select("url", "polygon_id"),
    "tile_assignments": "tile_assign",
    "knn": "knn",
    "pyramid_l8": "pyramid_l8",
    "zonal_stats": "zonal_stats",
    "cell_encode": "cell_encode",
}


@pytest.mark.parametrize("name", sorted(PARQUET_GOLDENS))
def test_parquet_golden(spark, sf_dir, name):
    spec = PARQUET_GOLDENS[name]
    fn = entrymod.queries()[spec] if isinstance(spec, str) else spec
    got = fn(spark, sf_dir)
    want = spark.read.parquet(os.path.join(GOLDEN_DIR, f"{name}.parquet"))
    assert got.count() == want.count(), name
    assert got.exceptAll(want).count() == 0, name
    assert want.exceptAll(got).count() == 0, name


def test_outline_geojson_golden(spark, sf_dir):
    from geotiff_processor_spark.operators import outline as ol
    rows = ol.cell_outlines(entrymod._geocoded(spark, sf_dir),
                            group_col="lang", level=6) \
        .orderBy("grp", "component_id").collect()
    with open(os.path.join(GOLDEN_DIR, "outline.geojson")) as f:
        want = json.load(f)
    assert len(rows) == len(want["features"])
    for r, feat in zip(rows, want["features"]):
        assert r["grp"] == feat["properties"]["grp"]
        assert r["n_cells"] == feat["properties"]["n_cells"]
        assert json.loads(r["ring_geojson"]) == feat["geometry"]


def test_quantities_golden(spark, sf_dir):
    row = entrymod.queries()["percentile_breaks"](spark, sf_dir).first()
    got = ",".join(str(round(row[f"break_{i + 1}"], 6)) for i in range(7))
    with open(os.path.join(GOLDEN_DIR, "quantities.txt")) as f:
        assert got == f.read().strip()


def test_multipolygon_feature_golden(spark):
    """Reference-exact merged document (outlines.py:79-128): ONE Feature
    per group whose geometry is the MultiPolygon of all components
    (holes included), byte-exact against the committed golden."""
    from geotiff_processor_spark.operators import outline as ol
    from geotiff_processor_spark.testing import donut_pages_fixture
    o = ol.cell_outlines(donut_pages_fixture(spark), group_col="g", level=6)
    got = ol.multipolygon_features(o, gsd=0.2, date="2026-01-01") \
        .first()["feature_json"]
    with open(os.path.join(GOLDEN_DIR, "multipolygon_feature.json")) as f:
        want = f.read()
    assert got == want
    doc = json.loads(got)
    assert doc["geometry"]["type"] == "MultiPolygon"
    # every component polygon present, ordered by component_id
    assert len(doc["geometry"]["coordinates"]) \
        == doc["properties"]["n_components"]


def test_feature_collection_golden(spark):
    """Full FeatureCollection document (geometry incl. hole ring +
    map_id/registroid/gsd/date properties) compared byte-exactly."""
    from geotiff_processor_spark.operators import outline as ol
    from geotiff_processor_spark.testing import donut_pages_fixture
    o = ol.cell_outlines(donut_pages_fixture(spark), group_col="g", level=6)
    got = ol.feature_collections(o, gsd=0.2, date="2026-01-01") \
        .first()["feature_collection"]
    with open(os.path.join(GOLDEN_DIR, "feature_collection.json")) as f:
        want = f.read()
    assert got == want
    doc = json.loads(got)
    rings = doc["features"][0]["geometry"]["coordinates"]
    assert len(rings) == 2  # outer + hole
