"""Adaptive stat-then-branch plan choice (SURVEY.md A9 / §4 cost-based).

The reference picks its warp resolution from a dataset statistic BEFORE
building the GDAL pipeline: rasters over 150 ha export at the standard
20 cm GSD, smaller ones at a finer 10 cm
(``/root/reference/export_formats/geoserverRGB.py:15-16`` with
``/root/reference/params.py:36-41``).

Spark form: collect a TINY aggregate (one row — count of valid pixels),
branch in the driver, and build the downstream logical plan with the
chosen parameter. This is the collect-stat-then-branch pattern: the
stat job is a separate tiny action; the main plan is constructed with a
literal, so Catalyst sees a constant (partition pruning / constant
folding apply) rather than a runtime join against the stat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HA_SM_TRIGGER = 150.0  # params.py:40
GSD_CM = 20            # params.py geoserverRGB['gsd']
GSD_SM_CM = 10         # params.py:41


def measured_area_ha(raster_valid: DataFrame, gsd_m: float) -> float:
    """Valid-pixel area in hectares (process.py:172-211 semantics)."""
    n = raster_valid.agg(F.count(F.lit(1)).alias("n")).first()["n"]
    return n * gsd_m * gsd_m / 10_000.0


def choose_gsd_cm(area_ha: float,
                  trigger_ha: float = HA_SM_TRIGGER) -> int:
    """geoserverRGB.py:15-16: big rasters at 20 cm, small at 10 cm."""
    return GSD_CM if area_ha > trigger_ha else GSD_SM_CM


def adaptive_pyramid_level(raster_valid: DataFrame, gsd_m: float,
                           base_gsd_cm: int = 5,
                           trigger_ha: float = HA_SM_TRIGGER
                           ) -> tuple[DataFrame, int, int]:
    """Stat -> branch -> plan: aggregate the coarsest level that still
    meets the chosen output GSD. Returns (plan, chosen_gsd_cm, factor).

    factor = chosen_gsd / native_gsd (e.g. native 5 cm, chosen 20 cm =>
    4x4 resample; chosen 10 cm => 2x2) — the pyramid analog of the
    reference's xRes/yRes warp choice.
    """
    from ..operators import pyramid

    area = measured_area_ha(raster_valid, gsd_m)
    gsd_cm = choose_gsd_cm(area, trigger_ha)
    factor = max(1, gsd_cm // base_gsd_cm)
    return pyramid.resample_aggregate(raster_valid, factor), gsd_cm, factor
