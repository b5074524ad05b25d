"""Point-in-polygon join (SURVEY.md J5, north_rule core operator).

Scale design (100 TB pages side, small polygon side):

1. **Cell-cover prefilter**: driver-side, compute for every polygon the
   set of level-p quadkey cells its bbox intersects (polygon side is the
   broadcast dimension). Explode into a (cell_pfx, polygon attrs) table.
2. **Broadcast equi-join** pages (cell prefix = substring of the already
   computed hierarchical cell id — parent-prefix property, no recompute)
   against the cover table. This is a map-side hash join: no shuffle of
   the pages table at all.
3. **Exact containment test** as a native column predicate (for the
   general-polygon path, an Arrow pandas-UDF ray-cast — see
   ``pip_join_raycast``).

Reference analog: the outline/mask semantics of
``/root/reference/outlines.py:39-59`` (pixels->polygons; here inverted
to points->polygons, as mandated by BASELINE.json north_star).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.geo import cell_key_for_quadkey, cell_range_for_bbox, sql_cell_key
from ..sources.synth import POLYGON_COLS, polygon_rows

DEFAULT_COVER_LEVEL = 4


def build_cover_table(spark: SparkSession,
                      rows: list[tuple] | None = None,
                      level: int = DEFAULT_COVER_LEVEL) -> DataFrame:
    """(cell_key, polygon_id, zone, bbox) — one row per covering cell.

    cell_key is the *integer* form of the level-p quadkey cell (bigint
    hash-join keys beat string prefixes; see sql_cell_key)."""
    rows = polygon_rows() if rows is None else rows
    cover = []
    for pid, zone, min_lonm, min_latm, max_lonm, max_latm in rows:
        for cell in cell_range_for_bbox(min_lonm, min_latm,
                                        max_lonm, max_latm, level):
            cover.append((cell_key_for_quadkey(cell), pid, zone,
                          min_lonm, min_latm, max_lonm, max_latm))
    df = spark.createDataFrame(
        cover, schema=["cell_key", *POLYGON_COLS])
    casts = [F.col("cell_key").cast("bigint"),
             F.col("polygon_id").cast("bigint"), F.col("zone")]
    casts += [F.col(c).cast("bigint")
              for c in ("min_lonm", "min_latm", "max_lonm", "max_latm")]
    return df.select(*casts)


def pip_join(geocoded: DataFrame, cover: DataFrame,
             level: int = DEFAULT_COVER_LEVEL) -> DataFrame:
    """Broadcast cell-cover PIP join. Input must carry lonm/latm.

    Returns one row per (page, containing polygon) — pages outside every
    polygon are dropped (inner join, matching the reference's outline
    semantics where only covered pixels polygonize).
    """
    pages_k = geocoded.withColumn(
        "cell_key", F.expr(sql_cell_key("lonm", "latm", level)))
    joined = pages_k.join(F.broadcast(cover), "cell_key")
    exact = joined.filter(
        (F.col("lonm") >= F.col("min_lonm"))
        & (F.col("lonm") < F.col("max_lonm"))
        & (F.col("latm") >= F.col("min_latm"))
        & (F.col("latm") < F.col("max_latm"))
    )
    return exact.drop("cell_key")


# ---------------------------------------------------------------------------
# general-polygon path: Arrow pandas-UDF vectorized ray casting
# ---------------------------------------------------------------------------

def pip_join_raycast(geocoded: DataFrame, polygons: list[dict],
                     level: int = DEFAULT_COVER_LEVEL) -> DataFrame:
    """PIP join for arbitrary (possibly concave) polygons.

    ``polygons``: list of {polygon_id, xs: [lonm...], ys: [latm...]}
    closed rings (first!=last fine; ring closure implied). The polygon
    set is captured in the UDF closure => shipped once per executor
    (broadcast-equivalent). Probing is numpy-vectorized ray casting —
    no per-row Python (input_hint mandate).

    Emits (url, polygon_id) candidate-verified pairs via mapInPandas
    (1:N — a UDTF-shaped operator, SURVEY.md §2.10).
    """
    poly_data = [
        (int(p["polygon_id"]),
         np.asarray(p["xs"], dtype=np.float64),
         np.asarray(p["ys"], dtype=np.float64))
        for p in polygons
    ]

    out_schema = "url string, polygon_id bigint"

    def probe(batches):
        for pdf in batches:
            x = pdf["lonm"].to_numpy(np.float64)
            y = pdf["latm"].to_numpy(np.float64)
            urls = pdf["url"].to_numpy(object)
            hits_url, hits_pid = [], []
            for pid, xs, ys in poly_data:
                # bbox prefilter (vectorized)
                m = ((x >= xs.min()) & (x < xs.max())
                     & (y >= ys.min()) & (y < ys.max()))
                if not m.any():
                    continue
                xi, yi = x[m], y[m]
                inside = np.zeros(len(xi), dtype=bool)
                n = len(xs)
                for k in range(n):
                    x1, y1 = xs[k], ys[k]
                    x2, y2 = xs[(k + 1) % n], ys[(k + 1) % n]
                    cond = ((y1 <= yi) != (y2 <= yi))
                    with np.errstate(divide="ignore", invalid="ignore"):
                        xcross = x1 + (yi - y1) * (x2 - x1) / (y2 - y1)
                    inside ^= cond & (xi < xcross)
                sel = np.flatnonzero(m)[inside]
                hits_url.extend(urls[sel])
                hits_pid.extend([pid] * len(sel))
            yield pd.DataFrame({"url": hits_url,
                                "polygon_id": pd.Series(hits_pid, dtype="int64")})

    return geocoded.select("url", "lonm", "latm").mapInPandas(
        probe, schema=out_schema)
