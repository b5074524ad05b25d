"""Arbitrary-CRS reprojection: UTM (transverse Mercator) -> lon/lat.

The reference ingests any EPSG code via ``osr.SpatialReference``
(``/root/reference/helpers.py:45-48``) and warps rasters to EPSG:3857
(``/root/reference/export_formats/geoserverDEM.py:34-38``).  This module
is the engine's analog for a non-4326 source CRS: a closed-form inverse
transverse-Mercator (UTM grid) using the Krueger n-series truncated at
n^3 (public-domain formulation, sub-millimetre within a UTM zone).

Design rules shared with functions/geo.py:

* every formula exists ONCE as dialect-neutral SQL text (valid in Spark
  SQL and DuckDB) so the engine and the differential oracle evaluate the
  same expression tree;
* no engine-builtin ``degrees``/``radians``/``pi`` or ``sinh``/``cosh``
  — those may differ between libm implementations and in constant
  association; instead RAD2DEG is inlined as one repr'd double and
  sinh/cosh are spelled via ``exp`` so both engines execute identical
  double operations;
* all series constants are computed once in Python and inlined via
  ``repr`` (17 significant digits — both engines parse to the same
  IEEE-754 double);
* the hot path is native expressions (whole-stage codegen); an
  Arrow-vectorized pandas UDF variant exists for the north-rule's batch
  UDF requirement and is differential-tested against the SQL path.

The forward transform (lon/lat -> UTM) exists numpy-only: it is used by
tests to prove the inverse is a true round-trip, mirroring how the
reference trusts GDAL's warp and we trust a self-inverse pair.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# WGS84 ellipsoid / UTM grid constants
A_WGS84 = 6378137.0
F_WGS84 = 1.0 / 298.257223563
K0 = 0.9996
E0 = 500000.0  # false easting

_N = F_WGS84 / (2.0 - F_WGS84)  # third flattening
# rectifying radius A = a/(1+n) * (1 + n^2/4 + n^4/64)
A_RECT = A_WGS84 / (1.0 + _N) * (1.0 + _N ** 2 / 4.0 + _N ** 4 / 64.0)
K0A = K0 * A_RECT

# Krueger series, truncated at n^3 (public formulation; e.g. Karney 2011
# "Transverse Mercator with an accuracy of a few nanometers", eqs 21-26,
# or the standard survey-handbook coefficients)
BETA = (  # inverse: (xi, eta) -> (xi', eta')
    _N / 2.0 - 2.0 * _N ** 2 / 3.0 + 37.0 * _N ** 3 / 96.0,
    _N ** 2 / 48.0 + _N ** 3 / 15.0,
    17.0 * _N ** 3 / 480.0,
)
DELTA = (  # inverse: conformal lat chi -> geographic lat phi
    2.0 * _N - 2.0 * _N ** 2 / 3.0 - 2.0 * _N ** 3,
    7.0 * _N ** 2 / 3.0 - 8.0 * _N ** 3 / 5.0,
    56.0 * _N ** 3 / 15.0,
)
ALPHA = (  # forward (numpy/test side only)
    _N / 2.0 - 2.0 * _N ** 2 / 3.0 + 5.0 * _N ** 3 / 16.0,
    13.0 * _N ** 2 / 48.0 - 3.0 * _N ** 3 / 5.0,
    61.0 * _N ** 3 / 240.0,
)

RAD2DEG = 180.0 / math.pi


def utm_lon0(zone: int) -> float:
    """Central meridian of a UTM zone, degrees."""
    return zone * 6.0 - 183.0


def utm_false_northing(south: bool) -> float:
    return 10000000.0 if south else 0.0


# ---------------------------------------------------------------------------
# SQL-text emitters (dialect-neutral; same text drives Spark and DuckDB)
# ---------------------------------------------------------------------------

def _d(v: float) -> str:
    """Inline a double constant.  Bare decimal literals parse as DECIMAL
    (fixed-point) in Spark SQL and DuckDB — the explicit cast keeps the
    whole chain in IEEE-754 double arithmetic in both engines."""
    return f"cast({v!r} as double)"


def _sql_sinh(x: str) -> str:
    return f"((exp({x}) - exp(-({x}))) / 2)"


def _sql_cosh(x: str) -> str:
    return f"((exp({x}) + exp(-({x}))) / 2)"


def sql_utm_xi(northing: str, south: bool = True) -> str:
    """Normalized northing xi = (N - N0) / (k0 * A)."""
    return f"(({northing} - {_d(utm_false_northing(south))}) / {_d(K0A)})"


def sql_utm_eta(easting: str) -> str:
    """Normalized easting eta = (E - E0) / (k0 * A)."""
    return f"(({easting} - {_d(E0)}) / {_d(K0A)})"


def sql_utm_xip(xi: str, eta: str) -> str:
    """xi' = xi - sum_j beta_j sin(2j xi) cosh(2j eta)."""
    terms = " + ".join(
        f"{_d(b)} * sin({2 * j} * {xi}) * {_sql_cosh(f'{2 * j} * {eta}')}"
        for j, b in enumerate(BETA, start=1))
    return f"({xi} - ({terms}))"


def sql_utm_etap(xi: str, eta: str) -> str:
    """eta' = eta - sum_j beta_j cos(2j xi) sinh(2j eta)."""
    terms = " + ".join(
        f"{_d(b)} * cos({2 * j} * {xi}) * {_sql_sinh(f'{2 * j} * {eta}')}"
        for j, b in enumerate(BETA, start=1))
    return f"({eta} - ({terms}))"


def sql_utm_chi(xip: str, etap: str) -> str:
    """Conformal latitude chi = asin(sin xi' / cosh eta')."""
    return f"asin(sin({xip}) / {_sql_cosh(etap)})"


def sql_utm_lat(chi: str) -> str:
    """Geographic latitude, degrees (unrounded)."""
    series = " + ".join(
        f"{_d(d)} * sin({2 * j} * {chi})"
        for j, d in enumerate(DELTA, start=1))
    return f"(({chi} + {series}) * {_d(RAD2DEG)})"


def sql_utm_lon(xip: str, etap: str, zone: int) -> str:
    """Longitude, degrees (unrounded)."""
    return (f"({_d(utm_lon0(zone))}"
            f" + atan({_sql_sinh(etap)} / cos({xip})) * {_d(RAD2DEG)})")


def utm_inverse_cte(src: str, id_cols: list[str],
                    easting: str = "e_utm", northing: str = "n_utm",
                    zone: int = 21, south: bool = True,
                    round_digits: int = 6) -> str:
    """CTE chain ``u1 .. utm_ll``: UTM coords in `src` -> lon/lat degrees.

    Identical text runs in Spark SQL and DuckDB; rounding to
    `round_digits` absorbs last-ulp libm differences in sin/cos/asin/
    atan/exp between the JVM and DuckDB while exceeding the milli-degree
    grid resolution of the engine's cell index.
    """
    ids = ", ".join(id_cols)
    return f"""u1 AS (
  SELECT {ids}, {easting}, {northing},
    {sql_utm_xi(northing, south)} AS xi,
    {sql_utm_eta(easting)} AS eta
  FROM {src}
),
u2 AS (
  SELECT {ids}, {easting}, {northing},
    {sql_utm_xip('xi', 'eta')} AS xip,
    {sql_utm_etap('xi', 'eta')} AS etap
  FROM u1
),
u3 AS (
  SELECT {ids}, {easting}, {northing}, xip, etap,
    {sql_utm_chi('xip', 'etap')} AS chi
  FROM u2
),
utm_ll AS (
  SELECT {ids}, {easting}, {northing},
    round({sql_utm_lon('xip', 'etap', zone)}, {round_digits}) AS lon,
    round({sql_utm_lat('chi')}, {round_digits}) AS lat
  FROM u3
)"""


# deterministic UTM-coordinate synthesis from an integer id `i`
# (easting within the well-conditioned zone interior, northing covering
# ~ -54deg .. -9deg in a southern zone — the reference's Argentine AOI)
SQL_UTM_EASTING = "(200000 + (i * 7919) % 600000)"
SQL_UTM_NORTHING = "(4000000 + (i * 104729) % 5000000)"


# ---------------------------------------------------------------------------
# Spark operator (native exprs — whole-stage codegen path)
# ---------------------------------------------------------------------------

def reproject_utm(df: DataFrame, easting: str = "e_utm",
                  northing: str = "n_utm", zone: int = 21,
                  south: bool = True,
                  round_digits: int = 6) -> DataFrame:
    """Append lon/lat (degrees, rounded) to a DataFrame of UTM coords.

    Stages mirror `utm_inverse_cte` exactly (same expression text per
    stage) so the operator and the oracle evaluate the same double
    operations in the same order.
    """
    return (
        df.withColumn("xi", F.expr(sql_utm_xi(northing, south)))
        .withColumn("eta", F.expr(sql_utm_eta(easting)))
        .withColumn("xip", F.expr(sql_utm_xip("xi", "eta")))
        .withColumn("etap", F.expr(sql_utm_etap("xi", "eta")))
        .withColumn("chi", F.expr(sql_utm_chi("xip", "etap")))
        .withColumn(
            "lon",
            F.expr(f"round({sql_utm_lon('xip', 'etap', zone)},"
                   f" {round_digits})"))
        .withColumn(
            "lat", F.expr(f"round({sql_utm_lat('chi')}, {round_digits})"))
        .drop("xi", "eta", "xip", "etap", "chi")
    )


# ---------------------------------------------------------------------------
# numpy mirrors (Arrow pandas UDF + round-trip ground truth for tests)
# ---------------------------------------------------------------------------

def np_utm_inverse(e: np.ndarray, n: np.ndarray, zone: int = 21,
                   south: bool = True) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized inverse — same truncated series as the SQL text."""
    xi = (n.astype(np.float64) - utm_false_northing(south)) / K0A
    eta = (e.astype(np.float64) - E0) / K0A
    xip = xi.copy()
    etap = eta.copy()
    for j, b in enumerate(BETA, start=1):
        xip = xip - b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        etap = etap - b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    chi = np.arcsin(np.sin(xip) / np.cosh(etap))
    phi = chi.copy()
    for j, d in enumerate(DELTA, start=1):
        phi = phi + d * np.sin(2 * j * chi)
    lat = phi * RAD2DEG
    lon = utm_lon0(zone) + np.arctan(np.sinh(etap) / np.cos(xip)) * RAD2DEG
    return lon, lat


def np_utm_forward(lon: np.ndarray, lat: np.ndarray, zone: int = 21,
                   south: bool = True) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized forward transform (test-side ground truth only)."""
    lam = (lon.astype(np.float64) - utm_lon0(zone)) / RAD2DEG
    phi = lat.astype(np.float64) / RAD2DEG
    s = 2.0 * math.sqrt(_N) / (1.0 + _N)
    sphi = np.sin(phi)
    t = np.sinh(np.arctanh(sphi) - s * np.arctanh(s * sphi))
    xip = np.arctan2(t, np.cos(lam))
    etap = np.arctanh(np.sin(lam) / np.sqrt(1.0 + t * t))
    xi = xip.copy()
    eta = etap.copy()
    for j, a in enumerate(ALPHA, start=1):
        xi = xi + a * np.sin(2 * j * xip) * np.cosh(2 * j * etap)
        eta = eta + a * np.cos(2 * j * xip) * np.sinh(2 * j * etap)
    easting = E0 + K0A * eta
    northing = utm_false_northing(south) + K0A * xi
    return easting, northing


def make_utm_inverse_pandas_udf(zone: int = 21, south: bool = True,
                                round_digits: int = 6):
    """Arrow-vectorized pandas UDF returning struct<lon,lat> — the
    north-rule's batch-UDF path; differential-tested against the native
    expression path."""

    @F.pandas_udf("struct<lon: double, lat: double>")
    def utm_inverse_udf(e: pd.Series, n: pd.Series) -> pd.DataFrame:
        lon, lat = np_utm_inverse(
            e.to_numpy(np.float64), n.to_numpy(np.float64), zone, south)
        return pd.DataFrame({
            "lon": np.round(lon, round_digits),
            "lat": np.round(lat, round_digits),
        })

    return utm_inverse_udf
