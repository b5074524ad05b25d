"""Comparison helpers shared by tests/ and scripts/diffcheck.py."""

from __future__ import annotations

import math


def norm_val(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def norm_rows(cols, rows):
    """Sort columns by name, stringify values, sort rows — the driver's
    order-insensitive multiset comparison."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(norm_val(r[i]) for i in order) for r in rows)
    return sorted(cols), out


def spark_norm(df):
    return norm_rows(df.columns, [tuple(r) for r in df.collect()])


def duck_norm(con, sql):
    res = con.execute(sql)
    cols = [d[0] for d in res.description]
    return norm_rows(cols, res.fetchall())


def assert_frames_match(a_cols, a_rows, b_cols, b_rows, label=""):
    assert a_cols == b_cols, f"{label} columns differ: {a_cols} vs {b_cols}"
    assert len(a_rows) == len(b_rows), (
        f"{label} row counts differ: {len(a_rows)} vs {len(b_rows)}")
    if a_rows != b_rows:
        diffs = [(x, y) for x, y in zip(a_rows, b_rows) if x != y][:5]
        raise AssertionError(f"{label} values differ, first diffs: {diffs}")


def assert_spark_equals_duck(df, con, sql, label=""):
    sc, sr = spark_norm(df)
    dc, dr = duck_norm(con, sql)
    assert_frames_match(sc, sr, dc, dr, label)


def donut_pages_fixture(spark):
    """Pages whose occupied level-6 cells form a 3x3 block minus the
    center — polygonizes to an outer ring + one hole ring (the donut
    mask case of gdal.Polygonize, outlines.py:48). Deterministic."""
    from pyspark.sql import functions as F

    rows = []
    for cx in range(10, 13):
        for cy in range(10, 13):
            if (cx, cy) == (11, 11):
                continue
            lonm = -180000 + cx * 5625 + 2000      # mid-cell x
            latm = 90000 - (cy * 2813 + 100)       # maps into row cy
            rows.append((f"d{cx}_{cy}", lonm, latm))
    return spark.createDataFrame(rows, ["url", "lonm", "latm"]).select(
        "url", F.col("lonm").cast("bigint"), F.col("latm").cast("bigint"),
    ).withColumn("g", F.lit("donut"))
