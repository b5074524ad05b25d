"""kNN joins (SURVEY.md J6 / W3).

Two implementations:

- ``knn_exact``: two-phase broadcast kNN. Query points are a small
  broadcast side; phase 1 computes per-input-partition local top-k with
  a vectorized numpy kernel inside ``mapInPandas`` (no shuffle of the
  pages table, map-side reduction to |Q|*k rows per partition); phase 2
  is a global window rank over the tiny survivor set. Exact — this is
  the oracle-checked operator.

- ``knn_cell_prefix``: the cell-prefix candidate join from the
  north_star: candidates share a level-p cell prefix with the query
  (parent-prefix property of the hierarchical cell id), ranked per
  query. Approximate near cell borders unless the prefix ring is
  expanded; recall is tested in pytest against ``knn_exact``.

Distances are exact bigint squared milli-degree distances — no FP drift
between engines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.geo import np_cell_id, sql_dist2_mdeg


def knn_exact(geocoded: DataFrame, queries: DataFrame, k: int = 5) -> DataFrame:
    """Exact kNN: (query_id, url, rank, dist2), rank 1..k.

    Ties broken by url (deterministic total order).
    """
    qrows = queries.select("query_id", "qlonm", "qlatm").collect()
    qid = np.array([r["query_id"] for r in qrows], dtype=np.int64)
    qx = np.array([r["qlonm"] for r in qrows], dtype=np.int64)
    qy = np.array([r["qlatm"] for r in qrows], dtype=np.int64)

    out_schema = "query_id bigint, url string, dist2 bigint"

    def local_topk(batches):
        # accumulate the whole partition's best k per query, streaming
        # over Arrow batches: keep a (|Q|, k) running candidate pool
        best: dict[int, list[tuple[int, str]]] = {int(q): [] for q in qid}
        for pdf in batches:
            x = pdf["lonm"].to_numpy(np.int64)
            y = pdf["latm"].to_numpy(np.int64)
            urls = pdf["url"].to_numpy(object)
            # (|Q|, batch) squared distances, vectorized
            d2 = ((x[None, :] - qx[:, None]) ** 2
                  + (y[None, :] - qy[:, None]) ** 2)
            kk = min(k, d2.shape[1])
            # keep EVERY candidate tied at the k-th distance (an
            # argpartition cut drops arbitrary members of the tie class
            # before the (dist2, url) order is applied — under integer
            # distance collisions the surviving url could then differ
            # from the oracle's ORDER BY dist2, url)
            kth = np.partition(d2, kk - 1, axis=1)[:, kk - 1]
            qis, js = np.nonzero(d2 <= kth[:, None])  # one pass, all queries
            for qi, j in zip(qis.tolist(), js.tolist()):
                best[int(qid[qi])].append((int(d2[qi, j]), urls[j]))
            for pool in best.values():
                pool.sort()
                del pool[k:]
        rows = [
            (q, u, d) for q, pool in best.items() for d, u in pool
        ]
        yield pd.DataFrame(rows, columns=["query_id", "url", "dist2"]) \
            .astype({"query_id": "int64", "dist2": "int64"})

    local = geocoded.select("url", "lonm", "latm").mapInPandas(
        local_topk, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy("dist2", "url")
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "url",
                F.col("rank").cast("bigint").alias("rank"), "dist2")
    )


def knn_crossjoin(geocoded: DataFrame, queries: DataFrame, k: int = 5) -> DataFrame:
    """Naive broadcast crossJoin + window variant (reference semantics,
    used for differential testing of knn_exact)."""
    j = geocoded.select("url", "lonm", "latm").crossJoin(F.broadcast(queries))
    j = j.withColumn(
        "dist2", F.expr(sql_dist2_mdeg("lonm", "latm", "qlonm", "qlatm")))
    w = Window.partitionBy("query_id").orderBy("dist2", "url")
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "url",
                F.col("rank").cast("bigint").alias("rank"), "dist2")
    )


def knn_cell_prefix(geocoded: DataFrame, queries: DataFrame, k: int = 5,
                    prefix_level: int = 2, ring: int = 1) -> DataFrame:
    """Approximate kNN via the cell hierarchy: candidates = pages in the
    query's level-p cell *plus its ring-r neighborhood* (the standard
    grid-index expansion — a point near a cell border still sees its
    true neighbors in the adjacent cell). One broadcast equi-join on the
    cell prefix; no pages shuffle. Exact iff the true k-NN ball fits in
    the (2r+1)x(2r+1) cell block; recall tested vs knn_exact.
    """
    from ..functions.geo import LAT_SPAN, LON_SPAN

    n = 1 << prefix_level
    qrows = queries.select("query_id", "qlonm", "qlatm").collect()
    expanded = []
    for r in qrows:
        xi = min(max(int(r["qlonm"]) + 180_000, 0), LON_SPAN - 1)
        yi = min(max(90_000 - int(r["qlatm"]), 0), LAT_SPAN - 1)
        xq, yq = xi * n // LON_SPAN, yi * n // LAT_SPAN
        seen = set()
        for dx in range(-ring, ring + 1):
            for dy in range(-ring, ring + 1):
                cx, cy = xq + dx, yq + dy
                if not (0 <= cx < n and 0 <= cy < n) or (cx, cy) in seen:
                    continue
                seen.add((cx, cy))
                digits = "".join(
                    str(((cx >> (prefix_level - l)) & 1)
                        + 2 * ((cy >> (prefix_level - l)) & 1))
                    for l in range(1, prefix_level + 1))
                expanded.append((int(r["query_id"]), int(r["qlonm"]),
                                 int(r["qlatm"]), digits))
    qdf = geocoded.sparkSession.createDataFrame(
        expanded, schema=["query_id", "qlonm", "qlatm", "qcell"])
    cand = geocoded.withColumn(
        "cell_pfx", F.substring("cell_id", 1, prefix_level)
    ).join(F.broadcast(qdf), F.col("cell_pfx") == F.col("qcell"))
    cand = cand.withColumn(
        "dist2", F.expr(sql_dist2_mdeg("lonm", "latm", "qlonm", "qlatm")))
    w = Window.partitionBy("query_id").orderBy("dist2", "url")
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "url",
                F.col("rank").cast("bigint").alias("rank"), "dist2")
    )
