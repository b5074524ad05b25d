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
            idx = np.argpartition(d2, kk - 1, axis=1)[:, :kk]
            for qi in range(len(qid)):
                pool = best[int(qid[qi])]
                pool.extend(
                    (int(d2[qi, j]), urls[j]) for j in idx[qi])
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
                    prefix_level: int = 2) -> DataFrame:
    """Approximate kNN: candidates = pages in the query's level-p cell."""
    qrows = queries.select("query_id", "qlonm", "qlatm").collect()
    q_lonm = np.array([r["qlonm"] for r in qrows], dtype=np.int64)
    q_latm = np.array([r["qlatm"] for r in qrows], dtype=np.int64)
    q_cells = np_cell_id(q_lonm, q_latm, levels=prefix_level)
    qdf = geocoded.sparkSession.createDataFrame(
        [(int(r["query_id"]), int(r["qlonm"]), int(r["qlatm"]), str(c))
         for r, c in zip(qrows, q_cells)],
        schema=["query_id", "qlonm", "qlatm", "qcell"],
    )
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
