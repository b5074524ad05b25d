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
  query. The ring around the query's cell expands adaptively until the
  k-th distance provably beats anything outside the block — EXACT
  (pinned equal to ``knn_exact`` in pytest; shares its DuckDB oracle).

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


def _cells_for_block(xq: int, yq: int, ring: int, prefix_level: int
                     ) -> list[str]:
    n = 1 << prefix_level
    cells = []
    for cx in range(max(0, xq - ring), min(n - 1, xq + ring) + 1):
        for cy in range(max(0, yq - ring), min(n - 1, yq + ring) + 1):
            cells.append("".join(
                str(((cx >> (prefix_level - l)) & 1)
                    + 2 * ((cy >> (prefix_level - l)) & 1))
                for l in range(1, prefix_level + 1)))
    return cells


def knn_cell_prefix(geocoded: DataFrame, queries: DataFrame, k: int = 5,
                    prefix_level: int = 4, max_rounds: int = 8
                    ) -> DataFrame:
    """EXACT kNN via the cell hierarchy with adaptive ring expansion.

    Round r: candidates = pages whose level-p cell prefix falls in the
    query's (2r+1)x(2r+1) cell block — one broadcast equi-join on the
    prefix, no pages shuffle, |Q|*k survivors collected. A query is
    RESOLVED once it has k candidates and the k-th squared distance is
    provably smaller than any point outside the block could achieve:
    every outside point differs by > margin in some axis, where margin
    is the query's distance to the block's inner edge (domain-clipped
    sides are unbounded), so ``dk2 < (margin+1)^2`` certifies global
    exactness. Unresolved queries re-run with a wider ring; typical
    workloads resolve at r=1, so the candidate volume stays ~|Q| cells
    of pages rather than the whole table (the reference-style global
    sort this replaces, SURVEY.md J6/W3).
    """
    from ..functions.geo import LAT_SPAN, LON_SPAN

    spark = geocoded.sparkSession
    n = 1 << prefix_level
    INF = 1 << 60
    qrows = queries.select("query_id", "qlonm", "qlatm").collect()
    state = {}
    for r in qrows:
        xi = min(max(int(r["qlonm"]) + 180_000, 0), LON_SPAN - 1)
        yi = min(max(90_000 - int(r["qlatm"]), 0), LAT_SPAN - 1)
        state[int(r["query_id"])] = {
            "qlonm": int(r["qlonm"]), "qlatm": int(r["qlatm"]),
            "xi": xi, "yi": yi,
            "xq": xi * n // LON_SPAN, "yq": yi * n // LAT_SPAN,
            "ring": 1,
        }

    pages_pfx = geocoded.select(
        "url", "lonm", "latm",
        F.substring("cell_id", 1, prefix_level).alias("cell_pfx"))
    resolved: dict[int, list] = {}
    unresolved = set(state)
    for _ in range(max_rounds):
        if not unresolved:
            break
        expanded = []
        for qid in sorted(unresolved):
            s = state[qid]
            for cell in _cells_for_block(s["xq"], s["yq"], s["ring"],
                                         prefix_level):
                expanded.append((qid, s["qlonm"], s["qlatm"], cell))
        qdf = spark.createDataFrame(
            expanded, schema=["query_id", "qlonm", "qlatm", "qcell"])
        cand = pages_pfx.join(
            F.broadcast(qdf), F.col("cell_pfx") == F.col("qcell"))
        cand = cand.withColumn(
            "dist2", F.expr(sql_dist2_mdeg("lonm", "latm", "qlonm", "qlatm")))
        w = Window.partitionBy("query_id").orderBy("dist2", "url")
        top = (
            cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "url", "rank", "dist2")
        ).collect()
        by_q: dict[int, list] = {}
        for row in top:
            by_q.setdefault(int(row["query_id"]), []).append(row)
        for qid in list(unresolved):
            s = state[qid]
            rows = by_q.get(qid, [])
            ring = s["ring"]
            xlo, xhi = max(0, s["xq"] - ring), min(n - 1, s["xq"] + ring)
            ylo, yhi = max(0, s["yq"] - ring), min(n - 1, s["yq"] + ring)
            # inner xi/yi bounds of the block (cell c covers
            # [ceil(c*S/n), ceil((c+1)*S/n) - 1])
            def ceil_div(a: int, b: int) -> int:
                return -(-a // b)

            mx_l = (s["xi"] - ceil_div(xlo * LON_SPAN, n)
                    if xlo > 0 else INF)
            mx_r = (ceil_div((xhi + 1) * LON_SPAN, n) - 1 - s["xi"]
                    if xhi < n - 1 else INF)
            my_l = (s["yi"] - ceil_div(ylo * LAT_SPAN, n)
                    if ylo > 0 else INF)
            my_r = (ceil_div((yhi + 1) * LAT_SPAN, n) - 1 - s["yi"]
                    if yhi < n - 1 else INF)
            margin = min(mx_l, mx_r, my_l, my_r)
            full_cover = margin >= INF
            if len(rows) == k and (full_cover
                                   or int(rows[-1]["dist2"])
                                   < (margin + 1) ** 2):
                resolved[qid] = rows
                unresolved.discard(qid)
            elif full_cover:  # whole domain scanned, fewer than k pages
                resolved[qid] = rows
                unresolved.discard(qid)
            else:
                s["ring"] += 1
    out = [(qid, r["url"], int(r["rank"]), int(r["dist2"]))
           for qid, rows in resolved.items() for r in rows]
    return spark.createDataFrame(
        out, schema="query_id bigint, url string, rank bigint, dist2 bigint")
