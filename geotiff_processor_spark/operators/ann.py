"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: exact brute-force top-k per query against a small
  broadcast query set. The fold-left ``F.aggregate`` dot product is the
  oracle-checked path (deterministic summation order); the
  ``cosine_topk_numpy`` variant is the throughput path (Arrow batches,
  one BLAS matmul per batch — the 100 TB scale path, since the scan is
  embarrassingly parallel and only |Q|*k rows per partition survive).
- ``lsh_bucket_ann``: sign-random-projection LSH — embeddings bucketed
  by a b-bit sign signature against fixed deterministic hyperplanes;
  probing compares only same-bucket candidates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: str, b: str):
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b),
                   lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm2(a: str):
    return F.aggregate(
        F.transform(F.col(a), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_topk(embeddings: DataFrame, n_queries: int = 5,
                k: int = 10) -> DataFrame:
    """(query_vec_id, vec_id, rank, cos_sim) — queries are the first
    ``n_queries`` vec_ids, self-matches excluded, ties broken by vec_id."""
    q = (
        embeddings.filter(F.col("vec_id") < n_queries)
        .select(F.col("vec_id").alias("query_vec_id"),
                F.col("embedding").alias("q_emb"))
    )
    j = embeddings.crossJoin(F.broadcast(q)) \
        .filter(F.col("vec_id") != F.col("query_vec_id"))
    j = j.withColumn(
        "cos_sim",
        F.round(
            _dot("embedding", "q_emb")
            / (F.sqrt(_norm2("embedding")) * F.sqrt(_norm2("q_emb"))), 6),
    )
    w = Window.partitionBy("query_vec_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_vec_id", "vec_id",
                F.col("rank").cast("bigint").alias("rank"), "cos_sim")
    )


def cosine_topk_numpy(embeddings: DataFrame, query_mat: np.ndarray,
                      query_ids: np.ndarray, k: int = 10) -> DataFrame:
    """Throughput variant: per-partition numpy matmul local top-k, then a
    global window over the |Q|*k survivors per partition."""
    qn = query_mat / np.linalg.norm(query_mat, axis=1, keepdims=True)
    out_schema = "query_vec_id bigint, vec_id bigint, cos_sim double"

    def local(batches):
        for pdf in batches:
            ids = pdf["vec_id"].to_numpy(np.int64)
            mat = np.stack(pdf["embedding"].to_numpy())  # (n, d) float32
            mat = mat.astype(np.float64)
            mat /= np.linalg.norm(mat, axis=1, keepdims=True)
            sims = qn @ mat.T  # (|Q|, n)
            for qi, qid in enumerate(query_ids):
                row = sims[qi]
                mask = ids != qid
                cand = np.flatnonzero(mask)
                kk = min(k, len(cand))
                if kk == 0:
                    continue
                top = cand[np.argpartition(-row[cand], kk - 1)[:kk]]
                yield pd.DataFrame({
                    "query_vec_id": np.full(kk, qid, dtype=np.int64),
                    "vec_id": ids[top],
                    "cos_sim": row[top],
                })

    local_df = embeddings.select("vec_id", "embedding").mapInPandas(
        local, schema=out_schema)
    w = Window.partitionBy("query_vec_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        local_df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_vec_id", "vec_id",
                F.col("rank").cast("bigint").alias("rank"),
                F.round("cos_sim", 6).alias("cos_sim"))
    )


def srp_signature(embeddings: DataFrame, dim: int = 64,
                  bits: int = 8, seed: int = 42, table: int = 0) -> DataFrame:
    """Sign-random-projection bucket id: deterministic hyperplanes from a
    seeded RNG, dot products as native fold expressions."""
    rng = np.random.default_rng(seed + 1000 * table)
    planes = rng.standard_normal((bits, dim))
    sig = None
    for j in range(bits):
        plane = [float(v) for v in planes[j]]
        dot = F.aggregate(
            F.zip_with(F.col("embedding"),
                       F.array(*[F.lit(v) for v in plane]),
                       lambda x, y: x.cast("double") * y),
            F.lit(0.0), lambda acc, x: acc + x)
        bit = F.when(dot > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return embeddings.withColumn("bucket", sig.cast("bigint"))


def srp_signatures_multi(embeddings: DataFrame, dim: int = 64,
                         bits: int = 8, n_tables: int = 4,
                         seed: int = 42) -> DataFrame:
    """Multi-table SRP: one (table, bucket) row per table — standard LSH
    recall amplification (union of candidates across independent tables)."""
    out = None
    for t in range(n_tables):
        sig = srp_signature(embeddings, dim=dim, bits=bits,
                            seed=seed, table=t) \
            .withColumn("table", F.lit(t))
        out = sig if out is None else out.unionByName(sig)
    return out


def embedding_near_dup(corpus: DataFrame, threshold: float = 0.9999,
                       dim: int = 64, bits: int = 8,
                       n_tables: int = 4) -> DataFrame:
    """Embedding-cosine near-dup via SRP bucketing — never all-pairs.

    Both sides are bucketed by a b-bit sign-random-projection signature
    in ``n_tables`` independent tables; only same-(table, bucket) pairs
    are compared. Exact copies / positive scalings share every sign, so
    they collide in **every** table (recall 1 for the cos=1 near-dup
    class this operator targets); general recall amplifies with tables.
    The dedupe shuffles only (vid_a, vid_b, cos_sim) candidate rows —
    embeddings never re-shuffle after the bucket join.
    """
    sig = srp_signatures_multi(corpus, dim=dim, bits=bits,
                               n_tables=n_tables)
    a = sig.select(F.col("vec_id").alias("vid_a"),
                   F.col("embedding").alias("emb_a"), "table", "bucket")
    b = sig.select(F.col("vec_id").alias("vid_b"),
                   F.col("embedding").alias("emb_b"), "table", "bucket")
    cand = (
        a.join(b, ["table", "bucket"])
        .filter(F.col("vid_a") < F.col("vid_b"))
        .withColumn(
            "cos_sim",
            F.round(_dot("emb_a", "emb_b")
                    / (F.sqrt(_norm2("emb_a")) * F.sqrt(_norm2("emb_b"))),
                    6))
        .filter(F.col("cos_sim") >= threshold)
    )
    # a pair can collide in several tables: dedupe on ids only (cos_sim
    # is deterministic per pair, so min == the value)
    return cand.groupBy("vid_a", "vid_b").agg(
        F.min("cos_sim").alias("cos_sim"))


def lsh_bucket_ann(embeddings: DataFrame, n_queries: int = 5, k: int = 10,
                   dim: int = 64, bits: int = 4,
                   n_tables: int = 8) -> DataFrame:
    """ANN: compare only candidates sharing an SRP bucket with the query
    in at least one of ``n_tables`` hash tables (recall < 1 by design;
    tested against cosine_topk for recall)."""
    sig = srp_signatures_multi(embeddings, dim=dim, bits=bits,
                               n_tables=n_tables)
    q = (
        sig.filter(F.col("vec_id") < n_queries)
        .select(F.col("vec_id").alias("query_vec_id"),
                F.col("embedding").alias("q_emb"),
                F.col("table").alias("q_table"),
                F.col("bucket").alias("q_bucket"))
    )
    j = sig.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("q_bucket"))
        & (F.col("table") == F.col("q_table"))) \
        .filter(F.col("vec_id") != F.col("query_vec_id")) \
        .select("vec_id", "embedding", "query_vec_id", "q_emb") \
        .distinct()
    j = j.withColumn(
        "cos_sim",
        F.round(
            _dot("embedding", "q_emb")
            / (F.sqrt(_norm2("embedding")) * F.sqrt(_norm2("q_emb"))), 6))
    w = Window.partitionBy("query_vec_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_vec_id", "vec_id",
                F.col("rank").cast("bigint").alias("rank"), "cos_sim")
    )
