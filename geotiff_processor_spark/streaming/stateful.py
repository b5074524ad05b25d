"""Custom stateful streaming operators over keyed state.

The reference keeps an in-memory processed-registry dict across its
per-file loop (/root/reference/helpers.py:166-183). The streaming-native
form is keyed state: ``applyInPandasWithState`` holds one record per
key across micro-batches, surviving restarts via the checkpoint
(north_rule resumability).

- ``running_cell_totals``: cumulative (n_pages, n_bytes) per cell,
  output mode "update" — one row per touched cell per batch.
- ``streaming_dedup``: dedup-on-ingest — first-seen filter keyed by
  content digest, output mode "append": a document is emitted exactly
  once corpus-lifetime, duplicates (same md5(text)) in the same or any
  later micro-batch are dropped. State is one long per distinct
  document, sharded across executors by the digest-keyed shuffle the
  groupBy already does — at 100 TB that state lives in the per-
  partition state store (RocksDB provider on a real cluster) and no
  single node ever holds the full registry.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType([
    StructField("cell_pfx", StringType()),
    StructField("n_pages", LongType()),
    StructField("n_bytes", LongType()),
])
STATE_SCHEMA = StructType([
    StructField("n_pages", LongType()),
    StructField("n_bytes", LongType()),
])


def _update_totals(key, pdfs, state: GroupState):
    total_rows, total_bytes = (state.get if state.exists else (0, 0))
    for pdf in pdfs:
        total_rows += len(pdf)
        total_bytes += int(pdf["n_chars"].sum())
    state.update((total_rows, total_bytes))
    yield pd.DataFrame({
        "cell_pfx": [key[0]],
        "n_pages": [total_rows],
        "n_bytes": [total_bytes],
    })


def running_cell_totals(pages_stream: DataFrame,
                        prefix_level: int = 2) -> DataFrame:
    """Stateful cumulative totals per level-p cell over a geocoded page
    stream (needs cell_id + text columns)."""
    keyed = pages_stream.select(
        F.substring("cell_id", 1, prefix_level).alias("cell_pfx"),
        F.length("text").alias("n_chars"),
    )
    return keyed.groupBy("cell_pfx").applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


DEDUP_OUTPUT_SCHEMA = StructType([
    StructField("content_hash", StringType()),
    StructField("doc_id", LongType()),
])
DEDUP_STATE_SCHEMA = StructType([
    StructField("first_doc", LongType()),
])


def _first_seen(key, pdfs, state: GroupState):
    ids: list[int] = []
    for pdf in pdfs:
        ids.extend(int(x) for x in pdf["doc_id"])
    if state.exists or not ids:
        return  # digest already emitted in an earlier batch -> all dups
    keep = min(ids)  # deterministic within-batch winner
    state.update((keep,))
    yield pd.DataFrame({"content_hash": [key[0]], "doc_id": [keep]})


def streaming_dedup(docs_stream: DataFrame, key_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """First-seen exact dedup over a document stream: emits
    (content_hash, doc_id) once per distinct md5(text) for the corpus
    lifetime; every later occurrence is silently dropped. The batch
    equivalent is dedup.first_wins on md5(text) — the streaming form
    is what a dedup-on-ingest stage runs so downstream stages never
    see a duplicate at all."""
    keyed = docs_stream.select(
        F.md5(F.col(text_col)).alias("content_hash"),
        F.col(key_col).cast("long").alias("doc_id"),
    )
    return keyed.groupBy("content_hash").applyInPandasWithState(
        _first_seen,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
