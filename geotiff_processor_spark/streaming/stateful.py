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


TTL_HOURS = 1
DEDUP_TTL_STATE_SCHEMA = StructType([
    StructField("first_doc", LongType()),
    StructField("last_ts_us", LongType()),
])


def _make_first_seen_ttl(ttl_us: int):
    def _first_seen_ttl(key, pdfs, state: GroupState):
        # watermark passed last_seen + ttl with no new sighting:
        # drop the registry entry — THIS bounds state at corpus scale
        if state.hasTimedOut:
            state.remove()
            return
        ids: list[int] = []
        ts_us: list[int] = []
        for pdf in pdfs:
            ids.extend(int(x) for x in pdf["doc_id"])
            # normalize to ns first: pandas may hand datetime64[us]
            ts_us.extend(
                int(v) // 1000
                for v in pd.to_datetime(pdf["ts"])
                .astype("datetime64[ns]").astype("int64"))
        if not ids:
            return
        lo_ts, hi_ts = min(ts_us), max(ts_us)
        emit = None
        if state.exists:
            first_doc, last_ts = state.get
            if lo_ts - last_ts > ttl_us:
                # content reappears AFTER the horizon: a fresh epoch —
                # re-emit (dedup only promises uniqueness within TTL)
                emit = min(ids)
                state.update((emit, max(hi_ts, last_ts)))
            else:
                state.update((first_doc, max(hi_ts, last_ts)))
        else:
            emit = min(ids)
            state.update((emit, hi_ts))
        # expire at last sighting + ttl (sliding horizon); clamp above
        # the current watermark as the API requires
        wm_ms = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(hi_ts // 1000 + ttl_us // 1000,
                                      wm_ms + 1))
        if emit is not None:
            yield pd.DataFrame({"content_hash": [key[0]],
                                "doc_id": [emit]})
    return _first_seen_ttl


def streaming_dedup_ttl(docs_stream: DataFrame, key_col: str = "doc_id",
                        text_col: str = "text", ts_col: str = "ts",
                        ttl_hours: int = TTL_HOURS,
                        watermark_delay: str = "10 minutes") -> DataFrame:
    """First-seen dedup with an EVENT-TIME horizon: a document is
    emitted once per distinct md5(text) per ``ttl_hours`` window since
    its last sighting; registry entries whose horizon the watermark has
    passed are dropped by the state timeout. Unlike ``streaming_dedup``
    (corpus-lifetime uniqueness, state grows with distinct content),
    the TTL form bounds state to content seen within the horizon — the
    shape an UNBOUNDED 100 TB/day ingest must run, trading global
    uniqueness for a dedup horizon exactly like production CDC dedup.
    Reference analog: the per-run processed-registry dict
    (/root/reference/helpers.py:166-183), which is equally scoped to a
    bounded window (one run), not corpus lifetime."""
    ttl_us = ttl_hours * 3_600_000_000
    keyed = docs_stream.select(
        F.md5(F.col(text_col)).alias("content_hash"),
        F.col(key_col).cast("long").alias("doc_id"),
        # watermarks require TIMESTAMP (tz); an NTZ source casts via the
        # session zone — a uniform shift, and the TTL rule only compares
        # differences, so the horizon is zone-independent
        F.col(ts_col).cast("timestamp").alias("ts"),
    ).withWatermark("ts", watermark_delay)
    return keyed.groupBy("content_hash").applyInPandasWithState(
        _make_first_seen_ttl(ttl_us),
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=DEDUP_TTL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
