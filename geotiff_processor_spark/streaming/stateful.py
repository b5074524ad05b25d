"""Custom stateful streaming operator: cumulative per-cell page totals.

The reference keeps an in-memory processed-registry dict across its
per-file loop (/root/reference/helpers.py:166-183). The streaming-native
form is keyed state: ``applyInPandasWithState`` holds one running
(n_pages, n_bytes) record per cell across micro-batches, surviving
restarts via the checkpoint (north_rule resumability). Output mode
"update": one row per touched cell per batch with the new cumulative
totals.
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
