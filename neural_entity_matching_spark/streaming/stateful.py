"""Custom stateful streaming operator: per-conversation accumulator via
``applyInPandasWithState`` (the arbitrary-stateful-op escape hatch —
used where watermarked windows can't express the semantics).

``running_conversation_state`` keeps (n_turns, max_turn_idx, last_ts_epoch)
per conv_id across micro-batches and emits the updated row each batch a
conversation receives turns — the streaming source of truth the batch
blocking stage consumes (only conversations whose state changed need
re-signing). State is bounded per key (three scalars), so 10^9 live
conversations fit comfortably in the state store."""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("n_turns", LongType(), False),
        StructField("max_turn_idx", IntegerType(), True),
        StructField("last_ts_epoch", DoubleType(), True),
    ]
)

STATE = StructType(
    [
        StructField("n_turns", LongType(), False),
        StructField("max_turn_idx", IntegerType(), True),
        StructField("last_ts_epoch", DoubleType(), True),
    ]
)


def _update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    (conv_id,) = key
    if state.exists:
        n, mx, last = state.get
    else:
        n, mx, last = 0, -1, 0.0
    for pdf in pdfs:
        n += len(pdf)
        if len(pdf):
            mx = max(mx, int(pdf["turn_idx"].max()))
            ts = pdf["ts"].astype("int64").max() / 1e9  # ns -> s
            last = max(last, float(ts))
    state.update((n, int(mx), float(last)))
    yield pd.DataFrame(
        {
            "conv_id": [conv_id],
            "n_turns": [n],
            "max_turn_idx": [int(mx)],
            "last_ts_epoch": [float(last)],
        }
    )


def running_conversation_state(turns: DataFrame) -> DataFrame:
    """Streaming DataFrame of per-conversation cumulative turn state."""
    return turns.groupBy("conv_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT,
        stateStructType=STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
