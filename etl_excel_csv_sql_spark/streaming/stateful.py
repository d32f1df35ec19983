"""Custom stateful streaming operators via applyInPandasWithState.

For state shapes the built-in operators can't express (running per-key
accumulators surviving restarts, custom session payloads), Structured
Streaming exposes arbitrary per-key state with Arrow-batched Pandas
processing. State lives in the checkpointed state store: it survives
query restarts and scales with distinct keys per partition, not stream
length.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

#: Output: one row per key per micro-batch it appears in.
RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("batch_events", LongType(), False),
        StructField("total_events", LongType(), False),
    ]
)

_STATE_SCHEMA = StructType([StructField("total", LongType(), False)])


def running_user_totals(
    events: DataFrame, user_col: str = "user_id"
) -> DataFrame:
    """Per-user cumulative event counts across micro-batches — custom state
    the built-in aggregations can't give you in update mode with restart
    persistence AND per-batch deltas in one output row.

    Each group's state is a single long; per batch the operator emits
    (user, events-in-this-batch, lifetime-total). Grouping shuffles on
    user_col once; the Arrow boundary moves only that user's batch rows.
    """

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        batch_n = sum(len(pdf) for pdf in pdfs)
        (total,) = state.get if state.exists else (0,)
        total += batch_n
        state.update((total,))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "batch_events": [batch_n],
                "total_events": [total],
            }
        )

    return events.groupBy(user_col).applyInPandasWithState(
        update,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
