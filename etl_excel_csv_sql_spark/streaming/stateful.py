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

#: Output shape for the default user_col (kept for reference/tests);
#: the operator derives the real schema from its input so the key
#: column keeps ITS name and type.
RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), True),
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

    The output schema is derived from the input (r10 review): the key
    column keeps the caller's ``user_col`` name and type (it was
    hardcoded 'user_id' long before), and is NULLABLE — a null grouping
    key is a legal group, and a non-null declaration crashed the stream
    at the Arrow boundary when one arrived.
    """
    matches = [
        f for f in events.schema.fields if f.name.lower() == user_col.lower()
    ]
    key_field = matches[0] if matches else events.schema[user_col]
    out_schema = StructType(
        [
            StructField(key_field.name, key_field.dataType, True),
            StructField("batch_events", LongType(), False),
            StructField("total_events", LongType(), False),
        ]
    )

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
                key_field.name: [key[0]],
                "batch_events": [batch_n],
                "total_events": [total],
            }
        )

    return events.groupBy(user_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
