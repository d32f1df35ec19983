"""Streaming observability: StreamingQueryProgress as a DataFrame.

Every micro-batch, Structured Streaming emits a progress event (rows
read, processing rates, per-operator STATE size, watermark position,
rows dropped by the watermark). At 100 TB of stream, these numbers ARE
the ops surface — state growth says whether watermark bounds hold,
dropped-row counts say whether the lateness budget is right — and they
come from the engine for free; no extra aggregation pass touches the
data (same philosophy as the batch Observation API).

``progress_report`` reshapes ``query.recentProgress`` into a typed frame
so the monitoring numbers can be joined/thresholded/persisted with the
same engine that runs the pipeline.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

PROGRESS_SCHEMA = (
    "batch_id long, num_input_rows long, state_rows_total long, "
    "state_rows_updated long, state_memory_bytes long, "
    "rows_dropped_by_watermark long, watermark string, sink_description string"
)


def progress_report(spark: SparkSession, query) -> DataFrame:
    """One row per completed micro-batch of ``query`` (a
    StreamingQuery), from its retained progress events."""
    rows = []
    for p in query.recentProgress:
        d = p if isinstance(p, dict) else json.loads(p.json)
        ops = d.get("stateOperators") or []
        rows.append(
            (
                int(d.get("batchId", -1)),
                int(d.get("numInputRows", 0) or 0),
                sum(int(o.get("numRowsTotal", 0) or 0) for o in ops),
                sum(int(o.get("numRowsUpdated", 0) or 0) for o in ops),
                sum(int(o.get("memoryUsedBytes", 0) or 0) for o in ops),
                sum(
                    int(o.get("numRowsDroppedByWatermark", 0) or 0)
                    for o in ops
                ),
                (d.get("eventTime") or {}).get("watermark"),
                (d.get("sink") or {}).get("description"),
            )
        )
    return spark.createDataFrame(rows, PROGRESS_SCHEMA)
