"""Structured Streaming twins of the batch operators.

The reference's incremental behavior is hand-rolled file streaming
(SURVEY §2.8): folder queues, mtime watermarks, archive-on-success.
Structured Streaming provides those semantics natively; this package wires
them:

- file_source: drop-folder pickup with ``cleanSource=archive`` — the
  built-in twin of runner.folder_queue (T2) — and checkpointed sinks (the
  built-in twin of runner.watermark commit ordering, T1).
- windows: event-time tumbling/sliding/session aggregation with late-data
  watermarks — the streaming twins of operators.events (the expressions
  are literally shared; only read/writeStream differ).
"""
