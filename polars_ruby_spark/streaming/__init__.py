"""Structured Streaming wrappers (beyond-reference; SURVEY §2.10).

The reference's "streaming" is out-of-core batch — inherent to Spark.  These
wrappers add true event-time streaming over the same window API so batch
(`group_by_dynamic`) and streaming share semantics."""

from .stream import scan_stream, sink_stream, windowed_agg
