"""IO: scans (lazy) and reads (eager) — SURVEY §2.1.

Everything maps onto ``spark.read`` so statistics pruning, hive
partitioning, globs, predicate/projection pushdown are native.
"""

from .io import (
    scan_table,
    write_bucketed,
    read_avro,
    read_csv,
    read_csv_batched,
    BatchedCsvReader,
    read_database,
    read_ipc,
    read_ipc_schema,
    read_ipc_stream,
    scan_ipc,
    read_json,
    read_ndjson,
    read_parquet,
    read_parquet_schema,
    scan_csv,
    scan_ndjson,
    scan_parquet,
    from_pandas,
    from_arrow,
    from_hash,
    from_records,
)

__all__ = [
    "read_avro", "read_csv", "read_csv_batched", "BatchedCsvReader", "read_database", "read_ipc", "read_ipc_schema", "read_ipc_stream", "scan_ipc", "read_json",
    "read_ndjson", "read_parquet", "read_parquet_schema", "scan_csv",
    "scan_ndjson", "scan_parquet", "from_pandas", "from_arrow", "from_hash",
    "from_records",
]
