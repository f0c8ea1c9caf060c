"""Source / sink connectors (SURVEY.md §2.2 rows S1-S6).

Parquet is the native format (S1, via ``catalog.table``); this package
adds the schema-on-read JSON and CSV scans (S2/S3 — the reference's
batch ingest surface, reference README.md:105-107), the partitioned
parquet sink + its query layer (S4 + R13, standing in for the
reference's Elasticsearch index, README.md:102-104), and in-memory
ingest (S6, the HTTP POST surface, README.md:52-54).

Kafka (S5) is interface-compatible by construction: the streaming
module's transforms run unchanged under
``readStream/writeStream.format("kafka")`` — see streaming/replay.py.
"""

from .filescan import csv_scan, json_scan, write_json_copy, write_csv_copy
from .sink import partitioned_sink, query_index

__all__ = [
    "csv_scan",
    "json_scan",
    "write_json_copy",
    "write_csv_copy",
    "partitioned_sink",
    "query_index",
]
