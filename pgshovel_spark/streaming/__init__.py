"""Structured Streaming layer — the reference's CDC runtime rebuilt.

pgshovel (reconstructed from public knowledge; snapshot empty — see
SURVEY.md Provenance) captures Postgres row changes via triggers into
a PgQ queue, frames them into transactions, and publishes ordered
protobuf messages that consumers validate (dense sequences, publisher
fencing) and apply.  This package re-expresses each of those runtime
behaviors on Structured Streaming:

====================  =========================================
pgshovel behavior      Spark primitive here
====================  =========================================
trigger+PgQ capture    incremental high-watermark source reads
                       (JDBC in prod; file source in tests)
PgQ tick batching      micro-batches + event-time windows
ordered delivery       monotonic seq column + gap detection
publisher fencing      max-epoch filter
transaction framing    applyInPandasWithState by txid
idempotent consume     dropDuplicatesWithinWatermark
consumer apply         foreachBatch latest-state upsert sink
====================  =========================================
"""

from pgshovel_spark.streaming.change_stream import (
    CHANGE_SCHEMA,
    file_change_stream,
    mutations_from_events,
)
from pgshovel_spark.streaming.ops import (
    sessionize_stream,
    stream_dedup,
    stream_interval_join,
    tumbling_counts,
    validate_sequences,
)
from pgshovel_spark.streaming.sinks import (
    merge_upsert_foreach_batch,
    run_to_memory,
    upsert_foreach_batch,
)

__all__ = [
    "merge_upsert_foreach_batch",
    "CHANGE_SCHEMA",
    "file_change_stream",
    "mutations_from_events",
    "tumbling_counts",
    "stream_dedup",
    "stream_interval_join",
    "sessionize_stream",
    "validate_sequences",
    "run_to_memory",
    "upsert_foreach_batch",
]
