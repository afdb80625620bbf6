"""debezium_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch reimplementation of Debezium's observable semantics
(reference: yugabyte/debezium) on Spark DataFrames + Structured
Streaming:

- initial consistent snapshot -> WAL/binlog-tail replay of enveloped
  change events (``before``/``after``/``op``/LSN ordering/tombstones),
  per ``debezium-core/src/main/java/io/debezium/data/Envelope.java``;
- key-partitioned last-writer-wins apply with per-key LSN ordering
  (the reference's single-writer-per-partition invariant,
  ``pipeline/ChangeEventSourceCoordinator.java:106``);
- Debezium-style schema evolution (add / rename / widen) via a
  field-id based table schema (Iceberg-style), per
  ``relational/history/TableChanges.java``;
- exactly-once effect through idempotent MERGE + batch-id-fenced
  commits (upgrade over the reference's at-least-once offset flush,
  ``embedded/EmbeddedEngine.java:815-905``);
- resumability from a commit log / checkpoint with per-partition
  lineage + offset metrics (``pipeline/meters/*``).

Everything is DataFrame ops + vectorized pandas/Arrow UDFs — no
per-row Python in any hot path.
"""

from debezium_spark.envelope import EVENT_SCHEMA, ROW_FIELDS, ROW_SCHEMA
from debezium_spark.session import get_spark

__version__ = "0.1.0"

__all__ = [
    "EVENT_SCHEMA",
    "ROW_FIELDS",
    "ROW_SCHEMA",
    "get_spark",
    "__version__",
]
