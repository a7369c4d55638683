"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference IIoT data-engineering stack
(Kafka -> Flink SQL -> TimescaleDB -> Spark -> Delta), re-expressed
Spark-first: DataFrame/SQL plans optimized by Catalyst, Structured
Streaming for the stream paths, partitioned columnar storage for the
lake layer.

Layout:
  session     - SparkSession factory tuned for local[32] tests and
                cluster-scale defaults (AQE, Arrow, pushdown).
  schemas     - every fixed schema in the system (wire event, raw and
                rollup tables, fixture tables).
  sources     - readers (parquet fixtures, lenient JSON, JDBC/Kafka
                option plumbing) and the deterministic IIoT generator.
  operators   - batch operator library: aggregates, time windows,
                joins, dedup, similarity search, text analysis.
  functions   - scalar-function surface (timestamp parsing, JSON,
                date parts, rounding, vector math).
  streaming   - Structured Streaming jobs: watermarked windowed aggs,
                multi-sink fan-out, batch/streaming parity harness.
  plans       - storage lifecycle (partitioned writes, retention,
                compaction) and the orchestrated nightly flow.
"""

__version__ = "0.1.0"
