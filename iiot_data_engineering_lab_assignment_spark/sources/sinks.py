"""Sink layer (SURVEY.md section 2.2).

K1 — Kafka producer sink: the reference's producer loop
(ingestion/ingest_data.py:35-88) serializes JSON, keys by machine_id,
acks=all, and flushes periodically.  In Spark all of that collapses into
``to_wire_json(df).write.format("kafka")`` — serialization is
sources.generator.to_wire_json, delivery semantics belong to the Kafka
sink itself.

K2/K3 — JDBC append sinks: the Flink job's two JDBC sinks
(flink-jobs/sensor_aggregation.py:37-70) become ``foreachBatch`` JDBC
appends.  Batch-size/isolation options mirror the Flink connector's
buffering ('sink.buffer-flush.max-rows'='1000', :52).

No broker/database exists in this runtime; these builders are exercised
through stand-in writers in tests (the foreachBatch wiring itself is
tested in streaming.jobs.fan_out_two_sinks) and used as-is in production.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["kafka_batch_writer", "kafka_stream_writer", "jdbc_append", "jdbc_batch_writer"]


def kafka_batch_writer(wire_df: DataFrame, bootstrap_servers: str, topic: str = "machine-sensors"):
    """K1 batch form: write (key, value) rows to Kafka.  `wire_df` comes
    from generator.to_wire_json (key=machine_id preserves the reference's
    per-machine ordering, ingest_data.py:79)."""
    return (
        wire_df.write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("kafka.acks", "all")  # ingest_data.py:38
    )


def kafka_stream_writer(
    wire_df: DataFrame,
    bootstrap_servers: str,
    checkpoint: str,
    topic: str = "machine-sensors",
):
    """K1 streaming form (the live producer loop, ingest_data.py:126-146)."""
    return (
        wire_df.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("kafka.acks", "all")
        .option("checkpointLocation", checkpoint)
    )


def jdbc_append(df: DataFrame, url: str, table: str, properties: dict[str, str] | None = None, batchsize: int = 1000) -> None:
    """K2/K3 micro-batch body: append one batch to a JDBC table.  The
    reference's buffer-flush.max-rows=1000 (sensor_aggregation.py:52) maps
    to the JDBC batchsize option."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .mode("append")
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()


def jdbc_batch_writer(url: str, table: str, properties: dict[str, str] | None = None):
    """Returns a foreachBatch-compatible writer closure:
    ``stream.writeStream.foreachBatch(lambda df, _: jdbc_batch_writer(...)(df))``
    or pass directly to streaming.jobs.fan_out_two_sinks."""

    def write(df: DataFrame, batch_id: int | None = None) -> None:
        jdbc_append(df, url, table, properties)

    return write
