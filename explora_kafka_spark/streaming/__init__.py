"""Structured Streaming ingestion: Kafka/file micro-batch sources, JSON
serde, event-time extraction, and the foreachBatch MERGE view pipeline
(reference: ingestion/IngestStream.java topology)."""
