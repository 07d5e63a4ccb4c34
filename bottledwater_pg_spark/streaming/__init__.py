"""Structured Streaming plane: streaming CDC ingestion, stateful
latest-by-key, windowed aggregation, checkpointed exactly-once sinks."""
