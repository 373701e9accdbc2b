"""Sinks: time-machine versioned store, count, console, kafka
(reference: applier/* — HBase/Kafka/Console/Count appliers)."""
