"""replicator_spark — a PySpark-native re-expression of the
mysql-time-machine/replicator CDC engine (reference: /root/reference,
Booking.com MySQL Replicator, Apache-2.0).

The reference is a change-data-capture streaming ETL pipeline: binlog
events → schema-augmented typed change events grouped by transaction →
time-machine (every row version, µs commit timestamps) / Kafka sinks.
This package re-expresses those semantics Spark-first:

- ``cdc/``        envelope model, classification, filters, rowkeys,
                  transaction grouping + µs version organizer, type
                  decode library, partitioners, checkpoint watermark
                  (reference: Augmenter/Applier pipeline,
                  Replicator.java:151-204)
- ``sinks/``      time-machine long-format versioned store, count,
                  console, kafka (reference: applier/*)
- ``streaming/``  Structured Streaming wiring + schema registry with
                  DDL replay (reference: ActiveSchemaManager)
- ``queries/``    the batch query surface over the time-machine output
                  (TPC-H-style DataFrame layer)
- ``pipeline/``   large-scale training-data ops: dedup, similarity
                  search, text analysis, multimodal plumbing

Every operator ships as a pair: a DataFrame builder
``fn(spark, sf_dir) -> DataFrame`` and a DuckDB-oracle ANSI SQL string,
registered in ``replicator_spark.api``.
"""

__version__ = "0.1.0"
