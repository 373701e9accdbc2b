"""Structured Streaming layer: the reference's Streams dataflow engine
(streams/StreamsImplementation.java) is replaced wholesale by Spark's
micro-batch runtime; what lives here is the pipeline wiring, the
stateful transaction assembler, and the schema registry with DDL
replay."""
