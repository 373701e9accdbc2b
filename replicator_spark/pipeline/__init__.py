"""Large-scale training-data pipeline operators: deduplication,
similarity search, text analysis, multimodal plumbing — the operations
a 100 TB pretraining-data pipeline needs on top of the CDC engine."""
