"""CDC operator layer: the Spark-first re-expression of the reference's
Augmenter → Applier pipeline (reference: Replicator.java:151-204)."""
