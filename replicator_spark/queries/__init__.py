"""Batch query surface over the engine's tables — the general DataFrame
layer (SURVEY.md §2.11: the reference has no SQL layer; Spark gives us
one for free, exposed over the time-machine output and the driver's
star schema)."""
