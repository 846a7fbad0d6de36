"""Plan-level utilities: stage checkpointing, lineage + metrics tables."""
