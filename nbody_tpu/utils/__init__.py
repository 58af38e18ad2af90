"""Utilities: physics metrics, IO / dumps, profiling, checkpointing."""
