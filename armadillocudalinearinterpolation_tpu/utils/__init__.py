"""Utilities: debug dumps, checkpointing, timing."""
