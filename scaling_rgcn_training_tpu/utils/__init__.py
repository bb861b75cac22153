"""Shared utilities: timing/tracing, config checks, results, checkpointing."""
