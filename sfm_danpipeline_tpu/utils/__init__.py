"""Utilities: metrics (ATE / alignment), logging, checkpointing."""
