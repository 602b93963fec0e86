"""Incremental SfM pipeline: track table, baseline bootstrap, incremental
registration, and the end-to-end orchestrator."""
