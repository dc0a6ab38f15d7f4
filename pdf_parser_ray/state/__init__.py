"""Checkpoint/resume lineage state."""
