"""Streaming-adjacent machinery: checkpoint/lineage store, feedback stream."""
