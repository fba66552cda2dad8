"""Multi-stream batching and multi-chip sharding."""
