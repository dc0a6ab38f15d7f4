"""Ray Data map_batches stages: routing, extraction, metrics."""
