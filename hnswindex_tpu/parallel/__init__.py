"""Multi-chip scaling: mesh-sharded corpora with per-shard beams and
ICI all-gather top-k merges."""
