"""Core index engine: storage, search, construction, removal, stats,
snapshots."""
