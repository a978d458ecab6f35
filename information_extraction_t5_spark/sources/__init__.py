"""Sources/sinks for the reference's on-disk formats (migration path)."""
