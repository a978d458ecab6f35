"""DataFrame-level operators (the engine's physical building blocks)."""
