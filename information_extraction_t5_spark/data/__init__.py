"""Deterministic synthetic data (no external inputs)."""
