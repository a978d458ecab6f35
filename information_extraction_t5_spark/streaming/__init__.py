"""Structured Streaming ingestion (net-new; the reference is batch-only)."""
